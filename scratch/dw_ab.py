"""On-chip isolation of the s1 conv backward pieces at C=16 full grid:
fwd kernel, dx (same kernel, flipped weights), dw kernel, full VJP.
The round-5 step trace shows dw at ~3.05 ms/call vs a ~1.7 ms matmul
roofline — this pins down where.

Run on TPU:  python scratch/dw_ab.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import pallas_conv as PC
from unet_studio_tpu.ops.packed import pack

D, H, W, C = 192, 224, 192, 16
dims = (D, H, W, C)
rng = np.random.default_rng(0)
x5 = rng.standard_normal((D, H, W, C)).astype(np.float32)
g5 = rng.standard_normal((D, H, W, C)).astype(np.float32)
w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)), jnp.float32) * 0.1
b = jnp.zeros((C,), jnp.float32)
x3 = pack(jnp.asarray(x5)).astype(jnp.bfloat16)
g3 = pack(jnp.asarray(g5)).astype(jnp.bfloat16)


def timeloop(fn, *args, iters=20, perturb=0):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            aa = list(a)
            aa[perturb] = aa[perturb] + (acc * 1e-30).astype(aa[perturb].dtype)
            o = fn(*aa)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args)); t0 = time.perf_counter(); _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


bx = 128 // C
nb = W // bx
tz, th = PC._pick_tiles(D, H, nb, 2)
masks = PC._edge_masks(th, nb, C, jnp.bfloat16)
call = PC._make_dw_call(D, H, nb, tz, th, jnp.bfloat16, PC._halo_groups(C), C)

t_fwd = timeloop(lambda a, ww: PC.conv_s1_packed(a, ww, b, dims), x3, w)
t_dw = timeloop(lambda a, g: call(masks, a, g), x3, g3, perturb=1)
wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
t_dx = timeloop(lambda g, ww: PC.conv_s1_packed(g, ww, b, dims), g3, wt)


def full_vjp(a, g):
    _, vjp = jax.vjp(lambda xx: PC.conv_s1_p(xx, w, b, dims), a)
    return vjp(g)[0]


t_vjp = timeloop(full_vjp, x3, g3, perturb=1)
print(f"C=16 full grid: fwd {t_fwd:6.2f}  dx {t_dx:6.2f}  dw {t_dw:6.2f}  "
      f"full bwd(vjp dx+dw+db) {t_vjp:6.2f} ms", flush=True)
print(f"tiles tz={tz} th={th} nb={nb} n_tiles={(D//tz)*(H//th)}", flush=True)
