"""In-kernel breakdown of the native warp kernel's ~35 ms/item: time
stripped variants (shuffles only / rows only / compute with constant
geometry) at the flagship shape to locate the cost.

Run on TPU:  python scratch/warp_kernel_breakdown.py
"""
import sys, time
from functools import partial

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import pallas_warp as PW

D, H, W = 192, 224, 192
AZ, AY, AX = D // 2, H // 2, W // 2
GY = PW._pick_gy(AY, AX)
NG = AY // GY
N = AZ * AY * AX
ROWS = PW._ROWS

rng = np.random.default_rng(0)
rows = jnp.asarray(rng.random((N, ROWS)).astype(np.float32))
vol = jnp.asarray(rng.random((D, H, W)).astype(np.float32) * 4.0)
anc = jnp.asarray(rng.integers(0, 90, (AZ * AY, AX)).astype(np.int32))

row_spec = pl.BlockSpec((GY, AX, ROWS), lambda z, t: (z * NG + t, 0, 0))
vol_spec = pl.BlockSpec((2, 2 * GY, W), lambda z, t: (z, t, 0))
anc_spec = pl.BlockSpec((GY, AX), lambda z, t: (z * NG + t, 0))
rows3 = rows.reshape(AZ * AY, AX, ROWS)


def to_c(blk):
    a = blk.reshape(2, GY, 2, blk.shape[-1])
    a = a.transpose(0, 2, 1, 3).transpose(0, 1, 3, 2)
    a = a.reshape(2, 2, AX, 2, GY)
    a = a.transpose(0, 1, 3, 2, 4).transpose(0, 1, 2, 4, 3)
    return a.reshape(8, GY, AX)


def to_native(c):
    a = c.reshape(2, 2, 2, GY, AX)
    a = a.transpose(0, 1, 2, 4, 3).transpose(0, 1, 3, 2, 4)
    a = a.reshape(2, 2, 2 * AX, GY)
    a = a.transpose(0, 1, 3, 2).transpose(0, 2, 1, 3)
    return a.reshape(2, 2 * GY, 2 * AX)


def run(kern, n_vol_in, with_rows, n_anc=0, n_out=1):
    specs = ([row_spec] if with_rows else []) + [vol_spec] * n_vol_in + \
        [anc_spec] * n_anc
    args = ([rows3] if with_rows else []) + [vol] * n_vol_in + [anc] * n_anc
    outs = tuple(jax.ShapeDtypeStruct((D, H, W), jnp.float32)
                 for _ in range(n_out))
    f = pl.pallas_call(
        kern, grid=(AZ, NG), in_specs=specs,
        out_specs=tuple(vol_spec for _ in range(n_out)),
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )

    def fn(*a):
        return f(*a)
    return fn, args


def timeloop(fn, args, iters=20):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            aa = list(a)
            aa[-1] = aa[-1] + (acc * 1e-30).astype(aa[-1].dtype)
            o = fn(*aa)
            return acc + jax.tree.leaves(o)[0].ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args)); t0 = time.perf_counter(); _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


# v0: pure passthrough (DMA in/out only, 1 volume)
def k_pass(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
fn, args = run(k_pass, 1, False)
print(f"passthrough 1 vol            {timeloop(fn, args):7.2f} ms", flush=True)

# v1: 3x to_c + combine + to_native (shuffles, no rows)
def k_shuf(x_ref, y_ref, z_ref, o_ref):
    a = to_c(x_ref[...]) + to_c(y_ref[...]) + to_c(z_ref[...])
    o_ref[...] = to_native(a[:8])
fn, args = run(k_shuf, 3, False)
print(f"3x to_c + to_native          {timeloop(fn, args):7.2f} ms", flush=True)

# v2: rows DMA + batched transpose + reduce (no voxel shuffles)
def k_rows(g_ref, x_ref, o_ref):
    rt = g_ref[...].transpose(0, 2, 1)  # (GY, 216, AX)
    acc = jnp.zeros((GY, AX), jnp.float32)
    for i in range(ROWS):
        acc = acc + rt[:, i, :]
    o_ref[...] = to_native(jnp.broadcast_to(acc[None], (8, GY, AX)))
fn, args = run(k_rows, 1, True)
print(f"rows T + 216-sum             {timeloop(fn, args):7.2f} ms", flush=True)

# v2b: rows DMA + NO transpose, slice lanes instead (reduce over sublane i)
def k_rows_nt(g_ref, x_ref, o_ref):
    g = g_ref[...]  # (GY, AX, 216)
    acc = jnp.sum(g, axis=2)  # (GY, AX)
    o_ref[...] = to_native(jnp.broadcast_to(acc[None], (8, GY, AX)))
fn, args = run(k_rows_nt, 1, True)
print(f"rows no-T lane-sum           {timeloop(fn, args):7.2f} ms", flush=True)

# v3: full one-hot compute with FIXED geometry (no to_c, no rows T cost
# isolation — rows transposed, geometry constant)
def k_compute(g_ref, x_ref, o_ref):
    rt = g_ref[...].transpose(0, 2, 1)
    oz = jnp.full((8, GY, AX), 2, jnp.int32)
    f = jnp.full((8, GY, AX), 0.5, jnp.float32)
    v = jnp.ones((8, GY, AX), jnp.float32)
    img, lab = PW._compute(lambda i: rt[:, i, :][None],
                           oz, oz, oz, f, f, f, v)
    o_ref[...] = to_native(img + lab)
fn, args = run(k_compute, 1, True)
print(f"rows T + full compute        {timeloop(fn, args):7.2f} ms", flush=True)


# v5a: full compute, DATA-DEPENDENT geometry from a layout-natural source
def k_compute_dd(g_ref, x_ref, o_ref):
    rt = g_ref[...].transpose(0, 2, 1)
    src = jnp.broadcast_to(x_ref[...][0:1, :GY, :AX], (8, GY, AX))
    oz = jnp.clip(src.astype(jnp.int32), 0, 4)
    f = src - jnp.floor(src)
    v = (src >= 0).astype(jnp.float32)
    img, lab = PW._compute(lambda i: rt[:, i, :][None],
                           oz, oz, oz, f, f, f, v)
    o_ref[...] = to_native(img + lab)
fn, args = run(k_compute_dd, 1, True)
print(f"rows T + compute (dd natural){timeloop(fn, args):7.2f} ms", flush=True)

# v5b: same but geometry flows through to_c (possible relayout contagion)
def k_compute_tc(g_ref, x_ref, o_ref):
    rt = g_ref[...].transpose(0, 2, 1)
    src = to_c(x_ref[...])
    oz = jnp.clip(src.astype(jnp.int32), 0, 4)
    f = src - jnp.floor(src)
    v = (src >= 0).astype(jnp.float32)
    img, lab = PW._compute(lambda i: rt[:, i, :][None],
                           oz, oz, oz, f, f, f, v)
    o_ref[...] = to_native(img + lab)
fn, args = run(k_compute_tc, 1, True)
print(f"rows T + compute (dd to_c)   {timeloop(fn, args):7.2f} ms", flush=True)


# v8: scratch-roundtrip reset (mimics the kernel edit)
def k_compute_scr(g_ref, x_ref, o_ref, scr):
    rt = g_ref[...].transpose(0, 2, 1)
    scr[0] = to_c(x_ref[...])
    src = scr[0]
    oz = jnp.clip(src.astype(jnp.int32), 0, 4)
    f = src - jnp.floor(src)
    v = (src >= 0).astype(jnp.float32)
    img, lab = PW._compute(lambda i: rt[:, i, :][None],
                           oz, oz, oz, f, f, f, v)
    o_ref[...] = to_native(img + lab)
f8 = pl.pallas_call(
    k_compute_scr, grid=(AZ, NG), in_specs=[row_spec, vol_spec],
    out_specs=vol_spec, out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
    scratch_shapes=[pltpu.VMEM((1, 8, GY, AX), jnp.float32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20))
print(f"compute (to_c + scratch rt)  {timeloop(lambda a,b: f8(a,b), [rows3, vol]):7.2f} ms", flush=True)

# v9: rows pulled INTO the shuffle layout via +0*src — FMAs then mix
# same-layout operands
def k_compute_zsh(g_ref, x_ref, o_ref):
    rt = g_ref[...].transpose(0, 2, 1)
    src = to_c(x_ref[...])
    zero_sh = src * 0.0
    oz = jnp.clip(src.astype(jnp.int32), 0, 4)
    f = src - jnp.floor(src)
    v = (src >= 0).astype(jnp.float32)
    img, lab = PW._compute(lambda i: rt[:, i, :][None] + zero_sh,
                           oz, oz, oz, f, f, f, v)
    o_ref[...] = to_native(img + lab)
fn, args = run(k_compute_zsh, 1, True)
print(f"compute (to_c + rows zsh)    {timeloop(fn, args):7.2f} ms", flush=True)
