"""On-chip A/B of the NATIVE-layout supercell tail (round 5): geometry
volumes straight into the kernel, volumes straight out — vs the
blockified kernel (UNET_TPU_NO_NATIVE_WARP=1).  Also times the full
gate-averaged augmentation both ways and asserts exactness vs the
corner-cell sampler.

Run on TPU:  python scratch/warp_native_ab.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import resample as rs
from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation

D, H, W = 192, 224, 192
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
lab = jnp.asarray((rng.random((D, H, W)) * 4).astype(np.float32) // 1)
grid = rs.meshgrid_xyz((D, H, W))
m = rs.affine_matrix(rotation=(0.1, 0.15, -0.1), scaling=(1.1, 0.95, 1.05),
                     translation=(3.0, -2.0, 1.0), shape_dhw=(D, H, W))
coords = rs.apply_affine(grid + 1.5 * jnp.sin(grid * 0.05), m)


def timeloop(fn, *args, iters=10, perturb=0):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            aa = list(a)
            aa[perturb] = aa[perturb] + (acc * 1e-30).astype(aa[perturb].dtype)
            o = fn(*aa)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def timeloop_keyed(fn, img_, lab_, iters=20):
    @jax.jit
    def loop(a, b):
        def body(i, acc):
            k = jax.random.fold_in(jax.random.key(7), i)
            o = fn(a + (acc * 1e-30).astype(a.dtype), b, k)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(img_, lab_))
    t0 = time.perf_counter()
    _ = float(loop(img_, lab_))
    return (time.perf_counter() - t0) / iters * 1e3


opts = AugOptions()
warp = lambda a, b, c: rs.sample_warp_image_label_supercell(a, b, c)[0]
aug = lambda a, b, k: visual_perception_augmentation(a, b, k, opts, True)

for tag, env in (("native", None), ("blockified", "1")):
    if env is None:
        os.environ.pop("UNET_TPU_NO_NATIVE_WARP", None)
    else:
        os.environ["UNET_TPU_NO_NATIVE_WARP"] = env
    t_w = timeloop(warp, img, lab, coords, perturb=2)
    t_a = timeloop_keyed(aug, img[..., None], lab)
    print(f"[{tag:10s}] sc warp e2e {t_w:7.2f} ms   full aug (20-key avg) "
          f"{t_a:7.2f} ms", flush=True)

# exactness: native vs corner-cell (the bench gate's contract)
os.environ.pop("UNET_TPU_NO_NATIVE_WARP", None)
ia, la_ = jax.jit(rs.sample_warp_image_label_supercell)(img, lab, coords)
ib, lb = jax.jit(rs.sample_warp_image_label)(img, lab, coords)
print("native img max|diff| vs corner-cell:",
      float(jnp.max(jnp.abs(ia - ib))),
      " lab mismatch frac:", float(jnp.mean(la_ != lb)), flush=True)
