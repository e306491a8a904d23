"""On-chip check of the rewritten supercell path (mul-reduce extract +
full-volume geometry + shared geometry): warp e2e and gate-averaged aug."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import resample as rs

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


t_full = timeloop(
    lambda a, b, c: rs.sample_warp_image_label_supercell(a, b, c)[0],
    img, lab, coords, perturb=2)
print(f"sc warp e2e (new): {t_full:8.2f} ms   (was 98.82)", flush=True)

from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation
opts = AugOptions()


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


t_aug = timeloop_keyed(
    lambda a, b, k: visual_perception_augmentation(a, b, k, opts, True),
    img[..., None], lab)
print(f"full aug (mean over 20 keys, new): {t_aug:8.2f} ms   (was 132.40)",
      flush=True)

# numerical spot-check vs corner-cell (exactness contract)
ia, la_ = jax.jit(rs.sample_warp_image_label_supercell)(img, lab, coords)
ib, lb = jax.jit(rs.sample_warp_image_label)(img, lab, coords)
print("img max|diff| vs corner-cell:",
      float(jnp.max(jnp.abs(ia - ib))),
      " lab mismatch frac:", float(jnp.mean(la_ != lb)), flush=True)
