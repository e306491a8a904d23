"""On-chip component breakdown of the supercell warp + honest aug timing.

Harness rule: every loop body depends on the carried accumulator (defeats
XLA while-loop LICM); aug additionally folds the iteration index into the
RNG key so the 25-75% probability gates sample their true mix.
"""
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


# --- components -----------------------------------------------------------
packed, peak = rs._pack_image_label(img, lab)

t_pack = timeloop(lambda a, b: rs._pack_image_label(a, b)[0], img, lab)
print(f"pack:        {t_pack:8.2f} ms", flush=True)

t_tbl = timeloop(lambda v: rs._supercell_table(v)[0], packed)
print(f"table build: {t_tbl:8.2f} ms", flush=True)

table, anchors = rs._supercell_table(packed)

t_geo = timeloop(
    lambda c: rs._supercell_geometry(c, (D, H, W), anchors)[0], coords)
print(f"geometry:    {t_geo:8.2f} ms", flush=True)

row_idx, (oz, oy, ox), (fz, fy, fx), valid = rs._supercell_geometry(
    coords, (D, H, W), anchors)

t_gat = timeloop(lambda t, i: t[i], table, row_idx, perturb=0)
print(f"row gather:  {t_gat:8.2f} ms", flush=True)

g = table[row_idx].reshape(-1, rs._SC_L, rs._SC_L, rs._SC_L)

t_ext = timeloop(lambda gg: rs._extract_corners(gg, oz, oy, ox), g)
print(f"extract:     {t_ext:8.2f} ms", flush=True)

nbr = rs._extract_corners(g, oz, oy, ox)
t_cmb = timeloop(
    lambda nb: rs._combine_packed_corners(nb, fx, fy, fz, valid, peak)[0], nbr)
print(f"combine:     {t_cmb:8.2f} ms", flush=True)

# --- honest full-aug mean over keys (fold i into the key) ------------------
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
print(f"full aug (mean over 20 keys, supercell): {t_aug:8.2f} ms", flush=True)

import os
os.environ["UNET_TPU_NO_SUPERCELL"] = "1"
from unet_studio_tpu.ops import augment as am
aug_nosc = jax.jit(
    am.visual_perception_augmentation.__wrapped__, static_argnums=(3, 4))
t_aug0 = timeloop_keyed(lambda a, b, k: aug_nosc(a, b, k, opts, True),
                        img[..., None], lab)
print(f"full aug (mean over 20 keys, corner-cell): {t_aug0:8.2f} ms",
      flush=True)
del os.environ["UNET_TPU_NO_SUPERCELL"]
