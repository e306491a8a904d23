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

t_full = timeloop(
    lambda a, b, c: rs.sample_warp_image_label_supercell(a, b, c)[0],
    img, lab, coords, perturb=2)
print(f"sc warp e2e: {t_full:8.2f} ms", flush=True)

t_cc = timeloop(
    lambda a, b, c: rs.sample_warp_image_label(a, b, c)[0],
    img, lab, coords, perturb=2)
print(f"cc warp e2e: {t_cc:8.2f} ms", flush=True)


# --- coordinate-field construction (lens + 3 foci + perspective + affine) --
def build_coords(key):
    w_, h_, d_ = W, H, D
    pos = rs.meshgrid_xyz((D, H, W))
    kl, kn, kp = jax.random.split(key, 3)
    mag = jax.random.uniform(kl) * 0.1
    radius = max(D, H, W) / 2.0
    c_int = jnp.asarray([w_ // 2, h_ // 2, d_ // 2], jnp.float32)
    dirv = pos - c_int
    len2 = jnp.sum(dirv * dirv, axis=-1, keepdims=True)
    pos = pos + dirv * (-(mag / (radius * radius)) * len2)
    base = rs.meshgrid_xyz((D, H, W))
    disp = jnp.zeros_like(pos)
    num = jnp.floor(jax.random.uniform(kn, minval=1.0, maxval=4.0))
    for i in range(3):
        kk = jax.random.fold_in(key, 100 + i)
        frac = jax.random.uniform(kk, (3,), minval=0.3, maxval=0.7)
        c = frac * jnp.asarray([w_ - 1, h_ - 1, d_ - 1], jnp.float32)
        radius_i = w_ * jax.random.uniform(
            jax.random.fold_in(kk, 1), minval=0.1, maxval=0.5)
        mag_i = jax.random.uniform(
            jax.random.fold_in(kk, 2), minval=0.05, maxval=0.1)
        active = (jnp.float32(i) < num).astype(jnp.float32)
        dv = base - c
        length = jnp.linalg.norm(dv, axis=-1, keepdims=True)
        inside = (length <= radius_i) & (length > 1e-6)
        coef = jnp.where(
            inside,
            -radius_i * mag_i * jnp.sin(length * (np.pi / radius_i)) / length,
            0.0)
        disp = disp + dv * coef * active
    pos = pos + disp
    persp = jax.random.uniform(kp, (3,), minval=-0.5, maxval=0.5) * (
        0.1 / jnp.asarray([w_, h_, d_], jnp.float32))
    center = jnp.asarray([(w_ - 1) / 2, (h_ - 1) / 2, (d_ - 1) / 2], jnp.float32)
    denom = jnp.einsum("...i,i->...", pos - center, persp) + 1.0
    pos = pos / denom[..., None]
    return pos @ m[:, :3].T + m[:, 3]


@jax.jit
def coords_loop(n_dummy):
    def body(i, acc):
        k = jax.random.fold_in(jax.random.key(3), i)
        o = build_coords(k)
        return acc + o.ravel()[0]
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0) + n_dummy)


_ = float(coords_loop(jnp.float32(0)))
t0 = time.perf_counter()
_ = float(coords_loop(jnp.float32(0)))
t_coords = (time.perf_counter() - t0) / 10 * 1e3
print(f"coords (lens+3foci+persp+affine): {t_coords:8.2f} ms", flush=True)

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
