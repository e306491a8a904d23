"""A/B: supercell corner extraction as broadcast-multiply-REDUCE.

Hypothesis (after the N-minor layout LOST: 50.0 vs 42.8 ms): the unrolled
6-term slice-FMA sums materialize each partial add — ~6x the intermediate
HBM traffic.  A single multiply+sum(axis) per pass hands XLA one
reduce-fusion per stage: traffic = read inputs + write stage output once.

D: 3 staged mul-reduce passes, N-major (same shapes as current).
E: one fully fused 3-weight product reduced over the whole window.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import resample as rs

D, H, W = 192, 224, 192
N = (D // 2) * (H // 2) * (W // 2)
L = rs._SC_L

rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
lab = jnp.asarray((rng.random((D, H, W)) * 4).astype(np.float32) // 1)
grid = rs.meshgrid_xyz((D, H, W))
m = rs.affine_matrix(rotation=(0.1, 0.15, -0.1), scaling=(1.1, 0.95, 1.05),
                     translation=(3.0, -2.0, 1.0), shape_dhw=(D, H, W))
coords = rs.apply_affine(grid + 1.5 * jnp.sin(grid * 0.05), m)

packed, peak = rs._pack_image_label(img, lab)
table, anchors = rs._supercell_table(packed)
row_idx, (oz, oy, ox), (fz, fy, fx), valid = rs._supercell_geometry(
    coords, (D, H, W), anchors)
nbr_rows = table[row_idx]  # (N, 216)


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


i6 = jnp.arange(L, dtype=jnp.int32)
t2 = jnp.arange(2, dtype=jnp.int32)


def onehot(o):  # (N,8,2,6)
    return (
        i6[None, None, None, :]
        == o[:, :, None, None] + t2[None, None, :, None]
    ).astype(jnp.float32)


# --- D: staged mul-reduce, N-major ----------------------------------------
def variant_d(rows):
    g = rows.reshape(-1, L, L, L)
    wx, wy, wz = onehot(ox), onehot(oy), onehot(oz)
    # pass1: (N,8,2,6,6) over x
    u = (g[:, None, None, :, :, :] * wx[:, :, :, None, None, :]).sum(-1)
    # pass2: (N,8,2,2,6) over y
    u = (u[:, :, :, None, :, :] * wy[:, :, None, :, None, :]).sum(-1)
    # pass3: (N,8,2,2,2) over z
    u = (u[:, :, :, :, None, :] * wz[:, :, None, None, :, :]).sum(-1)
    return u.transpose(0, 1, 4, 3, 2).reshape(-1, 8, 8)


t_d = timeloop(variant_d, nbr_rows)
print(f"D staged mul-reduce:      {t_d:8.2f} ms", flush=True)


# --- E: fully fused product reduce -----------------------------------------
def variant_e(rows):
    g = rows.reshape(-1, 1, 1, L, L, L)  # (N,1,1,z,y,x)
    wx, wy, wz = onehot(ox), onehot(oy), onehot(oz)
    # w[n,v,c=(tz,ty,tx) packed later] — keep (N,8,8,z,y,x) virtual:
    # build (N,8,2,2,2,...) then flatten
    prod = (
        wz[:, :, :, None, None, :, None, None]      # (N,8,tz,1,1,z,1,1)
        * wy[:, :, None, :, None, None, :, None]    # (N,8,1,ty,1,1,y,1)
        * wx[:, :, None, None, :, None, None, :]    # (N,8,1,1,tx,1,1,x)
        * g[:, :, None, None, :, :, :]              # (N,1,1,1,1,z,y,x)
    )
    u = prod.sum((-3, -2, -1))  # (N,8,2,2,2) (tz,ty,tx)
    return u.reshape(-1, 8, 8)


t_e = timeloop(variant_e, nbr_rows)
print(f"E fused product-reduce:   {t_e:8.2f} ms", flush=True)

# parity
a = np.asarray(jax.jit(
    lambda r: rs._extract_corners(r.reshape(-1, L, L, L), oz, oy, ox)
)(nbr_rows))
d_ = np.asarray(jax.jit(variant_d)(nbr_rows))
e_ = np.asarray(jax.jit(variant_e)(nbr_rows))
print("D max|diff|:", float(np.max(np.abs(a - d_))),
      " E max|diff|:", float(np.max(np.abs(a - e_))), flush=True)


# --- D-full: D + existing combine ------------------------------------------
def d_full(rows):
    nbr = variant_d(rows)
    return rs._combine_packed_corners(nbr, fx, fy, fz, valid, peak)


t_df = timeloop(d_full, nbr_rows)
print(f"D extract+combine:        {t_df:8.2f} ms", flush=True)

# --- current A extract+combine baseline (same session) ----------------------
def a_full(rows):
    nbr = rs._extract_corners(rows.reshape(-1, L, L, L), oz, oy, ox)
    return rs._combine_packed_corners(nbr, fx, fy, fz, valid, peak)


t_af = timeloop(a_full, nbr_rows)
print(f"A extract+combine:        {t_af:8.2f} ms", flush=True)

# --- geometry mul-reduce? geometry baseline + fused-combine over D ----------
t_geo = timeloop(
    lambda c: rs._supercell_geometry(c, (D, H, W), anchors)[0], coords)
print(f"geometry (baseline):      {t_geo:8.2f} ms", flush=True)
