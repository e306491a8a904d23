"""A/B: supercell corner-extraction layouts on chip.

Hypothesis: `_extract_corners`'s staged one-hot contraction keeps the
window dims (6,6) minor -> vregs pad 6 of 128 lanes on every broadcasted
op.  Variant B transposes the gathered rows once to (216, N) and runs the
same contraction with N minor (full-lane), small dims major.
Variant C additionally fuses the packed-corner combine in the same
N-minor layout (no (...,8)-minor temps).
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


# --- A: current (N-major, small dims minor) --------------------------------
def variant_a(rows):
    g = rows.reshape(-1, L, L, L)
    return rs._extract_corners(g, oz, oy, ox)  # (N,8,8)


t_a = timeloop(variant_a, nbr_rows)
print(f"A extract (N,8,2,6,6) minor-6:  {t_a:8.2f} ms", flush=True)


# --- B: N-minor (transpose once, small dims major) -------------------------
i6 = jnp.arange(L, dtype=jnp.int32)
t2 = jnp.arange(2, dtype=jnp.int32)
ozT = oz.T  # (8, N)
oyT = oy.T
oxT = ox.T


def onehot_T(oT):  # (2, 6, 8, N)
    return (
        i6[None, :, None, None]
        == oT[None, None, :, :] + t2[:, None, None, None]
    ).astype(jnp.float32)


def variant_b(rows):
    gT = rows.T.reshape(L, L, L, -1)  # (z6, y6, x6, N) ; one 890MB transpose
    wx = onehot_T(oxT)  # (2,6,8,N)
    wy = onehot_T(oyT)
    wz = onehot_T(ozT)
    # u1: (tx2, z6, y6, v8, N)
    u = sum(gT[None, :, :, i, None, :] * wx[:, None, None, i] for i in range(L))
    # u2: (tx2, ty2, z6, v8, N)
    u = sum(u[:, None, :, i] * wy[None, :, i][:, :, None] for i in range(L))
    # u3: (tx2, ty2, tz2, v8, N)
    u = sum(u[:, :, None, i] * wz[None, None, :, i] for i in range(L))
    return u  # corner c = tz*4+ty*2+tx major


t_b = timeloop(variant_b, nbr_rows)
print(f"B extract N-minor:              {t_b:8.2f} ms", flush=True)

# parity check B vs A
a = np.asarray(jax.jit(variant_a)(nbr_rows))  # (N,8,8) c=tz*4+ty*2+tx
b = np.asarray(jax.jit(variant_b)(nbr_rows))  # (tx,ty,tz,v8,N)
b_cmp = b.transpose(4, 3, 2, 1, 0).reshape(N, 8, 8)
print("B max |diff|:", float(np.max(np.abs(a - b_cmp))), flush=True)


# --- C: B + fused combine in N-minor ---------------------------------------
fzT, fyT, fxT = fz.T, fy.T, fx.T  # (8, N)
validT = valid.T


def variant_c(rows):
    nbrT = variant_b(rows)  # (tx2, ty2, tz2, v8, N)
    labels, weights, imgs = [], [], []
    for dz in (0, 1):
        wz_ = (1 - fzT) if dz == 0 else fzT
        for dy in (0, 1):
            wy_ = (1 - fyT) if dy == 0 else fyT
            for dx in (0, 1):
                wx_ = (1 - fxT) if dx == 0 else fxT
                v = nbrT[dx, dy, dz]  # (v8, N)
                lb = jnp.floor(v * (1.0 / 65536.0))
                imgs.append(v - lb * 65536.0)
                labels.append(lb)
                weights.append(wz_ * wy_ * wx_)
    out_img = sum(w * im for w, im in zip(weights, imgs)) * (peak / 65535.0)
    best_label = labels[0]
    best_score = None
    for c in range(8):
        score = weights[0] * (labels[0] == labels[c])
        for j in range(1, 8):
            score = score + weights[j] * (labels[j] == labels[c])
        if best_score is None:
            best_score = score
        else:
            better = score > best_score
            best_score = jnp.where(better, score, best_score)
            best_label = jnp.where(better, labels[c], best_label)
    vf = validT.astype(jnp.float32)
    return out_img * vf, best_label * vf  # (v8, N)


t_c = timeloop(variant_c, nbr_rows)
print(f"C extract+combine N-minor:      {t_c:8.2f} ms", flush=True)

# reference combine time in current layout for the same tail
def variant_a_full(rows):
    nbr = variant_a(rows)
    return rs._combine_packed_corners(nbr, fx, fy, fz, valid, peak)


t_af = timeloop(variant_a_full, nbr_rows)
print(f"A extract+combine current:      {t_af:8.2f} ms", flush=True)

ia, la_ = jax.jit(variant_a_full)(nbr_rows)
ic, lc = jax.jit(variant_c)(nbr_rows)
ia, la_ = np.asarray(ia), np.asarray(la_)
ic = np.asarray(ic).T.reshape(N, 8)
lc = np.asarray(lc).T.reshape(N, 8)
print("C img max|diff|:", float(np.max(np.abs(ia - ic))),
      " lab mismatch:", float(np.mean(la_ != lc)), flush=True)
