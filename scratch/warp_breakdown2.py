"""On-chip component breakdown of the session-2 supercell warp path
(pallas extract+combine tail): pack, table build, geometry, row gather,
transpose, kernel, e2e."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import resample as rs
from unet_studio_tpu.ops import pallas_warp as pw

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


packed, peak = rs._pack_image_label(img, lab)
table, anchors = rs._supercell_table(packed)
geom = rs._supercell_geometry(coords, (D, H, W), anchors)
row_idx, (oz, oy, ox), (fz, fy, fx), valid = geom
rows = table[row_idx]

t = timeloop(lambda a, b: rs._pack_image_label(a, b)[0], img, lab)
print(f"pack:        {t:8.2f} ms", flush=True)
t = timeloop(lambda v: rs._supercell_table(v)[0], packed)
print(f"table build: {t:8.2f} ms", flush=True)
t = timeloop(lambda c: rs._supercell_geometry(c, (D, H, W), anchors)[0],
             coords)
print(f"geometry:    {t:8.2f} ms", flush=True)
t = timeloop(lambda tb, i: tb[i], table, row_idx, perturb=0)
print(f"row gather:  {t:8.2f} ms", flush=True)
t = timeloop(lambda r: r.T + 0.0, rows)
print(f"transpose:   {t:8.2f} ms", flush=True)
t = timeloop(
    lambda r: pw.extract_combine_packed(r, oz, oy, ox, fz, fy, fx, valid,
                                        peak)[0], rows)
print(f"kernel tail: {t:8.2f} ms (incl transpose+pads)", flush=True)
t = timeloop(
    lambda a, b, c: rs.sample_warp_image_label_supercell(a, b, c)[0],
    img, lab, coords, perturb=2)
print(f"sc warp e2e: {t:8.2f} ms", flush=True)
