"""A/B: supercell geometry in full-volume (D,H,W) layout.

Current `_supercell_geometry` blockifies coords to (N,8,3) then works in
minor-8 shapes (16x lane padding) — measured 22 ms standalone.  Variant G
keeps every elementwise op in (D,H,W) layout (W minor, full lanes),
does the block min/max as three staged stride-2 pair-reductions, and only
blockifies the final int32/f32 outputs.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops import resample as rs

D, H, W = 192, 224, 192
grid = rs.meshgrid_xyz((D, H, W))
m = rs.affine_matrix(rotation=(0.1, 0.15, -0.1), scaling=(1.1, 0.95, 1.05),
                     translation=(3.0, -2.0, 1.0), shape_dhw=(D, H, W))
coords = rs.apply_affine(grid + 1.5 * jnp.sin(grid * 0.05), m)
anchors = (D // 2, H // 2, W // 2)


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


def geometry_g(coords):
    d, h, w = D, H, W
    az_n, ay_n, ax_n = anchors
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
        & (z >= 0) & (z <= d - 1)
    )
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)

    def block_reduce(a, op):  # (D,H,W) -> (d/2,h/2,w/2)
        a = op(a[0::2], a[1::2])
        a = op(a[:, 0::2], a[:, 1::2])
        return op(a[:, :, 0::2], a[:, :, 1::2])

    def anchor(f0, n):
        mn = block_reduce(f0, jnp.minimum)
        mx = block_reduce(f0, jnp.maximum)
        return jnp.clip((mn + mx - 2) // 4, 0, n - 1)

    az = anchor(z0, az_n)
    ay = anchor(y0, ay_n)
    ax = anchor(x0, ax_n)
    row_idx = ((az * ay_n + ay) * ax_n + ax).reshape(-1)

    def up(a):  # (d/2,h/2,w/2) -> (D,H,W)
        a = jnp.repeat(a, 2, axis=0)
        a = jnp.repeat(a, 2, axis=1)
        return jnp.repeat(a, 2, axis=2)

    oz = jnp.clip(z0 - 2 * up(az), 0, rs._SC_L - 2)
    oy = jnp.clip(y0 - 2 * up(ay), 0, rs._SC_L - 2)
    ox = jnp.clip(x0 - 2 * up(ax), 0, rs._SC_L - 2)
    blk = rs._blockify
    return (
        row_idx,
        (blk(oz), blk(oy), blk(ox)),
        (blk(z - z0), blk(y - y0), blk(x - x0)),
        blk(valid),
    )


t_g = timeloop(geometry_g, coords)
print(f"G geometry full-volume:   {t_g:8.2f} ms", flush=True)

t_a = timeloop(
    lambda c: rs._supercell_geometry(c, (D, H, W), anchors)[0], coords)
print(f"A geometry blockified:    {t_a:8.2f} ms", flush=True)

# parity
ra, oa, fa, va = jax.jit(
    lambda c: rs._supercell_geometry(c, (D, H, W), anchors))(coords)
rg, og, fg, vg = jax.jit(geometry_g)(coords)
print("row_idx equal:", bool(jnp.all(ra == rg)),
      "o equal:", [bool(jnp.all(a == b)) for a, b in zip(oa, og)],
      "f maxdiff:", [float(jnp.max(jnp.abs(a - b))) for a, b in zip(fa, fg)],
      "valid equal:", bool(jnp.all(va == vg)), flush=True)
