"""Pallas TPU kernel for the supercell warp's extract+combine tail.

The supercell warp (ops/resample.py: sample_warp_image_label_supercell,
reference semantics tipl::resample + majority label,
/root/reference/visual_perception_augmentation.cpp:281-335) fetches one
6x6x6 window row per 2x2x2 output block and then extracts each voxel's 8
trilinear corners from the row with staged one-hot contractions.  In XLA
those stages materialize (N,8,2,6,6)-class intermediates in HBM — 27.8 ms
at the flagship grid even in the fused mul-reduce form.  This kernel runs
the whole extraction + trilinear blend + majority vote per VMEM tile:
HBM traffic collapses to read-rows + write-two-(N,8)-outputs.

Layout: everything minor-N.  The gathered rows arrive AS GATHERED in
(N, 216) — the kernel transposes each (B, 216) tile once in VMEM (the
XLA-side transpose this replaces was an HBM round trip, 6.2 ms measured
at the flagship grid) so every subsequent op is a full (8 sublane,
128 lane) vreg: the voxel dim v=8 rides the sublanes, N rides the
lanes.  Per window row (z,y,i) the kernel does 2 FMAs (taps tx=0,1)
against precomputed one-hot masks — 624 (8,B) FMAs per tile total, the
same 624 FMA/voxel the staged contraction always needed, now at VMEM
speed with zero HBM intermediates.

No VJP: augmentation is stop-gradient in the train step (the reference
augments on the host, outside autograd, train.cpp:604-707).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SC_L = 6  # window width per axis (must match ops.resample._SC_L)
_ROWS = _SC_L**3
_B = 1024  # N-tile width (lanes); per-tile VMEM ~2 MB


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compute(row, oz, oy, ox, fz, fy, fx, vf):
    """Shared extract+combine core.  ``row(i)`` returns window value i
    broadcast to the per-voxel compute form; o* i32 / f*, vf f32 arrays
    in that same form ((8,B) for the blockified kernel, (8*gy, ax) for
    the native one — the math is elementwise so the form is free).
    Returns (img un-scaled — caller multiplies by peak/65535 — and lab
    majority label)."""
    f32 = jnp.float32

    # one-hot masks per (tap, window index): (8,B) each
    def masks(o):
        return [
            [(o + t == i).astype(f32) for i in range(_SC_L)] for t in (0, 1)
        ]

    mx, my, mz = masks(ox), masks(oy), masks(oz)

    # pass 1: contract x.  u1[tx][z][y] (8,B)
    u1 = [[[None] * _SC_L for _ in range(_SC_L)] for _ in range(2)]
    for z in range(_SC_L):
        for y in range(_SC_L):
            base = z * (_SC_L * _SC_L) + y * _SC_L
            acc0 = None
            acc1 = None
            for i in range(_SC_L):
                r = row(base + i)
                t0 = r * mx[0][i]
                t1 = r * mx[1][i]
                acc0 = t0 if acc0 is None else acc0 + t0
                acc1 = t1 if acc1 is None else acc1 + t1
            u1[0][z][y] = acc0
            u1[1][z][y] = acc1

    # pass 2: contract y.  u2[tx][ty][z] (8,B)
    u2 = [[[None] * _SC_L for _ in range(2)] for _ in range(2)]
    for tx in range(2):
        for ty in range(2):
            for z in range(_SC_L):
                acc = None
                for y in range(_SC_L):
                    t = u1[tx][z][y] * my[ty][y]
                    acc = t if acc is None else acc + t
                u2[tx][ty][z] = acc

    # pass 3: contract z.  corners[tz][ty][tx] (8,B)
    corner = {}
    for tx in range(2):
        for ty in range(2):
            for tz in range(2):
                acc = None
                for z in range(_SC_L):
                    t = u2[tx][ty][z] * mz[tz][z]
                    acc = t if acc is None else acc + t
                corner[(tz, ty, tx)] = acc

    # combine: unpack label*65536 + img16, trilinear blend + majority vote
    wz = (1.0 - fz, fz)
    wy = (1.0 - fy, fy)
    wx = (1.0 - fx, fx)
    labs, imgs, wgts = [], [], []
    for tz in (0, 1):
        for ty in (0, 1):
            for tx in (0, 1):
                v = corner[(tz, ty, tx)]
                lb = jnp.floor(v * (1.0 / 65536.0))
                imgs.append(v - lb * 65536.0)
                labs.append(lb)
                wgts.append(wz[tz] * wy[ty] * wx[tx])

    out_img = None
    for w, im in zip(wgts, imgs):
        t = w * im
        out_img = t if out_img is None else out_img + t

    best_label = labs[0]
    best_score = None
    for c in range(8):
        score = None
        for j in range(8):
            t = wgts[j] * (labs[j] == labs[c]).astype(f32)
            score = t if score is None else score + t
        if best_score is None:
            best_score = score
        else:
            better = score > best_score
            best_score = jnp.where(better, score, best_score)
            best_label = jnp.where(better, labs[c], best_label)

    return out_img * vf, best_label * vf


def _kernel(g_ref, oz_ref, oy_ref, ox_ref, fz_ref, fy_ref, fx_ref, v_ref,
            img_ref, lab_ref):
    """Blockified-layout kernel: g (B,216) packed rows AS GATHERED
    (N-major — the XLA-side transpose used to cost 6.2 ms at the
    flagship grid; a single in-VMEM transpose here is free by
    comparison); o* (8,B) i32; f*/valid (8,B) f32.  Writes img/lab
    (8,B)."""
    gt = g_ref[...].T  # (216, B) in VMEM
    img, lab = _compute(
        lambda i: gt[i, :][None, :],  # (1,B) -> bcast (8,B)
        oz_ref[...], oy_ref[...], ox_ref[...],
        fz_ref[...], fy_ref[...], fx_ref[...], v_ref[...],
    )
    img_ref[...] = img
    lab_ref[...] = lab


def extract_combine_packed(rows, oz, oy, ox, fz, fy, fx, valid, peak):
    """Kernel-fused equivalent of
    ``_extract_corners`` + ``_combine_packed_corners``:
    rows (N,216) f32 packed window rows; o* (N,8) i32 in [0,4];
    f* (N,8) f32; valid (N,8) bool; peak traced scalar.
    Returns (img (N,8) f32, lab (N,8) f32)."""
    n = rows.shape[0]
    npad = -(-n // _B) * _B
    pad = npad - n

    def prep(a, dtype):
        a = a.astype(dtype).T  # (8, N)
        return jnp.pad(a, ((0, 0), (0, pad))) if pad else a

    g_nm = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows  # (npad, 216)
    args = (
        g_nm,
        prep(oz, jnp.int32), prep(oy, jnp.int32), prep(ox, jnp.int32),
        prep(fz, jnp.float32), prep(fy, jnp.float32), prep(fx, jnp.float32),
        prep(valid, jnp.float32),
    )
    grid = (npad // _B,)
    row_spec = pl.BlockSpec((_B, _ROWS), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((8, _B), lambda t: (0, t), memory_space=pltpu.VMEM)
    img8, lab8 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec] + [v_spec] * 7,
        out_specs=(v_spec, v_spec),
        out_shape=(
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(*args)
    img = img8[:, :n].T * (peak / 65535.0)
    lab = lab8[:, :n].T
    return img, lab


# ---------------------------------------------------------------------------
# supercell window-table builder (resample._supercell_table's kernel path)
# ---------------------------------------------------------------------------


def _table_planes_kernel(vp_hbm, tp_ref, slab, sem, *, gy, ax, w4):
    """Stage 1 of the table build: one tile covers gy*ax supercells (one
    z-anchor, gy y-anchors).  DMA the (6, 2*gy+4, W+4) source slab from
    the PRE-PADDED volume (padding makes every window in-bounds — no
    clamping), deinterleave the x parities via the transpose route, and
    assemble the (gy, 216, ax) window-major block with one sublane
    stack.  All shuffle products flow into the store (cheap — see the
    three-stage warp tail note)."""
    z = pl.program_id(0)
    y0 = pl.program_id(1)
    sy = slab.shape[1]  # 2*gy+4 rounded up to the 8-sublane tiling
    cp = pltpu.make_async_copy(
        vp_hbm.at[pl.ds(2 * z, 6), pl.ds(2 * gy * y0, sy), :],
        slab,
        sem,
    )
    cp.start()
    cp.wait()

    half = w4 // 2
    planes = []
    for iz in range(6):
        pl_t = slab[iz, : 2 * gy + 4, :w4].T  # (W+4, 2gy+4)
        pair = pl_t.reshape(half, 2, 2 * gy + 4)
        by_x = []
        for xp in range(2):
            p = pair[:, xp].T  # (2gy+4, half), lanes x = 2k+xp
            yp = p.reshape(gy + 2, 2, half)  # rows y = 2k+yp
            by_x.append((yp[:, 0], yp[:, 1]))  # each (gy+2, half)
        planes.append(by_x)

    # per-window-index stores: Mosaic refuses to concatenate slices
    # whose internal sublane/lane offsets differ, but a ref store
    # normalizes each part on its way out
    for iz in range(6):
        for iy in range(6):
            for ix in range(6):
                q = planes[iz][ix % 2][iy % 2]
                q = q[iy // 2 : iy // 2 + gy]  # rows 2j+iy
                q = q[:, ix // 2 : ix // 2 + ax]  # (gy, ax)
                tp_ref[:, (iz * 6 + iy) * 6 + ix, :] = q


def _table_swap_kernel(tp_ref, out_ref):
    """Stage 2: (gy, 216, ax) -> (gy, ax, 216) straight into the store —
    the (N, 216) row-major table the XLA gather wants."""
    out_ref[...] = tp_ref[...].transpose(0, 2, 1)


def build_table_kernel(vol: jnp.ndarray):
    """Pallas window-table build: (D,H,W) f32 -> (N, 216) rows, bitwise
    equal to the staged stack build (tests/test_resample.py).  The
    staged XLA form stages lane-hostile minor-6 shapes through DUS
    chains + layout copies (~17 ms/item in-step at the flagship grid)."""
    d, h, w = vol.shape
    az, ay, ax = d // 2, h // 2, w // 2
    gy = _pick_gy(ay, ax)
    ng = ay // gy
    p = 4  # _SC_L - stride
    # slab sublane/lane dims rounded up to the (8, 128) tiling (DMA
    # slice sizes must be tile-aligned); the volume's pads grow to match
    sy = -(-(2 * gy + 4) // 8) * 8
    wx = -(-(w + 4) // 128) * 128
    vp = jnp.pad(vol, ((0, p), (0, sy - 2 * gy), (0, wx - w)), mode="edge")
    tp_spec = pl.BlockSpec(
        (gy, _ROWS, ax),
        lambda z, t, _ng=ng: (z * _ng + t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tp = pl.pallas_call(
        partial(_table_planes_kernel, gy=gy, ax=ax, w4=w + 4),
        grid=(az, ng),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=tp_spec,
        out_shape=jax.ShapeDtypeStruct((az * ay, _ROWS, ax), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6, sy, wx), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(vp)
    rows = pl.pallas_call(
        _table_swap_kernel,
        grid=(az, ng),
        in_specs=[tp_spec],
        out_specs=pl.BlockSpec(
            (gy, ax, _ROWS),
            lambda z, t, _ng=ng: (z * _ng + t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((az * ay, ax, _ROWS), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(tp)
    return rows.reshape(az * ay * ax, _ROWS)


# ---------------------------------------------------------------------------
# native-layout variant: geometry in, volumes out — no XLA-side transposes
# ---------------------------------------------------------------------------


def _to_c(blk, gy, ax):
    """(2, 2*gy, W) -> (8, gy, ax), leading dim (vz,vy,vx) flat.
    Mosaic has no lane-dim split/interleave, so the lane dim routes
    through the sublanes via last-two-dim transposes + sublane reshapes
    (all supported; see scratch/mosaic_probe.py)."""
    a = blk.reshape(2, gy, 2, blk.shape[-1])  # (vz, j, vy, W)
    a = a.transpose(0, 2, 1, 3)  # (vz, vy, j, W)
    a = a.transpose(0, 1, 3, 2)  # (vz, vy, W, j) — lane dim -> j
    a = a.reshape(2, 2, ax, 2, gy)  # (vz, vy, axb, vx, j)
    a = a.transpose(0, 1, 3, 2, 4)  # (vz, vy, vx, axb, j)
    a = a.transpose(0, 1, 2, 4, 3)  # (vz, vy, vx, j, axb) — lanes=axb
    return a.reshape(8, gy, ax)


def _to_native(c, gy, ax):
    """(8, gy, ax) -> (2, 2*gy, W): inverse of _to_c."""
    a = c.reshape(2, 2, 2, gy, ax)  # (vz, vy, vx, j, axb)
    a = a.transpose(0, 1, 2, 4, 3)  # (vz, vy, vx, axb, j) — lanes=j
    a = a.transpose(0, 1, 3, 2, 4)  # (vz, vy, axb, vx, j)
    a = a.reshape(2, 2, 2 * ax, gy)  # (vz, vy, W, j)
    a = a.transpose(0, 1, 3, 2)  # (vz, vy, j, W) — lanes=W
    a = a.transpose(0, 2, 1, 3)  # (vz, j, vy, W)
    return a.reshape(2, 2 * gy, 2 * ax)


def _geom_kernel(x_ref, y_ref, z_ref, az_ref, ay_ref, ax_ref,
                 op_ref, fx_ref, fy_ref, fz_ref, *, gy, ax, dhw):
    """Stage 1 of the native warp tail: shuffle the three coordinate
    volumes into the (8, gy, ax) compute form and derive the sample
    geometry (floors, window offsets, fracs, validity — the math of
    resample._supercell_geometry), storing it to compute-form HBM
    intermediates.  The offsets + validity pack into one i32
    (oz | oy<<3 | ox<<6 | valid<<9).

    WHY TWO KERNELS: values produced by the shuffle keep a Mosaic
    layout that makes every subsequent vector op ~5x slower — the
    identical extract+combine measured 33.0 ms fed from the shuffle
    directly vs 6.4 ms from ref loads, and neither a VMEM scratch
    round-trip nor layout-matching the other operands broke the
    contagion (scratch/warp_kernel_breakdown.py).  A ref STORE is
    cheap, and the second kernel's LOADS are layout-natural, so the
    ~130 MB HBM round trip (~0.4 ms) buys the fast compute."""
    d, h, w = dhw
    xc = _to_c(x_ref[...], gy, ax)
    yc = _to_c(y_ref[...], gy, ax)
    zc = _to_c(z_ref[...], gy, ax)
    # geometry — identical formulas to _supercell_geometry, so the
    # result is BITWISE the blockified path's (asserted by
    # tests/test_resample.py native-vs-blockified)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    z0 = jnp.floor(zc)
    azb = az_ref[...][None]  # (1, gy, ax) i32, broadcasts over voxels
    ayb = ay_ref[...][None]
    axb = ax_ref[...][None]
    oz = jnp.clip(z0.astype(jnp.int32) - 2 * azb, 0, _SC_L - 2)
    oy = jnp.clip(y0.astype(jnp.int32) - 2 * ayb, 0, _SC_L - 2)
    ox = jnp.clip(x0.astype(jnp.int32) - 2 * axb, 0, _SC_L - 2)
    valid = (
        (xc >= 0) & (xc <= w - 1)
        & (yc >= 0) & (yc <= h - 1)
        & (zc >= 0) & (zc <= d - 1)
    ).astype(jnp.int32)
    op_ref[...] = oz + (oy << 3) + (ox << 6) + (valid << 9)
    fx_ref[...] = xc - x0
    fy_ref[...] = yc - y0
    fz_ref[...] = zc - z0


def _combine_blk_kernel(g_ref, op_ref, fx_ref, fy_ref, fz_ref,
                        img_ref, lab_ref):
    """Stage 2: extraction + trilinear blend + majority vote in the
    DENSE (8, B) blockified form — full 128-lane vregs.  The same math
    on (8, gy, 96) compute-form shapes ran ~8x slower per op (96-lane
    padding + per-leading-index op overhead); this kernel is the
    measured-fast original blockified tail, fed from the stage-1
    intermediates instead of XLA-side blockify transposes."""
    op = op_ref[...]
    oz = op & 7
    oy = (op >> 3) & 7
    ox = (op >> 6) & 7
    valid = (op >> 9).astype(jnp.float32)
    gt = g_ref[...].T  # (216, B) in VMEM
    img, lab = _compute(
        lambda i: gt[i, :][None, :], oz, oy, ox,
        fz_ref[...], fy_ref[...], fx_ref[...], valid,
    )
    img_ref[...] = img
    lab_ref[...] = lab


def _unblockify_kernel(a_ref, b_ref, oa_ref, ob_ref, *, gy, ax):
    """Stage 3: (8, gy, ax) compute-form blocks -> native (2, 2*gy, W)
    volume blocks for both outputs.  Shuffle results flow straight into
    stores (cheap); no compute touches the shuffle-layout values."""
    oa_ref[...] = _to_native(a_ref[...], gy, ax)
    ob_ref[...] = _to_native(b_ref[...], gy, ax)


def _pick_gy(ay: int, ax: int) -> int:
    """Largest divisor of Ay keeping the per-tile row block (gy*ax, 216)
    f32 under ~2 MB, preferring >= 256 supercells per tile."""
    best = 1
    for gy in range(1, ay + 1):
        if ay % gy:
            continue
        if gy * ax * _ROWS * 4 > (2 << 20):
            break
        best = gy
    return best


def extract_combine_native(rows, xc, yc, zc, az_arr, ay_arr, ax_arr, peak):
    """Native-layout warp tail with in-kernel geometry: rows (N,216) f32
    in supercell raster order (az, ay, ax); xc/yc/zc (D,H,W) f32 warp
    coordinates; a*_arr (Az,Ay,Ax) i32 per-supercell window anchors;
    peak traced scalar.  Returns (img (D,H,W) f32 scaled by peak/65535,
    lab (D,H,W) f32) — both in the canonical row-major volume layout."""
    d, h, w = xc.shape
    az, ay, ax = d // 2, h // 2, w // 2
    gy = _pick_gy(ay, ax)
    ng = ay // gy
    grid = (az, ng)
    vol_spec = pl.BlockSpec(
        (2, 2 * gy, w), lambda z, t: (z, t, 0), memory_space=pltpu.VMEM
    )
    anc_spec = pl.BlockSpec(
        (gy, ax),
        lambda z, t, _ng=ng: (z * _ng + t, 0),
        memory_space=pltpu.VMEM,
    )
    # compute-form intermediates: (8, Az*Ay, Ax), block (8, gy, ax)
    cf_spec = pl.BlockSpec(
        (8, gy, ax),
        lambda z, t, _ng=ng: (0, z * _ng + t, 0),
        memory_space=pltpu.VMEM,
    )
    cf_i32 = jax.ShapeDtypeStruct((8, az * ay, ax), jnp.int32)
    cf_f32 = jax.ShapeDtypeStruct((8, az * ay, ax), jnp.float32)
    op, fx, fy, fz = pl.pallas_call(
        partial(_geom_kernel, gy=gy, ax=ax, dhw=(d, h, w)),
        grid=grid,
        in_specs=[vol_spec] * 3 + [anc_spec] * 3,
        out_specs=(cf_spec,) * 4,
        out_shape=(cf_i32, cf_f32, cf_f32, cf_f32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(
        xc.astype(jnp.float32), yc.astype(jnp.float32), zc.astype(jnp.float32),
        az_arr.reshape(az * ay, ax).astype(jnp.int32),
        ay_arr.reshape(az * ay, ax).astype(jnp.int32),
        ax_arr.reshape(az * ay, ax).astype(jnp.int32),
    )

    # stage 2 on the free (8, N) view, padded to the dense tile width
    n = az * ay * ax
    npad = -(-n // _B) * _B
    pad = npad - n

    def flat(a):
        a = a.reshape(8, n)
        return jnp.pad(a, ((0, 0), (0, pad))) if pad else a

    g_nm = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
    bspec = pl.BlockSpec((8, _B), lambda t: (0, t), memory_space=pltpu.VMEM)
    img8, lab8 = pl.pallas_call(
        _combine_blk_kernel,
        grid=(npad // _B,),
        in_specs=[
            pl.BlockSpec((_B, _ROWS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ] + [bspec] * 4,
        out_specs=(bspec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(g_nm, flat(op), flat(fx), flat(fy), flat(fz))

    # stage 3: compute form -> native volumes
    def cf3(a):
        return (a[:, :n] if pad else a).reshape(8, az * ay, ax)

    img, lab = pl.pallas_call(
        partial(_unblockify_kernel, gy=gy, ax=ax),
        grid=grid,
        in_specs=[cf_spec, cf_spec],
        out_specs=(vol_spec, vol_spec),
        out_shape=(
            jax.ShapeDtypeStruct((d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((d, h, w), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(cf3(img8), cf3(lab8))
    return img * (peak / 65535.0), lab
