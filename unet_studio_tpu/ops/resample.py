"""Spatial resampling ops: trilinear and majority-vote warping, affine
transforms, scaling — jittable, channels-last, TPU-first.

These replace the TIPL device primitives the reference leans on
(``tipl::compose_mapping<linear|majority>``, ``tipl::scale``,
``tipl::resample``, visual_perception_augmentation.cu:322-523) and the
input resampling in ``read_image_and_label`` (train.cpp:13-40).

Coordinate convention: volumes are (D, H, W) = (z, y, x); coordinates are
(x, y, z) voxel positions to match the reference's math (its
transformation matrices act on (x,y,z)).  Sample positions outside the
volume produce 0 (the reference's interpolator leaves the output at its
zero initialization).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def meshgrid_xyz(shape_dhw) -> jnp.ndarray:
    """(D,H,W,3) grid of (x,y,z) voxel coordinates, float32."""
    d, h, w = shape_dhw
    z = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    y = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    x = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    return jnp.stack([x, y, z], axis=-1)


def _gather_dhw(vol: jnp.ndarray, zi, yi, xi):
    """vol: (D,H,W) or (D,H,W,C); indices same shape (clipped)."""
    d, h, w = vol.shape[:3]
    zi = jnp.clip(zi, 0, d - 1)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    flat = (zi * h + yi) * w + xi
    v = vol.reshape((d * h * w,) + vol.shape[3:])
    return v[flat]


def _corner_cells(vol: jnp.ndarray) -> jnp.ndarray:
    """(D,H,W[,C]) -> (D,H,W[,C],8): cell c = dz*4+dy*2+dx holds the
    edge-clamped shifted volume vol[z+dz, y+dy, x+dx].

    TPU gathers are transaction-bound (~12 ns per fetched row regardless
    of its width), so an 8-corner trilinear fetch done as 8 independent
    scalar gathers pays 8 transactions per output voxel.  Gathering ONE
    row of this corner-cell array instead fetches all 8 corners as 32
    contiguous bytes — measured 3.4x faster at the flagship grid (477 ->
    138 ms incl. the build) for 8x transient HBM (the reference's CUDA
    kernels sidestep this with per-thread pointer math,
    visual_perception_augmentation.cu:119-197; XLA's gather cannot).

    Edge-clamped cells reproduce the per-corner index clipping exactly
    for every in-range sample position (floor(p) >= 0 and the +1 corner
    only exceeds the edge where its weight pairs with clipping); out-of-
    range positions differ but are zero-masked by every caller.
    """
    pad3 = [(0, 0)] * (vol.ndim - 3)
    taps = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                v = vol[dz:, dy:, dx:]
                taps.append(
                    jnp.pad(v, [(0, dz), (0, dy), (0, dx)] + pad3, mode="edge")
                )
    return jnp.stack(taps, axis=-1)


def _gather_corners(vol: jnp.ndarray, z0, y0, x0):
    """All 8 trilinear corner values at integer base (z0,y0,x0), via one
    corner-cell gather.  Returns (..., [C,] 8)."""
    return _gather_dhw(_corner_cells(vol), z0, y0, x0)


def sample_linear(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling.  vol: (D,H,W[,C]); coords: (...,3) as (x,y,z).

    Out-of-range coordinates yield 0 (matching
    ``tipl::interpolator::linear::get_location`` returning false,
    visual_perception_augmentation.cpp:323-335).
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    d, h, w = vol.shape[:3]
    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1) & (z >= 0) & (z <= d - 1)
    )
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0

    # corner-cell gather (one 8-corner row fetch) unless the 8x transient
    # would be large (many-channel native-grid logits in the evaluate
    # back-warp): past ~2 GiB fall back to 8 scalar gathers
    use_cells = vol.size * 8 <= 512 * 1024 * 1024
    if use_cells:
        nbr = _gather_corners(vol, z0, y0, x0)  # (..., [C,] 8)
    out = 0.0
    c = 0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                wgt = (wz * wy * wx).astype(vol.dtype)
                if vol.ndim == 4:
                    wgt = wgt[..., None]
                val = (
                    nbr[..., c]
                    if use_cells
                    else _gather_dhw(vol, z0 + dz, y0 + dy, x0 + dx)
                )
                out = out + wgt * val
                c += 1
    mask = valid.astype(vol.dtype)
    if vol.ndim == 4:
        mask = mask[..., None]
    return out * mask


def sample_majority(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Majority-vote label sampling (TIPL ``tipl::estimate<tipl::majority>``).

    For each sample position, the 8 surrounding voxel labels vote with
    their trilinear weights; the label with the largest weight sum wins.
    Implemented class-count-free: each of the 8 corner labels is a
    candidate; its score is the summed weight of corners sharing its label
    (64 comparisons, fully vectorized on the VPU).
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    d, h, w = vol.shape[:3]
    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1) & (z >= 0) & (z <= d - 1)
    )
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0

    nbr = _gather_corners(vol, z0, y0, x0)  # (..., 8)
    labels, weights = [], []
    c = 0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                labels.append(nbr[..., c])
                weights.append((wz * wy * wx).astype(jnp.float32))
                c += 1
    # running argmax over the 8 candidates: score_c = sum_j w_j [l_j == l_c].
    # Sequential accumulation keeps peak memory at a few (...,)-sized temps
    # (a (...,8,8) vote matrix would be ~4 GB at the full model grid).
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
    return jnp.where(valid, best_label, jnp.zeros_like(best_label))


def _volume_max(vol: jnp.ndarray):
    """max(vol) via the streaming lane-max kernel where the shape and
    backend allow (XLA's volume max reduce costs ~2.5 ms at the flagship
    grid); jnp.max fallback otherwise.  Exact for the clamped use below
    (max(.., eps): the kernel's zero-init only matters for all-negative
    volumes, where both forms clamp to eps)."""
    d, h, w = vol.shape
    if (h * w) % 128 == 0 and warp_kernel_active():
        from .packed import lane_max

        return jnp.max(lane_max(vol.reshape(d, (h * w) // 128, 128)))
    return jnp.max(vol)


def _pack_image_label(image0: jnp.ndarray, label: jnp.ndarray):
    """``label*2^16 + round(image/peak*65535)`` in one f32 (exact for
    integers < 2^24).  Image is peak-scaled 16-bit quantized (relative
    error 1.5e-5); labels must be < 256."""
    peak = jnp.maximum(_volume_max(image0), 1e-12)
    img16 = jnp.round(jnp.clip(image0 / peak, 0.0, 1.0) * 65535.0)
    return jnp.round(label) * 65536.0 + img16, peak


def _combine_packed_corners(nbr, fx, fy, fz, valid, peak):
    """Shared tail of the fused image+label warp: unpack the 8 packed
    corner values (..., 8), trilinear-blend the image part and majority-
    vote the label part.  Returns (image', label') shaped like fx."""
    labels, weights, imgs = [], [], []
    c = 0
    for dz in (0, 1):
        wz = (1 - fz) if dz == 0 else fz
        for dy in (0, 1):
            wy = (1 - fy) if dy == 0 else fy
            for dx in (0, 1):
                wx = (1 - fx) if dx == 0 else fx
                v = nbr[..., c]
                lab = jnp.floor(v * (1.0 / 65536.0))
                imgs.append(v - lab * 65536.0)
                labels.append(lab)
                weights.append((wz * wy * wx).astype(jnp.float32))
                c += 1

    out_img = sum(wgt * img for wgt, img in zip(weights, imgs)) * (
        peak / 65535.0
    )
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
    vf = valid.astype(jnp.float32)
    return out_img * vf, best_label * vf


def sample_warp_image_label(
    image0: jnp.ndarray, label: jnp.ndarray, coords: jnp.ndarray
):
    """Fused warp of one image channel (trilinear) + integer label
    (majority) through the same coordinates with HALF the gather traffic.

    TPU gathers cost ~12 ns/element, so the warp is fetch-bound; packing
    image and label into one f32 (see ``_pack_image_label``) lets one
    8-corner fetch serve both samplers.  Returns (image', label').
    """
    packed, peak = _pack_image_label(image0, label)

    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    d, h, w = packed.shape
    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1) & (z >= 0) & (z <= d - 1)
    )
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0

    nbr = _gather_corners(packed, z0, y0, x0)  # (..., 8)
    return _combine_packed_corners(nbr, fx, fy, fz, valid, peak)


# ---------------------------------------------------------------------------
# supercell warp: amortize gather transactions over 2x2x2 output blocks
# ---------------------------------------------------------------------------

_SC_L = 6  # source window width per axis
_SC_S = 2  # anchor stride == output block edge


def _supercell_table(vol: jnp.ndarray):
    """(D,H,W) -> ((Az*Ay*Ax, 216) table, (Az,Ay,Ax)): row a holds the
    6x6x6 source window anchored at (2az, 2ay, 2ax), edge-clamped, minor
    order (iz, iy, ix).

    MEMORY: the table is 216/8 = 27x the volume (~890 MB f32 at the
    flagship 192x224x192 grid) — it is the dominant HBM term of the
    supercell design.  Callers must bound how many tables are live at
    once (see augment.py's one-extra-channel cap).

    BUILD: on the kernel route, two pallas_calls (pallas_warp.py
    ``build_table_kernel``) — slab DMA + transpose-route x-deinterleave
    + sublane stack, then a lane/sublane swap straight into stores; the
    XLA staged-stack fallback below stages lane-hostile minor-6 shapes
    through DUS chains + layout copies (~17 ms/item in-step at the
    flagship grid).  ``UNET_TPU_NO_TABLE_KERNEL=1`` restores the staged
    build (A/B + fallback); both are bitwise equal (tested).

    (A one-hot conv_general_dilated im2col build was tried round 5 and
    REJECTED: 12.3 vs 6.9 ms on chip, and the MXU's default-precision
    bf16 products truncate the f32 window values — not exact.)"""
    d, h, w = vol.shape
    az, ay, ax = d // 2, h // 2, w // 2
    if (
        warp_kernel_active()
        and not os.environ.get("UNET_TPU_NO_TABLE_KERNEL")
        and supercell_warp_shape_ok((d, h, w))
    ):
        from .pallas_warp import _interpret, _pick_gy, build_table_kernel

        # real-TPU DMA offsets (2*gy rows per tile) must be 8-aligned
        if _interpret() or (2 * _pick_gy(ay, ax)) % 8 == 0:
            return build_table_kernel(vol), (az, ay, ax)
    p = _SC_L - _SC_S  # window may reach index s*(A-1)+L-1 = dim+3
    vp = jnp.pad(vol, ((0, p), (0, p), (0, p)), mode="edge")
    t = jnp.stack([vp[i::2][:az] for i in range(_SC_L)], axis=-1)
    t = jnp.stack([t[:, i::2][:, :ay] for i in range(_SC_L)], axis=-1)
    t = jnp.stack([t[:, :, i::2][:, :, :ax] for i in range(_SC_L)], axis=-1)
    return t.reshape(az * ay * ax, _SC_L**3), (az, ay, ax)


def _blockify(arr: jnp.ndarray) -> jnp.ndarray:
    """(D,H,W,...) -> (D/2*H/2*W/2, 8, ...); voxel order (vz,vy,vx)."""
    d, h, w = arr.shape[:3]
    rest = arr.shape[3:]
    r = arr.reshape(d // 2, 2, h // 2, 2, w // 2, 2, *rest)
    r = r.transpose(0, 2, 4, 1, 3, 5, *range(6, 6 + len(rest)))
    return r.reshape(d // 2 * (h // 2) * (w // 2), 8, *rest)


def _unblockify(arr: jnp.ndarray, shape_dhw) -> jnp.ndarray:
    d, h, w = shape_dhw
    r = arr.reshape(d // 2, h // 2, w // 2, 2, 2, 2)
    return r.transpose(0, 3, 1, 4, 2, 5).reshape(d, h, w)


def _extract_corners(g: jnp.ndarray, oz, oy, ox):
    """Per-voxel 8-corner extraction from supercell rows WITHOUT a
    per-voxel gather (which would be transaction-bound again): staged
    one-hot contractions, each written as ONE broadcast-multiply +
    sum(axis) so XLA fuses the whole stage into a single reduce kernel.
    (Measured on chip at the flagship grid: unrolled per-tap slice-FMA
    sums materialize every partial add — 42.8 ms; an N-minor relayout
    is no better — 50.0 ms; this mul-reduce form is 28.2 ms.  A batched
    1M x (36x6)x(6x16) dot_general is still avoided: tiny-matmul MXU
    lowerings pad each operand tile to 128x128.)
    g (N,6,6,6); o* (N,8) int32 in [0,4].  Returns (N,8,8) corner
    values, minor order c = tz*4 + ty*2 + tx."""
    i6 = jnp.arange(_SC_L, dtype=jnp.int32)
    t2 = jnp.arange(2, dtype=jnp.int32)

    def onehot(o):  # (N,8,2,6): [i == o_v + tap]
        return (
            i6[None, None, None, :] == o[:, :, None, None] + t2[None, None, :, None]
        ).astype(g.dtype)

    wx, wy, wz = onehot(ox), onehot(oy), onehot(oz)
    # (N, v8, tx2, z6, y6) <- contract x
    u = (g[:, None, None, :, :, :] * wx[:, :, :, None, None, :]).sum(-1)
    # (N, v8, tx2, ty2, z6) <- contract y
    u = (u[:, :, :, None, :, :] * wy[:, :, None, :, None, :]).sum(-1)
    # (N, v8, tx2, ty2, tz2) <- contract z
    u = (u[:, :, :, :, None, :] * wz[:, :, None, None, :, :]).sum(-1)
    return u.transpose(0, 1, 4, 3, 2).reshape(g.shape[0], 8, 8)


def supercell_warp_shape_ok(shape_dhw) -> bool:
    return all(int(s) % 2 == 0 and int(s) >= _SC_L for s in shape_dhw)


class NativeGeometry(NamedTuple):
    """Anchor-only supercell geometry for the native-layout Pallas tail
    (pallas_warp.py): the per-voxel offsets/fracs/validity are computed
    IN-KERNEL from the coordinate volumes, so only the per-supercell
    anchor grids cross the boundary — no full-volume blockify transposes
    (~22 ms/item at the flagship grid) and no o/f/valid XLA passes."""

    row_idx: jnp.ndarray  # (N,) i32
    az: jnp.ndarray  # (Az, Ay, Ax) i32 window z-anchor per supercell
    ay: jnp.ndarray
    ax: jnp.ndarray


def _supercell_anchors(coords: jnp.ndarray, shape_dhw, anchors):
    """Per-supercell window anchors + raster row index.  The anchor
    choice is the largest even base <= min(floor) whose window still
    covers max(floor)+1, mid-balanced when both constraints allow
    slack, clipped into the anchor grid.

    Every elementwise op runs in full-volume (D,H,W) layout (W minor =
    full vector lanes); the per-block min/max is three staged stride-2
    pair reductions.  The blockify-first form kept minor-8 shapes
    throughout — measured 4x slower on chip (22.1 vs 5.6 ms at the
    flagship grid)."""
    az_n, ay_n, ax_n = anchors
    x0 = jnp.floor(coords[..., 0]).astype(jnp.int32)
    y0 = jnp.floor(coords[..., 1]).astype(jnp.int32)
    z0 = jnp.floor(coords[..., 2]).astype(jnp.int32)

    def block_reduce(a, op):  # (D,H,W) -> (D/2,H/2,W/2)
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
    return row_idx, az, ay, ax, (x0, y0, z0)


def _supercell_geometry(coords: jnp.ndarray, shape_dhw, anchors,
                        blockify: bool = True):
    """Shared blockified sample geometry against a supercell table.

    coords (D,H,W,3) -> (row_idx (N,), offsets (oz,oy,ox) each (N,8)
    clipped into the window, fracs (fz,fy,fx) each (N,8), valid (N,8)).
    ``blockify=False`` returns a ``NativeGeometry`` instead — anchors
    only; the native Pallas tail derives the per-voxel fields in-kernel
    (bitwise the same formulas, asserted by tests/test_resample.py)."""
    row_idx, az, ay, ax, floors = _supercell_anchors(coords, shape_dhw, anchors)
    if not blockify:
        return NativeGeometry(row_idx, az, ay, ax)
    return _blockify_geometry(NativeGeometry(row_idx, az, ay, ax),
                              coords, shape_dhw, floors)


def _geometry_is_native(geometry) -> bool:
    return isinstance(geometry, NativeGeometry)


def _blockify_geometry(geometry: "NativeGeometry", coords, shape_dhw,
                       floors=None):
    """Expand an anchor-only ``NativeGeometry`` into the blockified
    (N,8) per-voxel form the staged XLA tail / blockified kernel /
    SupercellLinearSampler consume."""
    d, h, w = shape_dhw
    x = coords[..., 0]
    y = coords[..., 1]
    z = coords[..., 2]
    if floors is None:
        floors = (
            jnp.floor(x).astype(jnp.int32),
            jnp.floor(y).astype(jnp.int32),
            jnp.floor(z).astype(jnp.int32),
        )
    x0, y0, z0 = floors
    valid = (
        (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1) & (z >= 0) & (z <= d - 1)
    )

    def up(a):  # (D/2,H/2,W/2) -> (D,H,W)
        a = jnp.repeat(a, 2, axis=0)
        a = jnp.repeat(a, 2, axis=1)
        return jnp.repeat(a, 2, axis=2)

    oz = jnp.clip(z0 - 2 * up(geometry.az), 0, _SC_L - 2)
    oy = jnp.clip(y0 - 2 * up(geometry.ay), 0, _SC_L - 2)
    ox = jnp.clip(x0 - 2 * up(geometry.ax), 0, _SC_L - 2)
    return (
        geometry.row_idx,
        (_blockify(oz), _blockify(oy), _blockify(ox)),
        (_blockify(z - z0), _blockify(y - y0), _blockify(x - x0)),
        _blockify(valid),
    )


def warp_kernel_active() -> bool:
    """Route the supercell tail through the Pallas kernel
    (ops/pallas_warp.py) only where its pallas_call can actually trace:
    on TPU, or off-TPU in interpret mode when the packed route is forced
    (UNET_TPU_FORCE_PACKED=1, the CPU-suite hook).  The plain CPU/XLA
    route keeps the staged-contraction tail below — pallas_call outputs
    carry no vma annotation, so tracing the kernel inside the training
    step's shard_map would break its check_vma=True machine check (the
    check stays ON for the pure-XLA configuration, engine/train.py).
    UNET_TPU_NO_WARP_KERNEL=1 restores the XLA tail everywhere
    (fallback + A/B control)."""
    if os.environ.get("UNET_TPU_NO_WARP_KERNEL"):
        return False
    return (
        jax.default_backend() == "tpu"
        or os.environ.get("UNET_TPU_FORCE_PACKED", "") == "1"
    )


def warp_native_active() -> bool:
    """Route the supercell tail through the NATIVE-layout kernel
    (geometry volumes in, output volumes out — no XLA-side blockify /
    unblockify transposes and no blocked-layout contagion downstream).
    UNET_TPU_NO_NATIVE_WARP=1 falls back to the blockified kernel
    (A/B + fallback); UNET_TPU_NO_WARP_KERNEL=1 still restores the
    staged XLA tail."""
    if os.environ.get("UNET_TPU_NO_NATIVE_WARP"):
        return False
    return warp_kernel_active()


def sample_warp_image_label_supercell(
    image0: jnp.ndarray, label: jnp.ndarray, coords: jnp.ndarray,
    geometry=None,
):
    """Fused image+label warp with 1/8 the gather transactions.

    TPU gathers cost ~17 ns per fetched row *regardless of row width*
    (transaction-bound), so the corner-cell warp pays 8.2M transactions at
    the flagship grid.  Adjacent output voxels sample adjacent source
    positions (the warp field is smooth), so one 6x6x6 source window
    covers all 64 corner taps of a 2x2x2 output block: fetch ONE 864-byte
    row per block (1.03M transactions) from a stride-2-anchored window
    table, then slice each voxel's 8 corners out of the row with one-hot
    contractions (arithmetic, not gathers).

    DEVIATION vs the reference sampler (documented): a block whose 8
    sample positions spread more than the 6-wide window (local warp
    Jacobian row-sum > ~2, i.e. extreme zoom/rotation/distortion draws)
    has its out-of-window taps clamped to the window edge — the sampled
    value then comes from a source voxel a step away from the true
    corner.  Callers gate on option bounds (augment._supercell_warp_ok)
    so this affects <<1% of voxels at default augmentation settings;
    exact for any transform with Jacobian row-sums <= 2.
    """
    d, h, w = label.shape
    packed, peak = _pack_image_label(image0, label)
    table, anchors = _supercell_table(packed)

    if geometry is None:
        geometry = _supercell_geometry(
            coords, (d, h, w), anchors, blockify=not warp_native_active()
        )
    if _geometry_is_native(geometry):
        if warp_native_active():
            # native-layout tail: row gather stays XLA (transaction-
            # optimal); per-voxel geometry + extraction ride per-tile
            # VMEM compute (pallas_warp._native_kernel)
            from .pallas_warp import extract_combine_native

            rows = table[geometry.row_idx]
            return extract_combine_native(
                rows,
                coords[..., 0], coords[..., 1], coords[..., 2],
                geometry.az, geometry.ay, geometry.ax, peak,
            )
        geometry = _blockify_geometry(geometry, coords, (d, h, w))
    row_idx, (oz, oy, ox), (fz, fy, fx), valid = geometry
    rows = table[row_idx]  # (N, 216)

    if warp_kernel_active():
        # Pallas tail: extraction + blend + majority per VMEM tile — no
        # HBM intermediates (the XLA stages below move ~GBs; see
        # ops/pallas_warp.py).  Exact same math.
        from .pallas_warp import extract_combine_packed

        img, lab = extract_combine_packed(
            rows, oz, oy, ox, fz, fy, fx, valid, peak
        )
    else:
        g = rows.reshape(-1, _SC_L, _SC_L, _SC_L)
        nbr = _extract_corners(g, oz, oy, ox)  # (N, 8, 8)
        img, lab = _combine_packed_corners(nbr, fx, fy, fz, valid, peak)
    return _unblockify(img, (d, h, w)), _unblockify(lab, (d, h, w))


class SupercellLinearSampler:
    """Reusable trilinear supercell sampler: build the window table ONCE
    for a (D,H,W) volume, then serve many coordinate fields at 1/8 the
    gather transactions each (one row per 2x2x2 output block).

    Unlike ``sample_warp_image_label_supercell`` the extraction here
    contracts the trilinear "hat" weights directly (no discrete corner
    unpack), so it only suits continuous volumes.  Same window-clamp
    deviation under local Jacobian row-sums > ~2 (see there).
    """

    def __init__(self, vol: jnp.ndarray):
        if not supercell_warp_shape_ok(vol.shape):
            raise ValueError(f"shape {vol.shape} not supercell-compatible")
        self.shape = vol.shape
        self.table, self.anchors = _supercell_table(vol)

    def sample(self, coords: jnp.ndarray, geometry=None) -> jnp.ndarray:
        """coords: (Do,Ho,Wo,3) (x,y,z) positions in the table volume's
        voxel space; Do/Ho/Wo even.  Returns (Do,Ho,Wo).  Pass a
        precomputed ``geometry`` (``_supercell_geometry`` of the same
        coords/shape) to amortize it across samplers of one volume
        shape — it only depends on coords and the table shape."""
        out_shape = coords.shape[:3]
        if geometry is None:
            geometry = _supercell_geometry(coords, self.shape, self.anchors)
        elif _geometry_is_native(geometry):
            geometry = _blockify_geometry(geometry, coords, self.shape)
        row_idx, (oz, oy, ox), (fz, fy, fx), valid = geometry
        g = self.table[row_idx].reshape(-1, _SC_L, _SC_L, _SC_L)

        i6 = jnp.arange(_SC_L, dtype=jnp.int32)

        def hat(o, f):
            lo = (i6[None, None, :] == o[:, :, None]).astype(jnp.float32)
            hi = (i6[None, None, :] == o[:, :, None] + 1).astype(jnp.float32)
            return lo * (1.0 - f)[..., None] + hi * f[..., None]

        hx = hat(ox, fx)
        hy = hat(oy, fy)
        hz = hat(oz, fz)
        # one mul-reduce per axis (see _extract_corners note)
        u = (g[:, None, :, :, :] * hx[:, :, None, None, :]).sum(-1)
        # (N, v8, z6, y6)
        u = (u * hy[:, :, None, :]).sum(-1)  # (N, v8, z6)
        u = (u * hz).sum(-1)  # (N, v8)
        return _unblockify(u * valid.astype(u.dtype), out_shape)


# ---------------------------------------------------------------------------
# affine transforms (reference: tipl::affine_param / transformation_matrix)
# ---------------------------------------------------------------------------


def affine_matrix(
    translation=(0.0, 0.0, 0.0),
    rotation=(0.0, 0.0, 0.0),
    scaling=(1.0, 1.0, 1.0),
    shape_dhw=(1, 1, 1),
    dtype=jnp.float32,
):
    """Build the 3x4 voxel->voxel transform TIPL builds from an
    ``affine_param`` (rotation about the volume center, then scaling, then
    translation).  Used by augmentation (visual_perception_augmentation.cpp
    :284-296) where src and dst grids are the same shape at unit spacing.

    Output maps destination (x,y,z) to source (x,y,z):
        src = R @ ((dst - center) * ? ) ...

    TIPL's convention (reg/linear): the transform computes, for a template
    (dst) coordinate p:  q = S * R * (p - c) + c + t, where c is the
    volume center, R = Rx(rx) Ry(ry) Rz(rz) rotation, S per-axis scaling
    (values > 1 shrink the rendered object = zoom out), t translation.
    """
    tx, ty, tz = translation
    rx, ry, rz = rotation
    sx, sy, sz = scaling
    cx = (shape_dhw[2] - 1) * 0.5
    cy = (shape_dhw[1] - 1) * 0.5
    cz = (shape_dhw[0] - 1) * 0.5

    def rot_x(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype)

    def rot_y(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype)

    def rot_z(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype)

    R = rot_x(jnp.asarray(rx, dtype)) @ rot_y(jnp.asarray(ry, dtype)) @ rot_z(
        jnp.asarray(rz, dtype)
    )
    S = jnp.diag(jnp.asarray([sx, sy, sz], dtype))
    A = S @ R
    center = jnp.asarray([cx, cy, cz], dtype)
    t = jnp.asarray([tx, ty, tz], dtype)
    offset = center + t - A @ center
    return jnp.concatenate([A, offset[:, None]], axis=1)  # (3, 4)


def apply_affine(coords: jnp.ndarray, mat34: jnp.ndarray) -> jnp.ndarray:
    """coords (...,3) @ 3x4 affine -> (...,3)."""
    return coords @ mat34[:, :3].T + mat34[:, 3]


def resample_affine(vol, mat34, out_shape_dhw, method="linear"):
    coords = apply_affine(meshgrid_xyz(out_shape_dhw), mat34)
    if method == "linear":
        return sample_linear(vol, coords)
    return sample_majority(vol, coords)


def scale_to_shape(vol: jnp.ndarray, out_shape_dhw, method="linear"):
    """TIPL ``tipl::scale``: stretch the whole FOV to a new grid
    (corner-anchored: dst index i maps to src i * (in-1)/(out-1))."""
    d, h, w = vol.shape[:3]
    od, oh, ow = out_shape_dhw
    sx = (w - 1) / max(ow - 1, 1)
    sy = (h - 1) / max(oh - 1, 1)
    sz = (d - 1) / max(od - 1, 1)
    grid = meshgrid_xyz(out_shape_dhw) * jnp.asarray([sx, sy, sz], jnp.float32)
    if method == "linear":
        return sample_linear(vol, grid)
    return sample_majority(vol, grid)


def axis_interp_matrix(n_in: int, n_out: int, scale: float, offset: float) -> np.ndarray:
    """(n_out, n_in) one-axis linear-interpolation matrix for the sample
    positions ``p_i = i*scale + offset`` with ``sample_linear``'s exact
    semantics: corner indices edge-clamped, out-of-range positions
    (p < 0 or p > n_in-1) produce 0 (all-zero row).

    An axis-aligned (diagonal) affine resample factorizes into one such
    matrix per axis; applying them as three matmuls replaces the
    transaction-bound 8-corner gather with MXU contractions — the whole
    point on TPU, where gathers cost ~17 ns per fetched row (the
    evaluate engine's two full-grid FOV resamples were gather-bound)."""
    p = np.arange(n_out, dtype=np.float64) * float(scale) + float(offset)
    valid = (p >= 0.0) & (p <= n_in - 1)
    i0 = np.floor(p).astype(np.int64)
    f = (p - i0).astype(np.float32)
    j0 = np.clip(i0, 0, n_in - 1)
    j1 = np.clip(i0 + 1, 0, n_in - 1)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, j0), (1.0 - f) * valid)
    np.add.at(m, (rows, j1), f * valid)
    return m


def separable_resample(vol: jnp.ndarray, mz: np.ndarray, my: np.ndarray, mx: np.ndarray):
    """Resample (D,H,W[,C]) through per-axis interpolation matrices
    (see ``axis_interp_matrix``).  Exactly equals ``sample_linear`` at the
    corresponding diagonal-affine coordinates (parity-tested)."""

    def contract(m, v, axis):
        return jnp.moveaxis(
            jnp.tensordot(
                jnp.asarray(m),
                jnp.moveaxis(v, axis, 0),
                axes=([1], [0]),
                precision=jax.lax.Precision.HIGHEST,
            ),
            0,
            axis,
        )

    # contract the axis that SHRINKS most first (cheapest intermediate)
    mats = [(0, mz), (1, my), (2, mx)]
    mats.sort(key=lambda am: am[1].shape[0] / am[1].shape[1])
    out = vol
    for axis, m in mats:
        out = contract(m, out, axis)
    return out


def diag_affine_matrices(mat34: np.ndarray, in_dhw, out_dhw):
    """Per-axis interpolation matrices for a DIAGONAL 3x4 voxel transform
    (out voxel -> in voxel, (x,y,z) convention).  Raises if off-diagonal
    terms are present."""
    m = np.asarray(mat34, np.float64)
    off = m[:, :3] - np.diag(np.diag(m[:, :3]))
    if np.abs(off).max() > 1e-9:
        raise ValueError("transform is not axis-aligned")
    # (x,y,z) rows of the matrix map to (W,H,D) axes
    mx = axis_interp_matrix(in_dhw[2], out_dhw[2], m[0, 0], m[0, 3])
    my = axis_interp_matrix(in_dhw[1], out_dhw[1], m[1, 1], m[1, 3])
    mz = axis_interp_matrix(in_dhw[0], out_dhw[0], m[2, 2], m[2, 3])
    return mz, my, mx


def model_grid_transform(
    image_shape_xyz,
    image_vs,
    model_shape_xyz,
    model_vs,
    fov_strategy: str = "align_top",
) -> np.ndarray:
    """Voxel transform from model grid to image grid (host-side, numpy).

    Reproduces read_image_and_label (train.cpp:26-29): scaling by voxel
    size ratio about the FOV, plus the "align_top" z translation
    ``0.5*((Di-1)*vi - (Dm-1)*vm)`` that aligns the top of the head.

    TIPL ``transformation_matrix(arg, model_dim, model_vs, image_dim,
    image_vs)`` maps model voxel p_m -> image voxel p_i:
        p_i = (p_m * vs_m + shift + t) / vs_i
    where shift centers the two FOVs in x/y and t is the affine_param
    translation (only t_z used, computed in mm).
    """
    if fov_strategy not in ("", "align_top"):
        # the align_top math below is the only strategy the reference's
        # own training reader implements (train.cpp:26-29); other values
        # live inside the external TIPL library whose behavior this
        # snapshot does not define — warn rather than silently misalign
        import warnings

        warnings.warn(
            f"fov_strategy {fov_strategy!r} is not implemented; "
            "using align_top",
            stacklevel=2,
        )
    image_vs = np.asarray(image_vs, np.float64)
    model_vs = np.asarray(model_vs, np.float64)
    img = np.asarray(image_shape_xyz, np.float64)
    mdl = np.asarray(model_shape_xyz, np.float64)

    # center-align x/y, top-align z, all in mm
    t = 0.5 * ((img - 1.0) * image_vs - (mdl - 1.0) * model_vs)
    scale = model_vs / image_vs
    mat = np.zeros((3, 4), np.float32)
    mat[0, 0], mat[1, 1], mat[2, 2] = scale
    mat[:, 3] = t / image_vs
    return mat


def resample_to_model_grid(
    vol: jnp.ndarray,
    image_vs,
    model_shape_xyz,
    model_vs,
    method="linear",
):
    """Resample a (D,H,W) image volume onto the model grid (train.cpp:26-29)."""
    img_xyz = (vol.shape[2], vol.shape[1], vol.shape[0])
    mat = model_grid_transform(img_xyz, image_vs, model_shape_xyz, model_vs)
    out_dhw = (model_shape_xyz[2], model_shape_xyz[1], model_shape_xyz[0])
    return resample_affine(vol, jnp.asarray(mat), out_dhw, method=method)


def normalize01(vol: jnp.ndarray) -> jnp.ndarray:
    """tipl::normalize: scale max to 1 (max <= 0 leaves zeros)."""
    mx = jnp.max(vol)
    return jnp.where(mx > 0, vol / mx, vol)
