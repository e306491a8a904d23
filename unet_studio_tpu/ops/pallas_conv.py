"""Pallas TPU kernels for 3x3x3 stride-1 convolution (fwd + custom VJP).

Why this exists: XLA's TPU conv pads the channel dimension to the 128-lane
width, so a C-channel conv moves (128/C)x its real bytes through HBM —
measured 128 of the 169 ms flagship forward (ROUND1_NOTES finding 4).
These kernels keep the volume DENSE end to end by fusing the minor
spatial axis with channels (lane = bx*C = 128, bx = 128/C x-positions per
flat row) and mapping the conv onto the MXU as an "x-block packed"
matmul:

* The input is a FREE reshape view (D, H*nb, 128) of the (D,H,W,C)
  volume — no XLA-side padding or packing pass at all (v2 spent more
  time in XLA pad/halo prep than in the kernel).  All conv padding and
  edge handling happens inside the kernel: per-z-row DMAs are clamped at
  volume edges and the skipped slab rows are zero-filled.
* Per (dy,dz) tap pair the kernel runs one CENTER matmul (R,128)x
  (128,128) against a block-banded weight matrix, plus one HALO matmul
  for the cross-block x-neighbor taps: the left/right neighbor operands
  are (+-1 flat-row)-shifted slab views, masked at x-line edges, summed
  into one operand — their live lanes ([128-C:] for left, [:C] for
  right) are disjoint, so a single matrix carries both taps.
* Slabs are DOUBLE-BUFFERED across the sequential grid: tile t starts
  tile t+1's DMAs before computing, hiding the HBM loads behind the MXU.
* FLOP inflation vs a dense conv: the 9 center matmuls are the banded
  structure's floor (128/(3*C) each); the halo matmuls (2*C live lanes
  of 128) are PACKED — up to 128/(2*C) dz taps share one matmul at
  lane-rolled disjoint groups (_halo_groups), cutting halo MXU work 3x
  at C=16 / 1.5x at C=32.  Net inflation ~(9+3)/18*2*128/(3*C) = 3.6x
  for C=16, 2.2x (9+5)/18 for C=32, 1.3x for C=64 — far cheaper than
  the 8x HBM inflation it replaces; HBM traffic is ~2.4x the dense
  volume (read + small overlap + write) instead of ~9-17x.

The backward reuses the same machinery:
* dx = stride-1 conv of g with flip(w) transposed — the same kernel.
* dw: per tile, dWc[dy,dz] += slab^T @ g and dWh[dy,dz] += halo^T @ g,
  accumulated in f32 across the sequential grid; db = sum(g) on the XLA
  side.  dw[dz,dy,dx,ci,co] is recovered from the (pc, p) diagonal
  blocks at trace level.

Semantics match jax.lax.conv_general_dilated(NDHWC, DHWIO, pad=1)
exactly — i.e. the reference's torch::nn::Conv3d(ks3, stride1, pad1)
(unet.cpp:24-101); parity is asserted by tests/test_pallas_conv.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# C=8 would need bx=16 x-blocks of 8 lanes (Mosaic-hostile) and C>=128 has
# no XLA lane-padding waste to begin with — both stay on the XLA path.
# 16..64 covers every lane-padded level of the flagship.
_SUPPORTED_C = (16, 32, 64)
_LANE = 128
_MARGIN = 0  # halo shifts use pltpu.roll on aligned windows; no margin


def _interpret() -> bool:
    # off-TPU (the virtual CPU test mesh) the kernels run in Pallas
    # interpret mode: same semantics, pure-jax execution
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pick_tiles(d, h, nb, itemsize):
    """(tz, th) sized so the per-tile working set (2 double-buffered slabs
    + f32 accumulator) stays well under the VMEM budget."""
    tz = _pick_tile(d, 8)
    th = _pick_tile(h, 16)
    budget = 10 * 2**20
    while th > 1:
        r = tz * th * nb
        work = (
            2 * (tz + 2) * (th + 2) * nb * _LANE * itemsize
            + r * _LANE * 4  # accumulator
        )
        if work <= budget:
            break
        th = _pick_tile(h, th - 1)
    return tz, th


def supported(ci: int, co: int, d: int, h: int, w: int) -> bool:
    """Shape eligibility for the packed kernels.

    Ci == Co keeps lane == N == 128.  2C->C decoder convs are decomposed
    into two C->C convs by the caller (conv3d_s1_dual) instead.
    """
    if ci not in _SUPPORTED_C or co not in _SUPPORTED_C or ci != co:
        return False
    bx = _LANE // ci
    if w % bx:
        return False
    nb = w // bx
    if nb % 8:
        return False  # block-row slices/DMA offsets must be 8-aligned
    if d < 2 or h < 2:
        return False
    return True


# ---------------------------------------------------------------------------
# packed weight construction (trace-level, tiny)
# ---------------------------------------------------------------------------


def _build_w2_center(w: jnp.ndarray, bx: int, dtype) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (3_dy, 3_dz, lane, bx*Co) center matrices.

    Block (dy,dz): M[pc*Ci+ci, p*Co+co] = w[dz,dy,pc-p+1,ci,co] for
    |pc-p| <= 1 (pc = x position within the block, p = output position).
    """
    ci, co = w.shape[3], w.shape[4]
    mats = []
    for dy in range(3):
        dz_mats = []
        for dz in range(3):
            cols = []
            for p in range(bx):
                lo, hi = max(0, p - 1), min(bx - 1, p + 1)
                seg = w[dz, dy, lo - p + 1 : hi - p + 2]  # (n, ci, co)
                block = jnp.zeros((bx * ci, co), w.dtype)
                block = block.at[lo * ci : (hi + 1) * ci].set(
                    seg.reshape((hi - lo + 1) * ci, co)
                )
                cols.append(block)
            dz_mats.append(jnp.concatenate(cols, axis=1))  # (lane, bx*Co)
        mats.append(jnp.stack(dz_mats))
    return jnp.stack(mats).astype(dtype)  # (3, 3, lane, N)


def _halo_groups(ci: int) -> tuple[tuple[int, ...], ...]:
    """dz tap indices packed per halo matmul.

    A halo operand has only 2*Ci live lanes ([:Ci] right + [Ci padding..
    lane-Ci:] left), so up to 128//(2*Ci) different dz taps fit in ONE
    128-lane operand at disjoint lane groups (member k lane-rolled by
    2*Ci*k).  C=16 packs all 3 dz into one matmul, C=32 packs 2+1,
    C=64 stays 1 per matmul — cutting the halo MXU work 3x/1.5x/1x.
    UNET_TPU_NO_HALO_PACK=1 restores one-matmul-per-dz (A/B + fallback).
    """
    import os

    if os.environ.get("UNET_TPU_NO_HALO_PACK"):
        return _UNPACKED_GROUPS
    g = max(1, min(3, _LANE // (2 * ci)))
    return tuple(tuple(range(s, min(s + g, 3))) for s in range(0, 3, g))


def _halo_lane_rows(ci: int, k_idx: int) -> tuple[int, int]:
    """(left_row_start, right_row_start) for packed-group member k_idx:
    after a +2*Ci*k lane roll, right-live lanes [:Ci] land at
    [2*Ci*k : 2*Ci*k+Ci] and left-live lanes [lane-Ci:] land at
    [(2*Ci*k - Ci) % lane : ...]."""
    shift = 2 * ci * k_idx
    return (shift - ci) % _LANE, shift


def _build_w2_halo(w: jnp.ndarray, bx: int, dtype) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (3_dy, n_groups, lane, bx*Co) PACKED halo matrices.

    The halo operand keeps ORIGINAL lanes: the left-neighbor (-1 row
    shift) operand is live in lanes [lane-Ci:) and feeds output position
    p=0 via tap dx=0; the right-neighbor (+1 row) operand is live in
    lanes [:Ci) and feeds p=bx-1 via dx=2.  The two lane sets are
    disjoint for every supported C, so one matrix serves the summed
    operand; with group packing (see _halo_groups) several dz taps'
    operands additionally share one matrix at lane-rolled offsets.
    """
    ci, co = w.shape[3], w.shape[4]
    mats = []
    for dy in range(3):
        g_mats = []
        for ks in _halo_groups(ci):
            m = jnp.zeros((_LANE, bx * co), w.dtype)
            for k_idx, dz in enumerate(ks):
                lrow, rrow = _halo_lane_rows(ci, k_idx)
                m = m.at[lrow : lrow + ci, :co].set(w[dz, dy, 0])
                m = m.at[rrow : rrow + ci, (bx - 1) * co :].set(w[dz, dy, 2])
            g_mats.append(m)
        mats.append(jnp.stack(g_mats))
    return jnp.stack(mats).astype(dtype)  # (3, n_groups, lane, N)


def _edge_masks(th: int, nb: int, ci: int, dtype):
    """(2, th*nb, lane) 0/1 masks for the shifted halo operands.  Each
    selects BOTH the valid rows (mask 0 kills rowmod==0 rows whose left
    neighbor crosses an x-line edge; mask 1 kills rowmod==nb-1) AND the
    live lanes — left keeps only the last Ci lanes, right only the first
    Ci.  Lane selection is essential: the two shifted operands are summed
    into one matmul operand, and without it each would pollute the other's
    live rows of the combined halo matrix."""
    rm = (jnp.arange(th * nb) % nb)[:, None]
    lane = jnp.arange(_LANE)[None, :]
    left = ((rm != 0) & (lane >= _LANE - ci)).astype(dtype)
    right = ((rm != nb - 1) & (lane < ci)).astype(dtype)
    return jnp.stack([left, right])


# ---------------------------------------------------------------------------
# shared slab machinery (in-kernel padding + double buffering)
# ---------------------------------------------------------------------------


def _issue_tile_dmas(x_hbm, slab, sems, slot, t, *, tz, th, nb, d, gy, start):
    """Start (or wait on) the per-z-row DMAs for flat tile t into slab
    buffer ``slot``.  Row copies are clamped at the y edges (the skipped
    pad blocks are zero-filled by ``_zero_tile_edges``); z rows outside
    the volume are skipped entirely.  All row offsets are multiples of nb
    (8-aligned by ``supported``).
    """
    i = t // gy
    j = t % gy
    rows_int = (th + 2) * nb
    rows_edge = (th + 1) * nb
    for dzl in range(tz + 2):
        z = i * tz + dzl - 1
        ok = (z >= 0) & (z < d)

        def _copy(src_row, dst_row, rows, dzl=dzl, z=z):
            # all row offsets are multiples of nb (8-aligned); Mosaic's
            # divisibility prover can't see that through t % gy, so assert
            src = pl.multiple_of(src_row, nb) if not isinstance(src_row, int) else src_row
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(z, 1), pl.ds(src, rows), :],
                slab.at[slot, pl.ds(dzl, 1), pl.ds(dst_row, rows), :],
                sems.at[slot, dzl],
            )
            cp.start() if start else cp.wait()

        if gy == 1:
            @pl.when(ok)
            def _():
                _copy(0, _MARGIN + nb, th * nb)
        else:
            @pl.when(ok & (j == 0))
            def _():
                _copy(0, _MARGIN + nb, rows_edge)

            @pl.when(ok & (j == gy - 1))
            def _():
                _copy(j * th * nb - nb, _MARGIN, rows_edge)

            @pl.when(ok & (j > 0) & (j < gy - 1))
            def _():
                _copy(j * th * nb - nb, _MARGIN, rows_int)


def _zero_tile_edges(slab, slot, t, *, tz, th, nb, d, gy):
    """Zero-fill the slab regions the clamped DMAs skip: out-of-volume z
    rows and the y-pad blocks at the first/last y tile.  (The _MARGIN rows
    are junk but only ever read through the edge masks.)"""
    i = t // gy
    j = t % gy
    for dzl in range(tz + 2):
        z = i * tz + dzl - 1

        @pl.when((z < 0) | (z >= d))
        def _(dzl=dzl):
            slab[slot, dzl, _MARGIN : _MARGIN + (th + 2) * nb, :] = jnp.zeros(
                ((th + 2) * nb, _LANE), slab.dtype
            )

    @pl.when(j == 0)
    def _():
        slab[slot, :, _MARGIN : _MARGIN + nb, :] = jnp.zeros(
            (tz + 2, nb, _LANE), slab.dtype
        )

    @pl.when(j == gy - 1)
    def _():
        slab[slot, :, _MARGIN + (th + 1) * nb : _MARGIN + (th + 2) * nb, :] = (
            jnp.zeros((tz + 2, nb, _LANE), slab.dtype)
        )


def _build_halo(oph_ref, slab, mask_ref, slot, dy, *, th, nb):
    """Write the combined halo operand for this dy into scratch: the left
    (-1 row) and right (+1 row) shifted windows, masked at x-line edges
    and summed — their live lanes are disjoint.  Staged through VMEM so
    the matmuls below stream it instead of materializing a full-window
    register value."""
    base = _MARGIN + dy * nb
    rows = th * nb
    # pltpu.roll on the ALIGNED window instead of +-1-row slices: unaligned
    # bf16 (packed-sublane) slices miscompile on Mosaic (v3 debug).  The
    # single wrapped row of each roll lands on a row the edge mask kills
    # (rowmod==0 for the left/+1 roll, rowmod==nb-1 for the right/-1), so
    # the circular shift is exact here.
    for zi in range(oph_ref.shape[0]):
        # rotate in f32: Mosaic's rotate only handles 32-bit element types
        win = slab[slot, zi, pl.ds(base, rows), :].astype(jnp.float32)
        oph_ref[zi] = (
            pltpu.roll(win, shift=1, axis=0) * mask_ref[0].astype(jnp.float32)
            + pltpu.roll(win, shift=rows - 1, axis=0) * mask_ref[1].astype(jnp.float32)
        ).astype(oph_ref.dtype)


def _pack_halo_group(hp_ref, oph_ref, ks, *, tz, ci):
    """Combine the halo operands of several dz taps into ONE 128-lane
    operand: member k's 2*Ci live lanes are lane-rolled to the disjoint
    group [2*Ci*k ...] (see _halo_groups/_halo_lane_rows).  Pure VPU work
    that converts 3 halo matmuls per dy into 1 (C=16)."""
    for zi in range(tz):
        acc = oph_ref[ks[0] + zi].astype(jnp.float32)
        for k_idx in range(1, len(ks)):
            acc = acc + pltpu.roll(
                oph_ref[ks[k_idx] + zi].astype(jnp.float32),
                shift=2 * ci * k_idx,
                axis=1,
            )
        hp_ref[zi] = acc.astype(hp_ref.dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _mm_precision(dtype):
    # fp32 operands: force full fp32 MXU passes (Mosaic's default is bf16)
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _apply_prologue(slab, slot, pa_ref, pb_ref, pact, n_planes):
    """Fused load-affine: y = act(a*x + b) per lane, applied IN PLACE to
    the freshly DMA'd slab (f32 compute).  This is how a pending
    instance-norm (+ its activation) from the PREVIOUS layer costs zero
    HBM passes: the conv consumes the un-normalized tensor and applies
    the (a, b) per-channel transform on load.  Out-of-volume pad rows
    must stay ZERO afterwards (conv 'same' semantics pad with zeros of
    the post-norm signal) — callers re-run the edge zero-fill after."""
    a = pa_ref[0].astype(jnp.float32)
    b = pb_ref[0].astype(jnp.float32)
    for zi in range(n_planes):
        v = slab[slot, zi].astype(jnp.float32) * a + b
        if pact == "relu":
            v = jnp.maximum(v, 0.0)
        elif pact == "leaky_relu":
            v = jnp.maximum(v, 0.01 * v)
        slab[slot, zi] = v.astype(slab.dtype)


def _fwd_kernel(
    mask_ref,
    bias_ref,
    w2c_ref,
    w2h_ref,
    *rest,
    tz,
    th,
    nb,
    d,
    gy,
    n_tiles,
    groups,
    ci,
    pact=None,
    has_pro=False,
    want_stats=False,
):
    if has_pro:
        pa_ref, pb_ref, x_hbm = rest[0], rest[1], rest[2]
        rest = rest[3:]
    else:
        x_hbm = rest[0]
        rest = rest[1:]
    if want_stats:
        o_ref, st_ref = rest[0], rest[1]
        rest = rest[2:]
    else:
        o_ref = rest[0]
        rest = rest[1:]
    slab, oph, hp, sems = rest

    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        _issue_tile_dmas(
            x_hbm, slab, sems, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy,
            start=True,
        )

    @pl.when(t + 1 < n_tiles)
    def _():
        _issue_tile_dmas(
            x_hbm, slab, sems, nxt, t + 1, tz=tz, th=th, nb=nb, d=d, gy=gy,
            start=True,
        )

    if not has_pro:
        _zero_tile_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)
    _issue_tile_dmas(
        x_hbm, slab, sems, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy,
        start=False,
    )
    if has_pro:
        # transform the whole slab, then re-zero the pad regions (the
        # affine would otherwise turn zero pads into act(b) != 0)
        _apply_prologue(slab, slot, pa_ref, pb_ref, pact, tz + 2)
        _zero_tile_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)

    R = tz * th * nb
    rows = th * nb
    prec = _mm_precision(slab.dtype)
    acc = jnp.broadcast_to(bias_ref[0], (R, _LANE)).astype(jnp.float32)
    for dy in range(3):
        base = _MARGIN + dy * nb
        _build_halo(oph, slab, mask_ref, slot, dy, th=th, nb=nb)
        for dz in range(3):
            acc = acc + jnp.dot(
                slab[slot, dz : dz + tz, pl.ds(base, rows), :].reshape(R, _LANE),
                w2c_ref[dy, dz],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        for gi, ks in enumerate(groups):
            if len(ks) == 1:
                opnd = oph[ks[0] : ks[0] + tz].reshape(R, _LANE)
            else:
                _pack_halo_group(hp, oph, ks, tz=tz, ci=ci)
                opnd = hp[:].reshape(R, _LANE)
            acc = acc + jnp.dot(
                opnd,
                w2h_ref[dy, gi],
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    if want_stats:
        # lane-wise first moments of the conv OUTPUT (the next norm's
        # statistics) accumulated across the sequential grid — saves the
        # norm's full-volume stats read
        @pl.when(t == 0)
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        st_ref[0, :] += jnp.sum(acc, axis=0)
        st_ref[1, :] += jnp.sum(acc * acc, axis=0)
    o_ref[:] = acc.reshape(tz, rows, _LANE).astype(o_ref.dtype)


_UNPACKED_GROUPS = ((0,), (1,), (2,))


def _make_fwd_call(
    d, h, nb, tz, th, dtype, groups=_UNPACKED_GROUPS, ci=0,
    *, pact=None, has_pro=False, want_stats=False,
):
    """``groups``/``ci``: halo-packing layout (see _halo_groups); the
    default is the unpacked one-matmul-per-dz layout (used by the entry
    conv's dx whose matrices are built in that layout).  ``has_pro``:
    two extra (1,128) inputs (a, b) applied as act(a*x+b) on slab load;
    ``want_stats``: extra (8,128) f32 output with rows 0/1 = lane sums /
    sums-of-squares of the conv output."""
    gz, gy = d // tz, h // th
    n_tiles = gz * gy
    kern = partial(
        _fwd_kernel, tz=tz, th=th, nb=nb, d=d, gy=gy, n_tiles=n_tiles,
        groups=groups, ci=ci, pact=pact, has_pro=has_pro,
        want_stats=want_stats,
    )
    srows = (th + 2) * nb
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # edge masks (2,rows,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, N)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 center (3,3,128,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 halo (3,g,128,128)
    ]
    if has_pro:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue a (1,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue b (1,128)
        ]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # x flat view
    o_spec = pl.BlockSpec(
        (tz, th * nb, _LANE),
        lambda t: (t // gy, t % gy, 0),
        memory_space=pltpu.VMEM,
    )
    o_shape = jax.ShapeDtypeStruct((d, h * nb, _LANE), dtype)
    if want_stats:
        out_specs = (
            o_spec,
            pl.BlockSpec((8, _LANE), lambda t: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (o_shape, jax.ShapeDtypeStruct((8, _LANE), jnp.float32))
    else:
        out_specs, out_shape = o_spec, o_shape
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, srows, _LANE), dtype),
            pltpu.VMEM((tz + 2, th * nb, _LANE), dtype),
            pltpu.VMEM((tz, th * nb, _LANE), dtype),  # packed halo operand
            pltpu.SemaphoreType.DMA((2, tz + 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=_interpret(),
    )


def conv_s1_packed(x3, w, b, dims, *, prologue=None, want_stats=False):
    """Packed-form forward: x3 (D, H*nb, 128) -> (D, H*nb, 128).
    No VJP — the training path uses conv3d_s1 below.

    ``prologue``: optional (a_lane (128,), b_lane (128,), act) applied to
    the INPUT on slab load (the previous layer's deferred instance-norm,
    see unet3d.py _run_level_packed fusion); ``want_stats=True`` returns
    (y, (sum_lane, sumsq_lane)) for the FOLLOWING norm's statistics."""
    d, h, wd, ci = dims
    if not supported(ci, ci, d, h, wd):
        # fail at TRACE time: at C=128 (bx=1) the combined halo matrix's
        # left/right writes overlap and the kernel computes garbage — the
        # round-2 defect that silently corrupted every TPU inference.
        # Routing layers must gate on supported() and fall back to XLA.
        raise ValueError(
            f"conv_s1_packed: unsupported packed shape dims={dims} "
            f"(need C in {_SUPPORTED_C}, W%(128/C)==0, (W*C/128)%8==0)"
        )
    bx = _LANE // ci
    nb = wd // bx
    dtype = x3.dtype
    tz, th = _pick_tiles(d, h, nb, jnp.dtype(dtype).itemsize)
    w2c = _build_w2_center(w, bx, dtype)
    w2h = _build_w2_halo(w, bx, dtype)
    bias2 = jnp.tile(b.astype(jnp.float32), bx)[None]  # (1, N)
    masks = _edge_masks(th, nb, ci, dtype)
    pact = prologue[2] if prologue else None
    call = _make_fwd_call(
        d, h, nb, tz, th, dtype, _halo_groups(ci), ci,
        pact=pact, has_pro=prologue is not None, want_stats=want_stats,
    )
    args = [masks, bias2, w2c, w2h]
    if prologue is not None:
        args += [
            prologue[0].astype(jnp.float32)[None],
            prologue[1].astype(jnp.float32)[None],
        ]
    args.append(x3)
    out = call(*args)  # (d, h*nb, 128) row-major [+ (8,128) stats]
    if want_stats:
        y, st = out
        return y, (st[0], st[1])
    return out


def conv3d_s1_fwd_impl(x, w, b):
    """x: (D,H,W,C); w: (3,3,3,C,C); b: (C,) -> (D,H,W,C).

    Pure forward evaluation (no VJP) via the packed Pallas kernels.
    """
    d, h, wd, ci = x.shape
    bx = _LANE // ci
    nb = wd // bx
    x3 = x.reshape(d, h * nb, _LANE)  # free view, no copy
    y = conv_s1_packed(x3, w, b, (d, h, wd, ci))
    return y.reshape(d, h, wd, ci)


# ---------------------------------------------------------------------------
# dw kernel (operand^T @ g, accumulated across the sequential grid)
# ---------------------------------------------------------------------------


def _dw_kernel(
    mask_ref,
    x_hbm,
    g_ref,
    dwc_ref,
    dwh_ref,
    slab,
    oph,
    hp,
    sems,
    *,
    tz,
    th,
    nb,
    d,
    gy,
    n_tiles,
    groups,
    ci,
):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    @pl.when(t == 0)
    def _():
        _issue_tile_dmas(
            x_hbm, slab, sems, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy,
            start=True,
        )
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    @pl.when(t + 1 < n_tiles)
    def _():
        _issue_tile_dmas(
            x_hbm, slab, sems, nxt, t + 1, tz=tz, th=th, nb=nb, d=d, gy=gy,
            start=True,
        )

    _zero_tile_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)
    _issue_tile_dmas(
        x_hbm, slab, sems, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy,
        start=False,
    )

    R = tz * th * nb
    rows = th * nb
    g = g_ref[:].reshape(R, _LANE)
    prec = _mm_precision(slab.dtype)
    dn = (((0,), (0,)), ((), ()))
    for dy in range(3):
        base = _MARGIN + dy * nb
        _build_halo(oph, slab, mask_ref, slot, dy, th=th, nb=nb)
        for dz in range(3):
            dwc_ref[dy, dz] += jax.lax.dot_general(
                slab[slot, dz : dz + tz, pl.ds(base, rows), :].reshape(R, _LANE),
                g,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )
        for gi, ks in enumerate(groups):
            if len(ks) == 1:
                opnd = oph[ks[0] : ks[0] + tz].reshape(R, _LANE)
            else:
                _pack_halo_group(hp, oph, ks, tz=tz, ci=ci)
                opnd = hp[:].reshape(R, _LANE)
            dwh_ref[dy, gi] += jax.lax.dot_general(
                opnd, g,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )


def _make_dw_call(d, h, nb, tz, th, dtype, groups=_UNPACKED_GROUPS, ci=0):
    gz, gy = d // tz, h // th
    n_tiles = gz * gy
    ng = len(groups)
    kern = partial(
        _dw_kernel, tz=tz, th=th, nb=nb, d=d, gy=gy, n_tiles=n_tiles,
        groups=groups, ci=ci,
    )
    srows = (th + 2) * nb
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # edge masks
            pl.BlockSpec(memory_space=pltpu.HBM),  # x flat view
            pl.BlockSpec(
                (tz, th * nb, _LANE),
                lambda t: (t // gy, t % gy, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, 3, _LANE, _LANE), lambda t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, ng, _LANE, _LANE), lambda t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, 3, _LANE, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, ng, _LANE, _LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, srows, _LANE), dtype),
            pltpu.VMEM((tz + 2, th * nb, _LANE), dtype),
            pltpu.VMEM((tz, th * nb, _LANE), dtype),  # packed halo operand
            pltpu.SemaphoreType.DMA((2, tz + 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20),
        interpret=_interpret(),
    )


def _extract_dw(dwc, dwh, bx, ci):
    """Recover dw (3,3,3,Ci,Co) from the packed accumulators.  ``dwh`` is
    in the group-packed layout (3_dy, n_groups, 128, N): member k of
    group gi holds dz=groups[gi][k] at the lane-rolled row offsets of
    _halo_lane_rows."""
    co = ci
    groups = _halo_groups(ci)
    where_dz = {}
    for gi, ks in enumerate(groups):
        for k_idx, dz in enumerate(ks):
            where_dz[dz] = (gi, *_halo_lane_rows(ci, k_idx))
    dw = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    for dy in range(3):
        blk = dwc[dy].reshape(3, bx, ci, bx, co)  # (dz, pc, ci, p, co)
        for dx in range(3):
            terms = [
                blk[:, p + dx - 1, :, p, :]
                for p in range(bx)
                if 0 <= p + dx - 1 < bx
            ]
            # at bx=1 the dx=0/dx=2 taps always cross the block edge and
            # the center term list is empty — the contribution is pure halo
            acc = sum(terms, jnp.zeros((3, ci, co), jnp.float32))
            if dx == 0:  # left halo rows feed output col p=0
                acc = acc + jnp.stack(
                    [
                        dwh[dy, where_dz[dz][0], where_dz[dz][1] : where_dz[dz][1] + ci, :co]
                        for dz in range(3)
                    ]
                )
            if dx == 2:  # right halo rows feed output col p=bx-1
                acc = acc + jnp.stack(
                    [
                        dwh[dy, where_dz[dz][0], where_dz[dz][2] : where_dz[dz][2] + ci, (bx - 1) * co :]
                        for dz in range(3)
                    ]
                )
            dw = dw.at[:, dy, dx].set(acc)
    return dw


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_s1_p(x3, w, b, dims):
    """Packed-form 3^3 stride-1 conv with the hand VJP — the training
    path's primitive (dx = same kernel with flipped/transposed weights,
    dw/db = transpose-matmul kernel)."""
    return conv_s1_packed(x3, w, b, dims)


def _conv_s1_p_fwd(x3, w, b, dims):
    return conv_s1_packed(x3, w, b, dims), (x3, w)


def _conv_s1_p_bwd(dims, res, g3):
    x3, w = res
    d, h, wd, ci = dims
    g3 = g3.astype(x3.dtype)
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx3 = conv_s1_packed(g3, wt, jnp.zeros((ci,), jnp.float32), dims)
    bx = _LANE // ci
    nb = wd // bx
    tz, th = _pick_tiles(d, h, nb, jnp.dtype(x3.dtype).itemsize)
    masks = _edge_masks(th, nb, ci, x3.dtype)
    call = _make_dw_call(d, h, nb, tz, th, x3.dtype, _halo_groups(ci), ci)
    dwc, dwh = call(masks, x3, g3)
    dw = _extract_dw(dwc, dwh, bx, ci)
    db = jnp.sum(g3.astype(jnp.float32), axis=(0, 1))
    db = db.reshape(bx, ci).sum(0)
    return dx3, dw, db


conv_s1_p.defvjp(_conv_s1_p_fwd, _conv_s1_p_bwd)


@jax.custom_vjp
def conv3d_s1(x, w, b):
    """3^3 stride-1 'same' conv, channels-last, Pallas packed kernels."""
    return conv3d_s1_fwd_impl(x, w, b)


def _conv3d_s1_fwd(x, w, b):
    return conv3d_s1_fwd_impl(x, w, b), (x, w)


def _conv3d_s1_bwd(res, g):
    x, w = res
    d, h, wd, ci = x.shape
    g = g.astype(x.dtype)
    # dx: full conv of g with spatially flipped, (ci,co)-transposed kernel
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = conv3d_s1_fwd_impl(g, wt, jnp.zeros((ci,), jnp.float32))
    # dw: packed transpose matmuls accumulated over the sequential grid
    bx = _LANE // ci
    nb = wd // bx
    tz, th = _pick_tiles(d, h, nb, jnp.dtype(x.dtype).itemsize)
    x3 = x.reshape(d, h * nb, _LANE)
    g3 = g.reshape(d, h * nb, _LANE)
    masks = _edge_masks(th, nb, ci, x.dtype)
    call = _make_dw_call(d, h, nb, tz, th, x.dtype, _halo_groups(ci), ci)
    dwc, dwh = call(masks, x3, g3)
    dw = _extract_dw(dwc, dwh, bx, ci)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv3d_s1.defvjp(_conv3d_s1_fwd, _conv3d_s1_bwd)


def conv3d_s1_dual(xa, xb, w, b):
    """2C->C conv on an implicit concat([xa, xb], -1) input, decomposed as
    two C->C packed convs summed — the decoder's skip+upsample convs
    (unet.cpp:179-190) WITHOUT materializing the concat, and within the
    Ci==Co shapes the packed kernels support."""
    ca = xa.shape[-1]
    ya = conv3d_s1(xa, w[:, :, :, :ca, :], b)
    yb = conv3d_s1(xb, w[:, :, :, ca:, :], jnp.zeros_like(b))
    return ya + yb
