"""Pallas TPU kernels for 3x3x3 stride-1 convolution (fwd + custom VJP).

Why this exists: XLA's TPU conv pads the channel dimension to the 128-lane
width, so a C-channel conv moves (128/C)x its real bytes through HBM —
measured 128 of the 169 ms flagship forward (ROUND1_NOTES finding 4).
These kernels keep the volume DENSE in HBM/VMEM by fusing the minor
spatial axis with channels (lanes = W*C) and mapping the conv onto the
MXU as an "x-block packed" matmul:

* The volume is viewed as flat rows of ``lane = bx*Ci`` lanes, where each
  row is one x-block of ``bx = 128/min(Ci,Co)`` positions; the matmul N
  dimension is (bx output positions) x Co = 128 or 256, so the systolic
  array runs at full column utilization even for C=16.
* Three slabs are DMA'd per tile at flat-row offsets -1/0/+1 — the DMA
  engine absorbs the x-neighbor shifts, so every in-kernel slice is
  sublane-aligned and no vector relayouts or operand materialization are
  needed for the center taps: the 9 (dz,dy) center matmuls read slab
  views directly.  Only the thin cross-block halo (6*Ci lanes per dy)
  goes through a scratch operand.
* Per-dy weights: W2c[dy] (lane, bx*Co) block-banded center matrices (one
  per dz) and W2h[dy] (6*Ci+1, bx*Co) halo matrices whose last row is the
  ones-lane trick for bias/db.
* FLOP inflation vs a dense conv is ~(bx+2)/3 (3.3x for C=16, 2x for
  C=32/64) — far cheaper than the 8x HBM inflation it replaces, and the
  op stays MXU-bound instead of HBM-bound.

The backward reuses the same machinery:
* dx = stride-1 conv of g with flip(w) transposed — the same kernel.
* dw: per tile, dW2c/dW2h += operand^T @ g_block, accumulated in fp32
  across the sequential TPU grid; db rides the halo ones-lane.
  dw[dz,dy,dx,ci,co] is then recovered by summing the (q=p+dx-1, p)
  diagonal blocks (trace-level slices).

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

# C=8 fails in Mosaic (8-wide lane pieces); C>=128 has no XLA lane-padding
# waste to begin with and its packed operand overflows VMEM — both stay on
# the XLA path.  16..64 covers every lane-padded level of the flagship.
_SUPPORTED_C = (16, 32, 64)


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    for t in range(min(target, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pick_tiles(d, h, wd, ci, co, lane, itemsize):
    """(tz, th) sized so the per-tile working set (3 slabs + halo operand +
    f32 accumulator) stays well under the VMEM budget."""
    bx = lane // ci
    nb = wd // bx
    n_out = bx * co
    tz = _pick_tile(d, 8)
    th = _pick_tile(h, 16)
    budget = 8 * 2**20
    while th > 1:
        r = tz * th * nb
        work = (
            3 * (tz + 2) * (th + 2) * nb * lane * itemsize  # 3 slabs
            + r * (6 * ci + 8) * itemsize  # halo operand
            + r * n_out * 4  # accumulator
        )
        if work <= budget:
            break
        th = _pick_tile(h, th - 1)
    return tz, th


def supported(ci: int, co: int, d: int, h: int, w: int) -> bool:
    """Shape eligibility for the packed kernels.

    Ci == Co keeps lane == N == 128: Mosaic requires 8-aligned row slices
    on multi-tile-wide (lane>128) HBM refs, which breaks the -1/+1 DMA
    shifts.  2C->C decoder convs are decomposed into two C->C convs by the
    caller (conv3d_s1_dual) instead.
    """
    if ci not in _SUPPORTED_C or co not in _SUPPORTED_C:
        return False
    if ci != co:
        return False
    bx = 128 // min(ci, co)
    if w % bx or (w * ci) % 128 or (w * co) % 128:
        return False
    if (w // bx) % 8:
        return False  # in-kernel row slices must stay sublane-aligned
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


def _build_w2_halo(w: jnp.ndarray, bx: int, bias, dtype) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (3_dy, 6*Ci+1, bx*Co) halo matrices.

    Rows (dz*2+0)*Ci..: left neighbor (contributes to p=0 via dx=0);
    rows (dz*2+1)*Ci..: right neighbor (p=bx-1 via dx=2).  The last row
    carries the bias in the dy=1 matrix only, so the ones-lane adds it
    exactly once (and yields db in the dw kernel).
    """
    ci, co = w.shape[3], w.shape[4]
    mats = []
    for dy in range(3):
        m = jnp.zeros((6 * ci + 1, bx * co), w.dtype)
        for dz in range(3):
            m = m.at[(dz * 2) * ci : (dz * 2 + 1) * ci, :co].set(w[dz, dy, 0])
            m = m.at[(dz * 2 + 1) * ci : (dz * 2 + 2) * ci, (bx - 1) * co :].set(
                w[dz, dy, 2]
            )
        if bias is not None and dy == 1:
            m = m.at[6 * ci].set(jnp.tile(bias, bx))
        mats.append(m)
    return jnp.stack(mats).astype(dtype)  # (3, 6*Ci+1, N)


# ---------------------------------------------------------------------------
# shared kernel pieces
# ---------------------------------------------------------------------------


def _mm_precision(dtype):
    # fp32 operands: force full fp32 MXU passes (Mosaic's default is bf16)
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _slab_rows(th, nb):
    """Rows per slab and the 8-multiple DMA row count (sublane-unaligned
    DMA sizes fault the TPU)."""
    needed = (th + 2) * nb
    return needed, -(-needed // 8) * 8


def _pad_fused(x, d, h, nb, lane, extra):
    """(D,H,W,Ci) -> (D+2, (H+2)*nb + 2 + extra, lane): z halo, y halo (nb
    flat rows), one extra flat row each side for the -1/+1 DMA shifts, and
    the DMA alignment tail — ONE pad, one HBM copy."""
    x3 = x.reshape(d, h * nb, lane)
    return jnp.pad(x3, ((1, 1), (nb + 1, nb + 1 + extra), (0, 0)))


def _start_slabs(x_hbm, slabs, sems, i, j, tz, th, nb):
    """Kick the three tile DMAs at flat-row offsets -1/0/+1 (x4 coords:
    the +1 pad row makes the center base j*th*nb + 1)."""
    rows_dma = slabs[0].shape[1]
    base = j * th * nb
    copies = [
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tz, tz + 2), pl.ds(base + k, rows_dma), :],
            slabs[k],
            sems.at[k],
        )
        for k in range(3)
    ]
    for cp in copies:
        cp.start()
    return copies


def _halo_operand(oph_ref, s0, s2, tz, th, nb, ci, lane):
    """Fill the thin halo operand (R, 6*Ci): per dz, the left-neighbor's
    last Ci lanes and right-neighbor's first Ci lanes, masked at x edges.
    The ones-lane at [6*Ci] is written once by the caller."""
    r = tz * th * nb
    rowmod = jax.lax.broadcasted_iota(jnp.int32, (tz, th * nb, ci), 1) % nb
    zeros = jnp.zeros((tz, th * nb, ci), s0[0].dtype)
    # dy enters via the row offset chosen by the caller's slicing
    for dz in range(3):
        left = jnp.where(rowmod == 0, zeros, s0[dz][..., lane - ci :])
        right = jnp.where(rowmod == nb - 1, zeros, s2[dz][..., :ci])
        oph_ref[:, (dz * 2) * ci : (dz * 2 + 1) * ci] = left.reshape(r, ci)
        oph_ref[:, (dz * 2 + 1) * ci : (dz * 2 + 2) * ci] = right.reshape(r, ci)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    w2c_ref,
    w2h_ref,
    x_hbm,
    o_ref,
    slab0,
    slab1,
    slab2,
    oph_ref,
    sems,
    *,
    tz,
    th,
    nb,
    ci,
    lane,
    co,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copies = _start_slabs(x_hbm, (slab0, slab1, slab2), sems, i, j, tz, th, nb)
    for cp in copies:
        cp.wait()
    bx = lane // ci
    N = bx * co
    R = tz * th * nb
    prec = _mm_precision(slab1.dtype)
    acc = jnp.zeros((R, N), jnp.float32)
    ones = jnp.ones((R, 1), slab1.dtype)
    oph_ref[:, 6 * ci : 6 * ci + 1] = ones
    for dy in range(3):
        r0 = dy * nb
        rows = pl.ds(r0, th * nb)
        # center taps: direct aligned views of the 0-shift slab
        for dz in range(3):
            lhs = slab1[dz : dz + tz, rows, :].reshape(R, lane)
            acc = acc + jnp.dot(
                lhs, w2c_ref[dy, dz], preferred_element_type=jnp.float32,
                precision=prec,
            )
        # halo taps (cross-block lanes) + bias via the ones-lane
        s0 = [slab0[dz : dz + tz, rows, :] for dz in range(3)]
        s2 = [slab2[dz : dz + tz, rows, :] for dz in range(3)]
        _halo_operand(oph_ref, s0, s2, tz, th, nb, ci, lane)
        acc = acc + jnp.dot(
            oph_ref[:], w2h_ref[dy], preferred_element_type=jnp.float32,
            precision=prec,
        )
    o_ref[:] = acc.reshape(tz, th * nb, N).astype(o_ref.dtype)


def _make_fwd_call(d, h, w, ci, co, lane, nb, tz, th, dtype):
    bx = lane // ci
    N = bx * co
    grid = (d // tz, h // th)
    kern = partial(_fwd_kernel, tz=tz, th=th, nb=nb, ci=ci, lane=lane, co=co)
    rows_dma = _slab_rows(th, nb)[1]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 center (3,3,lane,N)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 halo (3,6ci+1,N)
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tz, th * nb, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, h * nb, N), dtype),
        scratch_shapes=[
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM((tz * th * nb, 6 * ci + 1), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )


def conv3d_s1_fwd_impl(x, w, b):
    """x: (D,H,W,Ci); w: (3,3,3,Ci,Co); b: (Co,) -> (D,H,W,Co).

    Pure forward evaluation (no VJP) via the packed Pallas kernels.
    """
    d, h, wd, ci = x.shape
    co = w.shape[-1]
    bx = 128 // min(ci, co)
    lane = bx * ci
    nb = wd // bx
    dtype = x.dtype
    tz, th = _pick_tiles(d, h, wd, ci, co, lane, jnp.dtype(dtype).itemsize)
    needed, aligned = _slab_rows(th, nb)
    x3 = _pad_fused(x, d, h, nb, lane, aligned - needed)
    w2c = _build_w2_center(w, bx, dtype)
    w2h = _build_w2_halo(w, bx, b.astype(jnp.float32), dtype)
    call = _make_fwd_call(d, h, wd, ci, co, lane, nb, tz, th, dtype)
    y = call(w2c, w2h, x3)  # (d, h*nb, bx*co), row-major == (d,h,w,co)
    return y.reshape(d, h, wd, co)


# ---------------------------------------------------------------------------
# dw kernel (operand^T @ g, accumulated across the sequential grid)
# ---------------------------------------------------------------------------


def _dw_kernel(
    x_hbm,
    g_ref,
    dwc_ref,
    dwh_ref,
    slab0,
    slab1,
    slab2,
    oph_ref,
    sems,
    *,
    tz,
    th,
    nb,
    ci,
    lane,
    co,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    copies = _start_slabs(x_hbm, (slab0, slab1, slab2), sems, i, j, tz, th, nb)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    for cp in copies:
        cp.wait()
    bx = lane // ci
    N = bx * co
    R = tz * th * nb
    g = g_ref[:].reshape(R, N)
    prec = _mm_precision(slab1.dtype)
    dn = (((0,), (0,)), ((), ()))
    oph_ref[:, 6 * ci : 6 * ci + 1] = jnp.ones((R, 1), slab1.dtype)
    for dy in range(3):
        r0 = dy * nb
        rows = pl.ds(r0, th * nb)
        for dz in range(3):
            lhs = slab1[dz : dz + tz, rows, :].reshape(R, lane)
            dwc_ref[dy, dz] += jax.lax.dot_general(
                lhs, g, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )
        s0 = [slab0[dz : dz + tz, rows, :] for dz in range(3)]
        s2 = [slab2[dz : dz + tz, rows, :] for dz in range(3)]
        _halo_operand(oph_ref, s0, s2, tz, th, nb, ci, lane)
        dwh_ref[dy] += jax.lax.dot_general(
            oph_ref[:], g, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec,
        )


def _make_dw_call(d, h, w, ci, co, lane, nb, tz, th, dtype):
    bx = lane // ci
    N = bx * co
    grid = (d // tz, h // th)
    kern = partial(_dw_kernel, tz=tz, th=th, nb=nb, ci=ci, lane=lane, co=co)
    rows_dma = _slab_rows(th, nb)[1]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x (padded, fused)
            pl.BlockSpec(
                (tz, th * nb, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, 3, lane, N), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 6 * ci + 1, N), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, 3, lane, N), jnp.float32),
            jax.ShapeDtypeStruct((3, 6 * ci + 1, N), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM(((tz + 2), rows_dma, lane), dtype),
            pltpu.VMEM((tz * th * nb, 6 * ci + 1), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
    )


def _extract_dw_db(dwc, dwh, bx, ci, co):
    """Recover dw (3,3,3,Ci,Co) + db (Co,) from the packed accumulators."""
    dw = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    for dy in range(3):
        blk = dwc[dy].reshape(3, bx, ci, bx, co)  # (dz, pc, ci, p, co)
        for dx in range(3):
            terms = [
                blk[:, p + dx - 1, :, p, :]
                for p in range(bx)
                if 0 <= p + dx - 1 < bx
            ]
            acc = sum(terms[1:], terms[0])  # (3, ci, co)
            if dx == 0:  # left halo: p=0 column
                acc = acc + dwh[dy, : 6 * ci].reshape(3, 2, ci, bx, co)[:, 0, :, 0, :]
            if dx == 2:  # right halo: p=bx-1 column
                acc = acc + dwh[dy, : 6 * ci].reshape(3, 2, ci, bx, co)[
                    :, 1, :, bx - 1, :
                ]
            dw = dw.at[:, dy, dx].set(acc)
    db = sum(dwh[dy, 6 * ci].reshape(bx, co).sum(axis=0) for dy in range(3)) / 3.0
    return dw, db


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def conv3d_s1(x, w, b):
    """3^3 stride-1 'same' conv, channels-last, Pallas packed kernels."""
    return conv3d_s1_fwd_impl(x, w, b)


def _conv3d_s1_fwd(x, w, b):
    return conv3d_s1_fwd_impl(x, w, b), (x, w)


def _conv3d_s1_bwd(res, g):
    x, w = res
    d, h, wd, ci = x.shape
    co = w.shape[-1]
    g = g.astype(x.dtype)
    # dx: full conv of g with spatially flipped, (ci,co)-transposed kernel
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = conv3d_s1_fwd_impl(g, wt, jnp.zeros((ci,), jnp.float32))
    # dw/db: packed transpose matmuls accumulated over the sequential grid
    bx = 128 // min(ci, co)
    lane = bx * ci
    nb = wd // bx
    tz, th = _pick_tiles(d, h, wd, ci, co, lane, jnp.dtype(x.dtype).itemsize)
    needed, aligned = _slab_rows(th, nb)
    x3 = _pad_fused(x, d, h, nb, lane, aligned - needed)
    g3 = g.reshape(d, h * nb, bx * co)
    call = _make_dw_call(d, h, wd, ci, co, lane, nb, tz, th, x.dtype)
    dwc, dwh = call(x3, g3)
    dw, db = _extract_dw_db(dwc, dwh, bx, ci, co)
    return dx, dw, db.astype(jnp.float32)


conv3d_s1.defvjp(_conv3d_s1_fwd, _conv3d_s1_bwd)


def conv3d_s1_dual(xa, xb, w, b):
    """2C->C conv on an implicit concat([xa, xb], -1) input, decomposed as
    two C->C packed convs summed — the decoder's skip+upsample convs
    (unet.cpp:179-190) WITHOUT materializing the concat, and within the
    Ci==Co shapes Mosaic supports."""
    ca = xa.shape[-1]
    ya = conv3d_s1(xa, w[:, :, :, :ca, :], b)
    yb = conv3d_s1(xb, w[:, :, :, ca:, :], jnp.zeros_like(b))
    return ya + yb
