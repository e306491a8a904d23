"""Packed-dataflow ops: the whole C<128 half of the U-Net stays in the
dense flat form (D, H*nb, 128) — lane = (128/C x-positions) x C channels.

Why: the packed Pallas s1 conv (pallas_conv.py) beats XLA's lane-padded
conv 2-4x in isolation, but any 5D (N,D,H,W,C<128) tensor materialized
between kernels gets XLA's padded layout (8-64x expansion) and a
multi-GB conversion copy appears at each kernel boundary (measured: the
full-grid train step OOM'd at 22.5 GB from exactly these copies).  The
fix is structural: between the entry conv and the C>=128 levels nothing
is ever materialized in 5D — convs, instance norms, activations, heads,
down/upsamplers all consume and produce the flat (D, H*nb, 128) form,
whose natural TPU layout is dense.  pack()/unpack() are free reshape
views, so the only layout-conversion boundaries left are the entry conv
and the C>=128 levels (whose 128/256-minor tensors are dense anyway).

Reference semantics: torch Conv3d(ks3,stride2,pad1) downsamplers and
ConvTranspose3d(ks2,stride2) upsamplers of the flagship architecture
(unet.cpp:24-101,179-190; train.cpp:1054-1069).

Key geometry (all flagship C<128 shapes share nb = W*C/128 = 24):
* stride-2 conv C->2C: output block rows map to input PAIR-VIEW
  (D, H/2, 2, nb, 128) slices — parity indices are static, so every
  slab slice is aligned; only a LEFT x-halo exists (max input tap
  2*(bx_o-1)+1 = bx_i-1), built with the roll+mask trick of the s1
  kernel.
* trans conv 2C->C ks2/s2: NO halo at all (k2 covers each output parity
  exactly), so it is a pure auto-blocked matmul kernel; the output
  array is declared in the parity view (D, 2, H, 2, nb, 128), a free
  reshape of the canonical flat form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import (
    _LANE,
    _interpret,
    _mm_precision,
    _pick_tile,
    supported as s1_supported,
)

# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def lanes_per_block(c: int) -> int:
    return _LANE // c


def pack(x5: jnp.ndarray) -> jnp.ndarray:
    """(D,H,W,C) -> (D, H*nb, 128).  A free reshape view (row-major
    identical); C must divide 128 and W*C must be a multiple of 128."""
    d, h, w, c = x5.shape
    nb = w * c // _LANE
    return x5.reshape(d, h * nb, _LANE)


def unpack(x3: jnp.ndarray, dims) -> jnp.ndarray:
    d, h, w, c = dims
    return x3.reshape(d, h, w, c)


def s2_supported(ci: int, co: int, d: int, h: int, w: int) -> bool:
    """stride-2 conv eligibility: C -> 2C with the packed lane geometry."""
    if co != 2 * ci or ci not in (16, 32, 64):
        return False
    bxi = _LANE // ci
    if w % bxi or d % 2 or h % 2 or w % 2:
        return False
    nb = w // bxi
    return nb % 8 == 0 and d >= 4 and h >= 4


def trans_supported(ci: int, co: int, d: int, h: int, w: int) -> bool:
    """ks2/stride2 transposed conv eligibility: 2C -> C (C = co)."""
    if ci != 2 * co or co not in (16, 32, 64):
        return False
    bxi = _LANE // ci
    if w % bxi:
        return False
    nb = w // bxi
    return nb % 8 == 0


# ---------------------------------------------------------------------------
# stride-2 downsampling conv (C -> 2C), forward kernel
# ---------------------------------------------------------------------------


def _s2_center_mats(w: jnp.ndarray, bxi: int, dtype) -> jnp.ndarray:
    """(3,3,3,Ci,Co) -> (3_dy, 3_dz, 128, 128) center matrices:
    M[pi*Ci+c, po*Co+c'] = w[dz,dy,pi-2po+1,c,c'] for taps inside the
    input block."""
    ci, co = w.shape[3], w.shape[4]
    bxo = bxi // 2
    mats = []
    for dy in range(3):
        dz_mats = []
        for dz in range(3):
            m = jnp.zeros((bxi * ci, bxo * co), w.dtype)
            for po in range(bxo):
                for dx in range(3):
                    pi = 2 * po + dx - 1
                    if 0 <= pi < bxi:
                        m = m.at[
                            pi * ci : (pi + 1) * ci, po * co : (po + 1) * co
                        ].set(w[dz, dy, dx])
            dz_mats.append(m)
        mats.append(jnp.stack(dz_mats))
    return jnp.stack(mats).astype(dtype)


def _s2_halo_mats(w: jnp.ndarray, bxi: int, dtype) -> jnp.ndarray:
    """Left-halo matrices: input tap pi=-1 (the previous block's last
    position) feeds output position po=0 via dx=0.  Live lanes are the
    LAST Ci of the rolled operand."""
    ci, co = w.shape[3], w.shape[4]
    bxo = bxi // 2
    mats = []
    for dy in range(3):
        dz_mats = []
        for dz in range(3):
            m = jnp.zeros((bxi * ci, bxo * co), w.dtype)
            m = m.at[(bxi - 1) * ci :, :co].set(w[dz, dy, 0])
            dz_mats.append(m)
        mats.append(jnp.stack(dz_mats))
    return jnp.stack(mats).astype(dtype)


def _s2_left_mask(th: int, nb: int, ci: int, dtype):
    """(th*nb, 128) mask for the rolled (+1 row) left-halo operand: kills
    xb==0 rows (block at an x-line start) and all but the last Ci lanes."""
    rm = (jnp.arange(th * nb) % nb)[:, None]
    lane = jnp.arange(_LANE)[None, :]
    return ((rm != 0) & (lane >= _LANE - ci)).astype(dtype)


def _s2_issue_dmas(x5, slab, sems, slot, t, *, tz, th, nb, d, h2, gy, start):
    """Per-z-row DMAs for output tile t: input z rows
    [2*i*tz-2, 2*(i+1)*tz+2) (pair-aligned slab start), input y-line
    pairs [j*th-1, (j+1)*th+1) clamped at the volume edges."""
    i = t // gy
    j = t % gy
    for dzl in range(2 * tz + 4):
        z = 2 * (i * tz - 1) + dzl
        ok = (z >= 0) & (z < d)
        zq, zr = dzl // 2, dzl % 2

        def _copy(src_pair, dst_pair, npairs, zq=zq, zr=zr, z=z):
            cp = pltpu.make_async_copy(
                x5.at[pl.ds(z, 1), pl.ds(src_pair, npairs), :, :, :],
                slab.at[slot, pl.ds(zq, 1), zr, pl.ds(dst_pair, npairs), :, :, :],
                sems.at[slot, zq, zr],
            )
            cp.start() if start else cp.wait()

        if gy == 1:
            @pl.when(ok)
            def _():
                _copy(0, 1, th)
        else:
            @pl.when(ok & (j == 0))
            def _():
                _copy(0, 1, th + 1)

            @pl.when(ok & (j == gy - 1))
            def _():
                _copy(j * th - 1, 0, th + 1)

            @pl.when(ok & (j > 0) & (j < gy - 1))
            def _():
                _copy(j * th - 1, 0, th + 2)


def _s2_zero_edges(slab, slot, t, *, tz, th, nb, d, gy):
    i = t // gy
    j = t % gy
    for dzl in range(2 * tz + 4):
        z = 2 * (i * tz - 1) + dzl
        zq, zr = dzl // 2, dzl % 2

        @pl.when((z < 0) | (z >= d))
        def _(zq=zq, zr=zr):
            slab[slot, zq, zr] = jnp.zeros(
                (th + 2, 2, nb, _LANE), slab.dtype
            )

    @pl.when(j == 0)
    def _():
        slab[slot, :, :, 0] = jnp.zeros((tz + 2, 2, 2, nb, _LANE), slab.dtype)

    @pl.when(j == gy - 1)
    def _():
        slab[slot, :, :, th + 1] = jnp.zeros(
            (tz + 2, 2, 2, nb, _LANE), slab.dtype
        )


# (z-offset, z-parity) and (y-offset, y-parity) for each tap index:
# input coord = 2*out + tap - 1 => pair out+(tap-1+1)//2 ... derived:
_TAP_OFF_PAR = ((0, 1), (1, 0), (1, 1))


def _s2_fwd_kernel(
    mask_ref,
    bias_ref,
    wc_ref,
    wh_ref,
    x5,
    o_ref,
    slab,
    oph,
    sems,
    *,
    tz,
    th,
    nb,
    d,
    h2,
    gy,
    n_tiles,
):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    kw = dict(tz=tz, th=th, nb=nb, d=d, h2=h2, gy=gy)

    @pl.when(t == 0)
    def _():
        _s2_issue_dmas(x5, slab, sems, slot, t, start=True, **kw)

    @pl.when(t + 1 < n_tiles)
    def _():
        _s2_issue_dmas(x5, slab, sems, nxt, t + 1, start=True, **kw)

    _s2_zero_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)
    _s2_issue_dmas(x5, slab, sems, slot, t, start=False, **kw)

    R = tz * th * nb
    prec = _mm_precision(slab.dtype)
    acc = jnp.broadcast_to(bias_ref[0], (R, _LANE)).astype(jnp.float32)
    for dy in range(3):
        yo, yp = _TAP_OFF_PAR[dy]
        for dz in range(3):
            zo, zp = _TAP_OFF_PAR[dz]
            # operand (tz, th, nb, 128): all slice indices static/aligned
            opref = slab[slot, pl.ds(zo, tz), zp, pl.ds(yo, th), yp]
            lhs = opref.reshape(R, _LANE)
            acc = acc + jnp.dot(
                lhs, wc_ref[dy, dz],
                preferred_element_type=jnp.float32, precision=prec,
            )
            # left halo: +1-row roll per z-plane (wrap row lands on a
            # masked xb==0 row); rotate in f32 (Mosaic: 32-bit only)
            _build_s2_halo(oph, slab, mask_ref, slot, zo, zp, yo, yp,
                           tz=tz, th=th, nb=nb)
            acc = acc + jnp.dot(
                oph[:].reshape(R, _LANE), wh_ref[dy, dz],
                preferred_element_type=jnp.float32, precision=prec,
            )
    o_ref[:] = acc.reshape(tz, th * nb, _LANE).astype(o_ref.dtype)


def _build_s2_halo(oph_ref, slab, mask_ref, slot, zo, zp, yo, yp, *, tz, th, nb):
    rows = th * nb
    for zi in range(tz):
        win = (
            slab[slot, zo + zi, zp, pl.ds(yo, th), yp]
            .reshape(rows, _LANE)
            .astype(jnp.float32)
        )
        oph_ref[zi] = (
            pltpu.roll(win, shift=1, axis=0) * mask_ref[...].astype(jnp.float32)
        ).astype(oph_ref.dtype)


def _make_s2_call(d, h, nb, tz, th, dtype):
    d2, h2 = d // 2, h // 2
    gz, gy = d2 // tz, h2 // th
    n_tiles = gz * gy
    kern = partial(
        _s2_fwd_kernel, tz=tz, th=th, nb=nb, d=d, h2=h2, gy=gy, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # left mask (rows,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # center mats (3,3,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # halo mats (3,3,128,128)
            pl.BlockSpec(memory_space=pltpu.HBM),  # x pair view (d,h/2,2,nb,128)
        ],
        out_specs=pl.BlockSpec(
            (tz, th * nb, _LANE),
            lambda t: (t // gy, t % gy, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d2, h2 * nb, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, 2, th + 2, 2, nb, _LANE), dtype),
            pltpu.VMEM((tz, th * nb, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, tz + 2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )


def conv_s2_down(x3, w, b, dims):
    """Packed stride-2 'same' conv C->2C.

    x3: (D, H*nb, 128) flat input; w: (3,3,3,Ci,2Ci); b: (2Ci,).
    Returns (D/2, (H/2)*nb, 128).  Matches torch Conv3d(ks3, stride2,
    pad1) (unet.cpp:24-101) on the packed layout.  Forward-only (the
    training path still runs the chunked XLA conv)."""
    d, h, wd, ci = dims
    bxi = _LANE // ci
    nb = wd // bxi
    dtype = x3.dtype
    d2, h2 = d // 2, h // 2
    tz = _pick_tile(d2, 8)
    th = _pick_tile(h2, 8)
    x5 = x3.reshape(d, h // 2, 2, nb, _LANE)
    wc = _s2_center_mats(w, bxi, dtype)
    wh = _s2_halo_mats(w, bxi, dtype)
    bias2 = jnp.tile(b.astype(jnp.float32), bxi // 2)[None]
    mask = _s2_left_mask(th, nb, ci, dtype)
    call = _make_s2_call(d, h, nb, tz, th, dtype)
    return call(mask, bias2, wc, wh, x5)


# ---------------------------------------------------------------------------
# ks2/stride2 transposed conv (2C -> C): pure blocked matmul, no halo
# ---------------------------------------------------------------------------


def _trans_mats(w: jnp.ndarray, bxi: int, dtype) -> jnp.ndarray:
    """(Ci,2,2,2,Co) [the model's conv_trans layout] ->
    (2_rz, 2_ry, 128, 128): M[pi*Ci+c, po*Co+c'] = w[c,rz,ry,po%2,c']
    when pi == po//2."""
    ci, co = w.shape[0], w.shape[4]
    bxo = 2 * bxi
    mats = []
    for rz in range(2):
        ry_mats = []
        for ry in range(2):
            m = jnp.zeros((bxi * ci, bxo * co), w.dtype)
            for po in range(bxo):
                pi = po // 2
                m = m.at[pi * ci : (pi + 1) * ci, po * co : (po + 1) * co].set(
                    w[:, rz, ry, po % 2, :]
                )
            ry_mats.append(m)
        mats.append(jnp.stack(ry_mats))
    return jnp.stack(mats).astype(dtype)


def _trans_kernel(w_ref, bias_ref, x_ref, o_ref, *, tz, th, nb):
    R = tz * th * nb
    prec = _mm_precision(x_ref.dtype)
    xv = x_ref[:].reshape(R, _LANE)
    for rz in range(2):
        for ry in range(2):
            y = (
                jnp.dot(
                    xv, w_ref[rz, ry],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                + bias_ref[0]
            )
            o_ref[:, rz, :, ry, :, :] = y.reshape(tz, th, nb, _LANE).astype(
                o_ref.dtype
            )


def conv_trans2x_up(x3, w, b, dims):
    """Packed ks2/stride2 transposed conv 2C->C (the decoder upsampler,
    unet.cpp:179-190).  x3: (D, H*nb, 128) with Ci=2C channels; returns
    (2D, 2H*nb, 128) with C channels.  The output array is declared in
    the (D, 2, H, 2, nb, 128) parity view — a free reshape of the
    canonical flat form — so parity writes are static and aligned."""
    d, h, wd, ci = dims
    bxi = _LANE // ci
    nb = wd // bxi
    co = w.shape[4]
    dtype = x3.dtype
    tz = _pick_tile(d, 8)
    th = _pick_tile(h, 8)
    gz, gy = d // tz, h // th
    w2 = _trans_mats(w, bxi, dtype)
    bias2 = jnp.tile(b.astype(jnp.float32), 2 * bxi)[None]
    kern = partial(_trans_kernel, tz=tz, th=th, nb=nb)
    y = pl.pallas_call(
        kern,
        grid=(gz * gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mats (2,2,128,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,128)
            pl.BlockSpec(
                (tz, th * nb, _LANE),
                lambda t, gy=gy: (t // gy, t % gy, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tz, 2, th, 2, nb, _LANE),
            lambda t, gy=gy: (t // gy, 0, t % gy, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, 2, h, 2, nb, _LANE), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(w2, bias2, x3)
    return y.reshape(2 * d, 2 * h * nb, _LANE)


# ---------------------------------------------------------------------------
# packed instance norm + heads (pure jnp — elementwise/reduce on the flat
# form keeps XLA in dense layouts)
# ---------------------------------------------------------------------------


def instance_norm_packed(x3, scale, bias, c: int, eps: float = 1e-5):
    """InstanceNorm3d(affine) on the packed form.

    Stats are computed as LANE-WISE sums first (the reduce keeps the full
    128-lane minor dim, so XLA stays in the dense layout; reshaping to
    (..., bx, C) first re-creates the 8x lane-padded layout this module
    exists to avoid — measured 20 ms/norm that way vs ~1 ms here), then
    the tiny (128,) vectors are folded across the bx position groups."""
    bx = _LANE // c
    n = x3.shape[0] * x3.shape[1] * bx  # voxels per channel
    lane_sum = jnp.sum(x3, axis=(0, 1), dtype=jnp.float32)
    mean = lane_sum.reshape(bx, c).sum(0) / n
    mean_l = jnp.tile(mean, bx).astype(jnp.float32)
    lane_sq = jnp.sum(
        jnp.square(x3.astype(jnp.float32) - mean_l), axis=(0, 1)
    )
    var = lane_sq.reshape(bx, c).sum(0) / n
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    a = jnp.tile(inv * scale.astype(jnp.float32), bx).astype(x3.dtype)
    b = jnp.tile(
        bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32), bx
    ).astype(x3.dtype)
    return x3 * a + b


def head_conv_packed(x3, w, b, dims):
    """ks1 output head C->out on the packed form: one (R, 128) @
    (128, bx*out) matmul against a block-diagonal weight (keeps the
    full-lane layout — a (V, C) view would re-create the padded layout),
    then a free reshape to canonical 5D (1, D, H, W, out)."""
    d, h, wd, ci = dims
    out = w.shape[-1]
    bx = _LANE // ci
    wd2 = w.reshape(ci, out)
    blk = jnp.zeros((_LANE, bx * out), wd2.dtype)
    for p in range(bx):
        blk = blk.at[p * ci : (p + 1) * ci, p * out : (p + 1) * out].set(wd2)
    y = jnp.dot(
        x3.reshape(-1, _LANE),
        blk.astype(x3.dtype),
        precision=_mm_precision(x3.dtype),
        preferred_element_type=x3.dtype,
    ) + jnp.tile(b, bx).astype(x3.dtype)
    return y.reshape(1, d, h, wd, out)


# ---------------------------------------------------------------------------
# entry conv (Cin=1 -> C), ks3 stride1: the XLA conv pads the 1-channel
# input 128x (measured 55 ms + 25 ms of layout copies = half the packed
# forward).  Here the input is viewed as 8-lane rows (bx x-positions of
# one channel), lane-padded to 128 in one fused XLA pass (~0.4 ms), and
# run through the SAME fwd kernel as the s1 conv with entry-specific
# packed matrices: center rows [0:bx), halo rows 7 (left) / 0 (right).
# ---------------------------------------------------------------------------

from .pallas_conv import _make_fwd_call, _pick_tiles


def _entry_center_mats(w: jnp.ndarray, bx: int, dtype) -> jnp.ndarray:
    """(3,3,3,1,C) -> (3_dy, 3_dz, 128, 128): M[pi, po*C+c] =
    w[dz,dy,pi-po+1,0,c] for |pi-po| <= 1 (rows bx..127 are dead — the
    operand's upper lanes are the zero padding)."""
    co = w.shape[4]
    mats = []
    for dy in range(3):
        dz_mats = []
        for dz in range(3):
            m = jnp.zeros((_LANE, bx * co), w.dtype)
            for po in range(bx):
                for dx in range(3):
                    pi = po + dx - 1
                    if 0 <= pi < bx:
                        m = m.at[pi, po * co : (po + 1) * co].set(w[dz, dy, dx, 0])
            dz_mats.append(m)
        mats.append(jnp.stack(dz_mats))
    return jnp.stack(mats).astype(dtype)


def _entry_halo_mats(w: jnp.ndarray, bx: int, dtype) -> jnp.ndarray:
    """Combined halo matrices: the rolled-left operand is live in lane
    bx-1 (feeds po=0 via dx=0), rolled-right in lane 0 (po=bx-1, dx=2)."""
    co = w.shape[4]
    mats = []
    for dy in range(3):
        dz_mats = []
        for dz in range(3):
            m = jnp.zeros((_LANE, bx * co), w.dtype)
            m = m.at[bx - 1, :co].set(w[dz, dy, 0, 0])
            m = m.at[0, (bx - 1) * co :].set(w[dz, dy, 2, 0])
            dz_mats.append(m)
        mats.append(jnp.stack(dz_mats))
    return jnp.stack(mats).astype(dtype)


def _entry_masks(th: int, nb: int, bx: int, dtype):
    rm = (jnp.arange(th * nb) % nb)[:, None]
    lane = jnp.arange(_LANE)[None, :]
    left = ((rm != 0) & (lane == bx - 1)).astype(dtype)
    right = ((rm != nb - 1) & (lane == 0)).astype(dtype)
    return jnp.stack([left, right])


def entry_supported(cin: int, co: int, d: int, h: int, w: int) -> bool:
    if cin != 1 or co not in (16, 32, 64):
        return False
    bx = _LANE // co
    if w % bx:
        return False
    return (w // bx) % 8 == 0 and d >= 2 and h >= 2


def conv_entry(x5, w, b, dims):
    """Entry conv 1->C on a (1,D,H,W,1) input; returns the packed
    (D, H*nb, 128) C-channel output directly (no 5D intermediate)."""
    d, h, wd, _ = dims
    co = w.shape[4]
    bx = _LANE // co
    nb = wd // bx
    dtype = x5.dtype
    tz, th = _pick_tiles(d, h, nb, jnp.dtype(dtype).itemsize)
    x3e = jnp.pad(
        x5.reshape(d, h * nb, bx), ((0, 0), (0, 0), (0, _LANE - bx))
    )
    wc = _entry_center_mats(w, bx, dtype)
    wh = _entry_halo_mats(w, bx, dtype)
    bias2 = jnp.tile(b.astype(jnp.float32), bx)[None]
    masks = _entry_masks(th, nb, bx, dtype)
    call = _make_fwd_call(d, h, nb, tz, th, dtype)
    return call(masks, bias2, wc, wh, x3e)
