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


def _s2_apply_prologue(slab, slot, pa_ref, pb_ref, pact, tz):
    """In-place load-affine on the s2 slab (see pallas_conv
    _apply_prologue; same zero-pad contract — callers re-zero edges)."""
    a = pa_ref[0].astype(jnp.float32)
    b = pb_ref[0].astype(jnp.float32)
    for zi in range(tz + 2):
        for zr in range(2):
            v = slab[slot, zi, zr].astype(jnp.float32) * a + b
            if pact == "relu":
                v = jnp.maximum(v, 0.0)
            elif pact == "leaky_relu":
                v = jnp.maximum(v, 0.01 * v)
            slab[slot, zi, zr] = v.astype(slab.dtype)


def _s2_fwd_kernel(
    mask_ref,
    bias_ref,
    wc_ref,
    wh_ref,
    *rest,
    tz,
    th,
    nb,
    d,
    h2,
    gy,
    n_tiles,
    pact=None,
    has_pro=False,
    want_stats=False,
):
    if has_pro:
        pa_ref, pb_ref, x5 = rest[0], rest[1], rest[2]
        rest = rest[3:]
    else:
        x5 = rest[0]
        rest = rest[1:]
    if want_stats:
        o_ref, st_ref = rest[0], rest[1]
        rest = rest[2:]
    else:
        o_ref = rest[0]
        rest = rest[1:]
    slab, oph, sems = rest

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

    if not has_pro:
        _s2_zero_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)
    _s2_issue_dmas(x5, slab, sems, slot, t, start=False, **kw)
    if has_pro:
        _s2_apply_prologue(slab, slot, pa_ref, pb_ref, pact, tz)
        _s2_zero_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)

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
    if want_stats:
        @pl.when(t == 0)
        def _():
            st_ref[:] = jnp.zeros_like(st_ref)

        st_ref[0, :] += jnp.sum(acc, axis=0)
        st_ref[1, :] += jnp.sum(acc * acc, axis=0)
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


def _make_s2_call(d, h, nb, tz, th, dtype, *, pact=None, has_pro=False,
                  want_stats=False):
    d2, h2 = d // 2, h // 2
    gz, gy = d2 // tz, h2 // th
    n_tiles = gz * gy
    kern = partial(
        _s2_fwd_kernel, tz=tz, th=th, nb=nb, d=d, h2=h2, gy=gy,
        n_tiles=n_tiles, pact=pact, has_pro=has_pro, want_stats=want_stats,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # left mask (rows,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # center mats (3,3,128,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # halo mats (3,3,128,128)
    ]
    if has_pro:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue a (1,128)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prologue b (1,128)
        ]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))  # x pair view
    o_spec = pl.BlockSpec(
        (tz, th * nb, _LANE),
        lambda t: (t // gy, t % gy, 0),
        memory_space=pltpu.VMEM,
    )
    o_shape = jax.ShapeDtypeStruct((d2, h2 * nb, _LANE), dtype)
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
            pltpu.VMEM((2, tz + 2, 2, th + 2, 2, nb, _LANE), dtype),
            pltpu.VMEM((tz, th * nb, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, tz + 2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )


def conv_s2_down(x3, w, b, dims, *, prologue=None, want_stats=False):
    """Packed stride-2 'same' conv C->2C.

    x3: (D, H*nb, 128) flat input; w: (3,3,3,Ci,2Ci); b: (2Ci,).
    Returns (D/2, (H/2)*nb, 128).  Matches torch Conv3d(ks3, stride2,
    pad1) (unet.cpp:24-101) on the packed layout.  Forward-only (the
    training path still runs the chunked XLA conv).  ``prologue``/
    ``want_stats``: deferred-norm fusion (see conv_s1_packed)."""
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
    pact = prologue[2] if prologue else None
    call = _make_s2_call(
        d, h, nb, tz, th, dtype,
        pact=pact, has_pro=prologue is not None, want_stats=want_stats,
    )
    args = [mask, bias2, wc, wh]
    if prologue is not None:
        args += [
            prologue[0].astype(jnp.float32)[None],
            prologue[1].astype(jnp.float32)[None],
        ]
    args.append(x5)
    out = call(*args)
    if want_stats:
        y, st = out
        return y, (st[0], st[1])
    return out


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


def _trans_kernel(w_ref, bias_ref, *rest, tz, th, nb, pact=None, has_pro=False):
    if has_pro:
        pa_ref, pb_ref, x_ref, o_ref = rest
    else:
        x_ref, o_ref = rest
    R = tz * th * nb
    prec = _mm_precision(x_ref.dtype)
    xv = x_ref[:].reshape(R, _LANE)
    if has_pro:
        # load-affine for a pending norm on the trans conv's input — every
        # row is valid (ks2/s2 has no padding), so no re-zeroing needed
        v = xv.astype(jnp.float32) * pa_ref[0].astype(jnp.float32) + pb_ref[
            0
        ].astype(jnp.float32)
        if pact == "relu":
            v = jnp.maximum(v, 0.0)
        elif pact == "leaky_relu":
            v = jnp.maximum(v, 0.01 * v)
        xv = v.astype(x_ref.dtype)
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


def conv_trans2x_up(x3, w, b, dims, *, prologue=None):
    """Packed ks2/stride2 transposed conv 2C->C (the decoder upsampler,
    unet.cpp:179-190).  x3: (D, H*nb, 128) with Ci=2C channels; returns
    (2D, 2H*nb, 128) with C channels.  The output array is declared in
    the (D, 2, H, 2, nb, 128) parity view — a free reshape of the
    canonical flat form — so parity writes are static and aligned.
    ``prologue``: deferred-norm load-affine (see conv_s1_packed)."""
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
    pact = prologue[2] if prologue else None
    kern = partial(
        _trans_kernel, tz=tz, th=th, nb=nb, pact=pact,
        has_pro=prologue is not None,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mats (2,2,128,128)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1,128)
    ]
    args = [w2, bias2]
    if prologue is not None:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [
            prologue[0].astype(jnp.float32)[None],
            prologue[1].astype(jnp.float32)[None],
        ]
    in_specs.append(
        pl.BlockSpec(
            (tz, th * nb, _LANE),
            lambda t, gy=gy: (t // gy, t % gy, 0),
            memory_space=pltpu.VMEM,
        )
    )
    args.append(x3)
    y = pl.pallas_call(
        kern,
        grid=(gz * gy,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tz, 2, th, 2, nb, _LANE),
            lambda t, gy=gy: (t // gy, 0, t % gy, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, 2, h, 2, nb, _LANE), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(*args)
    return y.reshape(2 * d, 2 * h * nb, _LANE)


# ---------------------------------------------------------------------------
# packed instance norm + heads (pure jnp — elementwise/reduce on the flat
# form keeps XLA in dense layouts)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def instance_norm_packed(x3, scale, bias, c: int, eps: float = 1e-5):
    """InstanceNorm3d(affine) on the packed form.

    Stats are computed as LANE-WISE sums first (the reduce keeps the full
    128-lane minor dim, so XLA stays in the dense layout; reshaping to
    (..., bx, C) first re-creates the 8x lane-padded layout this module
    exists to avoid — measured 20 ms/norm that way vs ~1 ms here), then
    the tiny (128,) vectors are folded across the bx position groups."""
    mean, inv, n = _in_packed_stats(x3, c, eps)
    return _in_apply(x3, scale, bias, mean, inv, c)


def _in_apply(x3, scale, bias, mean, inv, c):
    bx = _LANE // c
    a = jnp.tile(inv * scale.astype(jnp.float32), bx).astype(x3.dtype)
    b = jnp.tile(
        bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32), bx
    ).astype(x3.dtype)
    return x3 * a + b


def _in_packed_stats(x3, c, eps):
    """Per-channel (mean, 1/std) in ONE volume read: lane-wise sum and
    sum-of-squares from the fused kernel, folded across bx position
    groups; var = E[x^2] - mean^2 (f32 accumulation)."""
    bx = _LANE // c
    n = x3.shape[0] * x3.shape[1] * bx
    s, sq = lane_sum_sq(x3)
    mean = s.reshape(bx, c).sum(0) / n
    ex2 = sq.reshape(bx, c).sum(0) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv, n


def norm_affine_from_stats(stats, scale, bias, c: int, n_vox: int, eps=1e-5):
    """Fold a conv kernel's lane-wise (sum, sumsq) epilogue into the
    deferred instance-norm affine: returns f32 lane vectors (a, b) with
    y = a*x + b == InstanceNorm3d(affine)(x).  ``n_vox`` = D*H*W (voxels
    per channel).  The consumer kernel applies (a, b) on load (see
    conv_s1_packed prologue) — the norm itself touches no volume data."""
    s, sq = stats
    bx = _LANE // c
    mean = s.reshape(bx, c).sum(0) / n_vox
    ex2 = sq.reshape(bx, c).sum(0) / n_vox
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = jnp.tile(inv * scale.astype(jnp.float32), bx)
    b = jnp.tile(
        bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32), bx
    )
    return a, b


def _in_packed_fwd(x3, scale, bias, c, eps):
    mean, inv, n = _in_packed_stats(x3, c, eps)
    out = _in_apply(x3, scale, bias, mean, inv, c)
    # mean/inv are (C,) vectors: carrying them as residuals saves the
    # backward's two full-volume stats reads
    return out, (x3, scale, mean, inv)


def _in_packed_bwd(c, eps, res, g3):
    """Lane-wise analog of the 5D instance-norm VJP (unet3d.py):
    dx = inv*scale * (g - mean(g) - xhat * mean(g*xhat))."""
    x3, scale, mean, inv = res
    bx = _LANE // c
    n = x3.shape[0] * x3.shape[1] * bx
    mean_l = jnp.tile(mean, bx).astype(x3.dtype)
    inv_l = jnp.tile(inv, bx).astype(x3.dtype)
    xhat = (x3 - mean_l) * inv_l
    g_lane, gx_lane = norm_bwd_sums(g3, x3, jnp.tile(mean, bx), jnp.tile(inv, bx))
    g_mean = g_lane.reshape(bx, c).sum(0) / n
    gx_mean = gx_lane.reshape(bx, c).sum(0) / n
    coef = jnp.tile(inv * scale.astype(jnp.float32), bx).astype(x3.dtype)
    dx = coef * (
        g3
        - jnp.tile(g_mean, bx).astype(x3.dtype)
        - xhat * jnp.tile(gx_mean, bx).astype(x3.dtype)
    )
    dscale = (gx_mean * n).astype(jnp.float32)
    dbias = (g_mean * n).astype(jnp.float32)
    return dx, dscale, dbias


instance_norm_packed.defvjp(_in_packed_fwd, _in_packed_bwd)


def head_conv_packed_raw(x3, w, b, dims, *, prologue=None):
    """ks1 output head C->out on the packed form: one (R, 128) @
    (128, bx*out) matmul against a block-diagonal weight.  Returns the
    RAW (R, bx*out) matmul result — lanes ordered (x-position, class),
    so ``reshape(d, h, nb, bx, out)`` is a free view.  Consumers that
    can work in this layout (the evaluate graph's separable FOV
    resample) avoid the lane-padded canonical-(…,out) materialization,
    which costs ~5 ms at the flagship grid (measured).

    ``prologue``: pending norm affine+act applied inline to the matmul
    operand (XLA fuses it into the dot's producer — no extra pass)."""
    d, h, wd, ci = dims
    out = w.shape[-1]
    bx = _LANE // ci
    wd2 = w.reshape(ci, out)
    blk = jnp.zeros((_LANE, bx * out), wd2.dtype)
    for p in range(bx):
        blk = blk.at[p * ci : (p + 1) * ci, p * out : (p + 1) * out].set(wd2)
    xv = x3.reshape(-1, _LANE)
    if prologue is not None:
        pa, pb, pact = prologue
        xv = xv * pa.astype(xv.dtype) + pb.astype(xv.dtype)
        if pact == "relu":
            xv = jnp.maximum(xv, 0.0)
        elif pact == "leaky_relu":
            xv = jnp.maximum(xv, 0.01 * xv)
        elif pact is not None:
            raise ValueError(f"unsupported head prologue act {pact!r}")
    return jnp.dot(
        xv,
        blk.astype(x3.dtype),
        precision=_mm_precision(x3.dtype),
        preferred_element_type=x3.dtype,
    ) + jnp.tile(b, bx).astype(x3.dtype)


def head_conv_packed(x3, w, b, dims, *, prologue=None):
    """ks1 head as above, reshaped to canonical 5D (1, D, H, W, out)."""
    d, h, wd, ci = dims
    out = w.shape[-1]
    y = head_conv_packed_raw(x3, w, b, dims, prologue=prologue)
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


def conv_entry(x5, w, b, dims, *, want_stats=False):
    """Entry conv 1->C on a (1,D,H,W,1) input; returns the packed
    (D, H*nb, 128) C-channel output directly (no 5D intermediate).
    ``want_stats``: deferred-norm statistics (see conv_s1_packed)."""
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
    call = _make_fwd_call(d, h, nb, tz, th, dtype, want_stats=want_stats)
    out = call(masks, bias2, wc, wh, x3e)
    if want_stats:
        y, st = out
        return y, (st[0], st[1])
    return out


# ---------------------------------------------------------------------------
# trans conv VJP: dx is 4 transposed matmuls over the parity view of g
# (no halo — k2/s2 covers each parity exactly); dw/db are transpose
# matmuls accumulated over the sequential grid.
# ---------------------------------------------------------------------------


def _trans_dx_kernel(wt_ref, g6_ref, o_ref, *, tz, th, nb):
    R = tz * th * nb
    prec = _mm_precision(g6_ref.dtype)
    acc = jnp.zeros((R, _LANE), jnp.float32)
    for rz in range(2):
        for ry in range(2):
            gv = g6_ref[:, rz, :, ry, :, :].reshape(R, _LANE)
            acc = acc + jnp.dot(
                gv, wt_ref[rz, ry],
                preferred_element_type=jnp.float32, precision=prec,
            )
    o_ref[:] = acc.reshape(tz, th * nb, _LANE).astype(o_ref.dtype)


def _trans_dw_kernel(x_ref, g6_ref, dw_ref, *, tz, th, nb):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    R = tz * th * nb
    prec = _mm_precision(x_ref.dtype)
    dn = (((0,), (0,)), ((), ()))
    xv = x_ref[:].reshape(R, _LANE)
    for rz in range(2):
        for ry in range(2):
            gv = g6_ref[:, rz, :, ry, :, :].reshape(R, _LANE)
            dw_ref[rz, ry] += jax.lax.dot_general(
                xv, gv, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )


def _trans_extract_dw(dm, bxi, ci, co):
    """(2,2,128,128) packed grads -> (Ci,2,2,2,Co)."""
    dw = jnp.zeros((ci, 2, 2, 2, co), jnp.float32)
    for rz in range(2):
        for ry in range(2):
            for rx in range(2):
                acc = None
                for po in range(rx, 2 * bxi, 2):
                    pi = po // 2
                    blk = dm[rz, ry, pi * ci : (pi + 1) * ci, po * co : (po + 1) * co]
                    acc = blk if acc is None else acc + blk
                dw = dw.at[:, rz, ry, rx, :].set(acc)
    return dw


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_trans2x_p(x3, w, b, dims):
    """conv_trans2x_up with the hand-written VJP (training primitive)."""
    return conv_trans2x_up(x3, w, b, dims)


def _trans_p_fwd(x3, w, b, dims):
    return conv_trans2x_up(x3, w, b, dims), (x3, w)


def _trans_p_bwd(dims, res, g3):
    x3, w = res
    d, h, wd, ci = dims
    bxi = _LANE // ci
    nb = wd // bxi
    co = w.shape[4]
    g3 = g3.astype(x3.dtype)
    g6 = g3.reshape(d, 2, h, 2, nb, _LANE)
    tz = _pick_tile(d, 8)
    th = _pick_tile(h, 8)
    gz, gy = d // tz, h // th
    w2 = _trans_mats(w, bxi, x3.dtype)
    wt = jnp.swapaxes(w2, 2, 3)  # transposed matmuls for dx
    dx3 = pl.pallas_call(
        partial(_trans_dx_kernel, tz=tz, th=th, nb=nb),
        grid=(gz * gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tz, 2, th, 2, nb, _LANE),
                lambda t, gy=gy: (t // gy, 0, t % gy, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tz, th * nb, _LANE),
            lambda t, gy=gy: (t // gy, t % gy, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, h * nb, _LANE), x3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(wt, g6)
    dm = pl.pallas_call(
        partial(_trans_dw_kernel, tz=tz, th=th, nb=nb),
        grid=(gz * gy,),
        in_specs=[
            pl.BlockSpec(
                (tz, th * nb, _LANE),
                lambda t, gy=gy: (t // gy, t % gy, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tz, 2, th, 2, nb, _LANE),
                lambda t, gy=gy: (t // gy, 0, t % gy, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (2, 2, _LANE, _LANE), lambda t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, 2, _LANE, _LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(x3, g6)
    dw = _trans_extract_dw(dm, bxi, ci, co)
    db = jnp.sum(g3.astype(jnp.float32), axis=(0, 1))
    db = db.reshape(2 * bxi, co).sum(0)
    return dx3, dw, db


conv_trans2x_p.defvjp(_trans_p_fwd, _trans_p_bwd)


# ---------------------------------------------------------------------------
# stride-2 conv VJP
# ---------------------------------------------------------------------------


def _s2_dw_kernel(
    mask_ref, x5, g_ref, dwc_ref, dwh_ref, slab, oph, sems,
    *, tz, th, nb, d, h2, gy, n_tiles,
):
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    kw = dict(tz=tz, th=th, nb=nb, d=d, h2=h2, gy=gy)

    @pl.when(t == 0)
    def _():
        _s2_issue_dmas(x5, slab, sems, slot, t, start=True, **kw)
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)

    @pl.when(t + 1 < n_tiles)
    def _():
        _s2_issue_dmas(x5, slab, sems, nxt, t + 1, start=True, **kw)

    _s2_zero_edges(slab, slot, t, tz=tz, th=th, nb=nb, d=d, gy=gy)
    _s2_issue_dmas(x5, slab, sems, slot, t, start=False, **kw)

    R = tz * th * nb
    g = g_ref[:].reshape(R, _LANE)
    prec = _mm_precision(slab.dtype)
    dn = (((0,), (0,)), ((), ()))
    for dy in range(3):
        yo, yp = _TAP_OFF_PAR[dy]
        for dz in range(3):
            zo, zp = _TAP_OFF_PAR[dz]
            opref = slab[slot, pl.ds(zo, tz), zp, pl.ds(yo, th), yp]
            dwc_ref[dy, dz] += jax.lax.dot_general(
                opref.reshape(R, _LANE), g, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )
            _build_s2_halo(oph, slab, mask_ref, slot, zo, zp, yo, yp,
                           tz=tz, th=th, nb=nb)
            dwh_ref[dy, dz] += jax.lax.dot_general(
                oph[:].reshape(R, _LANE), g, dimension_numbers=dn,
                preferred_element_type=jnp.float32, precision=prec,
            )


def _s2_extract_dw(dwc, dwh, bxi, ci, co):
    bxo = bxi // 2
    dw = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    for dy in range(3):
        for dz in range(3):
            blk = dwc[dy, dz].reshape(bxi, ci, bxo, co)
            for dx in range(3):
                terms = [
                    blk[2 * po + dx - 1, :, po, :]
                    for po in range(bxo)
                    if 0 <= 2 * po + dx - 1 < bxi
                ]
                # terms CAN be empty: at bxi=2 (ci=64) the dx=0 tap only
                # ever crosses the block edge, so the whole contribution
                # is the halo accumulator (round-2 verdict: the empty
                # list crashed the 64->128 s2 backward)
                acc = sum(terms, jnp.zeros((ci, co), jnp.float32))
                if dx == 0:  # left halo: pi=-1 feeds po=0
                    acc = acc + dwh[dy, dz, (bxi - 1) * ci :, :co]
                dw = dw.at[dz, dy, dx].add(acc)
    return dw


def _s2_dx_mats(w: jnp.ndarray, bxi: int, dtype):
    """Per output parity (rz, ry): the valid (dz, dy) taps with their
    (z-offset, y-offset) into the half-res g slab, the center matrix
    (g-lane -> full-res-lane) and the right-halo matrix (rolled-next-row
    g contributes p=bxi-1 via po=0/dx=0)."""
    ci, co = w.shape[3], w.shape[4]
    bxo = bxi // 2
    out = {}
    for rz in range(2):
        for ry in range(2):
            taps = []
            for dz in range(3):
                if dz % 2 != (rz + 1) % 2:
                    continue
                for dy in range(3):
                    if dy % 2 != (ry + 1) % 2:
                        continue
                    m = jnp.zeros((_LANE, _LANE), w.dtype)
                    for po in range(bxo):
                        for dx in range(3):
                            p = 2 * po + dx - 1
                            if 0 <= p < bxi:
                                m = m.at[
                                    po * co : (po + 1) * co,
                                    p * ci : (p + 1) * ci,
                                ].set(w[dz, dy, dx].T)
                    mh = jnp.zeros((_LANE, _LANE), w.dtype)
                    mh = mh.at[:co, (bxi - 1) * ci :].set(w[dz, dy, 0].T)
                    zoff = 1 + (rz + 1 - dz) // 2
                    yoff = 1 + (ry + 1 - dy) // 2
                    taps.append(
                        (zoff, yoff, m.astype(dtype), mh.astype(dtype))
                    )
            out[(rz, ry)] = taps
    return out


def _s2_dx_right_mask(th2: int, nb: int, co: int, dtype):
    """Mask for the rolled(-1) g operand: kills xb==nb-1 rows, keeps the
    first Co lanes (the next block's po=0 channels)."""
    rm = (jnp.arange(th2 * nb) % nb)[:, None]
    lane = jnp.arange(_LANE)[None, :]
    return ((rm != nb - 1) & (lane < co)).astype(dtype)


def _s2_dx_kernel(
    mask_ref, mats_ref, mats_h_ref, g_hbm, o_ref, slab, oph, sems,
    *, tz2, th2, nb, d2, gy, n_tiles, tap_table,
):
    from .pallas_conv import _issue_tile_dmas, _zero_tile_edges

    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    kw = dict(tz=tz2, th=th2, nb=nb, d=d2, gy=gy)

    @pl.when(t == 0)
    def _():
        _issue_tile_dmas(g_hbm, slab, sems, slot, t, start=True, **kw)

    @pl.when(t + 1 < n_tiles)
    def _():
        _issue_tile_dmas(g_hbm, slab, sems, nxt, t + 1, start=True, **kw)

    _zero_tile_edges(slab, slot, t, tz=tz2, th=th2, nb=nb, d=d2, gy=gy)
    _issue_tile_dmas(g_hbm, slab, sems, slot, t, start=False, **kw)

    R = tz2 * th2 * nb
    rows = th2 * nb
    prec = _mm_precision(slab.dtype)
    for rz in range(2):
        for ry in range(2):
            acc = jnp.zeros((R, _LANE), jnp.float32)
            for ti, (zoff, yoff) in enumerate(tap_table[(rz, ry)]):
                base = yoff * nb
                lhs = slab[
                    slot, pl.ds(zoff, tz2), pl.ds(base, rows), :
                ].reshape(R, _LANE)
                acc = acc + jnp.dot(
                    lhs, mats_ref[rz, ry, ti],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                for zi in range(tz2):
                    win = slab[
                        slot, zoff + zi, pl.ds(base, rows), :
                    ].astype(jnp.float32)
                    oph[zi] = (
                        pltpu.roll(win, shift=rows - 1, axis=0)
                        * mask_ref[...].astype(jnp.float32)
                    ).astype(oph.dtype)
                acc = acc + jnp.dot(
                    oph[:].reshape(R, _LANE), mats_h_ref[rz, ry, ti],
                    preferred_element_type=jnp.float32, precision=prec,
                )
            o_ref[:, rz, :, ry, :, :] = acc.reshape(
                tz2, th2, nb, _LANE
            ).astype(o_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_s2_p(x3, w, b, dims):
    """conv_s2_down with the hand-written VJP (training primitive)."""
    return conv_s2_down(x3, w, b, dims)


def _s2_p_fwd(x3, w, b, dims):
    return conv_s2_down(x3, w, b, dims), (x3, w)


def _s2_p_bwd(dims, res, g3):
    x3, w = res
    d, h, wd, ci = dims
    bxi = _LANE // ci
    nb = wd // bxi
    co = w.shape[4]
    d2, h2 = d // 2, h // 2
    g3 = g3.astype(x3.dtype)
    dtype = x3.dtype

    # ---- dw/db: transpose matmuls with the fwd slab machinery
    tz = _pick_tile(d2, 8)
    th = _pick_tile(h2, 8)
    x5 = x3.reshape(d, h // 2, 2, nb, _LANE)
    mask = _s2_left_mask(th, nb, ci, dtype)
    gz, gy = d2 // tz, h2 // th
    kern = partial(
        _s2_dw_kernel, tz=tz, th=th, nb=nb, d=d, h2=h2, gy=gy,
        n_tiles=gz * gy,
    )
    dwc, dwh = pl.pallas_call(
        kern,
        grid=(gz * gy,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (tz, th * nb, _LANE),
                lambda t, gy=gy: (t // gy, t % gy, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (3, 3, _LANE, _LANE), lambda t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, _LANE, _LANE), lambda t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, 3, _LANE, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, _LANE, _LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tz + 2, 2, th + 2, 2, nb, _LANE), dtype),
            pltpu.VMEM((tz, th * nb, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, tz + 2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(mask, x5, g3)
    dw = _s2_extract_dw(dwc, dwh, bxi, ci, co)
    db = jnp.sum(g3.astype(jnp.float32), axis=(0, 1))
    db = db.reshape(bxi // 2, co).sum(0)

    # ---- dx: parity-up kernel over the half-res g
    taps = _s2_dx_mats(w, bxi, dtype)
    tap_table = {k: [(z, y) for z, y, _, _ in v] for k, v in taps.items()}
    # stack matrices: (2, 2, max_taps, 128, 128), zero-padded
    maxt = max(len(v) for v in taps.values())
    mats = jnp.zeros((2, 2, maxt, _LANE, _LANE), dtype)
    mats_h = jnp.zeros((2, 2, maxt, _LANE, _LANE), dtype)
    for (rz, ry), v in taps.items():
        for ti, (_, _, m, mh) in enumerate(v):
            mats = mats.at[rz, ry, ti].set(m)
            mats_h = mats_h.at[rz, ry, ti].set(mh)
    tz2 = _pick_tile(d2, 8)
    th2 = _pick_tile(h2, 8)
    gz2, gy2 = d2 // tz2, h2 // th2
    maskr = _s2_dx_right_mask(th2, nb, co, dtype)
    kern2 = partial(
        _s2_dx_kernel, tz2=tz2, th2=th2, nb=nb, d2=d2, gy=gy2,
        n_tiles=gz2 * gy2, tap_table=tap_table,
    )
    dx6 = pl.pallas_call(
        kern2,
        grid=(gz2 * gy2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (tz2, 2, th2, 2, nb, _LANE),
            lambda t, gy2=gy2: (t // gy2, 0, t % gy2, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d2, 2, h2, 2, nb, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tz2 + 2, (th2 + 2) * nb, _LANE), dtype),
            pltpu.VMEM((tz2, th2 * nb, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2, tz2 + 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(maskr, mats, mats_h, g3)
    dx3 = dx6.reshape(d, h * nb, _LANE)
    return dx3, dw, db


conv_s2_p.defvjp(_s2_p_fwd, _s2_p_bwd)


# ---------------------------------------------------------------------------
# entry conv VJP
# ---------------------------------------------------------------------------

from .pallas_conv import _make_dw_call


def _entry_dx_mats(w: jnp.ndarray, bx: int, dtype):
    """Transposed-conv matrices for the entry dx: input lanes are g's
    (p*C+c) packing, output lanes the 8-live entry packing.
    dx = s1 conv of g with w'[dz,dy,dx][c,0] = w[2-dz,2-dy,2-dx,0,c]."""
    co = w.shape[4]
    cm, hm = [], []
    for dy in range(3):
        cms, hms = [], []
        for dz in range(3):
            m = jnp.zeros((_LANE, _LANE), w.dtype)
            for pc in range(bx):
                for p in range(bx):
                    dxo = pc - p + 1
                    if 0 <= dxo < 3:
                        m = m.at[pc * co : (pc + 1) * co, p].set(
                            w[2 - dz, 2 - dy, 2 - dxo, 0]
                        )
            mh = jnp.zeros((_LANE, _LANE), w.dtype)
            # left-rolled operand (prev row): its LAST position pc=bx-1
            # feeds p=0 via dxo=0 -> w'[...,0] = w[2-dz,2-dy,2]
            mh = mh.at[(bx - 1) * co : bx * co, 0].set(w[2 - dz, 2 - dy, 2, 0])
            # right-rolled operand (next row): pc=0 feeds p=bx-1 via dxo=2
            mh = mh.at[:co, bx - 1].set(w[2 - dz, 2 - dy, 0, 0])
            cms.append(m)
            hms.append(mh)
        cm.append(jnp.stack(cms))
        hm.append(jnp.stack(hms))
    return jnp.stack(cm).astype(dtype), jnp.stack(hm).astype(dtype)


def _entry_dx_masks(th: int, nb: int, co: int, dtype):
    """Row masks with FULL-lane selection: the left roll keeps the last
    Co lanes (prev row's pc=bx-1 channels), the right roll the first Co."""
    rm = (jnp.arange(th * nb) % nb)[:, None]
    lane = jnp.arange(_LANE)[None, :]
    left = ((rm != 0) & (lane >= _LANE - co)).astype(dtype)
    right = ((rm != nb - 1) & (lane < co)).astype(dtype)
    return jnp.stack([left, right])


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_entry_p(x5, w, b, dims):
    """conv_entry with the hand-written VJP (training primitive)."""
    return conv_entry(x5, w, b, dims)


def _entry_p_fwd(x5, w, b, dims):
    return conv_entry(x5, w, b, dims), (x5, w)


def _entry_p_bwd(dims, res, g3):
    x5, w = res
    d, h, wd, _ = dims
    co = w.shape[4]
    bx = _LANE // co
    nb = wd // bx
    dtype = x5.dtype
    g3 = g3.astype(dtype)
    tz, th = _pick_tiles(d, h, nb, jnp.dtype(dtype).itemsize)

    # dx: packed s1-style conv of g with flipped/transposed weights; the
    # live output lanes [0:bx] are the entry-input packing
    cmats, hmats = _entry_dx_mats(w, bx, dtype)
    masks_dx = _entry_dx_masks(th, nb, co, dtype)
    call = _make_fwd_call(d, h, nb, tz, th, dtype)
    zero_bias = jnp.zeros((1, _LANE), jnp.float32)
    dx3 = call(masks_dx, zero_bias, cmats, hmats, g3)
    dx5 = dx3[:, :, :bx].reshape(1, d, h, wd, 1).astype(dtype)

    # dw/db via the generic transpose-matmul kernel on the padded input
    x3e = jnp.pad(
        x5.reshape(d, h * nb, bx), ((0, 0), (0, 0), (0, _LANE - bx))
    )
    masks = _entry_masks(th, nb, bx, dtype)
    dwc, dwh = _make_dw_call(d, h, nb, tz, th, dtype)(masks, x3e, g3)
    dw = jnp.zeros((3, 3, 3, 1, co), jnp.float32)
    for dy in range(3):
        for dz in range(3):
            blk = dwc[dy, dz].reshape(_LANE, bx, co)
            for dxo in range(3):
                terms = [
                    blk[p + dxo - 1, p, :]
                    for p in range(bx)
                    if 0 <= p + dxo - 1 < bx
                ]
                acc = sum(terms[1:], terms[0])
                if dxo == 0:
                    acc = acc + dwh[dy, dz, bx - 1, :co]
                if dxo == 2:
                    acc = acc + dwh[dy, dz, 0, (bx - 1) * co :]
                dw = dw.at[dz, dy, dxo, 0].add(acc)
    db = jnp.sum(g3.astype(jnp.float32), axis=(0, 1)).reshape(bx, co).sum(0)
    return dx5, dw, db


conv_entry_p.defvjp(_entry_p_fwd, _entry_p_bwd)


# ---------------------------------------------------------------------------
# lane reductions: XLA's reduce of a (D, rows, 128) volume to (128,) runs
# at ~130 GB/s on this backend (measured 2-2.5 ms per reduce at full
# grid); these blocked single-pass kernels run at streaming bandwidth and
# fuse the elementwise pre-ops (square, g*xhat) into the read.
# ---------------------------------------------------------------------------


def _lane_reduce_kernel(mode, n_in):
    def kern(*refs):
        o_ref = refs[n_in]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = refs[0][0].astype(jnp.float32)
        if mode == "max":
            # zero-init accumulator: callers clamp with max(..., eps) so
            # all-negative inputs behave like jnp.max for their purposes
            o_ref[0, :] = jnp.maximum(o_ref[0, :], jnp.max(x, axis=0))
        elif mode == "sum":
            o_ref[0, :] += jnp.sum(x, axis=0)
        elif mode == "sum_sq":
            # one read yields both first moments: sum and sum of squares
            # (E[x^2]-mean^2 variance; saves the separate sqdiff pass)
            o_ref[0, :] += jnp.sum(x, axis=0)
            o_ref[1, :] += jnp.sum(x * x, axis=0)
        elif mode == "sqdiff":
            m = refs[1][0].astype(jnp.float32)
            o_ref[0, :] += jnp.sum(jnp.square(x - m), axis=0)
        elif mode == "norm_bwd":
            g = x
            xx = refs[1][0].astype(jnp.float32)
            m = refs[2][0].astype(jnp.float32)
            inv = refs[3][0].astype(jnp.float32)
            o_ref[0, :] += jnp.sum(g, axis=0)
            o_ref[1, :] += jnp.sum(g * (xx - m) * inv, axis=0)

    return kern


def _lane_reduce(mode, x3, *extra_vecs_or_vols):
    """Blocked lane reduction over a (D, rows, 128) volume.

    mode 'sum' -> (8,128) with row 0 = per-lane sums; 'sqdiff' (extra:
    (1,128) mean) -> row 0 = sum((x-mean)^2); 'norm_bwd' (extra: x volume,
    (1,128) mean, (1,128) inv) -> rows 0,1 = sum(g), sum(g*xhat)."""
    d, rows, _ = x3.shape
    vols = [x3] + [v for v in extra_vecs_or_vols if v.ndim == 3]
    vecs = [v for v in extra_vecs_or_vols if v.ndim == 2]
    n_in = 1 + len(extra_vecs_or_vols)
    in_specs = [
        pl.BlockSpec((1, rows, _LANE), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in vols
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in vecs]
    args = vols + vecs
    # kernel refs arrive in in_specs order: volumes then vectors; rebuild
    # the positional convention the kernel body expects
    if mode == "norm_bwd":
        # refs: g, x, mean, inv
        pass
    return pl.pallas_call(
        _lane_reduce_kernel(mode, n_in),
        grid=(d,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, _LANE), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=_interpret(),
    )(*args)


def lane_sum(x3):
    return _lane_reduce("sum", x3)[0]


def lane_max(x3):
    """Per-lane max over a (D, rows, 128) volume — XLA's full-volume max
    reduce runs at ~130 GB/s on this backend (~2.5 ms at the flagship
    grid); this blocked kernel streams.  NOTE: zero-initialized — exact
    for inputs with a non-negative max (callers clamp with an epsilon)."""
    return _lane_reduce("max", x3)[0]


def lane_sum_sq(x3):
    """(sum, sum_sq) per lane in ONE volume read."""
    r = _lane_reduce("sum_sq", x3)
    return r[0], r[1]


def lane_sqdiff(x3, mean_lane):
    return _lane_reduce("sqdiff", x3, mean_lane[None].astype(x3.dtype))[0]


def norm_bwd_sums(g3, x3, mean_lane, inv_lane):
    r = _lane_reduce(
        "norm_bwd", g3, x3,
        mean_lane[None].astype(jnp.float32),
        inv_lane[None].astype(jnp.float32),
    )
    return r[0], r[1]
