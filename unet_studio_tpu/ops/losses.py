"""Segmentation losses (reference: calc_losses, train.cpp:501-552).

Given logits (N, D, H, W, C) and integer targets (N, D, H, W):

* optional class collapse: the first ``collapse_before`` channels are
  merged via logsumexp into one foreground class (used when subject
  labels were shifted past the template classes, train.cpp:673-674)
* validity mask: voxels with target >= C are ignored
* masked cross-entropy
* "MSE": sum_c p_c^2 - 2 p_target + 1 per voxel, masked mean
* soft Dice over classes 1..C-1 (eps 1e-5), reported as 1 - mean dice

All three are returned; the training loss sums whichever of ce/dice/mse
are enabled, weighted per deep-supervision level by (1/2^k)/sum
(train.cpp:637-700).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ChannelLeading(NamedTuple):
    """Level-0 logits already in channel-leading planes (C, N, D, H, W).

    Produced straight from the packed head output (models/unet3d.py
    ``packed_head_planes``): the (R, bx*C) -> (C, N, D, H, W) transpose
    never materializes a C-minor (..., 4) tensor — on TPU that layout is
    lane-padded 4->128 and the round trip through it cost ~20 ms/item
    fwd+bwd at the flagship grid (round-5 step trace)."""

    planes: jnp.ndarray  # (C, N, D, H, W) float32


def calc_losses(
    logits,
    target: jnp.ndarray,
    n_classes: int,
    collapse_before: int = 0,
):
    """Returns (ce, dice, mse) scalars, float32.

    logits: (N, D, H, W, C) float — or a ``ChannelLeading`` of planes
    (C, N, D, H, W); target: (N, D, H, W) int.
    """
    if collapse_before < 0 or collapse_before >= n_classes:
        raise ValueError("invalid collapse_before")

    target = target.astype(jnp.int32)
    raw_target = target

    # CHANNEL-LEADING layout: one transpose up front, then every per-class
    # term is elementwise over dense (N,D,H,W) W-minor planes.  The naive
    # channel-minor form (take_along_axis for logit_target + logits[...,c]
    # strided slices on a C=4-minor volume) ran as an 8.2M-element gather
    # plus its scatter transpose: 218.6 ms fwd+bwd at the flagship grid on
    # chip; this form is 11.0 ms at exact (0.0) parity.
    if isinstance(logits, ChannelLeading):
        lgT = logits.planes.astype(jnp.float32)
        batch = lgT.shape[1]
    else:
        lgT = jnp.moveaxis(logits, -1, 0).astype(jnp.float32)
        batch = logits.shape[0]
    lg = [lgT[c] for c in range(lgT.shape[0])]

    if collapse_before:
        m = lg[0]
        for c in range(1, collapse_before):
            m = jnp.maximum(m, lg[c])
        merged = m + jnp.log(
            sum(jnp.exp(lg[c] - m) for c in range(collapse_before))
        )
        lg = [merged] + lg[collapse_before:]
        target = jnp.maximum(target - collapse_before + 1, 0)

    out_c = len(lg)
    valid = (raw_target < n_classes).astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1.0)
    target = jnp.where(raw_target < n_classes, target, 0)

    # memory note: probabilities are NEVER materialized as a (…,C) fp32
    # tensor (at the full model grid that plus a one-hot costs >1 GiB);
    # everything is per-class expressions that fuse into reductions.
    mx = lg[0]
    for c in range(1, out_c):
        mx = jnp.maximum(mx, lg[c])
    lse = mx + jnp.log(sum(jnp.exp(lg[c] - mx) for c in range(out_c)))
    logit_t = sum(jnp.where(target == c, lg[c], 0.0) for c in range(out_c))
    ce = ((lse - logit_t) * valid).sum() / n

    def prob_of(logit_c):
        return jnp.clip(jnp.exp(logit_c - lse), 1e-6, 1.0 - 1e-6)

    sum_p2 = sum(jnp.square(prob_of(lg[c])) for c in range(out_c))
    target_prob = prob_of(logit_t)
    mse = ((sum_p2 - 2.0 * target_prob + 1.0) * valid).sum() / n

    # soft dice over classes 1..out_c-1, per sample then averaged
    eps = 1e-5
    dice_sum = 0.0
    for c in range(1, out_c):
        p = prob_of(lg[c]) * valid
        m = (target == c).astype(jnp.float32) * valid
        inter = jnp.sum(p * m, axis=(1, 2, 3))  # (N,)
        card = jnp.sum(p + m, axis=(1, 2, 3))
        dice_sum = dice_sum + jnp.sum((2.0 * inter + eps) / (card + eps))
    dice = 1.0 - dice_sum / float(batch * max(1, out_c - 1))
    return ce, dice, mse


def _nearest_down2(t: jnp.ndarray) -> jnp.ndarray:
    """``t[:, ::2, ::2, ::2]`` for an int label volume (N, D, H, W).

    The W-axis stride-2 slice is a lane deinterleave — XLA:TPU lowers it
    as a full-volume GATHER (13 ms/item at the flagship grid, round-5
    step trace) in any layout.  Instead: slice z/y (sublane strides are
    cheap) and deinterleave x with a one-hot matmul on the MXU — exact
    for integer labels < 256 (bf16 products of small ints are exact and
    each sum has a single nonzero term).  ``UNET_TPU_NO_MM_DOWN2=1``
    restores the plain slice (A/B + fallback)."""
    import os

    n, d, h, w = t.shape
    if w % 2 or os.environ.get("UNET_TPU_NO_MM_DOWN2"):
        return t[:, ::2, ::2, ::2]
    ts = t[:, ::2, ::2, :]
    sel = (
        jnp.arange(w, dtype=jnp.int32)[:, None]
        == 2 * jnp.arange(w // 2, dtype=jnp.int32)[None, :]
    )
    out = jax.lax.dot(
        ts.reshape(-1, w).astype(jnp.bfloat16), sel.astype(jnp.bfloat16)
    )
    return out.reshape(ts.shape[:3] + (w // 2,)).astype(t.dtype)


def deep_supervision_loss(
    outputs: list,
    target: jnp.ndarray,
    n_classes: int,
    collapse_before: int = 0,
    cost_ce: bool = True,
    cost_dice: bool = True,
    cost_mse: bool = True,
):
    """Weighted multi-scale loss (train.cpp:637-700).

    ``outputs``: per-level logits (level 0 full-res); targets for level k>0
    are nearest-downsampled by 2 each level (floor semantics of torch
    ``interpolate(mode=nearest)``: index map ``i -> 2*i``).

    Returns (total_loss, (ce0, dice0, mse0)) — the level-0 metrics are what
    the reference records as training errors (train.cpp:676-682).
    """
    n_levels = len(outputs)
    weight_sum = sum(1.0 / (1 << k) for k in range(n_levels))
    total = 0.0
    level0 = None
    cur_target = target
    for k, logits in enumerate(outputs):
        if k > 0:
            # nearest downsample x2: torch interpolate(nearest) picks
            # floor(i * in/out) = 2*i -> stride-2 subsample from index 0
            cur_target = _nearest_down2(cur_target)
        ce, dice, mse = calc_losses(logits, cur_target, n_classes, collapse_before)
        if k == 0:
            level0 = (ce, dice, mse)
        level_loss = 0.0
        used = False
        if cost_ce:
            level_loss, used = level_loss + ce, True
        if cost_dice:
            level_loss, used = level_loss + dice, True
        if cost_mse:
            level_loss, used = level_loss + mse, True
        if not used:
            level_loss = ce
        total = total + level_loss * ((1.0 / (1 << k)) / weight_sum)
    return total, level0
