"""Parity of losses and optimizer against torch implementations of the
reference math (train.cpp:501-552, unet.cpp:246-277, train.cpp:759-766)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unet_studio_tpu.engine.optimizer import (
    SGDConfig,
    clip_by_global_norm,
    init_opt_state,
    poly_lr,
    sgd_step,
)
from unet_studio_tpu.ops.losses import calc_losses, deep_supervision_loss


def torch_calc_losses(pred_raw, target_indices, C, collapse_before=0):
    """Literal reimplementation of calc_losses (train.cpp:501-552) in torch."""
    logits = pred_raw
    target = target_indices
    out_C = C
    if collapse_before:
        logits = torch.cat(
            [
                torch.logsumexp(pred_raw[:, :collapse_before], 1, keepdim=True),
                pred_raw[:, collapse_before:C],
            ],
            1,
        )
        target = torch.clamp_min(target_indices - collapse_before + 1, 0)
        out_C = C - collapse_before + 1
    valid = target_indices < C
    v = valid.to(logits.dtype)
    n = torch.clamp_min(v.sum(), 1.0)
    target = torch.where(valid, target, torch.zeros_like(target))
    ce = F.cross_entropy(logits, target, reduction="none")
    ce = (ce * v).sum() / n
    prob = torch.clamp(torch.softmax(logits, 1), 1e-6, 1.0 - 1e-6)
    target_prob = prob.gather(1, target.unsqueeze(1)).squeeze(1)
    mse = ((torch.sum(prob * prob, 1) - 2.0 * target_prob + 1.0) * v).sum() / n
    eps = torch.tensor(1e-5)
    dice_sum = torch.zeros(())
    for c in range(1, out_C):
        p = prob[:, c] * v
        m = (target == c).to(p.dtype) * v
        inter = torch.sum(p * m, dim=(1, 2, 3))
        card = torch.sum(p + m, dim=(1, 2, 3))
        dice_sum = dice_sum + torch.sum((2.0 * inter + eps) / (card + eps))
    dice = 1.0 - dice_sum / float(target.size(0) * max(1, out_C - 1))
    return ce, dice, mse


def _rand_case(rng, N=2, C=5, D=6, H=6, W=6, invalid=True):
    logits = rng.standard_normal((N, C, D, H, W)).astype(np.float32)
    target = rng.integers(0, C + (2 if invalid else 0), (N, D, H, W)).astype(np.int64)
    return logits, target


def test_calc_losses_parity(rng):
    for collapse in (0, 3):
        logits, target = _rand_case(rng)
        t_ce, t_dice, t_mse = torch_calc_losses(
            torch.from_numpy(logits), torch.from_numpy(target), 5, collapse
        )
        j_ce, j_dice, j_mse = calc_losses(
            jnp.asarray(logits.transpose(0, 2, 3, 4, 1)),
            jnp.asarray(target),
            5,
            collapse,
        )
        np.testing.assert_allclose(float(j_ce), t_ce.item(), rtol=1e-5)
        np.testing.assert_allclose(float(j_dice), t_dice.item(), rtol=1e-5)
        np.testing.assert_allclose(float(j_mse), t_mse.item(), rtol=1e-5)


def test_deep_supervision_weights(rng):
    """Weighted sum across levels matches the reference formula."""
    N, C = 1, 3
    shapes = [(8, 8, 8), (4, 4, 4), (2, 2, 2)]
    logits = [
        rng.standard_normal((N, *s, C)).astype(np.float32) for s in shapes
    ]
    target = rng.integers(0, C, (N, 8, 8, 8)).astype(np.int64)

    total, (ce0, dice0, mse0) = deep_supervision_loss(
        [jnp.asarray(l) for l in logits], jnp.asarray(target), C
    )
    # manual: per level nearest-downsampled target
    weight_sum = sum(1.0 / (1 << k) for k in range(3))
    expect = 0.0
    cur = target
    for k in range(3):
        if k > 0:
            cur = cur[:, ::2, ::2, ::2]
        t_ce, t_dice, t_mse = torch_calc_losses(
            torch.from_numpy(logits[k].transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(cur),
            C,
        )
        expect += (t_ce + t_dice + t_mse).item() * (1.0 / (1 << k)) / weight_sum
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
    np.testing.assert_allclose(
        float(ce0),
        torch_calc_losses(
            torch.from_numpy(logits[0].transpose(0, 4, 1, 2, 3)),
            torch.from_numpy(target),
            C,
        )[0].item(),
        rtol=1e-5,
    )


def test_nearest_downsample_matches_torch(rng):
    t = rng.integers(0, 7, (1, 8, 6, 10)).astype(np.int64)
    ours = t[:, ::2, ::2, ::2]
    theirs = (
        F.interpolate(
            torch.from_numpy(t).unsqueeze(1).float(),
            size=(4, 3, 5),
            mode="nearest",
        )
        .squeeze(1)
        .long()
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_mm_nearest_down2_matches_slice(rng):
    """The one-hot-matmul lane deinterleave (ops/losses.py
    _nearest_down2) must be BITWISE the stride-2 slice for int labels,
    including odd z/h dims and 255-valued labels; odd W falls back to
    the slice."""
    from unet_studio_tpu.ops.losses import _nearest_down2

    for shape in ((1, 8, 6, 10), (2, 7, 5, 16), (1, 4, 4, 9)):
        t = jnp.asarray(
            rng.integers(0, 256, shape).astype(np.int32)
        )
        np.testing.assert_array_equal(
            np.asarray(_nearest_down2(t)),
            np.asarray(t[:, ::2, ::2, ::2]),
            err_msg=str(shape),
        )


def test_sgd_parity_with_torch(rng):
    """3 steps of our SGD == torch.optim.SGD with the reference's groups."""
    shapes = {"a.0.w": (4, 3, 3, 3, 3), "a.0.b": (4,), "a.1.w": (4,), "a.1.b": (4,)}
    params = {k: rng.standard_normal(s).astype(np.float32) for k, s in shapes.items()}
    t_params = {k: torch.tensor(v, requires_grad=True) for k, v in params.items()}
    decay = [t_params["a.0.w"]]
    no_decay = [t_params["a.0.b"], t_params["a.1.w"], t_params["a.1.b"]]
    opt = torch.optim.SGD(
        [
            {"params": decay, "weight_decay": 3e-5},
            {"params": no_decay, "weight_decay": 0.0},
        ],
        lr=1e-2,
        momentum=0.99,
        nesterov=True,
    )
    j_params = {k: jnp.asarray(v) for k, v in params.items()}
    opt_state = init_opt_state(j_params)
    cfg = SGDConfig()

    for step in range(3):
        grads = {k: rng.standard_normal(s).astype(np.float32) for k, s in shapes.items()}
        # torch: set grads, clip, step
        for k in t_params:
            t_params[k].grad = torch.tensor(grads[k])
        torch.nn.utils.clip_grad_norm_(list(t_params.values()), 12.0)
        opt.step()
        opt.zero_grad()
        j_params, opt_state = sgd_step(
            j_params, {k: jnp.asarray(v) for k, v in grads.items()}, opt_state,
            lr=1e-2, config=cfg,
        )
        for k in shapes:
            np.testing.assert_allclose(
                np.asarray(j_params[k]),
                t_params[k].detach().numpy(),
                rtol=1e-5,
                atol=1e-6,
                err_msg=f"step {step} param {k}",
            )


def test_clip_by_global_norm(rng):
    grads = {"x": jnp.asarray(rng.standard_normal((10, 10)).astype(np.float32) * 100)}
    clipped = clip_by_global_norm(grads, 12.0)
    norm = float(jnp.sqrt(jnp.sum(jnp.square(clipped["x"]))))
    assert norm <= 12.0 + 1e-3
    small = {"x": jnp.ones((2,)) * 0.1}
    out = clip_by_global_norm(small, 12.0)
    np.testing.assert_allclose(np.asarray(out["x"]), 0.1)


def test_poly_lr():
    np.testing.assert_allclose(float(poly_lr(1e-3, 0, 100)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(
        float(poly_lr(1e-3, 50, 100)), 1e-3 * 0.5**0.9, rtol=1e-5
    )
    assert float(poly_lr(1e-3, 100, 100)) == 0.0
