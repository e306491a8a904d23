"""Spatial sharding — the sequence-parallelism analog for volumetric CNNs
(SURVEY.md §5.7).

The reference copes with large volumes by resampling onto a fixed model
grid (train.cpp:26-29) and chunked inference (evalution_set.model_io).
On TPU the native answer is to shard the volume itself: the D (z) axis is
partitioned over the mesh's ``space`` axis and XLA GSPMD inserts the halo
exchanges every 3^3 convolution needs at shard boundaries — the
``ppermute`` of 1-voxel shells rides the ICI, no manual collectives.

Use when a volume (or its activations) outgrows one chip's HBM, or to
batch=1 latency-scale inference across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet3d import UNet3d, forward, no_conv_chunking, no_pallas_conv


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(N, D, H, W, C) arrays sharded along D over the ``space`` axis."""
    return NamedSharding(mesh, P(None, "space"))


def make_spatial_infer(model: UNet3d, mesh: Mesh, compute_dtype=jnp.bfloat16):
    """Build a jitted forward whose activations stay D-sharded across the
    ``space`` mesh axis.  The model must be deep enough that D/shards stays
    >= 1 at the bottleneck (D divisible by 2^(levels-1) * n_space).

    Returns fn(params, x) -> level-0 logits with the same sharding.
    """
    spec = model.spec
    sh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def fn(params, x):
        x = jax.lax.with_sharding_constraint(x, sh)
        # pallas kernels pad z locally (wrong at shard boundaries); the
        # XLA conv path lets GSPMD exchange halos
        with no_conv_chunking(), no_pallas_conv():
            outs, _ = forward(
                spec, params, x, train=False, compute_dtype=compute_dtype
            )
        return jax.lax.with_sharding_constraint(outs[0], sh)

    return jax.jit(fn, in_shardings=(rep, sh), out_shardings=sh)


def make_spatial_train_step(model: UNet3d, mesh: Mesh, compute_dtype=jnp.float32):
    """Spatially-sharded TRAINING step (SURVEY.md §5.7 stretch goal): the
    volume's z axis is partitioned over the ``space`` mesh axis, GSPMD
    inserts the convolution halo exchanges in BOTH the forward and the
    backward, and the replicated-parameter gradients come out implicitly
    all-reduced.  For volumes whose activations outgrow one chip's HBM —
    on-device augmentation is not applied here (its gather patterns don't
    shard along z); feed pre-augmented or raw volumes.

    Returns fn(params, opt_state, img, lab, lr) ->
    (params, opt_state, (ce, dice, mse)); img (1, D, H, W, C) and lab
    (1, D, H, W) sharded along D.
    """
    from ..engine.optimizer import SGDConfig, sgd_step
    from ..ops.losses import deep_supervision_loss

    spec = model.spec
    n_classes = model.out_count
    sh = spatial_sharding(mesh)
    lab_sh = NamedSharding(mesh, P(None, "space"))
    rep = NamedSharding(mesh, P())
    cfg = SGDConfig()

    def step(params, opt_state, img, lab, lr):
        def loss_fn(p):
            # pallas kernels pad z locally (wrong at shard boundaries);
            # the XLA conv path lets GSPMD exchange halos
            with no_pallas_conv():
                outs, _ = forward(
                    spec, p, img, train=True, compute_dtype=compute_dtype
                )
            loss, lvl0 = deep_supervision_loss(
                outs, lab.astype(jnp.int32), n_classes
            )
            return loss, jnp.stack(lvl0)

        grads, lvl0 = jax.grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = sgd_step(params, grads, opt_state, lr, cfg)
        return new_params, new_opt, lvl0

    return jax.jit(
        step,
        in_shardings=(rep, rep, sh, lab_sh, None),
        out_shardings=(rep, rep, rep),
    )
