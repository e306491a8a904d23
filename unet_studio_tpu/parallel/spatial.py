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

from ..models.unet3d import UNet3d, forward, no_conv_chunking


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
        with no_conv_chunking():
            outs, _ = forward(
                spec, params, x, train=False, compute_dtype=compute_dtype
            )
        return jax.lax.with_sharding_constraint(outs[0], sh)

    return jax.jit(fn, in_shardings=(rep, sh), out_shardings=sh)
