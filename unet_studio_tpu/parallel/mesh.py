"""Mesh / collective layer — the distributed backbone the reference never
had (SURVEY.md §2.10, §5.8).

The reference hand-rolls single-host multi-GPU data parallelism with one
model replica per device, per-epoch weight broadcasts, and per-tensor
gradient copies to device 0 (train.cpp:961-971, unet.cpp:224-244).  On
TPU all of that dissolves into one SPMD program over a
``jax.sharding.Mesh``:

* axis ``data``  — batch sharding; gradient reduction is a ``psum`` over
  ICI inside the jitted train step (no replica objects, no copies)
* axis ``space`` — reserved for spatial sharding of volumes larger than
  one chip's HBM (halo exchange; the SP analog for volumetric CNNs,
  SURVEY.md §5.7)

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
the same code then spans hosts with the data axis riding ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_space: int = 1) -> Mesh:
    """Build a (data, space) mesh over the available devices."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    n = n_data * n_space
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over ``data``."""
    sh = data_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
