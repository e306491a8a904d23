"""Model surgery: output-channel reordering and out_count padding
(reference: mainwindow_training.cpp:721-779 and :352-364).

Both operate on the deep-supervision head convs (the 1x1x1 ``output``
layers) whose out-channel dimension is the class dimension.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .dsl import parse_architecture
from .unet3d import UNet3d, init_params, init_state


def _head_keys(model: UNet3d):
    for level, head in enumerate(model.spec.heads):
        for i, layer in enumerate(head):
            if layer.has_params:
                yield f"output{level}.{i}"


def reorder_output_channels(model: UNet3d, new_order: list[int]) -> UNet3d:
    """Permute the class channels of every deep-supervision head.

    ``new_order[k]`` = the old class index that becomes class k.  The GUI
    uses this to renumber label classes without retraining
    (mainwindow_training.cpp:721-779).
    """
    if sorted(new_order) != list(range(model.out_count)):
        raise ValueError(f"new_order must be a permutation of 0..{model.out_count-1}")
    order = np.asarray(new_order)
    params = dict(model.params)
    for key in _head_keys(model):
        params[f"{key}.w"] = jnp.asarray(np.asarray(params[f"{key}.w"])[..., order])
        params[f"{key}.b"] = jnp.asarray(np.asarray(params[f"{key}.b"])[order])
    out = UNet3d(
        spec=model.spec,
        params=params,
        state=model.state,
        voxel_size=model.voxel_size.copy(),
        dim=tuple(model.dim),
        fov_strategy=model.fov_strategy,
        preproc=model.preproc,
        orientation=model.orientation,
        postproc=model.postproc,
        single_component_label=list(model.single_component_label),
        testing_errors=list(model.testing_errors),
        training_errors=list(model.training_errors),
    )
    return out


def pad_out_count(model: UNet3d, new_out_count: int, seed: int = 0) -> UNet3d:
    """Grow the class dimension: rebuild with the architecture's output
    token widened, then size-checked copy of every matching parameter
    (the GUI's rebuild + copy_from, mainwindow_training.cpp:352-364).
    New class channels keep their fresh initialization."""
    if new_out_count < model.out_count:
        raise ValueError("pad_out_count only grows the class dimension")
    arch = model.architecture.replace(
        f"conv{model.out_count},ks1,stride1", f"conv{new_out_count},ks1,stride1"
    )
    spec = parse_architecture(model.in_count, new_out_count, arch)

    new = UNet3d(
        spec=spec,
        params=init_params(spec, seed),
        state=init_state(spec),
        voxel_size=model.voxel_size.copy(),
        dim=tuple(model.dim),
        fov_strategy=model.fov_strategy,
        preproc=model.preproc,
        orientation=model.orientation,
        postproc=model.postproc,
    )
    for k, v in model.params.items():
        if k in new.params:
            nv = np.asarray(new.params[k])
            ov = np.asarray(v)
            if nv.shape == ov.shape:
                new.params[k] = jnp.asarray(ov)
            elif nv.ndim == ov.ndim and nv.shape[:-1] == ov.shape[:-1]:
                nv = nv.copy()
                nv[..., : ov.shape[-1]] = ov
                new.params[k] = jnp.asarray(nv)
            elif nv.ndim == 1 and nv.shape[0] >= ov.shape[0]:
                nv = nv.copy()
                nv[: ov.shape[0]] = ov
                new.params[k] = jnp.asarray(nv)
    return new
