"""Model <-> .nz serialization (reference: main.cpp:157-233).

Tensors are stored positionally as ``tensor0..tensorN`` float matrices in
LibTorch ``parameters()`` order with shape (rows=dim0, cols=numel/dim0) —
see ``param_order``.  Metadata keys mirror the reference exactly so the
existing model zoo loads and models we train load back into the reference.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..io.nz import read_nz, write_nz
from .dsl import parse_architecture
from .unet3d import (
    UNet3d,
    init_state,
    jax_to_torch,
    param_order,
    torch_param_shape,
    torch_to_jax,
)


def load_model(path: str) -> UNet3d:
    nz = read_nz(path)
    channels = nz.get_array("channels", np.int64)
    architecture = nz.get_string("architecture")
    if channels is None or not architecture:
        raise ValueError(f"{path}: invalid .nz format (missing channels/architecture)")
    in_count, out_count = int(channels[0]), int(channels[1])
    spec = parse_architecture(in_count, out_count, architecture)

    dim = nz.get_array("dimension", np.int64)
    voxel_size = nz.get_array("voxel_size", np.float32)
    if dim is None or voxel_size is None:
        raise ValueError(f"{path}: invalid .nz format (missing dimension/voxel_size)")

    model = UNet3d(
        spec=spec,
        params={},
        state=init_state(spec),
        voxel_size=np.asarray(voxel_size[:3], np.float32),
        dim=tuple(int(v) for v in dim[:3]),
        fov_strategy=nz.get_string("fov_strategy", "align_top"),
        preproc=nz.get_string("preproc", ""),
        orientation=nz.get_string("orientation", ""),
        postproc=nz.get_string("postproc", "softmax+create_mask+argmax"),
    )
    scl = nz.get_array("single_component_label")
    if scl is not None:
        model.single_component_label = [int(v) for v in np.asarray(scl).reshape(-1)]
    te = nz.get_array("testing_errors", np.float32)
    tr = nz.get_array("training_errors", np.float32)
    model.testing_errors = [] if te is None else [float(v) for v in te]
    model.training_errors = [] if tr is None else [float(v) for v in tr]
    # reference pads training_errors to testing length (main.cpp:189)
    if len(model.training_errors) < len(model.testing_errors):
        model.training_errors += [0.0] * (
            len(model.testing_errors) - len(model.training_errors)
        )

    for tid, (name, layer, which) in enumerate(param_order(spec)):
        arr = nz.get_array(f"tensor{tid}")
        expected = int(np.prod(torch_param_shape(layer, which)))
        if arr is None or arr.size != expected:
            got = 0 if arr is None else arr.size
            raise ValueError(
                f"{path}: tensor size mismatch at tensor{tid} ({got} != {expected})"
            )
        model.params[name] = jnp.asarray(torch_to_jax(layer, which, arr))
    return model


def save_model(path: str, model: UNet3d, sloped: bool = True) -> None:
    entries: dict[str, object] = {
        "channels": np.array([model.in_count, model.out_count], np.int32),
        "architecture": model.architecture,
        "dimension": np.array(model.dim, np.int32),
        "voxel_size": np.asarray(model.voxel_size, np.float32),
        "fov_strategy": model.fov_strategy,
        "preproc": model.preproc,
        "orientation": model.orientation,
        "postproc": model.postproc,
        "training_errors": np.asarray(model.training_errors, np.float32),
        "testing_errors": np.asarray(model.testing_errors, np.float32),
    }
    if model.single_component_label:
        entries["single_component_label"] = np.asarray(
            model.single_component_label, np.uint32
        )
    shapes: dict[str, tuple[int, int]] = {}
    sloped_keys: set[str] = set()
    for tid, (name, layer, which) in enumerate(param_order(model.spec)):
        t = jax_to_torch(layer, which, np.asarray(model.params[name]))
        tshape = torch_param_shape(layer, which)
        key = f"tensor{tid}"
        entries[key] = t.reshape(-1)
        # reference writes (cols=numel/dim0, rows=dim0) (main.cpp:228-229);
        # gz_mat stores column-major so this lays dim0-contiguous blocks out
        # in sequence, same as the C-order flat buffer we write.
        shapes[key] = (tshape[0], int(np.prod(tshape)) // tshape[0])
        if sloped:
            sloped_keys.add(key)
    write_nz(
        path,
        entries,
        shapes=shapes,
        sloped_keys=sloped_keys,
        min_size_for_slope=1024,
        precision={"training_errors": 3, "testing_errors": 3},
    )


def get_model_path(model_arg: str, zoo_dir: str | None = None) -> str:
    """--model resolution: append .nz, fall back to the zoo dir
    (train.cpp:1044-1052)."""
    path = model_arg
    if not path.endswith("nz"):
        path += ".nz"
    if not os.path.exists(path):
        for d in filter(None, [zoo_dir, os.path.join(os.path.dirname(__file__), "..", "..", "unet")]):
            cand = os.path.join(d, os.path.basename(path))
            if os.path.exists(cand):
                return cand
    return path
