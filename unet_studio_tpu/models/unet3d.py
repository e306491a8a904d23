"""Functional 3D U-Net, TPU-first.

Design notes (not a port of unet.cpp — same observable behavior, different
machine mapping):

* Layout is channels-last ``(N, D, H, W, C)`` so XLA tiles convolutions
  onto the MXU with lane dimension = channels.
* Parameters live in a flat ``dict[str, jnp.ndarray]`` keyed
  ``"{module}.{layer_idx}.{w|b}"``.  ``param_order()`` enumerates keys in
  LibTorch ``parameters()`` registration order, which defines the
  positional ``tensor0..tensorN`` layout of ``.nz`` files
  (main.cpp:193-204).
* ``conv_trans`` (ks2 stride2) is implemented as a single matmul +
  block reshape — on TPU this is strictly better than a transposed
  convolution: one MXU contraction, no scatter.
* InstanceNorm (``norm``) matches torch ``InstanceNorm3d(affine=True)``
  (eps 1e-5, per-sample per-channel stats, stateless).  ``bnorm`` matches
  ``BatchNorm3d(eps=0)``; at inference the reference resets its running
  stats to identity (unet.cpp:7-22), so eval mode applies affine only.
* Forward returns per-level deep-supervision logits, ``results[0]`` full
  resolution (unet.cpp:168-193).

Weight storage layouts (vs torch):
* conv:        ours ``(kd,kh,kw,I,O)``;  torch ``(O,I,kd,kh,kw)``
* conv_trans:  ours ``(I,2,2,2,O)``;     torch ``(I,O,2,2,2)``
* norm/bnorm:  ``(C,)`` scale ("w") and bias ("b")
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dsl import LayerSpec, UNetSpec, parse_architecture

# ---------------------------------------------------------------------------
# parameter bookkeeping
# ---------------------------------------------------------------------------


def param_order(spec: UNetSpec) -> list[tuple[str, LayerSpec, str]]:
    """Yield (param_key, layer, which) in LibTorch parameters() order.

    ``which`` is "w" or "b".  One entry per .nz ``tensorN`` record.
    """
    out = []
    for mod_name, layers in spec.module_names():
        for i, layer in enumerate(layers):
            if not layer.has_params:
                continue
            out.append((f"{mod_name}.{i}.w", layer, "w"))
            out.append((f"{mod_name}.{i}.b", layer, "b"))
    return out


def torch_param_shape(layer: LayerSpec, which: str) -> tuple[int, ...]:
    if which == "b":
        return (layer.out_c,)
    if layer.kind == "conv":
        return (layer.out_c, layer.in_c, layer.ks, layer.ks, layer.ks)
    if layer.kind == "conv_trans":
        return (layer.in_c, layer.out_c, 2, 2, 2)
    return (layer.in_c,)  # norm scale


def jax_param_shape(layer: LayerSpec, which: str) -> tuple[int, ...]:
    if which == "b":
        return (layer.out_c,)
    if layer.kind == "conv":
        return (layer.ks, layer.ks, layer.ks, layer.in_c, layer.out_c)
    if layer.kind == "conv_trans":
        return (layer.in_c, 2, 2, 2, layer.out_c)
    return (layer.in_c,)


def torch_to_jax(layer: LayerSpec, which: str, arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float32).reshape(torch_param_shape(layer, which))
    if which == "b":
        return arr
    if layer.kind == "conv":
        return np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0))
    if layer.kind == "conv_trans":
        return np.ascontiguousarray(arr.transpose(0, 2, 3, 4, 1))
    return arr


def jax_to_torch(layer: LayerSpec, which: str, arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, np.float32)
    if which == "b":
        return arr
    if layer.kind == "conv":
        return np.ascontiguousarray(arr.transpose(4, 3, 0, 1, 2))
    if layer.kind == "conv_trans":
        return np.ascontiguousarray(arr.transpose(0, 4, 1, 2, 3))
    return arr


def init_params(spec: UNetSpec, key: jax.Array) -> dict[str, jnp.ndarray]:
    """Initialize parameters matching torch's module defaults.

    Conv/ConvTranspose: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in));
    bias U(+-1/sqrt(fan_in)).  Norm affine: scale 1, bias 0.
    """
    params: dict[str, jnp.ndarray] = {}
    entries = param_order(spec)
    keys = jax.random.split(key, max(1, len(entries)))
    for (name, layer, which), k in zip(entries, keys):
        shape = jax_param_shape(layer, which)
        if layer.kind in ("norm", "bnorm"):
            params[name] = (
                jnp.ones(shape, jnp.float32) if which == "w" else jnp.zeros(shape, jnp.float32)
            )
            continue
        if layer.kind == "conv":
            fan_in = layer.in_c * layer.ks**3
        else:  # conv_trans: torch computes fan_in on (I,O,k,k,k) as O*k^3
            fan_in = layer.out_c * 8
        bound = 1.0 / math.sqrt(fan_in)
        params[name] = jax.random.uniform(
            k, shape, jnp.float32, minval=-bound, maxval=bound
        )
    return params


def init_state(spec: UNetSpec) -> dict[str, jnp.ndarray]:
    """BatchNorm running stats (identity).  Not serialized to .nz —
    the reference stores only parameters() (main.cpp:193-204) and resets
    running stats at inference (unet.cpp:7-22)."""
    state: dict[str, jnp.ndarray] = {}
    for mod_name, layers in spec.module_names():
        for i, layer in enumerate(layers):
            if layer.kind == "bnorm":
                state[f"{mod_name}.{i}.mean"] = jnp.zeros(layer.in_c, jnp.float32)
                state[f"{mod_name}.{i}.var"] = jnp.ones(layer.in_c, jnp.float32)
    return state


# ---------------------------------------------------------------------------
# layer compute
# ---------------------------------------------------------------------------

_CONV_DN = jax.lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
)


def _precision_for(dtype):
    # XLA's DEFAULT precision runs fp32 contractions at bf16; request full
    # fp32 when the compute dtype is fp32 (parity path).  bf16 inputs keep
    # the fast MXU default.
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _conv(x, w, b, stride: int, ks: int):
    pad = (ks - 1) // 2
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride, stride),
        padding=[(pad, pad)] * 3,
        dimension_numbers=_CONV_DN,
        precision=_precision_for(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _conv_trans2x(x, w, b):
    """ks2/stride2 transposed conv as matmul + block reshape (MXU-native)."""
    n, d, h, wd, ci = x.shape
    co = w.shape[-1]
    y = jnp.dot(
        x.reshape(-1, ci), w.reshape(ci, 8 * co).astype(x.dtype),
        precision=_precision_for(x.dtype),
        preferred_element_type=jnp.float32,
    )
    y = y.reshape(n, d, h, wd, 2, 2, 2, co)
    y = (y + b.astype(jnp.float32)).astype(x.dtype)
    # (n, d,2, h,2, w,2, co) then merge pairs
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(n, 2 * d, 2 * h, 2 * wd, co)


def _max_pool2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 2, 1),
        window_strides=(1, 2, 2, 2, 1),
        padding="VALID",
    )


def _upsample2(x):
    n, d, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :], (n, d, 2, h, 2, w, 2, c)
    )
    return x.reshape(n, 2 * d, 2 * h, 2 * w, c)


def _instance_norm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _batch_norm(x, scale, bias, mean, var, train: bool, eps=0.0):
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2, 3))
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2, 3))
    y = (x32 - mean) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, var


def _act(x, act: str | None):
    if act is None:
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "leaky_relu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)
    if act == "elu":
        return jax.nn.elu(x)
    raise ValueError(act)


def _run_sequential(params, state, mod_name, layers, x, train: bool):
    new_state = {}
    for i, layer in enumerate(layers):
        if layer.kind == "conv":
            x = _conv(x, params[f"{mod_name}.{i}.w"], params[f"{mod_name}.{i}.b"], layer.stride, layer.ks)
        elif layer.kind == "conv_trans":
            x = _conv_trans2x(x, params[f"{mod_name}.{i}.w"], params[f"{mod_name}.{i}.b"])
        elif layer.kind == "max_pool":
            x = _max_pool2(x)
        elif layer.kind == "upsample":
            x = _upsample2(x)
        elif layer.kind == "norm":
            x = _instance_norm(x, params[f"{mod_name}.{i}.w"], params[f"{mod_name}.{i}.b"])
        elif layer.kind == "bnorm":
            x, m, v = _batch_norm(
                x,
                params[f"{mod_name}.{i}.w"],
                params[f"{mod_name}.{i}.b"],
                state.get(f"{mod_name}.{i}.mean", jnp.zeros(layer.in_c, jnp.float32)),
                state.get(f"{mod_name}.{i}.var", jnp.ones(layer.in_c, jnp.float32)),
                train,
            )
            if train:
                new_state[f"{mod_name}.{i}.mean"] = m
                new_state[f"{mod_name}.{i}.var"] = v
        x = _act(x, layer.act)
    return x, new_state


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def forward(
    spec: UNetSpec,
    params: dict,
    x: jnp.ndarray,
    *,
    train: bool = True,
    state: dict | None = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """Run the U-Net.  ``x``: (N, D, H, W, in_count).

    Returns (results, new_state): results is the per-level deep-supervision
    logits list (level 0 = full resolution, float32), matching
    unet.cpp:168-193.  new_state carries updated BatchNorm statistics when
    training (empty dict otherwise).
    """
    state = state or {}
    x = x.astype(compute_dtype)
    new_state: dict = {}

    def seq(mod_name, layers, x):
        def body(x):
            return _run_sequential(params, state, mod_name, layers, x, train)

        if remat:
            body = jax.checkpoint(body)
        y, s = body(x)
        new_state.update(s)
        return y

    n_enc = len(spec.encoders)
    skips = []
    for level in range(n_enc):
        x = seq(f"encode{level}", spec.encoders[level], x)
        if level < n_enc - 1:
            skips.append(x)

    results: list = [None] * len(spec.decoders)
    for level in range(n_enc - 2, -1, -1):
        x = jnp.concatenate([skips[level], x], axis=-1)
        skips[level] = None
        x = seq(f"decode{level}", spec.decoders[level], x)
        if spec.heads[level]:
            results[level] = seq(f"output{level}", spec.heads[level], x).astype(
                jnp.float32
            )
        if spec.tails[level]:
            x = seq(f"decode_tail{level}", spec.tails[level], x)

    return results, new_state


# ---------------------------------------------------------------------------
# model wrapper (metadata + params), the UNet3d analog (unet.hpp:13-69)
# ---------------------------------------------------------------------------


@dataclass
class UNet3d:
    spec: UNetSpec
    params: dict
    state: dict = field(default_factory=dict)
    voxel_size: np.ndarray = field(
        default_factory=lambda: np.array([1.0, 1.0, 1.0], np.float32)
    )
    dim: tuple[int, int, int] = (192, 224, 192)  # (x, y, z), unet.hpp:37-38
    fov_strategy: str = "align_top"
    preproc: str = ""
    orientation: str = ""
    postproc: str = "softmax+create_mask+argmax"
    single_component_label: list[int] = field(default_factory=list)
    testing_errors: list[float] = field(default_factory=list)
    training_errors: list[float] = field(default_factory=list)

    @property
    def in_count(self) -> int:
        return self.spec.in_count

    @property
    def out_count(self) -> int:
        return self.spec.out_count

    @property
    def architecture(self) -> str:
        return self.spec.architecture

    @property
    def dim_dhw(self) -> tuple[int, int, int]:
        """(D, H, W) = (z, y, x) compute layout."""
        return (self.dim[2], self.dim[1], self.dim[0])

    @classmethod
    def create(
        cls, in_count: int, out_count: int, architecture: str, seed: int = 0
    ) -> "UNet3d":
        spec = parse_architecture(in_count, out_count, architecture)
        params = init_params(spec, jax.random.key(seed))
        return cls(spec=spec, params=params, state=init_state(spec))

    def __call__(self, x, *, train: bool = False, compute_dtype=jnp.float32, remat=False):
        results, _ = forward(
            self.spec,
            self.params,
            x,
            train=train,
            state=self.state,
            compute_dtype=compute_dtype,
            remat=remat,
        )
        return results

    def copy_from(self, other: "UNet3d") -> None:
        """Size-checked parameter copy (unet.cpp:195-222)."""
        for k, v in other.params.items():
            if k in self.params and self.params[k].shape == v.shape:
                self.params[k] = v
        self.voxel_size = np.array(other.voxel_size, np.float32)
        self.dim = tuple(other.dim)
        self.fov_strategy = other.fov_strategy
        self.postproc = other.postproc
        self.preproc = other.preproc

    def get_info(self) -> str:
        out = [
            f"in: {self.in_count} out: {self.out_count}",
            f"dim: {self.dim} reso: {tuple(float(v) for v in self.voxel_size)}",
            f"structure: {self.architecture}",
        ]
        if self.preproc:
            out.append(f"preproc: {self.preproc}")
        if self.postproc:
            out.append(f"postproc: {self.postproc}")
        return "\n".join(out) + "\n"


def round_up_size(shape_xyz, multiple=32) -> tuple[int, int, int]:
    """Round each dim up to a multiple (TIPL ml3d::round_up_size analog,
    train.cpp:1131).  Also the MXU-friendly thing to do."""
    return tuple(int(-(-int(s) // multiple) * multiple) for s in shape_xyz)
