"""Deferred instance-norm fusion (round-4 verdict item 3): the inference
packed forward folds every norm+act into the neighboring conv kernels
(stats epilogue + load-affine prologue).  Exactness contract: at f32 the
fused route must match BOTH the unfused packed route and the XLA forward
to float tolerance on every architecture shape it can take
(unet.cpp:24-101 norm-after-conv semantics)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from unet_studio_tpu.models.unet3d import UNet3d, forward


ARCH_PACKED = "\n".join(
    [
        "conv16,ks3,stride1+norm,leaky_relu+conv16,ks3,stride1+norm,leaky_relu",
        "conv32,ks3,stride2+norm,leaky_relu+conv32,ks3,stride1+norm,leaky_relu",
        "conv64,ks3,stride2+norm,leaky_relu+conv64,ks3,stride1+norm,leaky_relu"
        "+conv_trans32,ks2,stride2",
        "conv32,ks3,stride1+norm,leaky_relu+conv32,ks3,stride1+norm,leaky_relu"
        "+conv4,ks1,stride1+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv16,ks3,stride1+norm,leaky_relu"
        "+conv4,ks1,stride1",
    ]
)


@pytest.fixture(scope="module")
def model_and_input():
    model = UNet3d.create(1, 4, ARCH_PACKED, seed=3)
    # (x, y, z): packed needs W % (128/C) == 0 and (W*C/128) % 8 == 0
    model.dim = (64, 8, 8)
    d, h, w = model.dim_dhw
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, d, h, w, 1), np.float32))
    return model, x


def _fwd(model, x, **env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: v for k, v in env.items() if v is not None})
    for k, v in env.items():
        if v is None:
            os.environ.pop(k, None)
    try:
        outs, _ = forward(
            model.spec, model.params, x, train=False, compute_dtype=jnp.float32
        )
        return [np.asarray(o) for o in outs]
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_fused_matches_unfused_and_xla(model_and_input):
    model, x = model_and_input
    fused = _fwd(model, x, UNET_TPU_FORCE_PACKED="1")
    unfused = _fwd(
        model, x, UNET_TPU_FORCE_PACKED="1", UNET_TPU_NO_NORM_FUSION="1"
    )
    xla = _fwd(model, x, UNET_TPU_NO_PALLAS="1")
    assert len(fused) == len(unfused) == len(xla)
    for lvl, (f, u, r) in enumerate(zip(fused, unfused, xla)):
        scale = max(np.abs(r).max(), 1e-6)
        assert np.abs(f - u).max() / scale < 1e-4, f"level {lvl} fused!=unfused"
        assert np.abs(f - r).max() / scale < 1e-4, f"level {lvl} fused!=xla"


def test_fusion_on_training_path_is_off(model_and_input):
    """Training keeps the custom-VJP norm passes: train=True must still be
    exact vs the XLA train forward (the fusion gate is inference-only)."""
    model, x = model_and_input
    os.environ["UNET_TPU_FORCE_PACKED"] = "1"
    try:
        outs, _ = forward(
            model.spec, model.params, x, train=True, compute_dtype=jnp.float32
        )
        packed_train = [np.asarray(o) for o in outs]
    finally:
        del os.environ["UNET_TPU_FORCE_PACKED"]
    xla = _fwd(model, x, UNET_TPU_NO_PALLAS="1")
    for lvl, (p, r) in enumerate(zip(packed_train, xla)):
        scale = max(np.abs(r).max(), 1e-6)
        assert np.abs(p - r).max() / scale < 1e-4, f"level {lvl}"
