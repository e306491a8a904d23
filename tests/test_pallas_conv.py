"""Packed Pallas conv kernels: exact parity with the XLA conv they replace
(the reference's torch::nn::Conv3d(ks3, stride1, pad1), unet.cpp:24-101).

On the CPU test mesh the kernels run in Pallas interpret mode — identical
semantics, pure-jax execution; the TPU Mosaic path is exercised by the
driver's bench/dryrun and was parity-verified on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_studio_tpu.ops.pallas_conv import (
    conv3d_s1,
    conv3d_s1_dual,
    supported,
)


def _ref_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x[None],
        w.astype(x.dtype),
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype,
    )[0]
    return y + b.astype(x.dtype)


SHAPES = [(16, 16, 64, 16), (8, 16, 32, 32), (8, 8, 16, 64)]


def test_supported_constraints():
    assert supported(16, 16, 192, 224, 192)
    assert supported(32, 32, 96, 112, 96)
    assert supported(64, 64, 48, 56, 48)
    assert not supported(16, 32, 192, 224, 192)  # ci != co
    assert not supported(128, 128, 24, 28, 24)  # no lane padding to fix
    assert not supported(8, 8, 64, 64, 64)  # bx=16 unsupported
    assert not supported(16, 16, 64, 64, 60)  # W % bx
    assert not supported(16, 16, 64, 64, 32)  # nb=4 not 8-aligned


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_parity(shape, rng):
    d, h, w_, c = shape
    assert supported(c, c, d, h, w_)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    y = jax.jit(conv3d_s1)(x, w, b)
    yr = _ref_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_grad_parity(rng):
    d, h, w_, c = SHAPES[0]
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    g = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)

    def loss(fn):
        return lambda x, w, b: jnp.sum(fn(x, w, b) * g)

    gp = jax.jit(jax.grad(loss(conv3d_s1), argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss(_ref_conv), argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        scale = max(float(jnp.max(jnp.abs(r))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(r) / scale, atol=3e-6, err_msg=name
        )


def test_dual_matches_concat(rng):
    d, h, w_, c = 8, 16, 32, 32
    xa = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2 * c, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    y = jax.jit(conv3d_s1_dual)(xa, xb, w, b)
    yr = _ref_conv(jnp.concatenate([xa, xb], -1), w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)
