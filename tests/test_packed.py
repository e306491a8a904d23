"""Packed-dataflow ops vs their 5D XLA references (interpret mode on the
CPU mesh; hardware parity is checked by the driver bench).

Reference semantics: Conv3d(ks3,stride2,pad1) downsamplers,
ConvTranspose3d(ks2,stride2) upsamplers, InstanceNorm3d(affine), and the
ks1 output heads of unet.cpp:24-101,168-193.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_studio_tpu.ops import packed


def _conv5(x, w, stride):
    return jax.lax.conv_general_dilated(
        x[None],
        w,
        (stride,) * 3,
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def test_s2_down_parity(rng):
    d, h, w_, c = 8, 16, 64, 16
    assert packed.s2_supported(c, 2 * c, d, h, w_)
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, 2 * c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(2 * c), jnp.float32)
    y3 = jax.jit(
        lambda x3: packed.conv_s2_down(x3, w, b, (d, h, w_, c))
    )(packed.pack(x))
    y = packed.unpack(y3, (d // 2, h // 2, w_ // 2, 2 * c))
    yr = _conv5(x, w, 2) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=3e-5)


def test_trans_up_parity(rng):
    from unet_studio_tpu.models.unet3d import _conv_trans2x

    d, h, w_, c = 4, 8, 16, 32  # ci = 2C = 64, bx_i = 2, nb = 8
    ci, co = 2 * c, c
    assert packed.trans_supported(ci, co, d, h, w_)
    x = jnp.asarray(rng.standard_normal((d, h, w_, ci)), jnp.float32)
    # the model's conv_trans layout: (I, 2, 2, 2, O)
    w = jnp.asarray(rng.standard_normal((ci, 2, 2, 2, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32)
    y3 = jax.jit(
        lambda x3: packed.conv_trans2x_up(x3, w, b, (d, h, w_, ci))
    )(packed.pack(x))
    y = packed.unpack(y3, (2 * d, 2 * h, 2 * w_, co))
    yr = _conv_trans2x(x[None], w, b)[0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=3e-5)


def test_instance_norm_packed(rng):
    d, h, w_, c = 4, 8, 32, 16
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    y3 = packed.instance_norm_packed(packed.pack(x), scale, bias, c)
    y = packed.unpack(y3, (d, h, w_, c))
    mean = x.mean(axis=(0, 1, 2))
    var = ((x - mean) ** 2).mean(axis=(0, 1, 2))
    yr = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_head_conv_packed(rng):
    d, h, w_, c, out = 4, 8, 32, 16, 4
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 1, 1, c, out)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(out), jnp.float32)
    y = packed.head_conv_packed(packed.pack(x), w, b, (d, h, w_, c))
    yr = (jnp.einsum("dhwc,co->dhwo", x, w[0, 0, 0]) + b)[None]
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


PACKED_ARCH = "\n".join(
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


def test_forward_packed_matches_forward(rng):
    """The packed-dataflow inference forward must match forward(train=False)
    through entry conv, s1/s2 convs, dual decoder entry, trans upsamplers,
    norms, and heads (unet.cpp:168-193 semantics)."""
    from unet_studio_tpu.models.unet3d import UNet3d, forward, forward_packed

    model = UNet3d.create(1, 4, PACKED_ARCH, seed=0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64, 1)), jnp.float32)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    ref, _ = forward(
        model.spec, params, x, train=False, compute_dtype=jnp.float32
    )
    got = forward_packed(model.spec, params, x, compute_dtype=jnp.float32)
    assert len(got) == len(ref)
    for lvl, (a, b) in enumerate(zip(got, ref)):
        assert (a is None) == (b is None), lvl
        if a is not None:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"level {lvl}"
            )


def test_s1_packed_grad(rng):
    from unet_studio_tpu.ops.pallas_conv import conv_s1_p

    d, h, w_, c = 8, 8, 64, 16
    dims = (d, h, w_, c)
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c), jnp.float32)
    g = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    g3 = packed.pack(g)

    def loss_p(x5, w, b):
        return jnp.sum(conv_s1_p(packed.pack(x5), w, b, dims) * g3)

    def loss_r(x5, w, b):
        return jnp.sum(_conv5(x5, w, 1) * g)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        if name == "db":
            r = g.sum((0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, err_msg=name
        )


def test_instance_norm_packed_grad(rng):
    from unet_studio_tpu.models.unet3d import _instance_norm

    d, h, w_, c = 4, 8, 32, 16
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    g = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)

    def loss_p(x, s, b):
        return jnp.sum(
            packed.instance_norm_packed(packed.pack(x), s, b, c) * packed.pack(g)
        )

    def loss_r(x, s, b):
        return jnp.sum(_instance_norm(x[None], s, b)[0] * g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for name, a, r in zip(("dx", "dscale", "dbias"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-4, err_msg=name
        )


def test_trans_packed_grad(rng):
    from unet_studio_tpu.models.unet3d import _conv_trans2x

    d, h, w_, c = 4, 8, 16, 32
    ci, co = 2 * c, c
    dims = (d, h, w_, ci)
    x = jnp.asarray(rng.standard_normal((d, h, w_, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ci, 2, 2, 2, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2 * d, 2 * h, 2 * w_, co)), jnp.float32)
    g3 = packed.pack(g)

    def loss_p(x5, w, b):
        return jnp.sum(packed.conv_trans2x_p(packed.pack(x5), w, b, dims) * g3)

    def loss_r(x5, w, b):
        return jnp.sum(_conv_trans2x(x5[None], w, b)[0] * g)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-5, err_msg=name
        )


def test_s2_packed_grad(rng):
    d, h, w_, c = 8, 16, 64, 16
    dims = (d, h, w_, c)
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, 2 * c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(2 * c), jnp.float32)
    g = jnp.asarray(
        rng.standard_normal((d // 2, h // 2, w_ // 2, 2 * c)), jnp.float32
    )
    g3 = packed.pack(g)

    def loss_p(x5, w, b):
        return jnp.sum(packed.conv_s2_p(packed.pack(x5), w, b, dims) * g3)

    def loss_r(x5, w, b):
        return jnp.sum((_conv5(x5, w, 2) + b) * g)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-5, err_msg=name
        )


def test_entry_packed_parity_and_grad(rng):
    d, h, w_, co = 8, 16, 64, 16
    dims = (d, h, w_, 1)
    x = jnp.asarray(rng.standard_normal((1, d, h, w_, 1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 1, co)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32)
    y3 = jax.jit(lambda x: packed.conv_entry(x, w, b, dims))(x)
    y = packed.unpack(y3, (d, h, w_, co))
    yr = _conv5(x[0], w, 1) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=3e-5)

    g = jnp.asarray(rng.standard_normal((d, h, w_, co)), jnp.float32)
    g3 = packed.pack(g)

    def loss_p(x, w, b):
        return jnp.sum(packed.conv_entry_p(x, w, b, dims) * g3)

    def loss_r(x, w, b):
        return jnp.sum((_conv5(x[0], w, 1) + b) * g)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-5, err_msg=name
        )


def test_forward_packed_train_grads(rng):
    """Parameter gradients through the full packed forward (train mode,
    with and without remat) must match the standard forward's."""
    from unet_studio_tpu.models.unet3d import UNet3d, forward, forward_packed

    model = UNet3d.create(1, 4, PACKED_ARCH, seed=0)
    spec = model.spec
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64, 1)), jnp.float32)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    gs = [
        jnp.asarray(rng.standard_normal((1, 16, 16, 64, 4)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 8, 8, 32, 4)), jnp.float32),
    ]

    def loss_ref(params):
        outs, _ = forward(spec, params, x, train=True, compute_dtype=jnp.float32)
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs) if o is not None)

    def loss_pk(params, remat):
        outs = forward_packed(
            spec, params, x, compute_dtype=jnp.float32, train=True, remat=remat
        )
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs) if o is not None)

    gr = jax.grad(loss_ref)(params)
    for remat in (False, True):
        gp = jax.grad(lambda p, r=remat: loss_pk(p, r))(params)
        for k in gr:
            # conv biases feeding instance norms have a mathematically
            # ZERO gradient (the norm cancels constant shifts); both
            # paths leave ~1e-3 fp32 cancellation residue there, so the
            # comparison gets an absolute-noise allowance on top of the
            # relative tolerance
            scale = max(float(jnp.max(jnp.abs(gr[k]))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(gp[k]),
                np.asarray(gr[k]),
                atol=5e-4 * scale + 2e-3,
                err_msg=f"{k} remat={remat}",
            )


def test_packed_head_planes_loss_parity(rng):
    """The channel-leading level-0 loss interface (PackedHead ->
    packed_head_planes -> ChannelLeading, the round-5 train-step path)
    must match the 5D-logits path in loss value AND parameter grads."""
    from unet_studio_tpu.models.unet3d import (
        PackedHead,
        UNet3d,
        forward_packed,
        packed_head_planes,
    )
    from unet_studio_tpu.ops.losses import ChannelLeading, deep_supervision_loss

    model = UNet3d.create(1, 4, PACKED_ARCH, seed=0)
    spec = model.spec
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64, 1)), jnp.float32)
    target = jnp.asarray(
        (rng.random((1, 16, 16, 64)) * 5).astype(np.int32)
    )  # includes some invalid (=4) voxels
    params = {k: jnp.asarray(v) for k, v in model.params.items()}

    def loss_plain(params):
        outs = forward_packed(
            spec, params, x, compute_dtype=jnp.float32, train=True
        )
        outs = [o for o in outs if o is not None]
        return deep_supervision_loss(outs, target, 4)[0]

    def loss_planes(params):
        outs = forward_packed(
            spec, params, x, compute_dtype=jnp.float32, train=True,
            level0_packed=True,
        )
        assert isinstance(outs[0], PackedHead), "head fast-path not taken"
        outs = [ChannelLeading(packed_head_planes(outs[0]))] + [
            o for o in outs[1:] if o is not None
        ]
        return deep_supervision_loss(outs, target, 4)[0]

    v0, g0 = jax.value_and_grad(loss_plain)(params)
    v1, g1 = jax.value_and_grad(loss_planes)(params)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for k in g0:
        scale = max(float(jnp.max(jnp.abs(g0[k]))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g0[k]),
            atol=1e-5 * scale + 1e-7, err_msg=k,
        )


# ---------------------------------------------------------------------------
# the 64->128->64 boundary (round-2 verdict: the untested seam that shipped
# ~80%-relative-error TPU inference and a crashing TPU train step)
# ---------------------------------------------------------------------------

# 4-level arch crossing C=128: the 64->128 s2 conv runs PACKED (bxi=2),
# the C=128 s1 convs must be GATED to the XLA path (bx=1 is outside
# conv_s1_p's support), the 128->64 trans conv runs packed at bxi=1.
PACKED_ARCH_128 = "\n".join(
    [
        "conv16,ks3,stride1+norm,leaky_relu+conv16,ks3,stride1+norm,leaky_relu",
        "conv32,ks3,stride2+norm,leaky_relu+conv32,ks3,stride1+norm,leaky_relu",
        "conv64,ks3,stride2+norm,leaky_relu+conv64,ks3,stride1+norm,leaky_relu",
        "conv128,ks3,stride2+norm,leaky_relu+conv128,ks3,stride1+norm,leaky_relu"
        "+conv_trans64,ks2,stride2",
        "conv64,ks3,stride1+norm,leaky_relu+conv64,ks3,stride1+norm,leaky_relu"
        "+conv4,ks1,stride1+conv_trans32,ks2,stride2",
        "conv32,ks3,stride1+norm,leaky_relu+conv32,ks3,stride1+norm,leaky_relu"
        "+conv4,ks1,stride1+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv16,ks3,stride1+norm,leaky_relu"
        "+conv4,ks1,stride1",
    ]
)


def test_conv_s1_packed_rejects_c128(rng):
    """conv_s1_p at C=128 (bx=1) must fail at TRACE time, never compute:
    the combined halo matrix's left/right lane sets overlap there (the
    round-2 silent-corruption defect)."""
    from unet_studio_tpu.ops.pallas_conv import conv_s1_packed

    d, h, w_, c = 4, 4, 8, 128
    x3 = jnp.zeros((d, h * w_, 128), jnp.float32)
    w = jnp.zeros((3, 3, 3, c, c), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    with pytest.raises(ValueError, match="unsupported packed shape"):
        conv_s1_packed(x3, w, b, (d, h, w_, c))


def test_s2_packed_grad_ci64(rng):
    """The 64->128 downsampler's backward (bxi=2: the dx=0 center-term
    list is empty, round-2 IndexError) against the XLA reference."""
    d, h, w_, c = 8, 8, 16, 64
    dims = (d, h, w_, c)
    x = jnp.asarray(rng.standard_normal((d, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, c, 2 * c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(2 * c), jnp.float32)
    assert packed.s2_supported(c, 2 * c, d, h, w_)
    y3 = jax.jit(lambda x3: packed.conv_s2_down(x3, w, b, dims))(packed.pack(x))
    yr = _conv5(x, w, 2) + b
    np.testing.assert_allclose(
        np.asarray(packed.unpack(y3, (d // 2, h // 2, w_ // 2, 2 * c))),
        np.asarray(yr),
        atol=3e-5,
    )

    g = jnp.asarray(
        rng.standard_normal((d // 2, h // 2, w_ // 2, 2 * c)), jnp.float32
    )
    g3 = packed.pack(g)

    def loss_p(x5, w, b):
        return jnp.sum(packed.conv_s2_p(packed.pack(x5), w, b, dims) * g3)

    def loss_r(x5, w, b):
        return jnp.sum((_conv5(x5, w, 2) + b) * g)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-5, err_msg=name
        )


def test_trans_packed_grad_ci128(rng):
    """The 128->64 decoder upsampler at bxi=1 (whole input block = one
    lane) against the XLA reference."""
    from unet_studio_tpu.models.unet3d import _conv_trans2x

    d, h, w_, co = 4, 4, 8, 64
    ci = 2 * co
    dims = (d, h, w_, ci)
    assert packed.trans_supported(ci, co, d, h, w_)
    x = jnp.asarray(rng.standard_normal((d, h, w_, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ci, 2, 2, 2, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(co), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2 * d, 2 * h, 2 * w_, co)), jnp.float32)
    g3 = packed.pack(g)

    def loss_p(x5, w, b):
        return jnp.sum(packed.conv_trans2x_p(packed.pack(x5), w, b, dims) * g3)

    def loss_r(x5, w, b):
        return jnp.sum(_conv_trans2x(x5[None], w, b)[0] * g)

    y3 = jax.jit(lambda x3: packed.conv_trans2x_up(x3, w, b, dims))(packed.pack(x))
    yr = _conv_trans2x(x[None], w, b)[0]
    np.testing.assert_allclose(
        np.asarray(packed.unpack(y3, (2 * d, 2 * h, 2 * w_, co))),
        np.asarray(yr),
        atol=3e-5,
    )

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(x, w, b)
    for name, a, r in zip(("dx", "dw", "db"), gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, rtol=1e-5, err_msg=name
        )


def test_forward_packed_matches_forward_c128(rng):
    """Full-network forward parity across the 64->128->64 boundary: the
    exact seam the round-2 suite never traced."""
    from unet_studio_tpu.models.unet3d import UNet3d, forward, forward_packed

    model = UNet3d.create(1, 4, PACKED_ARCH_128, seed=0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64, 1)), jnp.float32)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    ref, _ = forward(
        model.spec, params, x, train=False, compute_dtype=jnp.float32
    )
    got = forward_packed(model.spec, params, x, compute_dtype=jnp.float32)
    assert len(got) == len(ref)
    for lvl, (a, b) in enumerate(zip(got, ref)):
        assert (a is None) == (b is None), lvl
        if a is not None:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, err_msg=f"level {lvl}"
            )


def test_forward_packed_train_grads_c128(rng):
    """Parameter gradients through the packed train forward across the
    64->128->64 boundary (the round-2 TPU train crash path)."""
    from unet_studio_tpu.models.unet3d import UNet3d, forward, forward_packed

    model = UNet3d.create(1, 4, PACKED_ARCH_128, seed=0)
    spec = model.spec
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64, 1)), jnp.float32)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    gs = [
        jnp.asarray(rng.standard_normal((1, 16, 16, 64, 4)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 8, 8, 32, 4)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 4, 4, 16, 4)), jnp.float32),
    ]

    def loss_ref(params):
        outs, _ = forward(spec, params, x, train=True, compute_dtype=jnp.float32)
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs) if o is not None)

    def loss_pk(params):
        outs = forward_packed(
            spec, params, x, compute_dtype=jnp.float32, train=True, remat=True
        )
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs) if o is not None)

    gr = jax.grad(loss_ref)(params)
    gp = jax.grad(loss_pk)(params)
    for k in gr:
        scale = max(float(jnp.max(jnp.abs(gr[k]))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gp[k]),
            np.asarray(gr[k]),
            atol=5e-4 * scale + 2e-3,
            err_msg=k,
        )
