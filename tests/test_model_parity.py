"""Numerical parity of the JAX U-Net against a LibTorch-semantics replica.

The reference has no tests; parity against torch modules (same semantics
as unet.cpp:24-101) is our golden check for the DSL parser, layer
numerics, and the torch-order parameter mapping that underlies the .nz
positional tensor format.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from unet_studio_tpu.models.dsl import default_architecture, parse_architecture
from unet_studio_tpu.models.serialize import load_model, save_model
from unet_studio_tpu.models.unet3d import (
    UNet3d,
    forward,
    init_state,
    param_order,
    torch_to_jax,
)

SMALL_ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1",
    ]
)

POOL_ARCH = "\n".join(
    [
        "conv8,ks3,stride1,relu",
        "max_pool+conv16,ks3,stride1+bnorm,elu",
        "max_pool+conv16,ks3,stride1+norm,leaky_relu+upsample+conv16,ks3,stride1",
        "conv16,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1+upsample+conv8,ks3,stride1",
        "conv8,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1",
    ]
)


# --- torch replica of unet.cpp:24-193 (test scaffolding) -------------------


def _torch_layer(token: str, in_c: int):
    params = {}
    for word in token.split(","):
        import re

        m = re.match(r"^([a-z_]+)(\d*)$", word)
        params[m.group(1)] = int(m.group(2)) if m.group(2) else 1
    mods, out_c = [], in_c
    if "max_pool" in params:
        mods.append(nn.MaxPool3d(2, stride=2))
    elif "upsample" in params:
        mods.append(nn.Upsample(scale_factor=2.0, mode="nearest"))
    elif "conv_trans" in params:
        out_c = params["conv_trans"]
        mods.append(nn.ConvTranspose3d(in_c, out_c, 2, stride=2))
    elif "conv" in params:
        out_c = params["conv"]
        ks = params.get("ks", 3)
        stride = params.get("stride", 1)
        mods.append(nn.Conv3d(in_c, out_c, ks, stride=stride, padding=(ks - 1) // 2))
    elif "norm" in params:
        mods.append(nn.InstanceNorm3d(in_c, affine=True))
    elif "bnorm" in params:
        # reference uses eps=0 (unet.cpp:83); this torch build rejects 0 in
        # training mode, 1e-12 is numerically identical at our tolerances
        mods.append(nn.BatchNorm3d(in_c, affine=True, track_running_stats=True, eps=1e-12))
    if "relu" in params:
        mods.append(nn.ReLU())
    elif "leaky_relu" in params:
        mods.append(nn.LeakyReLU(0.01))
    elif "elu" in params:
        mods.append(nn.ELU())
    return mods, out_c


class TorchUNet(nn.Module):
    def __init__(self, in_count, out_count, architecture):
        super().__init__()
        lines = [ln for ln in architecture.split("\n") if ln.strip()]
        enc_count = len(lines) // 2 + 1
        enc_lines, dec_lines = lines[:enc_count], lines[enc_count:]
        self.encoding, self.decoding, self.output, self.decoding_tail = [], [], [], []
        channel = in_count
        skip_channels = []
        for level, line in enumerate(enc_lines):
            seq = nn.Sequential()
            for token in line.split("+"):
                mods, channel = _torch_layer(token, channel)
                for m in mods:
                    seq.append(m)
            self.add_module(f"encode{level}", seq)
            self.encoding.append(seq)
            skip_channels.append(channel)
        n_dec = len(dec_lines)
        self.decoding = [None] * n_dec
        self.output = [None] * n_dec
        self.decoding_tail = [None] * n_dec
        out_token = dec_lines[-1].split("+")[-1]
        for level in range(n_dec - 1, -1, -1):
            tokens = dec_lines[n_dec - 1 - level].split("+")
            channel += skip_channels[level]
            body, tail, head = nn.Sequential(), nn.Sequential(), nn.Sequential()
            after = False
            for token in tokens:
                if token == out_token:
                    mods, _ = _torch_layer(token, channel)
                    for m in mods:
                        head.append(m)
                    after = True
                    continue
                mods, channel = _torch_layer(token, channel)
                for m in mods:
                    (tail if after else body).append(m)
            self.decoding[level] = body
            self.output[level] = head
            self.decoding_tail[level] = tail
            self.add_module(f"decode{level}", body)
            if len(head):
                self.add_module(f"output{level}", head)
            if len(tail):
                self.add_module(f"decode_tail{level}", tail)

    def forward(self, x):
        skips = []
        n_enc = len(self.encoding)
        for level in range(n_enc):
            x = self.encoding[level](x)
            if level < n_enc - 1:
                skips.append(x)
        results = [None] * len(self.decoding)
        for level in range(n_enc - 2, -1, -1):
            x = torch.cat([skips[level], x], dim=1)
            x = self.decoding[level](x)
            if len(self.output[level]):
                results[level] = self.output[level](x)
            if len(self.decoding_tail[level]):
                x = self.decoding_tail[level](x)
        return results


def _copy_torch_params(tm: TorchUNet, spec):
    """Positional copy exactly as load_from_file does (main.cpp:193-204)."""
    torch_params = list(tm.parameters())
    order = param_order(spec)
    assert len(torch_params) == len(order), (
        f"param count mismatch: torch {len(torch_params)} vs ours {len(order)}"
    )
    params = {}
    for (name, layer, which), tp in zip(order, torch_params):
        tnp = tp.detach().numpy()
        assert tnp.shape == tuple(
            __import__(
                "unet_studio_tpu.models.unet3d", fromlist=["torch_param_shape"]
            ).torch_param_shape(layer, which)
        ), f"{name}: torch {tnp.shape}"
        params[name] = jnp.asarray(torch_to_jax(layer, which, tnp))
    return params


@pytest.mark.parametrize("arch", [SMALL_ARCH, POOL_ARCH])
def test_forward_parity(arch, rng):
    torch.manual_seed(0)
    tm = TorchUNet(1, 4, arch).eval()
    spec = parse_architecture(1, 4, arch)
    params = _copy_torch_params(tm, spec)

    x = rng.standard_normal((1, 1, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))
    j_out, _ = forward(
        spec, params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False,
        state=init_state(spec),
    )
    assert len(t_out) == len(j_out)
    for lvl, (t, j) in enumerate(zip(t_out, j_out)):
        if t is None:
            assert j is None
            continue
        t = t.numpy()
        j = np.asarray(j).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(j, t, rtol=2e-4, atol=2e-5, err_msg=f"level {lvl}")


def test_forward_parity_train_mode_bnorm(rng):
    """bnorm uses batch stats in training mode (eps=0)."""
    torch.manual_seed(1)
    tm = TorchUNet(1, 4, POOL_ARCH).train()
    spec = parse_architecture(1, 4, POOL_ARCH)
    params = _copy_torch_params(tm, spec)
    x = rng.standard_normal((2, 1, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x))
    j_out, new_state = forward(
        spec, params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=True,
        state=init_state(spec),
    )
    np.testing.assert_allclose(
        np.asarray(j_out[0]).transpose(0, 4, 1, 2, 3),
        t_out[0].numpy(),
        rtol=2e-4,
        atol=2e-5,
    )
    assert any(k.endswith(".mean") for k in new_state)


def test_default_architecture_builds():
    spec = parse_architecture(1, 4, default_architecture(4))
    assert len(spec.encoders) == 6
    assert len(spec.decoders) == 5
    assert all(len(h) == 1 for h in spec.heads)  # deep supervision at all 5
    assert len(spec.tails[0]) == 0  # last level has no upsampler
    # 5 deep supervision head outputs
    m = UNet3d.create(1, 4, default_architecture(4), seed=0)
    x = jnp.zeros((1, 32, 32, 32, 1))
    outs = m(x)
    assert len(outs) == 5
    assert outs[0].shape == (1, 32, 32, 32, 4)
    assert outs[4].shape == (1, 2, 2, 2, 4)


def test_invalid_architectures():
    with pytest.raises(ValueError):
        parse_architecture(1, 2, "conv8\nconv8")  # <3 lines
    with pytest.raises(ValueError):
        parse_architecture(1, 2, "conv8,ks5\nconv8\nconv8,ks1,stride1")  # bad ks
    with pytest.raises(ValueError):
        parse_architecture(1, 2, "wat8\nconv8\nconv2,ks1,stride1")


def test_nz_roundtrip_preserves_forward(tmp_path, rng):
    m = UNet3d.create(2, 3, SMALL_ARCH, seed=3)
    m.voxel_size = np.array([0.5, 0.5, 0.5], np.float32)
    m.dim = (32, 64, 32)
    m.single_component_label = [1, 2]
    m.testing_errors = [0.5, 0.4, 0.3]
    p = str(tmp_path / "model.nz")
    save_model(p, m, sloped=False)
    m2 = load_model(p)
    assert m2.in_count == 2 and m2.out_count == 3
    assert m2.dim == (32, 64, 32)
    assert m2.single_component_label == [1, 2]
    assert m2.fov_strategy == "align_top"
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)).astype(np.float32))
    o1 = m(x)
    o2 = m2(x)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), rtol=1e-6)


def test_nz_sloped_roundtrip_close(tmp_path, rng):
    m = UNet3d.create(1, 2, SMALL_ARCH, seed=4)
    p = str(tmp_path / "model_sloped.nz")
    save_model(p, m, sloped=True)
    m2 = load_model(p)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    o1 = np.asarray(m(x)[0])
    o2 = np.asarray(m2(x)[0])
    # 8-bit quantization of weights: outputs close but not identical
    assert np.abs(o1 - o2).mean() < 0.05 * (np.abs(o1).mean() + 1e-6) + 0.05


def test_copy_from(rng):
    a = UNet3d.create(1, 2, SMALL_ARCH, seed=1)
    b = UNet3d.create(1, 2, SMALL_ARCH, seed=2)
    b.copy_from(a)
    for k in a.params:
        np.testing.assert_array_equal(np.asarray(a.params[k]), np.asarray(b.params[k]))
