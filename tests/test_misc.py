import numpy as np
import pytest

import jax.numpy as jnp

from unet_studio_tpu.config.options import (
    OPTION_TABLE,
    POSTPROC_TABLE,
    default_option_values,
    parse_option_line,
)
from unet_studio_tpu.config.session import Settings, load_session, save_session
from unet_studio_tpu.models.surgery import pad_out_count, reorder_output_channels
from unet_studio_tpu.models.unet3d import UNet3d, round_up_size
from unet_studio_tpu.ops.augment import AugOptions

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)


def test_option_table_matches_aug_options():
    """Every AugOptions field is an option id and defaults agree
    (options.txt parity)."""
    defaults = default_option_values()
    aug = AugOptions().to_dict()
    for k, v in aug.items():
        assert k in defaults, f"option id {k} missing from table"
        assert float(defaults[k]) == float(v), f"default mismatch for {k}"
    assert len(OPTION_TABLE) == 39  # == reference options.txt line count
    assert len(POSTPROC_TABLE) == 18


def test_parse_option_line():
    item = parse_option_line(
        "Reduction/Noise/noise/Off:25%:50%:75%:On/2/add uniform noise"
    )
    assert item.id == "noise" and item.kind == "prob" and item.default == 2
    item = parse_option_line(
        "Reduction/M/noise_mag/float:0.0:1.0:0.1:2/0.2/magnitude"
    )
    assert item.kind == "float" and item.maximum == 1.0 and item.decimals == 2


def test_round_up_size():
    assert round_up_size((181, 217, 181), 32) == (192, 224, 192)
    assert round_up_size((192, 224, 192), 32) == (192, 224, 192)


def test_reorder_output_channels(rng):
    m = UNet3d.create(1, 3, ARCH, seed=0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    base = np.asarray(m(x)[0])
    m2 = reorder_output_channels(m, [2, 0, 1])
    out = np.asarray(m2(x)[0])
    np.testing.assert_allclose(out[..., 0], base[..., 2], rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], base[..., 0], rtol=1e-5)
    with pytest.raises(ValueError):
        reorder_output_channels(m, [0, 0, 1])


def test_pad_out_count(rng):
    m = UNet3d.create(1, 3, ARCH, seed=0)
    m2 = pad_out_count(m, 5)
    assert m2.out_count == 5
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 1)).astype(np.float32))
    base = np.asarray(m(x)[0])
    out = np.asarray(m2(x)[0])
    # old class channels produce identical logits
    np.testing.assert_allclose(out[..., :3], base, rtol=1e-5, atol=1e-6)


def test_session_roundtrip(tmp_path):
    p = str(tmp_path / "sess.json")
    save_session(
        p,
        images=["a.nii.gz"],
        labels=["a_dseg.nii.gz"],
        model_path="m.nz",
        batch_size=8,
        learning_rate=1e-3,
        epoch=100,
        options={"noise": 4},
    )
    s = load_session(p)
    assert s["images"] == ["a.nii.gz"]
    assert s["options"]["noise"] == 4

    cfg = Settings(path=str(tmp_path / "settings.json"))
    cfg.set("last_network", "human.t1w.seg5")
    cfg.save()
    cfg2 = Settings(path=str(tmp_path / "settings.json"))
    assert cfg2.value("last_network") == "human.t1w.seg5"


def test_match_files_rename_by_example():
    """tipl::match_files contract (mainwindow_evaluation.cpp:394): the
    differing token between two source names maps the example output
    name onto every other case."""
    from unet_studio_tpu.utils.match import match_files

    assert (
        match_files("/d/sub-01_T1w.nii.gz", "/o/sub-01_mask.nii.gz",
                    "/d/sub-02_T1w.nii.gz")
        == "/o/sub-02_mask.nii.gz"
    )
    # token in directory AND basename: basename match wins
    assert (
        match_files("/d/a/T1w.nii.gz", "/d/a/a_out.nii.gz", "/d/b/T1w.nii.gz")
        == "/d/a/b_out.nii.gz"
    )
    # same file: output name passes through
    assert match_files("x.nii", "y.nii", "x.nii") == "y.nii"
    # no consistent rewrite
    assert match_files("ab.nii", "out.nii", "ac.nii") is None
