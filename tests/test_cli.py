"""CLI smoke tests (evaluate/qc paths; the train engine is covered by
test_e2e — the CLI train path rounds dims to 32 which is too slow to
compile on the 1-core CI runner)."""

import numpy as np
import pytest

from unet_studio_tpu.cli import build_parser, get_files, main
from unet_studio_tpu.io.nifti import read_nifti, write_nifti
from unet_studio_tpu.models.serialize import save_model
from unet_studio_tpu.models.unet3d import UNet3d

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)


def _phantom(n=16):
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    label = (r < n / 3).astype(np.float32)
    label[r < n / 6] = 2.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (label > 0)
    return img, label


def test_parser_accepts_all_option_flags():
    p = build_parser()
    args = p.parse_args(
        ["--action=train", "--model=m", "--bids=x", "--noise", "4",
         "--noise_mag", "0.3", "--perlin_texture", "0"]
    )
    assert args.noise == 4.0 and args.noise_mag == 0.3


def test_get_files(tmp_path):
    for name in ("a.nii.gz", "b.nii.gz"):
        write_nifti(str(tmp_path / name), np.zeros((4, 4, 4), np.float32))
    assert len(get_files(str(tmp_path))) == 2
    assert len(get_files(str(tmp_path / "*.nii.gz"))) == 2
    assert get_files(str(tmp_path / "a.nii.gz")) == [str(tmp_path / "a.nii.gz")]


@pytest.mark.slow
def test_cli_evaluate_and_qc(tmp_path, capsys):
    img, label = _phantom()
    src = str(tmp_path / "sub-01_T1w.nii.gz")
    write_nifti(src, img, is_mni=True)
    write_nifti(str(tmp_path / "sub-01_dseg.nii.gz"), label.astype(np.int16), is_mni=True)

    m = UNet3d.create(1, 3, ARCH, seed=0)
    m.dim = (16, 16, 16)
    m.single_component_label = [1]
    mp = str(tmp_path / "model.nz")
    save_model(mp, m, sloped=False)

    # qc first: evaluate writes <src>.result.nii.gz, which BIDS prefix
    # matching would (faithfully to the reference) pick up as another pair
    rc = main(
        [
            "--action=qc",
            f"--model={mp}",
            f"--bids={tmp_path}",
            "--compute_dtype=float32",
        ]
    )
    assert rc == 0

    rc = main(
        [
            "--action=evaluate",
            f"--model={mp}",
            f"--source={src}",
            "--output_type=0",
            "--compute_dtype=float32",
            f"--mosaic={tmp_path}/mosaic.png",
        ]
    )
    assert rc == 0
    out = read_nifti(src + ".result.nii.gz")
    assert out.data.shape == (16, 16, 16)
    assert (tmp_path / "mosaic.png").exists()
    report = tmp_path / "model.error_report.tsv"
    assert report.exists()
    lines = report.read_text().strip().split("\n")
    assert len(lines) == 2 and lines[0].startswith("image\t")


def test_cli_train_unreadable_first_pair_clean_error(tmp_path, capsys):
    """A corrupt first label/image must produce the reference's clean
    'cannot load' error and rc=1, not a traceback (train.cpp:1119-1122)."""
    d = tmp_path / "bids"
    d.mkdir()
    (d / "sub-a_T1w.nii.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 50)
    (d / "sub-a_dseg.nii.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 50)
    rc = main([
        "--action", "train", "--model", str(tmp_path / "m.nz"),
        "--bids", str(d), "--batch_size", "1", "--epoch", "1",
    ])
    assert rc == 1
    assert "cannot load" in capsys.readouterr().err


def test_train_engine_run_catches_exceptions(tmp_path):
    """TrainEngine.run must convert a mid-training failure into
    error_msg + aborted (train.cpp:709-721), not an escaping exception."""
    from unet_studio_tpu.engine.train import TrainEngine

    eng = TrainEngine.__new__(TrainEngine)
    eng.cur_epoch = 0
    eng.aborted = False
    eng.paused = False
    eng.error_msg = ""

    class _P:
        epoch = 3

    eng.param = _P()

    def boom():
        raise RuntimeError("disk on fire")

    eng.run_epoch = boom
    eng.run(chart=False)
    assert eng.aborted
    assert "disk on fire" in eng.error_msg
