"""End-to-end: template BIDS dataset -> training (2-device virtual mesh)
-> checkpoint/resume -> evaluation -> qc report.  Tiny shapes (16^3): the
runner is one slow CPU core.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_studio_tpu.data.bids import TrainingDataset, get_bids_pairs
from unet_studio_tpu.engine.evaluate import EvaluateEngine
from unet_studio_tpu.engine.qc import run_qc
from unet_studio_tpu.engine.train import TrainEngine, TrainParam
from unet_studio_tpu.io.nifti import read_nifti, write_nifti
from unet_studio_tpu.models.serialize import load_model, save_model
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.ops.augment import AugOptions
from unet_studio_tpu.parallel.mesh import make_mesh

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)

# cheap augmentation for CPU tests: geometry + zero-background only
FAST_OPTS = AugOptions(
    cropping=0, truncation_z=0, downsample_x=0, downsample_y=0, downsample_z=0,
    noise=0, ambient=0, diffuse=0, specular=0, perspective=0.0,
    lens_distortion=0.0, distortion=0, zero_background=4, rubber_stamping=0,
    perlin_texture=0,
)


def _phantom(n=16):
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    label = (r < n / 3).astype(np.float32)
    label[r < n / 6] = 2.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (label > 0)
    return img, label


@pytest.fixture(scope="module")
def bids_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bids")
    img, label = _phantom()
    write_nifti(str(d / "tpl-A_T1w.nii.gz"), img, is_mni=True)
    write_nifti(str(d / "tpl-A_dseg.nii.gz"), label.astype(np.int16), is_mni=True)
    return str(d)


def test_bids_pairing_and_scan(bids_dir):
    images, labels = get_bids_pairs(bids_dir)
    assert len(images) == 1
    ds = TrainingDataset.scan(images, labels, out_count=3)
    assert ds.is_template == [True]
    assert ds.max_template_label == 2
    assert ds.test_indices == [0]
    assert not ds.has_subject_data


@pytest.mark.slow
def test_train_evaluate_qc_roundtrip(bids_dir, tmp_path):
    images, labels = get_bids_pairs(bids_dir)
    model = UNet3d.create(1, 3, ARCH, seed=0)
    model.dim = (16, 16, 16)
    model_path = str(tmp_path / "m.nz")

    mesh = make_mesh(n_data=2)
    param = TrainParam(
        image_file_name=images,
        label_file_name=labels,
        batch_size=2,
        epoch=4,
        learning_rate=1e-3,
        options=FAST_OPTS,
        compute_dtype="float32",
        remat=False,
    )
    eng = TrainEngine(model, param, mesh=mesh, model_path=model_path)
    eng.start()
    assert not eng.error_msg
    info0 = eng.run_epoch()
    info1 = eng.run_epoch()
    assert len(model.training_errors) == 6
    assert len(model.testing_errors) == 6
    assert all(np.isfinite(model.testing_errors))
    assert info1["epoch"] == 1

    # save + resume: epoch cursor derives from the error history
    eng.sync_params_to_model()
    save_model(model_path, model, sloped=False)
    eng._save_optimizer()
    model2 = load_model(model_path)
    eng2 = TrainEngine(model2, param, mesh=mesh, model_path=model_path)
    eng2.start()
    assert eng2.cur_epoch == 2

    # optimizer-state resume correctness on the mesh: (train 2 + save +
    # resume 2) must be BIT-identical to (train 4) — params and momentum
    # (train.cpp:945-957)
    eng.run_epoch()
    eng.run_epoch()
    eng2.run_epoch()
    eng2.run_epoch()
    for k in eng._params:
        np.testing.assert_array_equal(
            np.asarray(eng._params[k]), np.asarray(eng2._params[k]), err_msg=k
        )
    for k in eng.opt_state["momentum"]:
        np.testing.assert_array_equal(
            np.asarray(eng.opt_state["momentum"][k]),
            np.asarray(eng2.opt_state["momentum"][k]),
            err_msg=k,
        )

    # deterministic stream replay: same seed + epoch -> same batch keys
    b1 = eng._assemble_batch(1)
    b2 = eng2._assemble_batch(1)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(b1[4])), np.asarray(jax.random.key_data(b2[4]))
    )

    # pause lifecycle: cooperative flag + status string (train.hpp:99)
    eng.pause()
    assert eng.paused and "paused" in eng.get_status()
    eng.resume()
    assert not eng.paused

    # evaluation end-to-end on the training image
    ev = EvaluateEngine(model2, compute_dtype=jnp.float32)
    cases = list(ev.run([images[0]]))
    assert len(cases) == 1 and not cases[0].error_msg
    case = cases[0]
    assert case.label.shape == (16, 16, 16)
    assert case.label_prob.shape == (3, 16, 16, 16)
    out = str(tmp_path / "result.nii.gz")
    assert ev.save_case(case, out, output_type=0)
    assert read_nifti(out).data.shape == (16, 16, 16)
    for ot in (1, 2, 3):
        assert ev.save_case(case, str(tmp_path / f"r{ot}.nii.gz"), output_type=ot)

    # qc report
    report = str(tmp_path / "m.error_report.tsv")
    cases = run_qc(model2, images, labels, report, compute_dtype=jnp.float32)
    assert os.path.exists(report)
    lines = open(report).read().strip().split("\n")
    assert lines[0].startswith("image\tground_truth\twrong_ratio")
    assert len(lines) == 2
    assert 0.0 <= cases[0].overall.ratio() <= 1.0


@pytest.mark.slow
def test_mixed_template_subject_training(tmp_path):
    """Templates + subjects: label shifting, subject-only training errors,
    and the logsumexp class-collapse loss path (train.cpp:330-342,673-674)."""
    d = tmp_path / "bids"
    d.mkdir()
    img, label = _phantom()
    write_nifti(str(d / "tpl-A_T1w.nii.gz"), img, is_mni=True)
    write_nifti(str(d / "tpl-A_dseg.nii.gz"), label.astype(np.int16), is_mni=True)
    # subject: NOT MNI-flagged, single foreground class (max label 1)
    write_nifti(str(d / "sub-01_T1w.nii.gz"), img * 0.8, is_mni=False)
    write_nifti(
        str(d / "sub-01_dseg.nii.gz"), (label > 0).astype(np.int16), is_mni=False
    )
    images, labels = get_bids_pairs(str(d))
    assert len(images) == 2

    # out_count must cover template classes (2) + shifted subject class
    model = UNet3d.create(1, 5, ARCH.replace("conv3,ks1,stride1", "conv5,ks1,stride1"), seed=0)
    model.dim = (16, 16, 16)
    ds = TrainingDataset.scan(images, labels, model.out_count)
    assert ds.has_subject_data
    assert ds.max_template_label == 2
    sub = ds.subject_indices[0]
    assert ds.need_shift[sub]

    param = TrainParam(
        image_file_name=images,
        label_file_name=labels,
        batch_size=2,
        epoch=2,
        learning_rate=1e-3,
        options=FAST_OPTS,
        compute_dtype="float32",
        remat=False,
    )
    eng = TrainEngine(model, param, mesh=make_mesh(n_data=2))
    eng.start()
    assert not eng.error_msg
    info = eng.run_epoch()
    assert all(np.isfinite(info["test"]))
    # subject items exist -> training errors recorded from subjects only
    assert len(model.training_errors) == 3
    # subject label was shifted: classes {0 (bg->1 via image>0), 1, 3}
    _, lab = eng._load_item(sub)
    assert set(np.unique(lab)).issubset({0.0, 1.0, 3.0})


@pytest.mark.slow
def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(4)
