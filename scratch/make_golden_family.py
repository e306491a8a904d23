"""Generate the round-5 golden fixture family (round-4 verdict item 5):
three additional committed end-to-end anchors exercising the DSL paths the
original golden fixture (scratch/make_golden.py) skips:

  golden_bmu — bnorm + max_pool + upsample architecture (main.cpp:157-233
               vocabulary coverage)
  golden_mc  — multi-channel-input model (in_count=2, 4D NIfTI input)
  golden_pp  — preproc-bearing model (preproc='normalize+flip_x'); also
               writes the evaluate-predicted label back as a NIfTI so the
               QC-with-preproc test can assert pipeline self-consistency

Run with the CPU prefix (device work):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scratch/make_golden_family.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from unet_studio_tpu.io.nifti import write_nifti
from unet_studio_tpu.models.serialize import save_model
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.engine.evaluate import EvaluateEngine

FIX = "tests/fixtures"


def nudge(m, seed):
    rng = np.random.default_rng(seed)
    m.params = {
        k: np.asarray(v) + rng.normal(0, 0.02, np.shape(v)).astype(np.float32)
        for k, v in m.params.items()
    }


def ball(n, vs=(1.2, 1.0, 0.9), seed=None):
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32)
    if seed is not None:
        img += np.random.default_rng(seed).normal(0, 0.02, img.shape).astype(np.float32)
        img = np.clip(img, 0, 1)
    return img


def emit(name, model, input_arr, voxel_size=(1.2, 1.0, 0.9)):
    d = os.path.join(FIX, name)
    os.makedirs(d, exist_ok=True)
    save_model(os.path.join(d, "model.nz"), model, sloped=True)
    write_nifti(os.path.join(d, "input.nii.gz"), input_arr, voxel_size=voxel_size)
    # expected outputs from the QUANTIZED (reloaded) model: the sloped .nz
    # codec rounds params, and the test loads from disk — generating from
    # the in-memory params left ~0.1% of boundary voxels flipped
    from unet_studio_tpu.models.serialize import load_model

    model = load_model(os.path.join(d, "model.nz"))
    if name == "golden_bmu":
        model.prepare_for_inference()
    eng = EvaluateEngine(model, compute_dtype=jnp.float32)
    case = next(iter(eng.run([os.path.join(d, "input.nii.gz")])))
    assert not case.error_msg, case.error_msg
    np.savez_compressed(
        os.path.join(d, "expected.npz"),
        label=case.label.astype(np.int16),
        fg_prob=case.fg_prob.astype(np.float32),
    )
    print(
        f"{name}: label hist {np.bincount(case.label.ravel())} "
        f"fg mean {case.fg_prob.mean():.4f}"
    )
    return case


# ---- golden_bmu: bnorm + max_pool + upsample --------------------------------
arch_bmu = "\n".join(
    [
        "conv8,ks3,stride1+bnorm,relu",
        "max_pool+conv16,ks3,stride1+bnorm,relu",
        "max_pool+conv16,ks3,stride1+bnorm,relu+upsample",
        "conv16,ks3,stride1+bnorm,relu+conv3,ks1,stride1+upsample",
        "conv8,ks3,stride1+bnorm,relu+conv3,ks1,stride1",
    ]
)
m = UNet3d.create(1, 3, arch_bmu, seed=7)
m.dim = (16, 16, 16)
nudge(m, 701)
m.prepare_for_inference()
emit("golden_bmu", m, ball(20))

# ---- golden_mc: multi-channel input -----------------------------------------
arch_mc = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)
m = UNet3d.create(2, 3, arch_mc, seed=8)
m.dim = (16, 16, 16)
nudge(m, 801)
vol0 = ball(20)
vol1 = (1.0 - ball(20)).astype(np.float32)
emit("golden_mc", m, np.stack([vol0, vol1]))  # (T=2, D, H, W)

# ---- golden_pp: preproc-bearing model ---------------------------------------
# reuse the base arch body with in_count=1
m = UNet3d.create(1, 3, arch_mc, seed=9)
m.dim = (16, 16, 16)
m.preproc = "normalize+flip_x"
nudge(m, 901)
case = emit("golden_pp", m, (2.0 * ball(20, seed=5)).astype(np.float32))
# evaluate-predicted label as the QC ground-truth input.  Two space fixes:
# (a) QC scores the PLAIN argmax (qc.cpp:101-139), so generate the label
#     with postproc='softmax+argmax' (no create_mask);
# (b) case.label lives in the PREPROCESSED space (save_case undoes only the
#     canonicalize flips, not model preproc) — a QC ground-truth label file
#     is in NATIVE space, so undo the preproc flip_x (x = last axis).
# QC's loader then re-applies the preproc geometry to both volumes,
# restoring alignment.
# The QC pair lives on a native grid IDENTICAL to the model grid (16^3 @
# 1mm): the FOV transform is then the identity, so the model-grid argmax
# QC computes and the native-grid argmax evaluate emits coincide exactly —
# a random-weight model's prediction is high-frequency, and any resample
# roundtrip between mismatched grids decorrelates it.
from unet_studio_tpu.models.serialize import load_model

write_nifti(
    os.path.join(FIX, "golden_pp", "qc_input.nii.gz"),
    (2.0 * ball(16, seed=6)).astype(np.float32),
    voxel_size=(1.0, 1.0, 1.0),
)
m_qc = load_model(os.path.join(FIX, "golden_pp", "model.nz"))
m_qc.postproc = "softmax+argmax"
case_qc = next(
    iter(
        EvaluateEngine(m_qc, compute_dtype=jnp.float32).run(
            [os.path.join(FIX, "golden_pp", "qc_input.nii.gz")]
        )
    )
)
assert not case_qc.error_msg, case_qc.error_msg
# desired CANONICAL-space label: case.label with the preproc flip_x undone
# (x = last axis).  write_nifti's default affine makes canonicalize_lps
# apply flips on read (case.flip_swap records them for this very file), so
# pre-compensate: raw = apply_flip_swap(desired, flips, reverse=True).
from unet_studio_tpu.io.nifti import apply_flip_swap

desired = np.flip(case_qc.label, axis=2).astype(np.int32)
raw = apply_flip_swap(desired, case_qc.flip_swap, reverse=True)
write_nifti(
    os.path.join(FIX, "golden_pp", "label.nii.gz"),
    np.ascontiguousarray(raw),
    voxel_size=(1.0, 1.0, 1.0),
)
print("qc label hist:", np.bincount(case_qc.label.ravel()))
