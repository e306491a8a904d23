"""BIDS-style dataset discovery and label bookkeeping
(reference: train.cpp:182-257, 259-343).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import numpy as np

from ..io.nifti import canonicalize_lps, read_nifti

DSEG_SUFFIX = "_dseg.nii.gz"


def get_bids_pairs(bids: str) -> tuple[list[str], list[str]]:
    """For each comma-separated root, match every ``*_dseg.nii.gz`` label to
    all sibling images sharing its prefix (train.cpp:182-227)."""
    images, labels = [], []
    for root in bids.split(","):
        root = root.strip()
        if not os.path.isdir(root):
            raise FileNotFoundError(f"invalid BIDS directory: {root}")
        files = sorted(glob.glob(os.path.join(root, "**", "*.nii.gz"), recursive=True))
        matched = 0
        for label in files:
            if not label.endswith(DSEG_SUFFIX):
                continue
            prefix = label[: -len(DSEG_SUFFIX)]
            for image in files:
                if image != label and image.startswith(prefix):
                    images.append(image)
                    labels.append(label)
                    matched += 1
    if not images:
        raise FileNotFoundError("no image/label pairs found")
    return images, labels


def read_label_info(path: str) -> tuple[bool, int]:
    """(is_template, max_label): a label is a template iff its NIfTI is
    flagged MNI space (train.cpp:229-246)."""
    img = read_nifti(path)
    return img.is_mni, int(np.max(img.data))


def shift_subject_label(image: np.ndarray, label: np.ndarray, max_template_label: int):
    """Offset subject labels past the template classes; untouched foreground
    becomes class 1 (train.cpp:248-257)."""
    out = np.where(label != 0, label + max_template_label, (image > 0).astype(label.dtype))
    return out


@dataclass
class TrainingDataset:
    """Classified training pairs + the sampling policy of the reference's
    reader thread (train.cpp:259-443)."""

    images: list[str]
    labels: list[str]
    is_template: list[bool] = field(default_factory=list)
    need_shift: list[bool] = field(default_factory=list)
    max_template_label: int = 0
    template_indices: list[int] = field(default_factory=list)
    subject_indices: list[int] = field(default_factory=list)
    test_indices: list[int] = field(default_factory=list)
    errors: dict[int, str] = field(default_factory=dict)

    @classmethod
    def scan(
        cls,
        images: list[str],
        labels: list[str],
        out_count: int,
        strict: bool = True,
    ) -> "TrainingDataset":
        """``strict=False`` records unreadable labels in ``ds.errors`` and
        classifies them as non-template instead of raising — QC keeps going
        past a bad pair (qc.cpp:305-315); training keeps the hard error."""
        ds = cls(images=list(images), labels=list(labels))
        info: dict[str, tuple[bool, int]] = {}
        failed: dict[str, str] = {}
        for lbl in labels:
            if lbl in info:
                continue
            try:
                info[lbl] = read_label_info(lbl)
            except Exception as e:  # noqa: BLE001
                if strict:
                    raise
                info[lbl] = (False, 0)
                failed[lbl] = str(e)
        ds.errors = {i: failed[lbl] for i, lbl in enumerate(labels) if lbl in failed}
        max_template_label = 0
        for i, lbl in enumerate(labels):
            is_template, max_label = info[lbl]
            ds.is_template.append(is_template)
            if is_template:
                max_template_label = max(max_template_label, max_label)
                ds.template_indices.append(i)
            else:
                ds.subject_indices.append(i)
        if not ds.template_indices or max_template_label == 0:
            # no template label found: default 5 regions (train.cpp:311-314)
            max_template_label = 5
        ds.max_template_label = max_template_label
        for i, lbl in enumerate(labels):
            is_template, max_label = info[lbl]
            ds.need_shift.append(
                (not is_template)
                and max_label < max_template_label
                and max_label + max_template_label < out_count
            )
        # validation set: the 2 largest template files (train.cpp:345-357)
        by_size = sorted(
            ds.template_indices,
            key=lambda i: os.path.getsize(images[i]),
            reverse=True,
        )
        ds.test_indices = by_size[:2]
        return ds

    @property
    def has_subject_data(self) -> bool:
        return bool(self.subject_indices)

    def sample_index(self, rng: np.random.Generator, slot_in_batch: int, batch_size: int) -> int:
        """The reference's batch mix: the first ``len(template_indices)``
        slots of each batch draw templates, the rest subjects
        (train.cpp:395-398)."""
        use_template = (not self.subject_indices) or (
            slot_in_batch % batch_size < len(self.template_indices)
        )
        pool = self.template_indices if use_template else self.subject_indices
        return pool[int(rng.integers(0, len(pool)))]


_GEOMETRIC_PREPROC = (
    "flip_x", "flip_y", "flip_z", "swap_xy", "swap_yz", "swap_xz",
    "upsampling", "downsampling",
)


def _apply_preproc_pair(data, ldata, preproc: str):
    """Apply a model's preproc chain to a native-grid (image, label) pair
    BEFORE the model-grid resample — the same per-volume operations the
    evaluate engine applies to its inputs (engine/evaluate.py preprocess;
    evaluate.cpp:5-17 vocabulary).  Geometric ops transform BOTH volumes
    (the label must stay aligned); intensity ops transform the image only.
    Label downsampling is nearest (a mean over labels is meaningless)."""
    from ..engine.evaluate import run_preproc_op

    for op in filter(None, preproc.split("+")):
        data = run_preproc_op(data, op)
        if op in _GEOMETRIC_PREPROC:
            if op == "downsampling":
                d, h, w = (s // 2 * 2 for s in ldata.shape)
                ldata = np.ascontiguousarray(ldata[:d:2, :h:2, :w:2])
            else:
                ldata = run_preproc_op(ldata, op)
    return data, ldata


def load_pair_on_model_grid(
    image_path: str,
    label_path: str,
    model_dim_xyz,
    model_vs,
    preproc: str = "",
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side load of one (image, label) pair resampled onto the model
    grid with align-top FOV (read_image_and_label, train.cpp:13-40).

    ``preproc``: optional '+'-joined preproc chain applied to the native
    volumes first (QC on preproc-bearing models routes through the same
    operations as evaluation).  As in the evaluate engine, the voxel size
    is NOT rescaled by up/downsampling ops (engine/evaluate.py preprocess
    keeps ``image_vs`` at the native value).

    Returns (image (D,H,W) normalized to [0,1], label (D,H,W) float32,
    majority-resampled).  Uses the jitted device resampler.
    """
    import jax.numpy as jnp

    from ..ops.resample import resample_to_model_grid

    img = canonicalize_lps(read_nifti(image_path))
    lbl = canonicalize_lps(read_nifti(label_path))
    data = img.data.astype(np.float32)
    if data.ndim == 4:
        data = data[0]
    ldata = lbl.data.astype(np.float32)
    if ldata.ndim == 4:
        ldata = ldata[0]
    if ldata.shape != data.shape:
        raise ValueError(
            f"label grid {ldata.shape} != image grid {data.shape} "
            f"({label_path} vs {image_path})"
        )
    if preproc:
        data, ldata = _apply_preproc_pair(data, ldata, preproc)
    out_img = np.array(
        resample_to_model_grid(jnp.asarray(data), img.voxel_size, model_dim_xyz, model_vs)
    )
    mx = out_img.max()
    if mx > 0:
        out_img /= mx
    out_lbl = np.asarray(
        resample_to_model_grid(
            jnp.asarray(ldata), img.voxel_size, model_dim_xyz, model_vs, method="majority"
        )
    )
    return out_img.astype(np.float32), out_lbl.astype(np.float32)
