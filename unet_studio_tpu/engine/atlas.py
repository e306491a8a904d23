"""Template/atlas parcellation (reference: evaluate.hpp:26-41,
evaluate.cpp:60-179).

* ``load_template``: tissue segmentation template; CSF labels (>=5) zeroed.
* ``load_atlas``: resample the atlas into template space (majority),
  mask it by the template, reclassify each atlas region to its majority
  tissue (zeroing dissenting voxels), then region-grow fill tissues with
  > 75% atlas coverage; the corrected atlas is cached to
  ``corrected_atlas/<name>.corrected.nii.gz``.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..io.nifti import read_nifti, write_nifti
from ..ops.morphology import fill_and_smooth_labels
from ..ops.resample import resample_affine

TISSUE_NAMES = (
    "background",
    "white matter",
    "gray matter",
    "cerebellar gray matter",
    "subcortical",
)
TEMPLATE_REGION_COUNT = 5


def reclassify_labels_by_template(template: np.ndarray, atlas: np.ndarray):
    """Zero atlas voxels whose tissue class disagrees with the region's
    majority tissue (evaluate.cpp:60-110)."""
    n_tissue = int(template.max()) + 1
    n_regions = int(atlas.max())
    if n_regions == 0:
        return atlas, []
    a = atlas.reshape(-1).astype(np.int64)
    t = template.reshape(-1).astype(np.int64)
    sel = (a > 0) & (t < n_tissue)
    votes = np.bincount(
        a[sel] * n_tissue + t[sel], minlength=(n_regions + 1) * n_tissue
    ).reshape(n_regions + 1, n_tissue)
    majority = votes.argmax(axis=1)
    majority[0] = 0
    erase = (a > 0) & (t != majority[a])
    out = atlas.copy()
    out.reshape(-1)[erase] = 0
    erased_counts = np.bincount(a[erase], minlength=n_regions + 1)[1:]
    return out, erased_counts.tolist()


class AtlasParcellation:
    def __init__(self, cache_dir: str = "corrected_atlas"):
        self.cache_dir = cache_dir
        self.template = None  # (D,H,W) uint8 tissue labels
        self.template_vs = None
        self.template_affine = None
        self.atlas = None  # (D,H,W) uint16 region labels
        self.atlas_region_count = 0
        self.error_msg = ""

    def load_template(self, path: str) -> bool:
        try:
            img = read_nifti(path)
        except Exception as e:  # noqa: BLE001
            self.error_msg = str(e)
            return False
        t = img.data.astype(np.int32)
        t[t >= TEMPLATE_REGION_COUNT] = 0  # remove CSF (evaluate.hpp:38)
        self.template = t.astype(np.uint8)
        self.template_vs = img.voxel_size
        self.template_affine = img.affine
        return True

    def _resample_to_template(self, img) -> np.ndarray:
        """Majority-resample an atlas NIfTI onto the template grid using the
        two sform affines (template voxel -> world -> atlas voxel)."""
        def h4(a):
            a = np.asarray(a, np.float64)
            if a.shape == (4, 4):
                return a
            return np.vstack([a, [0, 0, 0, 1]])

        A_tpl = h4(self.template_affine)
        A_atl = h4(img.affine)
        M = np.linalg.inv(A_atl) @ A_tpl
        mat34 = M[:3, :].astype(np.float32)
        out = resample_affine(
            jnp.asarray(img.data.astype(np.float32)),
            jnp.asarray(mat34),
            self.template.shape,
            method="majority",
        )
        return np.asarray(out).astype(np.uint16)

    def load_atlas(self, path: str) -> bool:
        base = os.path.basename(path)
        for suffix in (".nii.gz", ".nii"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
        corrected = os.path.join(self.cache_dir, base + ".corrected.nii.gz")
        if os.path.exists(corrected):
            self.atlas = self._resample_to_template(read_nifti(corrected))
            self.atlas_region_count = int(self.atlas.max())
            return True
        try:
            img = read_nifti(path)
        except Exception as e:  # noqa: BLE001
            self.error_msg = str(e)
            return False
        atlas = self._resample_to_template(img)
        self.atlas_region_count = int(atlas.max())
        atlas[self.template == 0] = 0

        # per-tissue atlas coverage (evaluate.cpp:141-155)
        coverage = np.zeros(TEMPLATE_REGION_COUNT)
        for tissue in range(1, TEMPLATE_REGION_COUNT):
            total = int((self.template == tissue).sum())
            if total:
                coverage[tissue] = float(
                    ((atlas > 0) & (self.template == tissue)).sum()
                ) / total

        atlas, _ = reclassify_labels_by_template(self.template, atlas)

        # region-grow fill for well-covered tissues (evaluate.cpp:162-175)
        for tissue in range(1, TEMPLATE_REGION_COUNT):
            if coverage[tissue] <= 0.75:
                continue
            atlas = fill_and_smooth_labels(self.template == tissue, atlas)

        os.makedirs(self.cache_dir, exist_ok=True)
        write_nifti(
            corrected,
            atlas.astype(np.uint16),
            self.template_vs,
            self.template_affine,
            is_mni=True,
        )
        self.atlas = atlas
        return True
