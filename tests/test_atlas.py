"""Template/atlas parcellation (engine/atlas.py vs evaluate.cpp:60-179):
reclassification math, corrected-atlas build + cache, coverage-gated
region-grow fill, error paths — on synthetic template/atlas volumes."""

import os

import numpy as np
import pytest

from unet_studio_tpu.engine.atlas import (
    AtlasParcellation,
    reclassify_labels_by_template,
)
from unet_studio_tpu.io.nifti import write_nifti


def test_reclassify_majority_semantics():
    """Each region keeps only voxels of its majority tissue
    (evaluate.cpp:60-110)."""
    template = np.zeros((4, 4, 4), np.uint8)
    template[:, :, :2] = 1  # white matter half
    template[:, :, 2:] = 2  # gray matter half
    atlas = np.zeros((4, 4, 4), np.uint16)
    # region 1 mostly in tissue 1 (12 voxels) with a 4-voxel spill into 2
    atlas[0, :, :2] = 1
    atlas[0, 0, 2:] = 1
    atlas[1, :, 2:] = 2  # region 2 fully tissue 2
    out, erased = reclassify_labels_by_template(template, atlas)
    assert (out[0, :, :2] == 1).all()  # majority voxels kept
    assert (out[0, 0, 2:] == 0).all()  # dissenting voxels zeroed
    assert (out[1, :, 2:] == 2).all()
    assert erased[0] == 2 and erased[1] == 0


def _phantom_assets(tmp_path, n=16):
    """Synthetic tissue template + an atlas parcelling tissue 1 into two
    regions (sharing the template grid/affine)."""
    template = np.zeros((n, n, n), np.int16)
    template[2:14, 2:14, 2:8] = 1
    template[2:14, 2:14, 8:14] = 2
    template[0, 0, 0] = 7  # CSF-ish label, must be zeroed on load
    atlas = np.zeros((n, n, n), np.int16)
    atlas[2:14, 2:8, 2:8] = 1
    atlas[2:14, 8:14, 2:8] = 2
    atlas[2:14, 2:14, 8:14] = 3
    tpl = str(tmp_path / "tissue.nii.gz")
    atl = str(tmp_path / "regions.nii.gz")
    write_nifti(tpl, template, is_mni=True)
    write_nifti(atl, atlas, is_mni=True)
    return tpl, atl, template, atlas


def test_parcellation_build_and_cache(tmp_path):
    tpl, atl, template, atlas = _phantom_assets(tmp_path)
    cache = str(tmp_path / "corrected")
    parc = AtlasParcellation(cache_dir=cache)
    assert parc.load_template(tpl), parc.error_msg
    assert parc.template.max() == 2  # label 7 removed (evaluate.hpp:38)
    assert parc.load_atlas(atl), parc.error_msg
    assert parc.atlas_region_count == 3
    # atlas masked by template; regions agree with their tissues
    assert (parc.atlas[template == 0] == 0).all()
    assert set(np.unique(parc.atlas)) == {0, 1, 2, 3}
    # corrected atlas cached (evaluate.cpp:177)
    cached = os.path.join(cache, "regions.corrected.nii.gz")
    assert os.path.exists(cached)

    # second load takes the cache path and reproduces the same atlas
    parc2 = AtlasParcellation(cache_dir=cache)
    assert parc2.load_template(tpl)
    assert parc2.load_atlas(atl)
    np.testing.assert_array_equal(parc2.atlas, parc.atlas)


def test_region_grow_fills_covered_tissue(tmp_path):
    """A tissue with >75% atlas coverage has its uncovered voxels filled
    by region growing (evaluate.cpp:162-175)."""
    n = 16
    template = np.zeros((n, n, n), np.int16)
    template[2:14, 2:14, 2:10] = 1
    atlas = np.zeros((n, n, n), np.int16)
    atlas[2:14, 2:14, 2:9] = 1  # covers 7/8 of tissue 1 (> 75%)
    tpl = str(tmp_path / "t.nii.gz")
    atl = str(tmp_path / "a.nii.gz")
    write_nifti(tpl, template, is_mni=True)
    write_nifti(atl, atlas, is_mni=True)
    parc = AtlasParcellation(cache_dir=str(tmp_path / "c"))
    assert parc.load_template(tpl)
    assert parc.load_atlas(atl), parc.error_msg
    # the uncovered stripe of tissue 1 got region-grown to region 1
    assert (parc.atlas[template == 1] == 1).all()


def test_load_errors(tmp_path):
    parc = AtlasParcellation(cache_dir=str(tmp_path / "c"))
    assert not parc.load_template(str(tmp_path / "missing.nii.gz"))
    assert parc.error_msg
    tpl, atl, *_ = _phantom_assets(tmp_path)
    parc = AtlasParcellation(cache_dir=str(tmp_path / "c"))
    assert parc.load_template(tpl)
    assert not parc.load_atlas(str(tmp_path / "missing.nii.gz"))
    assert parc.error_msg
