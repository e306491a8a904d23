import numpy as np
import pytest
from scipy import ndimage

from unet_studio_tpu.ops.morphology import (
    apply_single_component,
    connected_components,
    defragment_by_size_ratio,
    fill_and_smooth_labels,
    largest_component,
)
from unet_studio_tpu.utils.native import cc3d_label


def _random_mask(rng, n=24, p=0.3):
    return (rng.random((n, n, n)) < p).astype(np.uint8)


def test_native_matches_scipy(rng):
    for p in (0.1, 0.3, 0.5):
        mask = _random_mask(rng, p=p)
        native = cc3d_label(mask)
        assert native is not None, "native build failed"
        labels, counts = native
        ref_labels, ref_n = ndimage.label(
            mask, structure=ndimage.generate_binary_structure(3, 1)
        )
        assert labels.max() == ref_n
        assert (labels > 0).sum() == (ref_labels > 0).sum()
        # same partition: each native component maps to exactly one scipy one
        for lab in range(1, labels.max() + 1):
            sel = labels == lab
            assert len(np.unique(ref_labels[sel])) == 1
        np.testing.assert_array_equal(
            np.sort(counts[1:]), np.sort(np.bincount(ref_labels.reshape(-1))[1:])
        )


def test_largest_component():
    mask = np.zeros((10, 10, 10), bool)
    mask[1:3, 1:3, 1:3] = True  # 8 voxels
    mask[6:9, 6:9, 6:9] = True  # 27 voxels
    keep = largest_component(mask)
    assert keep.sum() == 27
    assert keep[7, 7, 7] and not keep[1, 1, 1]


def test_defragment_by_size_ratio():
    mask = np.zeros((10, 10, 10), bool)
    mask[0:5, 0:5, 0:5] = True  # 125 voxels
    mask[8, 8, 8] = True  # 1 voxel fragment
    out = defragment_by_size_ratio(mask, size_ratio=0.05)
    assert out.sum() == 125


def test_apply_single_component():
    vol = np.zeros((10, 10, 10), np.int32)
    vol[1:3, 1:3, 1:3] = 1
    vol[7:9, 7:9, 7:9] = 1  # same class, equal size: one survives
    vol[5, 5, 5] = 2
    out = apply_single_component(vol, [1])
    assert (out == 1).sum() == 8
    assert (out == 2).sum() == 1


def test_fill_and_smooth_labels():
    mask = np.zeros((12, 12, 12), bool)
    mask[2:10, 2:10, 2:10] = True
    atlas = np.zeros((12, 12, 12), np.int32)
    atlas[2:10, 2:6, 2:10] = 1
    atlas[2:10, 6:8, 2:10] = 0  # hole inside the mask
    atlas[2:10, 8:10, 2:10] = 2
    out = fill_and_smooth_labels(mask, atlas)
    assert (out[mask] == 0).sum() == 0  # all mask voxels labeled
    assert set(np.unique(out[mask])).issubset({1, 2})
