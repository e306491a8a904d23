"""Tests for contrast simulation and visual-perception augmentation.

Volumes are tiny (<=16^3): the test runner is a single slow CPU core and
these checks are about semantics, not throughput.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation
from unet_studio_tpu.ops.simulate import (
    gaussian3,
    simulate_modality_subject,
    simulate_modality_template,
)


def _phantom(n=16):
    """Ball phantom: label 1 inside radius n/3, intensity ramp."""
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    label = (r < n / 3).astype(np.float32)
    label[r < n / 6] = 2.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (label > 0)
    return img, label


IDENTITY_OPTS = AugOptions(
    cropping=0,
    truncation_z=0,
    downsample_x=0,
    downsample_y=0,
    downsample_z=0,
    noise=0,
    ambient=0,
    diffuse=0,
    specular=0,
    translocation_ratio=0.0,
    rotation_x=0.0,
    rotation_y=0.0,
    rotation_z=0.0,
    scaling_up=1.0,
    scaling_down=1.0,
    aspect_ratio=1.0,
    perspective=0.0,
    lens_distortion=0.0,
    distortion=0,
    zero_background=0,
    rubber_stamping=0,
    perlin_texture=0,
)


class TestSimulate:
    def test_template_range_and_mask(self):
        img, label = _phantom()
        out = np.asarray(
            simulate_modality_template(
                jnp.asarray(img), jnp.asarray(label), 3, jax.random.key(0)
            )
        )
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        # voxels <= 0.02 stay 0 (train.cpp:86-90)
        np.testing.assert_array_equal(out[img <= 0.02], 0.0)
        # foreground spans to ~1 after renormalization
        assert out[label > 0].max() > 0.99

    def test_template_deterministic_and_key_dependent(self):
        img, label = _phantom()
        a = np.asarray(
            simulate_modality_template(jnp.asarray(img), jnp.asarray(label), 3, jax.random.key(1))
        )
        b = np.asarray(
            simulate_modality_template(jnp.asarray(img), jnp.asarray(label), 3, jax.random.key(1))
        )
        c = np.asarray(
            simulate_modality_template(jnp.asarray(img), jnp.asarray(label), 3, jax.random.key(2))
        )
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 1e-3

    def test_subject_variant(self):
        img, _ = _phantom()
        out = np.asarray(simulate_modality_subject(jnp.asarray(img), jax.random.key(0)))
        assert out.min() >= 0.0 and out.max() <= 1.0
        np.testing.assert_array_equal(out[img <= 0.02], 0.0)

    def test_gaussian3_smooths(self, rng):
        v = rng.standard_normal((8, 8, 8)).astype(np.float32)
        s = np.asarray(gaussian3(jnp.asarray(v)))
        assert s.shape == v.shape
        assert s.std() < v.std()
        # constant volume is invariant (kernel sums to 1 with edge replication)
        c = np.full((8, 8, 8), 3.5, np.float32)
        np.testing.assert_allclose(np.asarray(gaussian3(jnp.asarray(c))), c, rtol=1e-6)


class TestAugment:
    def test_identity_options_passthrough(self):
        img, label = _phantom()
        im = jnp.asarray(img[..., None])
        out_img, out_label = visual_perception_augmentation(
            im, jnp.asarray(label), jax.random.key(0), IDENTITY_OPTS, True
        )
        # geometry is identity; step 7 normalizes (max is already 1 here)
        np.testing.assert_allclose(np.asarray(out_img)[..., 0], img, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out_label), label)

    def test_default_options_run_and_valid(self):
        img, label = _phantom()
        out_img, out_label = visual_perception_augmentation(
            jnp.asarray(img[..., None]),
            jnp.asarray(label),
            jax.random.key(3),
            AugOptions(),
            True,
        )
        out_img, out_label = np.asarray(out_img), np.asarray(out_label)
        assert out_img.shape == img.shape + (1,)
        assert out_label.shape == label.shape
        assert np.isfinite(out_img).all()
        assert out_img.min() >= 0.0 and out_img.max() <= 1.0 + 1e-6
        # majority-sampled labels take only original values
        assert set(np.unique(out_label)).issubset({0.0, 1.0, 2.0})

    def test_deterministic_per_key(self):
        img, label = _phantom()
        args = (jnp.asarray(img[..., None]), jnp.asarray(label))
        a = visual_perception_augmentation(*args, jax.random.key(7), AugOptions(), True)
        b = visual_perception_augmentation(*args, jax.random.key(7), AugOptions(), True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        c = visual_perception_augmentation(*args, jax.random.key(8), AugOptions(), True)
        assert np.abs(np.asarray(a[0]) - np.asarray(c[0])).max() > 1e-4

    def test_zero_background_always(self):
        img, label = _phantom()
        opts = AugOptions(**{**IDENTITY_OPTS.to_dict(), "zero_background": 4})
        out_img, out_label = visual_perception_augmentation(
            jnp.asarray(img[..., None]), jnp.asarray(label), jax.random.key(0), opts, True
        )
        out_img, out_label = np.asarray(out_img), np.asarray(out_label)
        np.testing.assert_array_equal(out_img[out_label == 0], 0.0)

    def test_truncation_zeroes_slabs(self):
        img, label = _phantom()
        opts = AugOptions(**{**IDENTITY_OPTS.to_dict(), "truncation_z": 4})
        # try a few keys; at least one should truncate a nonzero slab
        hit = False
        for seed in range(4):
            out_img, out_label = visual_perception_augmentation(
                jnp.asarray(img[..., None]), jnp.asarray(label),
                jax.random.key(seed), opts, True,
            )
            ol = np.asarray(out_label)
            if (ol.sum(axis=(1, 2)) == 0).any() and ol.sum() < label.sum():
                hit = True
                break
        assert hit

    def test_geometry_moves_label_coherently(self):
        """Image and label must be warped by the same field."""
        img, label = _phantom()
        opts = AugOptions(
            **{
                **IDENTITY_OPTS.to_dict(),
                "translocation_ratio": 0.1,
                "rotation_x": 0.3,
                "rotation_y": 0.3,
                "rotation_z": 0.3,
            }
        )
        out_img, out_label = visual_perception_augmentation(
            jnp.asarray(img[..., None]), jnp.asarray(label), jax.random.key(5), opts, True
        )
        out_img, out_label = np.asarray(out_img)[..., 0], np.asarray(out_label)
        assert np.abs(out_label - label).sum() > 0  # actually moved
        # overlap of warped foreground with warped label stays high
        inter = ((out_img > 0.05) & (out_label > 0)).sum()
        assert inter / max((out_label > 0).sum(), 1) > 0.8

    def test_is_label_false_linear_label(self):
        img, label = _phantom()
        opts = AugOptions(
            **{**IDENTITY_OPTS.to_dict(), "rotation_z": 0.5, "zero_background": 4}
        )
        _, out_label = visual_perception_augmentation(
            jnp.asarray(img[..., None]), jnp.asarray(label), jax.random.key(1), opts, False
        )
        # linear interpolation creates fractional label values at edges
        ol = np.asarray(out_label)
        frac = ol - np.round(ol)
        assert np.abs(frac).max() > 1e-3

    def test_multichannel(self):
        img, label = _phantom()
        two = np.stack([img, img * 0.5], axis=-1)
        out_img, _ = visual_perception_augmentation(
            jnp.asarray(two), jnp.asarray(label), jax.random.key(0), AugOptions(), True
        )
        assert np.asarray(out_img).shape == two.shape

    def test_from_dict_roundtrip(self):
        d = AugOptions().to_dict()
        d["noise"] = 4
        d["noise_mag"] = 0.3
        o = AugOptions.from_dict(d)
        assert o.noise == 4 and abs(o.noise_mag - 0.3) < 1e-9


def test_subject_mode_supercell_matches_fallback(rng):
    """is_label=False warp: the supercell route must match the corner-cell
    samplers (moderate default-draw transforms are within the exact
    window)."""
    import jax
    import jax.numpy as jnp

    from unet_studio_tpu.ops.augment import AugOptions
    from unet_studio_tpu.ops import augment as aug_mod

    img = jnp.asarray(rng.random((16, 16, 16, 1)).astype(np.float32))
    lab = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
    key = jax.random.key(7)
    # geometry-only options so the comparison isolates the warp
    opts = AugOptions(
        cropping=0, truncation_z=0, downsample_x=0, downsample_y=0,
        downsample_z=0, noise=0, ambient=0, diffuse=0, specular=0,
        zero_background=0, rubber_stamping=0, perlin_texture=0,
    )
    fn = aug_mod.visual_perception_augmentation.__wrapped__
    oi, ol = fn(img, lab, key, opts, False)
    orig = aug_mod._supercell_warp_ok
    aug_mod._supercell_warp_ok = lambda *a: False
    try:
        ri, rl = fn(img, lab, key, opts, False)
    finally:
        aug_mod._supercell_warp_ok = orig
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ol), np.asarray(rl), atol=1e-4)


def test_supercell_gate_on_option_bounds(monkeypatch):
    from unet_studio_tpu.ops.augment import AugOptions, _supercell_warp_ok

    shape = (192, 224, 192)
    assert _supercell_warp_ok(AugOptions(), shape)
    # extreme zoom widens the worst-draw Jacobian past the window
    assert not _supercell_warp_ok(AugOptions(scaling_down=0.4), shape)
    assert not _supercell_warp_ok(AugOptions(lens_distortion=0.4), shape)
    assert not _supercell_warp_ok(AugOptions(aspect_ratio=2.0), shape)
    # a single-axis rotation's |R| row-sum peaks at sqrt(2) (45 deg) —
    # within the window even for large angles...
    assert _supercell_warp_ok(AugOptions(rotation_x=1.5), shape)
    # ...but two axes compound toward sqrt(3); the gate scans an angle
    # GRID (row-sums are non-monotone in angle, peaking near pi/4), so
    # interior maxima are caught even when the range corners look benign
    assert not _supercell_warp_ok(
        AugOptions(rotation_x=1.5, rotation_y=1.5), shape
    )
    assert not _supercell_warp_ok(
        AugOptions(rotation_x=2.0, rotation_y=2.0, rotation_z=2.0), shape
    )
    # odd dims cannot blockify
    assert not _supercell_warp_ok(AugOptions(), (191, 224, 192))
    monkeypatch.setenv("UNET_TPU_NO_SUPERCELL", "1")
    assert not _supercell_warp_ok(AugOptions(), shape)


def test_multichannel_template_warp_consistent(rng):
    """in_count>1 template mode: extra channels must ride the same warp
    field as channel 0 on both routing paths."""
    import jax
    import jax.numpy as jnp

    from unet_studio_tpu.ops import augment as aug_mod
    from unet_studio_tpu.ops.augment import AugOptions

    img = jnp.asarray(rng.random((16, 16, 16, 2)).astype(np.float32))
    lab = jnp.asarray(((rng.random((16, 16, 16)) * 3) // 1).astype(np.float32))
    key = jax.random.key(11)
    opts = AugOptions(
        cropping=0, truncation_z=0, downsample_x=0, downsample_y=0,
        downsample_z=0, noise=0, ambient=0, diffuse=0, specular=0,
        zero_background=0, rubber_stamping=0, perlin_texture=0,
    )
    fn = aug_mod.visual_perception_augmentation.__wrapped__
    oi, ol = fn(img, lab, key, opts, True)
    orig = aug_mod._supercell_warp_ok
    aug_mod._supercell_warp_ok = lambda *a: False
    try:
        ri, rl = fn(img, lab, key, opts, True)
    finally:
        aug_mod._supercell_warp_ok = orig
    assert oi.shape == img.shape
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ol), np.asarray(rl))


class TestBackgroundSynthesis:
    """Distribution tests for the low-res background synthesis paths
    (quarter-res rubber stamps, half-res perlin — documented deviations
    vs the reference's full-res rendering, .cpp:345-426)."""

    def _run(self, seed, **over):
        img, label = _phantom()
        opts = AugOptions(**{**IDENTITY_OPTS.to_dict(), **over})
        oi, ol = visual_perception_augmentation(
            jnp.asarray(img[..., None]), jnp.asarray(label),
            jax.random.key(seed), opts, True,
        )
        return img, label, np.asarray(oi)[..., 0], np.asarray(ol)

    def test_rubber_stamps_fill_background(self):
        filled = []
        for seed in range(4):
            img, label, oi, ol = self._run(seed, rubber_stamping=4)
            bg = ol == 0
            # foreground voxels keep the (normalized) source image
            assert np.isfinite(oi).all() and oi.min() >= 0 and oi.max() <= 1 + 1e-6
            filled.append((oi[bg] > 0.01).mean())
        # stamps land somewhere in the background for most draws
        assert max(filled) > 0.05
        # stamp magnitude is bounded by rubber_stamping_mag blending
        img, label, oi, ol = self._run(0, rubber_stamping=4, rubber_stamping_mag=0.5)
        assert oi[ol == 0].max() <= 1.0 + 1e-6

    def test_rubber_stamps_respect_label_region(self):
        """Stamps only modify background; the warped foreground stays put."""
        img, label, base_i, base_l = self._run(3)
        _, _, oi, ol = self._run(3, rubber_stamping=4)
        np.testing.assert_array_equal(ol, base_l)
        fg = ol != 0
        # foreground may be renormalized by a constant; check proportionality
        a, b = oi[fg], base_i[fg]
        nz = b > 1e-6
        if nz.any():
            ratios = a[nz] / b[nz]
            assert ratios.std() < 1e-3

    def test_perlin_fills_background_with_texture(self):
        img, label, oi, ol = self._run(0, perlin_texture=4)
        bg = ol == 0
        vals = oi[bg]
        # texture covers most background voxels and is non-constant
        assert (vals > 0.01).mean() > 0.5
        assert vals.std() > 0.01
        assert oi.max() <= 1.0 + 1e-6
        # half-res rendering: the field is piecewise-constant on 2x2x2
        # blocks BEFORE blending; after blending with a smooth image the
        # 2-voxel autocorrelation must still be high vs random
        d0 = np.abs(np.diff(oi[bg.shape[0] // 2], axis=0)).mean()
        assert d0 < vals.std() * 2.0

    def test_perlin_deterministic_per_key(self):
        _, _, a, _ = self._run(5, perlin_texture=4)
        _, _, b, _ = self._run(5, perlin_texture=4)
        np.testing.assert_array_equal(a, b)
        _, _, c, _ = self._run(6, perlin_texture=4)
        assert np.abs(a - c).max() > 1e-4

    def test_stamp_quarter_res_matches_supercell_off(self):
        """The supercell stamp route must match the plain low-res gather
        route (exact parity: same pooled source, same coords)."""
        import os

        from unet_studio_tpu.ops import augment as aug_mod

        img, label = _phantom()
        opts = AugOptions(**{**IDENTITY_OPTS.to_dict(), "rubber_stamping": 4})
        args = (jnp.asarray(img[..., None]), jnp.asarray(label), jax.random.key(2), opts, True)
        # bypass the jit cache: the env flag is read at trace time
        fn = visual_perception_augmentation.__wrapped__
        on_i, _ = fn(*args)
        os.environ["UNET_TPU_NO_SUPERCELL"] = "1"
        try:
            off_i, _ = fn(*args)
        finally:
            del os.environ["UNET_TPU_NO_SUPERCELL"]
        # routes differ (pooled supercell vs full-res gather at low-res
        # coords) but must agree closely on the smooth phantom
        assert np.abs(np.asarray(on_i) - np.asarray(off_i)).max() < 0.25
        assert np.abs(np.asarray(on_i) - np.asarray(off_i)).mean() < 0.01
