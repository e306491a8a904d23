"""Resampling math tests: model-grid transform (align_top), warp samplers,
fused packed sampler, scale round-trips."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_studio_tpu.ops.resample import (
    affine_matrix,
    apply_affine,
    meshgrid_xyz,
    model_grid_transform,
    normalize01,
    resample_to_model_grid,
    sample_linear,
    sample_majority,
    sample_warp_image_label,
    sample_warp_image_label_supercell,
    scale_to_shape,
    supercell_warp_shape_ok,
)


def test_model_grid_transform_align_top():
    """The z translation must match the reference formula
    0.5*((Di-1)*vi - (Dm-1)*vm) in mm (train.cpp:27)."""
    img_xyz, img_vs = (256, 256, 180), (0.9, 0.9, 1.2)
    mdl_xyz, mdl_vs = (192, 224, 192), (1.0, 1.0, 1.0)
    m = model_grid_transform(img_xyz, img_vs, mdl_xyz, mdl_vs)
    # scale = vs_model / vs_image
    np.testing.assert_allclose(np.diag(m[:, :3]), [1 / 0.9, 1 / 0.9, 1 / 1.2], rtol=1e-5)
    t_mm = 0.5 * ((np.array(img_xyz) - 1) * img_vs - (np.array(mdl_xyz) - 1) * np.array(mdl_vs))
    np.testing.assert_allclose(m[:, 3], t_mm / img_vs, rtol=1e-5)
    # center voxel of the model grid maps to the center of the image in x/y
    center_m = (np.array(mdl_xyz) - 1) / 2.0
    mapped = m[:, :3] @ center_m + m[:, 3]
    np.testing.assert_allclose(mapped[:2], (np.array(img_xyz[:2]) - 1) / 2.0, rtol=1e-5)


def test_sample_linear_identity_and_shift(rng):
    vol = jnp.asarray(rng.standard_normal((6, 7, 8)).astype(np.float32))
    grid = meshgrid_xyz((6, 7, 8))
    np.testing.assert_allclose(np.asarray(sample_linear(vol, grid)), np.asarray(vol), atol=1e-6)
    # half-voxel x shift == average of neighbors
    shifted = sample_linear(vol, grid + jnp.asarray([0.5, 0, 0]))
    manual = 0.5 * (np.asarray(vol)[:, :, :-1] + np.asarray(vol)[:, :, 1:])
    np.testing.assert_allclose(np.asarray(shifted)[:, :, :-1], manual, atol=1e-5)
    # out of range -> 0
    out = sample_linear(vol, grid + jnp.asarray([100.0, 0, 0]))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_sample_majority_prefers_dominant_corner(rng):
    vol = jnp.asarray((rng.random((6, 6, 6)) * 4).astype(np.float32) // 1)
    grid = meshgrid_xyz((6, 6, 6))
    np.testing.assert_array_equal(
        np.asarray(sample_majority(vol, grid)), np.asarray(vol)
    )
    # at an exact half-way point between equal labels, the result is one of
    # the corner labels
    out = np.asarray(sample_majority(vol, grid + jnp.asarray([0.5, 0.5, 0.5])))
    corners = np.stack([
        np.asarray(vol)[a:a+5, b:b+5, c:c+5]
        for a in (0, 1) for b in (0, 1) for c in (0, 1)
    ])
    assert ((out[:5, :5, :5][None] == corners).any(0)).all()


def test_packed_sampler_matches_separate(rng):
    img = rng.random((8, 9, 10)).astype(np.float32) * 2.5
    lab = (rng.random((8, 9, 10)) * 5).astype(np.float32) // 1
    coords = jnp.asarray(rng.random((8, 9, 10, 3)).astype(np.float32) * 8)
    pi, pl = sample_warp_image_label(jnp.asarray(img), jnp.asarray(lab), coords)
    ri = sample_linear(jnp.asarray(img), coords)
    rl = sample_majority(jnp.asarray(lab), coords)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(ri), atol=2.5 * 2e-4)
    assert (np.asarray(pl) == np.asarray(rl)).mean() > 0.999


def test_scale_roundtrip_identity(rng):
    vol = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
    same = scale_to_shape(vol, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(same), np.asarray(vol), atol=1e-5)


def test_resample_to_model_grid_same_grid(rng):
    vol = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
    out = resample_to_model_grid(vol, (1, 1, 1), (16, 16, 16), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_affine_matrix_rotation_preserves_center():
    m = affine_matrix(rotation=(0.3, -0.2, 0.5), shape_dhw=(16, 20, 24))
    center = jnp.asarray([(24 - 1) / 2, (20 - 1) / 2, (16 - 1) / 2])
    out = apply_affine(center[None], m)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(center), atol=1e-4)


def test_normalize01():
    v = jnp.asarray([0.0, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(normalize01(v)), [0, 0.5, 1.0])
    z = jnp.zeros(3)
    np.testing.assert_array_equal(np.asarray(normalize01(z)), 0.0)


def test_supercell_warp_matches_base_identity(rng):
    img = rng.random((12, 14, 16)).astype(np.float32)
    lab = ((rng.random((12, 14, 16)) * 5).astype(np.float32)) // 1
    grid = meshgrid_xyz((12, 14, 16))
    bi, bl = sample_warp_image_label(jnp.asarray(img), jnp.asarray(lab), grid)
    si, sl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), grid
    )
    np.testing.assert_allclose(np.asarray(si), np.asarray(bi), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(bl))


def test_supercell_warp_matches_base_moderate_affine(rng):
    """Jacobian row-sums < 2: the supercell window always covers the
    block, so the result must equal the corner-cell sampler exactly."""
    img = rng.random((24, 32, 28)).astype(np.float32) * 3.0
    lab = ((rng.random((24, 32, 28)) * 6).astype(np.float32)) // 1
    m = affine_matrix(
        translation=(2.3, -1.7, 0.9),
        rotation=(0.15, -0.2, 0.1),
        scaling=(1.2, 0.85, 1.1),
        shape_dhw=(24, 32, 28),
    )
    coords = apply_affine(meshgrid_xyz((24, 32, 28)), m)
    bi, bl = sample_warp_image_label(jnp.asarray(img), jnp.asarray(lab), coords)
    si, sl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords
    )
    np.testing.assert_allclose(np.asarray(si), np.asarray(bi), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(bl))


def test_supercell_warp_worst_draw_mismatch_tiny(rng):
    """At the worst default-options draw (zoom 1.5625 + rotation 0.2 each
    axis + a wiggle field), window clamping may deviate — but only on a
    tiny fraction of voxels."""
    img = rng.random((24, 32, 28)).astype(np.float32)
    lab = ((rng.random((24, 32, 28)) * 5).astype(np.float32)) // 1
    m = affine_matrix(
        rotation=(0.2, 0.2, 0.2),
        scaling=(1.5625, 1.5625, 1.5625),
        shape_dhw=(24, 32, 28),
    )
    grid = meshgrid_xyz((24, 32, 28))
    coords = apply_affine(grid + 2.0 * jnp.sin(grid * 0.3), m)
    bi, bl = sample_warp_image_label(jnp.asarray(img), jnp.asarray(lab), coords)
    si, sl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords
    )
    assert (np.abs(np.asarray(si) - np.asarray(bi)) > 1e-3).mean() < 0.01
    assert (np.asarray(sl) == np.asarray(bl)).mean() > 0.99


def test_supercell_shape_gate():
    assert supercell_warp_shape_ok((192, 224, 192))
    assert not supercell_warp_shape_ok((191, 224, 192))
    assert not supercell_warp_shape_ok((4, 224, 192))


def test_supercell_warp_kernel_matches_xla_tail(rng, monkeypatch):
    """The Pallas extract+combine tail (ops/pallas_warp.py) must match
    the XLA staged-contraction fallback (UNET_TPU_NO_WARP_KERNEL=1):
    image to 1-2 ulp (reduction-order rounding only), majority label
    exactly.  The N-pad path is exercised too (N = 6*7*8 = 336 blocks,
    not a multiple of the 512-lane tile)."""
    img = rng.random((12, 14, 16)).astype(np.float32) * 2.5
    lab = ((rng.random((12, 14, 16)) * 6).astype(np.float32)) // 1
    m = affine_matrix(
        translation=(1.2, -0.7, 0.4),
        rotation=(0.1, -0.15, 0.2),
        scaling=(1.1, 0.9, 1.05),
        shape_dhw=(12, 14, 16),
    )
    grid = meshgrid_xyz((12, 14, 16))
    coords = apply_affine(grid + 0.7 * jnp.sin(grid * 0.4), m)
    monkeypatch.setenv("UNET_TPU_FORCE_PACKED", "1")  # kernel on, off-TPU
    ki, kl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords
    )
    monkeypatch.setenv("UNET_TPU_NO_WARP_KERNEL", "1")
    xi, xl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords
    )
    # image: 1-2 ulp — XLA's sum() reduces pairwise, the kernel
    # accumulates sequentially; same math, different rounding order
    np.testing.assert_allclose(
        np.asarray(ki), np.asarray(xi), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(kl), np.asarray(xl))


def test_supercell_warp_native_kernel_matches_blockified(rng, monkeypatch):
    """The native-layout kernel (geometry volumes in, volumes out) must
    match the blockified kernel BITWISE — the compute core is shared;
    only the VMEM shuffle differs.  Ay=10 exercises the gy divisor
    pick; the shared-geometry sampler path must accept native form."""
    from unet_studio_tpu.ops.resample import (
        SupercellLinearSampler,
        _supercell_geometry,
    )

    shape = (12, 20, 16)
    img = rng.random(shape).astype(np.float32) * 2.5
    lab = ((rng.random(shape) * 6).astype(np.float32)) // 1
    m = affine_matrix(
        translation=(1.2, -0.7, 0.4),
        rotation=(0.1, -0.15, 0.2),
        scaling=(1.1, 0.9, 1.05),
        shape_dhw=shape,
    )
    grid = meshgrid_xyz(shape)
    coords = apply_affine(grid + 0.7 * jnp.sin(grid * 0.4), m)

    monkeypatch.setenv("UNET_TPU_FORCE_PACKED", "1")  # kernels on, off-TPU
    anchors = tuple(s // 2 for s in shape)
    geom_native = _supercell_geometry(coords, shape, anchors, blockify=False)
    ni, nl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords, geometry=geom_native
    )
    # the native geometry must also feed the (blockify-on-use) sampler
    extra = SupercellLinearSampler(jnp.asarray(img)).sample(
        coords, geometry=geom_native
    )

    monkeypatch.setenv("UNET_TPU_NO_NATIVE_WARP", "1")
    bi, bl = sample_warp_image_label_supercell(
        jnp.asarray(img), jnp.asarray(lab), coords
    )
    extra_b = SupercellLinearSampler(jnp.asarray(img)).sample(coords)

    np.testing.assert_array_equal(np.asarray(ni), np.asarray(bi))
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(bl))
    np.testing.assert_array_equal(np.asarray(extra), np.asarray(extra_b))


def test_supercell_table_kernel_matches_staged(rng, monkeypatch):
    """The Pallas table build (pallas_warp.build_table_kernel) must be
    BITWISE the staged stack build — both produce the edge-clamped
    6x6x6 window per stride-2 anchor."""
    from unet_studio_tpu.ops.resample import _supercell_table

    vol = jnp.asarray(rng.random((12, 20, 16)).astype(np.float32) * 7.0)
    monkeypatch.setenv("UNET_TPU_FORCE_PACKED", "1")  # kernel on, off-TPU
    t_k, a_k = _supercell_table(vol)
    monkeypatch.setenv("UNET_TPU_NO_TABLE_KERNEL", "1")
    t_s, a_s = _supercell_table(vol)
    assert a_k == a_s
    np.testing.assert_array_equal(np.asarray(t_k), np.asarray(t_s))


def test_supercell_linear_sampler_matches_sample_linear(rng):
    from unet_studio_tpu.ops.resample import SupercellLinearSampler

    vol = rng.random((16, 20, 24)).astype(np.float32) * 2.0
    m = affine_matrix(
        translation=(1.1, -0.7, 2.0),
        rotation=(0.1, 0.2, -0.15),
        scaling=(1.1, 0.9, 1.2),
        shape_dhw=(16, 20, 24),
    )
    coords = apply_affine(meshgrid_xyz((16, 20, 24)), m)
    ref = sample_linear(jnp.asarray(vol), coords)
    got = SupercellLinearSampler(jnp.asarray(vol)).sample(coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_separable_resample_matches_sample_linear(rng):
    """The evaluate engine's separable FOV resample must EXACTLY match the
    gather-based sampler for diagonal affines (design invariant: every
    optimized path keeps its fallback + a parity test)."""
    from unet_studio_tpu.ops.resample import (
        diag_affine_matrices,
        separable_resample,
    )

    in_dhw, out_dhw = (14, 11, 9), (10, 13, 12)
    mat = np.zeros((3, 4), np.float32)
    # scales cover shrink, grow, and negative offsets / out-of-range taps
    mat[0, 0], mat[1, 1], mat[2, 2] = 0.8, 1.3, 1.05
    mat[:, 3] = [-1.2, 0.7, 2.5]
    for channels in (None, 3):
        shape = in_dhw if channels is None else (*in_dhw, channels)
        vol = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        coords = apply_affine(meshgrid_xyz(out_dhw), jnp.asarray(mat))
        ref = sample_linear(vol, coords)
        mz, my, mx = diag_affine_matrices(mat, in_dhw, out_dhw)
        out = separable_resample(vol, mz, my, mx)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_diag_affine_matrices_rejects_offdiagonal():
    import pytest

    from unet_studio_tpu.ops.resample import diag_affine_matrices

    mat = np.eye(3, 4, dtype=np.float32)
    mat[0, 1] = 0.1
    with pytest.raises(ValueError):
        diag_affine_matrices(mat, (4, 4, 4), (4, 4, 4))


def test_make_infer_graph_separable_matches_gather(rng, monkeypatch):
    """The end-to-end evaluate graph with the separable FOV path must match
    the gather-based fallback (UNET_TPU_NO_SEPARABLE_FOV)."""
    import os

    from unet_studio_tpu.engine.evaluate import make_infer_graph
    from unet_studio_tpu.models.unet3d import UNet3d

    arch = "conv8,ks3,stride1+norm,leaky_relu\n" \
           "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2\n" \
           "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1"
    model = UNet3d.create(1, 3, arch, seed=0)
    model.dim = (16, 16, 16)
    image_dhw, image_vs = (20, 18, 22), np.array([0.9, 1.1, 1.0], np.float32)
    chunk = jnp.asarray(rng.random((20, 18, 22, 1), np.float32))
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    state = {k: jnp.asarray(v) for k, v in model.state.items()}

    monkeypatch.delenv("UNET_TPU_NO_SEPARABLE_FOV", raising=False)
    run_sep = make_infer_graph(model, image_dhw, image_vs, jnp.float32)
    monkeypatch.setenv("UNET_TPU_NO_SEPARABLE_FOV", "1")
    run_gat = make_infer_graph(model, image_dhw, image_vs, jnp.float32)

    l1, p1, f1 = jax.jit(run_sep)(params, state, chunk)
    l2, p2, f2 = jax.jit(run_gat)(params, state, chunk)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f1, np.float32), np.asarray(f2, np.float32), atol=1e-2
    )
    assert float(np.mean(np.asarray(l1) == np.asarray(l2))) > 0.9995


def test_make_infer_graph_packed_head_matches_standard(rng, monkeypatch):
    """The evaluate graph's packed-head route (level-0 logits consumed in
    the (R, bx*out) packed layout by the separable FOV resample, emitting
    channel-leading prob) must match the standard 5D route.  Forced
    through the packed dataflow in interpret mode (UNET_TPU_FORCE_PACKED)
    so the CPU suite covers the TPU-only path."""
    import numpy as np

    from unet_studio_tpu.engine.evaluate import make_infer_graph
    from unet_studio_tpu.models.unet3d import UNet3d

    from unet_studio_tpu.models.dsl import default_architecture

    # packed-eligible tiny grid: C=16 level needs W%8==0 and (W*C/128)%8==0
    arch = "conv16,ks3,stride1+norm,leaky_relu\n" \
           "conv32,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2\n" \
           "conv16,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1"
    model = UNet3d.create(1, 4, arch, seed=0)
    model.dim = (64, 8, 8)  # (x, y, z)
    image_dhw, image_vs = (10, 9, 70), np.array([1.1, 0.9, 1.0], np.float32)
    chunk = jnp.asarray(rng.random((*image_dhw, 1), np.float32))
    params = {k: jnp.asarray(v) for k, v in model.params.items()}

    monkeypatch.delenv("UNET_TPU_NO_SEPARABLE_FOV", raising=False)
    monkeypatch.setenv("UNET_TPU_FORCE_PACKED", "1")
    run_packed = make_infer_graph(model, image_dhw, image_vs, jnp.float32)
    l1, p1, f1 = jax.jit(run_packed)(params, {}, chunk)
    monkeypatch.delenv("UNET_TPU_FORCE_PACKED")
    run_std = make_infer_graph(model, image_dhw, image_vs, jnp.float32)
    l2, p2, f2 = jax.jit(run_std)(params, {}, chunk)

    assert p1.shape == (4, *image_dhw)  # channel-leading contract
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(f1, np.float32), np.asarray(f2, np.float32), atol=1e-2
    )
    assert float(np.mean(np.asarray(l1) == np.asarray(l2))) > 0.999
