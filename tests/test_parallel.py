"""Mesh/collective layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from unet_studio_tpu.parallel.spatial import make_spatial_infer, spatial_sharding

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=4, n_space=2)
    assert mesh.shape == {"data": 4, "space": 2}
    mesh2 = make_mesh()
    assert mesh2.shape["data"] == len(jax.devices())


def test_shard_batch_places_on_data_axis(rng):
    mesh = make_mesh(n_data=8)
    x = rng.standard_normal((8, 4, 4)).astype(np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding == data_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_spatial_inference_matches_single_device(rng):
    """D-sharded forward over the space axis == unsharded forward.

    This exercises GSPMD's halo exchange for the 3^3 convs at shard
    boundaries — the SP analog (SURVEY.md §5.7)."""
    model = UNet3d.create(1, 3, ARCH, seed=0)
    x = rng.standard_normal((1, 16, 8, 8, 1)).astype(np.float32)

    ref = np.asarray(model(jnp.asarray(x))[0])

    mesh = make_mesh(n_data=1, n_space=4)
    infer = make_spatial_infer(model, mesh, compute_dtype=jnp.float32)
    params = jax.device_put(model.params, NamedSharding(mesh, P()))
    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    out = infer(params, xs)
    assert out.sharding.spec == P(None, "space")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_multihost_two_process_training(tmp_path):
    """2-process jax.distributed CPU cluster: each process loads only its
    shard of every batch (make_array_from_process_local_data, SURVEY.md
    §5.8) and both converge to IDENTICAL parameters."""
    import json
    import os
    import socket
    import subprocess
    import sys

    import numpy as np

    from unet_studio_tpu.io.nifti import write_nifti

    d = tmp_path / "bids"
    d.mkdir()
    n = 16
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    lab = (r < n / 3).astype(np.float32)
    lab[r < n / 6] = 2.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (lab > 0)
    write_nifti(str(d / "tpl-A_T1w.nii.gz"), img, is_mni=True)
    write_nifti(str(d / "tpl-A_dseg.nii.gz"), lab.astype(np.int16), is_mni=True)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), outs[i], str(d)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    # SPMD: both processes hold identical replicated parameters
    assert r0["param_sums"].keys() == r1["param_sums"].keys()
    for k in r0["param_sums"]:
        assert abs(r0["param_sums"][k] - r1["param_sums"][k]) < 1e-6, k
    assert r0["training_errors"] == r1["training_errors"]
    assert len(r0["training_errors"]) == 6
    assert all(np.isfinite(r0["training_errors"]))


def test_spatial_train_step_matches_unsharded():
    """z-sharded training step == single-device step: GSPMD halo
    exchanges in fwd+bwd keep grads exact (SURVEY.md §5.7)."""
    from unet_studio_tpu.engine.optimizer import init_opt_state
    from unet_studio_tpu.parallel.spatial import make_spatial_train_step

    arch = "\n".join(
        [
            "conv8,ks3,stride1+norm,leaky_relu",
            "conv16,ks3,stride2+norm,leaky_relu",
            "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
            "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
            "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
        ]
    )
    model = UNet3d.create(1, 3, arch, seed=0)
    rng = np.random.default_rng(0)
    img = np.clip(rng.random((1, 16, 16, 16, 1), np.float32), 0, 1)
    lab = rng.integers(0, 3, (1, 16, 16, 16)).astype(np.float32)
    params = {k: jnp.asarray(v) for k, v in model.params.items()}

    mesh_sp = make_mesh(n_data=1, n_space=2)
    mesh_1 = make_mesh(n_data=1, n_space=1)
    outs = {}
    for name, mesh in (("sharded", mesh_sp), ("single", mesh_1)):
        step = make_spatial_train_step(model, mesh)
        p, o, lvl0 = step(params, init_opt_state(params), img, lab, 1e-3)
        outs[name] = (jax.device_get(p), np.asarray(lvl0))
    np.testing.assert_allclose(
        outs["sharded"][1], outs["single"][1], atol=1e-5
    )
    for k in outs["single"][0]:
        np.testing.assert_allclose(
            outs["sharded"][0][k], outs["single"][0][k], atol=2e-5, err_msg=k
        )


PACKED_DP_ARCH = "\n".join(
    [
        "conv16,ks3,stride1+norm,leaky_relu",
        "conv32,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv4,ks1,stride1",
    ]
)


def test_packed_route_inside_shard_map(monkeypatch, rng):
    """The packed Pallas kernels (interpret mode) traced INSIDE the
    data-parallel shard_map train step — the coverage hole behind round
    2's on-hardware crash (check_vma=False means no machine check
    either): one step on a 2-device mesh, packed vs XLA path parity on
    the resulting parameters."""
    from unet_studio_tpu.engine.optimizer import init_opt_state
    from unet_studio_tpu.engine.train import TrainParam, build_train_step
    from unet_studio_tpu.models.unet3d import no_pallas_conv

    model = UNet3d.create(1, 4, PACKED_DP_ARCH, seed=0)
    model.dim = (64, 4, 4)  # (x, y, z) -> dhw (4, 4, 64), packed-eligible
    mesh = make_mesh(n_data=2)
    param = TrainParam(batch_size=2, compute_dtype="float32", remat=False)

    d, h, w = model.dim_dhw
    images = rng.random((2, d, h, w, 1)).astype(np.float32)
    labels = (rng.random((2, d, h, w)) * 3).astype(np.float32)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(2)
    )
    sh = NamedSharding(mesh, P("data"))
    args = (
        jax.device_put(images, sh),
        jax.device_put(labels, sh),
        jax.device_put(np.ones(2, bool), sh),
        jax.device_put(np.zeros(2, bool), sh),
        jax.device_put(keys, sh),
        1e-3,
    )
    params = {k: jnp.asarray(v) for k, v in model.params.items()}

    monkeypatch.setenv("UNET_TPU_FORCE_PACKED", "1")
    step_fn, _ = build_train_step(model, param, mesh)
    p_packed, _, m_packed = step_fn(params, init_opt_state(params), *args)
    m_packed = np.asarray(m_packed)
    assert np.isfinite(m_packed).all()

    with no_pallas_conv():
        step_fn2, _ = build_train_step(model, param, mesh)
        p_ref, _, m_ref = step_fn2(params, init_opt_state(params), *args)
    np.testing.assert_allclose(m_packed, np.asarray(m_ref), rtol=1e-4, atol=1e-5)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_packed[k]),
            np.asarray(p_ref[k]),
            rtol=1e-4,
            atol=5e-6,
            err_msg=k,
        )
