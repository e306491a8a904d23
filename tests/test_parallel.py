"""Mesh/collective layer tests on the virtual 8-device CPU mesh."""

import numpy as np

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
