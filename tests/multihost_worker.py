"""Worker for the 2-process multi-host training test (run by
test_parallel.py, not collected by pytest).  Each process contributes one
virtual CPU device, initializes jax.distributed against a shared
coordinator, trains 2 epochs on a template phantom, and writes its
resulting parameter checksums + first-epoch metrics to a JSON file.
"""

import json
import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert jax.process_count() == nproc
assert jax.device_count() == nproc  # one virtual CPU device per process

import numpy as np

from unet_studio_tpu.data.bids import get_bids_pairs
from unet_studio_tpu.engine.train import TrainEngine, TrainParam
from unet_studio_tpu.io.nifti import write_nifti
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.ops.augment import AugOptions
from unet_studio_tpu.parallel.mesh import make_mesh

bids = sys.argv[5]

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)
FAST = AugOptions(
    cropping=0, truncation_z=0, downsample_x=0, downsample_y=0,
    downsample_z=0, noise=0, ambient=0, diffuse=0, specular=0,
    perspective=0.0, lens_distortion=0.0, distortion=0, zero_background=4,
    rubber_stamping=0, perlin_texture=0,
)

images, labels = get_bids_pairs(bids)
model = UNet3d.create(1, 3, ARCH, seed=0)
model.dim = (16, 16, 16)
param = TrainParam(
    image_file_name=images, label_file_name=labels, batch_size=2, epoch=2,
    learning_rate=1e-3, options=FAST, compute_dtype="float32", remat=False,
)
mesh = make_mesh(n_data=nproc)
eng = TrainEngine(model, param, mesh=mesh)
eng.start()
assert not eng.error_msg, eng.error_msg
info0 = eng.run_epoch()
eng.run_epoch()

sums = {
    k: float(np.asarray(jax.device_get(v)).astype(np.float64).sum())
    for k, v in sorted(eng._params.items())
}
with open(out_path, "w") as f:
    json.dump(
        {
            "proc": proc_id,
            "param_sums": sums,
            "training_errors": model.training_errors,
        },
        f,
    )
print("worker", proc_id, "done")
