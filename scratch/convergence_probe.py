"""Convergence probe (round-4 verdict item 1): does TrainEngine LEARN?

Tiny grid, one synthetic template, N epochs through the REAL engine
(TrainEngine.run_epoch), printing the per-epoch train/validation errors
and the final evaluate-vs-template dice.  Used to pick the acceptance
test's epoch count / thresholds (tests/test_convergence.py).

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scratch/convergence_probe.py [epochs] [lr]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from unet_studio_tpu.data.bids import get_bids_pairs
from unet_studio_tpu.engine.evaluate import EvaluateEngine
from unet_studio_tpu.engine.train import TrainEngine, TrainParam
from unet_studio_tpu.io.nifti import write_nifti
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.ops.augment import AugOptions

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-2

ARCH = "\n".join(
    [
        "conv8,ks3,stride1+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu",
        "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
        "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
        "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
    ]
)

OPTS = AugOptions(
    cropping=0, truncation_z=0, downsample_x=0, downsample_y=0, downsample_z=0,
    noise=0, ambient=0, diffuse=0, specular=0, perspective=0.0,
    lens_distortion=0.0, distortion=0, zero_background=4, rubber_stamping=0,
    perlin_texture=0,
)


def phantom(n=16):
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    label = (r < n / 3).astype(np.float32)
    label[r < n / 6] = 2.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (label > 0)
    return img, label


d = "/tmp/conv_probe"
os.makedirs(d, exist_ok=True)
img, label = phantom()
write_nifti(d + "/tpl-A_T1w.nii.gz", img, is_mni=True)
write_nifti(d + "/tpl-A_dseg.nii.gz", label.astype(np.int16), is_mni=True)

images, labels = get_bids_pairs(d)
model = UNet3d.create(1, 3, ARCH, seed=0)
model.dim = (16, 16, 16)
param = TrainParam(
    image_file_name=images, label_file_name=labels,
    batch_size=4, epoch=EPOCHS, learning_rate=LR,
    options=OPTS, compute_dtype="float32",
)
eng = TrainEngine(model, param)
eng.start()
assert not eng.error_msg, eng.error_msg
t0 = time.time()
for e in range(EPOCHS):
    info = eng.run_epoch()
    tr = info["train"]
    te = info["test"]
    print(
        f"e{e:03d} lr={info['lr']:.4f} train ce/dice/mse "
        f"{tr[0]:.4f}/{tr[1]:.4f}/{tr[2]:.4f}  val {te[0]:.4f}/{te[1]:.4f}/{te[2]:.4f}"
        f"  ({time.time()-t0:.0f}s)",
        flush=True,
    )
eng.sync_params_to_model()
from unet_studio_tpu.models.serialize import save_model

save_model(d + "/trained.nz", model)

# evaluate the trained model on its own template image
m2 = model
m2.postproc = "softmax+argmax"
eng2 = EvaluateEngine(m2, compute_dtype=jnp.float32)
case = next(iter(eng2.run([d + "/tpl-A_T1w.nii.gz"])))
assert not case.error_msg, case.error_msg
pred = case.label
gt = label.astype(int)
for c in (1, 2):
    inter = np.sum((pred == c) & (gt == c))
    dice = 2 * inter / max((pred == c).sum() + (gt == c).sum(), 1)
    print(f"class {c}: dice {dice:.4f}")
fg_inter = np.sum((pred > 0) & (gt > 0))
fg_dice = 2 * fg_inter / max((pred > 0).sum() + (gt > 0).sum(), 1)
print(f"foreground dice {fg_dice:.4f}")
