"""On-chip flagship learning run (round-4 verdict item 1b): train the
DEFAULT architecture at the DEFAULT 192x224x192 grid on one synthetic
4-class template for N epochs through the real TrainEngine, then save
* the error curve (printed per epoch -> tee to a log),
* the trained model (docs/evidence/flagship_trained.nz),
* a segmentation mosaic PNG via the evaluate engine.

Run on TPU (no env prefixes), ~8 s/epoch at batch 4:
  JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
  python scratch/train_flagship_probe.py 200 0.02 | tee /tmp/flagship_train.log
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
from unet_studio_tpu.io.nifti import canonicalize_lps, read_nifti, write_nifti
from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.serialize import save_model
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.utils.mosaic import save_mosaic_png

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02

OUT = "/tmp/flagship_probe"
os.makedirs(OUT, exist_ok=True)

# synthetic 4-class "brain": nested ellipsoids at the native model grid
nz, ny, nx = 192, 224, 192
z, y, x = np.mgrid[0:nz, 0:ny, 0:nx].astype(np.float32)
r = np.sqrt(
    ((x - nx / 2) / (nx * 0.38)) ** 2
    + ((y - ny / 2) / (ny * 0.42)) ** 2
    + ((z - nz / 2) / (nz * 0.36)) ** 2
)
label = np.zeros((nz, ny, nx), np.float32)
label[r < 1.0] = 1.0       # outer shell (csf/skull analog)
label[r < 0.82] = 2.0      # cortex analog
label[r < 0.55] = 3.0      # deep analog
img = np.clip(1.25 - r, 0, 1) * (label > 0)
# mild texture so contrast simulation has structure to chew on
rng = np.random.default_rng(0)
img = np.clip(img + 0.05 * rng.standard_normal(img.shape).astype(np.float32), 0, 1)
img = img.astype(np.float32)

write_nifti(OUT + "/tpl-A_T1w.nii.gz", img, is_mni=True)
write_nifti(OUT + "/tpl-A_dseg.nii.gz", label.astype(np.int16), is_mni=True)

images, labels = get_bids_pairs(OUT)
model = UNet3d.create(1, 4, default_architecture(4), seed=0)
param = TrainParam(
    image_file_name=images,
    label_file_name=labels,
    batch_size=4,
    epoch=EPOCHS,
    learning_rate=LR,
)
eng = TrainEngine(model, param, model_path=OUT + "/flagship.nz")
eng.start()
assert not eng.error_msg, eng.error_msg
t0 = time.time()
for e in range(EPOCHS):
    info = eng.run_epoch()
    tr, te = info["train"], info["test"]
    print(
        f"e{e:03d} lr={info['lr']:.5f} "
        f"train {tr[0]:.4f}/{tr[1]:.4f}/{tr[2]:.4f} "
        f"val {te[0]:.4f}/{te[1]:.4f}/{te[2]:.4f} ({time.time()-t0:.0f}s)",
        flush=True,
    )
eng.sync_params_to_model()
save_model(OUT + "/flagship_trained.nz", model, sloped=True)
print("saved", OUT + "/flagship_trained.nz", flush=True)

ev = EvaluateEngine(model, compute_dtype=jnp.bfloat16)
case = next(iter(ev.run([OUT + "/tpl-A_T1w.nii.gz"])))
assert not case.error_msg, case.error_msg
gt = canonicalize_lps(read_nifti(OUT + "/tpl-A_dseg.nii.gz")).data
for c in (1, 2, 3):
    inter = np.sum((case.label == c) & (gt == c))
    dice = 2 * inter / max((case.label == c).sum() + (gt == c).sum(), 1)
    print(f"class {c} dice {dice:.4f}", flush=True)
fg = 2 * np.sum((case.label > 0) & (gt > 0)) / max(
    (case.label > 0).sum() + (gt > 0).sum(), 1
)
print(f"foreground dice {fg:.4f}", flush=True)
vol = canonicalize_lps(read_nifti(OUT + "/tpl-A_T1w.nii.gz")).data
save_mosaic_png(OUT + "/flagship_mosaic.png", vol, case.label)
print("mosaic saved", OUT + "/flagship_mosaic.png", flush=True)
