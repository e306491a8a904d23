"""Generate the committed golden fixture: tiny trained-ish model + input +
expected outputs from THIS framework (CPU f32)."""
import numpy as np
import jax.numpy as jnp

from unet_studio_tpu.io.nifti import write_nifti
from unet_studio_tpu.models.serialize import save_model
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.engine.evaluate import EvaluateEngine

arch = "\n".join([
    "conv8,ks3,stride1+norm,leaky_relu",
    "conv16,ks3,stride2+norm,leaky_relu",
    "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
    "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
    "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
])
m = UNet3d.create(1, 3, arch, seed=42)
m.dim = (16, 16, 16)
# nudge params so outputs aren't symmetric-near-zero
rng = np.random.default_rng(123)
m.params = {k: np.asarray(v) + rng.normal(0, 0.02, np.shape(v)).astype(np.float32)
            for k, v in m.params.items()}
save_model("tests/fixtures/golden/model.nz", m, sloped=True)

n = 20
z, y, x = np.mgrid[0:n, 0:n, 0:n]
r = np.sqrt((x - n/2)**2 + (y - n/2)**2 + (z - n/2)**2)
img = (np.clip(1.0 - r/(n/2), 0, 1)).astype(np.float32)
write_nifti("tests/fixtures/golden/input.nii.gz", img, voxel_size=(1.2, 1.0, 0.9))

eng = EvaluateEngine(m, compute_dtype=jnp.float32)
case = next(iter(eng.run(["tests/fixtures/golden/input.nii.gz"])))
assert not case.error_msg, case.error_msg
np.savez_compressed(
    "tests/fixtures/golden/expected.npz",
    label=case.label.astype(np.int16),
    fg_prob=case.fg_prob.astype(np.float32),
)
print("label hist:", np.bincount(case.label.ravel()), "fg mean:", case.fg_prob.mean())
