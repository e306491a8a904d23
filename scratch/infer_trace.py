"""Capture an XPlane trace of the REAL evaluate graph (native 182x218x182
T1w -> fov_pre -> packed bf16 forward (fused norm) -> fov_post ->
softmax/argmax), two runs in one window.  Parse with scratch/xplane_top.py.

Run on TPU:  python scratch/infer_trace.py /tmp/infertrace
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/infertrace"
print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.engine.evaluate import EvaluateEngine

model = UNet3d.create(1, 4, default_architecture(4), seed=0)
ev = EvaluateEngine(model, compute_dtype=jnp.bfloat16)

# mimic bench's native-grid volume -> device graph
rng = np.random.default_rng(0)
vol = np.clip(rng.random((182, 218, 182)).astype(np.float32), 0, 1)

run = ev._infer_fn(vol.shape, (1.0, 1.0, 1.0))
x = jnp.asarray(vol[..., None])


def once():
    y = run(model.params, {}, x)
    _ = np.asarray(jax.tree.leaves(y)[0])
    return y


once()
once()
print("warm; tracing...", flush=True)
jax.profiler.start_trace(OUT)
once()
once()
jax.profiler.stop_trace()
print("trace written to", OUT, flush=True)
