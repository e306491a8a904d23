"""Capture an XPlane trace of the REAL judged train step (B=4, 1-device
mesh) — two steps inside one trace window.  Parse the result with
scratch/xplane_top.py to see the true per-op time composition.

Run on TPU:  python scratch/step_trace.py /tmp/steptrace
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steptrace"
print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.engine.optimizer import init_opt_state
from unet_studio_tpu.engine.train import TrainParam, build_train_step
from unet_studio_tpu.parallel.mesh import make_mesh

B = 4
D, H, W = 192, 224, 192
model = UNet3d.create(1, 4, default_architecture(4), seed=0)
tparam = TrainParam(batch_size=B)
mesh = make_mesh(n_data=1)
step_fn, _ = build_train_step(model, tparam, mesh)

rep = NamedSharding(mesh, P())
sh = NamedSharding(mesh, P("data"))
rng = np.random.default_rng(1)
keys = jax.device_put(jax.random.split(jax.random.key(0), B), sh)
params = jax.device_put(model.params, rep)
opt = jax.device_put(init_opt_state(model.params), rep)
img = jax.device_put(np.clip(rng.random((B, D, H, W, 1), np.float32), 0, 1), sh)
lab = jax.device_put(rng.integers(0, 4, (B, D, H, W)).astype(np.float32), sh)
tmpl = jax.device_put(np.ones(B, bool), sh)
shift = jax.device_put(np.zeros(B, bool), sh)

def one(params, opt):
    p, o, m = step_fn(params, opt, img, lab, tmpl, shift, keys, 1e-3)
    return p, o, m

# compile + warm
p, o, m = one(params, opt)
_ = np.asarray(m)
p, o, m = one(p, o)
_ = np.asarray(m)
print("warm; tracing...", flush=True)

jax.profiler.start_trace(OUT)
p, o, m = one(p, o)
p, o, m = one(p, o)
_ = np.asarray(m)
jax.profiler.stop_trace()
print("trace written to", OUT, flush=True)
