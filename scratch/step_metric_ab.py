"""On-chip A/B of the REAL judged train step (build_train_step, B=4,
1-device mesh, bench-style committed inputs + chained slope timing):

  full   : step_fn as benched (params, opt, metrics outputs)
  nometr : outer jit drops the metrics output -> XLA DCEs whatever part
           of the loss-VALUE (aux) side is separable from the grads

Slope between k and 3k chained steps; the one D2H sync cancels.

TPU-ONLY: the jax.random.split/fold_in key staging below is device work
at import time — during an axon pool outage this hangs ~25 min before
raising.  For CPU experiments run with the usual empty
PALLAS_AXON_POOL_IPS= / JAX_PLATFORMS=cpu prefix instead.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

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
kb = [
    jax.device_put(jax.random.split(jax.random.fold_in(jax.random.key(0), s), B), sh)
    for s in range(16)
]
params = jax.device_put(model.params, rep)
opt0 = jax.device_put(init_opt_state(model.params), rep)
img = jax.device_put(np.clip(rng.random((B, D, H, W, 1), np.float32), 0, 1), sh)
lab = jax.device_put(rng.integers(0, 4, (B, D, H, W)).astype(np.float32), sh)
tmpl = jax.device_put(np.ones(B, bool), sh)
shift = jax.device_put(np.zeros(B, bool), sh)
lr = 1e-3


def slope(call):
    p, o = call(params, opt0, 0)
    _ = np.asarray(next(iter(p.values()))).ravel()[0]
    p, o = call(p, o, 1)
    _ = np.asarray(next(iter(p.values()))).ravel()[0]
    k1, k2 = 3, 9
    t0 = time.perf_counter()
    for i in range(k1):
        p, o = call(p, o, i)
    _ = np.asarray(next(iter(p.values()))).ravel()[0]
    t1 = time.perf_counter()
    for i in range(k2):
        p, o = call(p, o, i)
    _ = np.asarray(next(iter(p.values()))).ravel()[0]
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (k2 - k1) / B * 1e3  # ms/item


def call_full(p, o, i):
    p, o, m = step_fn(p, o, img, lab, tmpl, shift, kb[i % 16], lr)
    return p, o


t = slope(call_full)
print(f"full step:  {t:7.2f} ms/item", flush=True)


@jax.jit
def step_nometrics(p, o, img, lab, tmpl, shift, keys, lr):
    p2, o2, _m = step_fn(p, o, img, lab, tmpl, shift, keys, lr)
    return p2, o2


def call_nom(p, o, i):
    return step_nometrics(p, o, img, lab, tmpl, shift, kb[i % 16], lr)


t = slope(call_nom)
print(f"no-metrics: {t:7.2f} ms/item", flush=True)
