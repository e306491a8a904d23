"""On-chip A/B of the REAL train step with the native-layout warp tail
on vs off (UNET_TPU_NO_NATIVE_WARP).  The native kernel is ~14 ms/item
SLOWER standalone (in-kernel lane<->sublane shuffles) but removes the
blocked-layout contagion the unblockify spreads into the loss
(~45 ms/item of relayouts + a strided-slice-as-gather label pyramid in
the round-5 step trace) — only the full step shows the net.

Run on TPU:  python scratch/step_native_ab.py
"""
import os
import sys
import time

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

rep = NamedSharding(mesh, P())
sh = NamedSharding(mesh, P("data"))
rng = np.random.default_rng(1)
keys = jax.device_put(jax.random.split(jax.random.key(0), B), sh)
params0 = jax.device_put(model.params, rep)
opt0 = jax.device_put(init_opt_state(model.params), rep)
img = jax.device_put(np.clip(rng.random((B, D, H, W, 1), np.float32), 0, 1), sh)
lab = jax.device_put(rng.integers(0, 4, (B, D, H, W)).astype(np.float32), sh)
tmpl = jax.device_put(np.ones(B, bool), sh)
shift = jax.device_put(np.zeros(B, bool), sh)


def time_steps(step_fn, iters):
    p, o = params0, opt0
    m = None
    for _ in range(2):  # compile + warm
        p, o, m = step_fn(p, o, img, lab, tmpl, shift, keys, 1e-3)
    _ = np.asarray(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, m = step_fn(p, o, img, lab, tmpl, shift, keys, 1e-3)
    _ = np.asarray(m)
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3  # ms per step (B items)


results = {}
for tag, env in (("native", None), ("blockified", "1")):
    if env is None:
        os.environ.pop("UNET_TPU_NO_NATIVE_WARP", None)
    else:
        os.environ["UNET_TPU_NO_NATIVE_WARP"] = env
    step_fn, _ = build_train_step(model, tparam, mesh)
    t3 = time_steps(step_fn, 3)
    t9 = time_steps(step_fn, 9)
    slope = (9 * t9 - 3 * t3) / 6
    results[tag] = slope
    print(f"[{tag:10s}] step {slope:8.2f} ms  ({slope / B:.2f} ms/item, "
          f"{1000.0 * B / slope:.3f} items/s)", flush=True)

n, b = results["native"], results["blockified"]
print(f"native vs blockified: {n - b:+.2f} ms/step ({(n - b) / B:+.2f} ms/item)")
