"""On-chip isolation of the train step's optimizer tail (~25 ms/step in
the round-4 segment A/B: step - accum).  Times, separately:

  sgd      : clip + SGD-nesterov update on the flagship param tree
  sgd_nc   : SGD without the global-norm clip
  clip     : clip_by_global_norm alone
  div      : the grads/batch_size tree map alone
  tail     : psum(1-dev mesh) + div + clip + sgd (the full step tail)

All slope-timed between two loop lengths so dispatch+tunnel sync cancel.
Run on TPU: python scratch/opt_ab.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.unet3d import UNet3d
from unet_studio_tpu.engine.optimizer import (
    SGDConfig, clip_by_global_norm, init_opt_state, sgd_step,
)

model = UNet3d.create(1, 4, default_architecture(4), seed=0)
params = {k: jnp.asarray(v) for k, v in model.params.items()}
opt_state = jax.tree.map(jnp.asarray, init_opt_state(model.params))
rng = np.random.default_rng(0)
grads = {k: jnp.asarray(rng.normal(0, 1e-3, v.shape).astype(np.float32))
         for k, v in model.params.items()}
n_par = sum(int(np.prod(v.shape)) for v in model.params.values())
print(f"params: {n_par/1e6:.1f} M", flush=True)
cfg = SGDConfig()


def slope(fn, args, n1=10, n2=30):
    def loop(n):
        @jax.jit
        def run(args):
            def body(i, carry):
                out = fn(*jax.tree.map(
                    lambda a: a + (carry * 0).astype(a.dtype), args))
                first = jax.tree.leaves(out)[0]
                return carry + jnp.asarray(first, jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run
    l1, l2 = loop(n1), loop(n2)
    _ = float(l1(args)); _ = float(l2(args))
    t0 = time.perf_counter(); _ = float(l1(args)); t1 = time.perf_counter()
    _ = float(l2(args)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


ms = slope(lambda p, g, o: sgd_step(p, g, o, 0.01, cfg), (params, grads, opt_state))
print(f"sgd (clip+update): {ms:7.2f} ms", flush=True)

ms = slope(
    lambda p, g, o: sgd_step(p, g, o, 0.01, SGDConfig(clip_norm=0.0) if False else cfg),
    (params, grads, opt_state))

def sgd_noclip(p, g, o):
    import unet_studio_tpu.engine.optimizer as O
    mask = O.decay_mask(p)
    first = o["step"] == 0
    m = cfg.momentum
    new_p, new_m = {}, {}
    for k, pv in p.items():
        gv = g[k].astype(jnp.float32)
        if mask[k] and cfg.weight_decay:
            gv = gv + cfg.weight_decay * pv.astype(jnp.float32)
        buf = jnp.where(first, gv, m * o["momentum"][k] + gv)
        step_g = gv + m * buf
        new_m[k] = buf
        new_p[k] = (pv.astype(jnp.float32) - 0.01 * step_g).astype(pv.dtype)
    return new_p, {"momentum": new_m, "step": o["step"] + 1}

ms = slope(sgd_noclip, (params, grads, opt_state))
print(f"sgd (no clip)    : {ms:7.2f} ms", flush=True)

ms = slope(lambda g: clip_by_global_norm(g, 12.0), (grads,))
print(f"clip alone       : {ms:7.2f} ms", flush=True)

ms = slope(lambda g: jax.tree.map(lambda x: x / 8.0, g), (grads,))
print(f"div alone        : {ms:7.2f} ms", flush=True)

# full tail under a 1-device shard_map (as in build_train_step)
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

def tail(p, g, o):
    def f(p, g, o):
        g = jax.lax.psum(g, "data")
        g = jax.tree.map(lambda x: x / 8.0, g)
        return sgd_step(p, g, o, 0.01, cfg)
    return shard_map(f, mesh=mesh, in_specs=(P(), P(), P()),
                     out_specs=(P(), P()), check_vma=False)(p, g, o)

ms = slope(tail, (params, grads, opt_state))
print(f"tail (psum+div+clip+sgd): {ms:7.2f} ms", flush=True)
