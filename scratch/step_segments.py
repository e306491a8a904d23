"""On-chip segment timing of the REAL train step (flagship arch/grid).

Segments, each scanned over B items exactly like device_step:
  simaug : contrast sim + full augmentation (stop_gradient'd in the step)
  value  : simaug + forward + deep-supervision loss (no backward)
  grad   : simaug + forward + backward (jax.grad)  [= value + bwd]
  step   : the full build_train_step fn (adds psum/clip/SGD/scan carries)

Per-item cost = slope between B=2 and B=6 runs; per-step overhead =
intercept.  Loop bodies chain through carries (defeats LICM); keys vary
per item and per iteration.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.unet3d import UNet3d, forward
from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation
from unet_studio_tpu.ops.losses import deep_supervision_loss
from unet_studio_tpu.ops.simulate import simulate_modality_template

model = UNet3d.create(1, 4, default_architecture(4), seed=0)
spec = model.spec
params = {k: jnp.asarray(v) for k, v in model.params.items()}
opts = AugOptions()
D, H, W = 192, 224, 192
rng = np.random.default_rng(0)


def make_batch(B):
    img = jnp.asarray(np.clip(rng.random((B, D, H, W, 1), np.float32), 0, 1))
    lab = jnp.asarray((rng.random((B, D, H, W)) * 4).astype(np.float32) // 1)
    keys = jax.random.split(jax.random.key(0), B)
    return img, lab, keys


def item_parts(params, img, lab, key, *, depth):
    k_sim, k_aug = jax.random.split(key)
    x = simulate_modality_template(img[..., 0], lab, 4, k_sim)
    ai, al = visual_perception_augmentation(x[..., None], lab, k_aug, opts, True)
    ai = jax.lax.stop_gradient(ai)
    al = jax.lax.stop_gradient(al)
    if depth == 0:  # simaug
        return jnp.asarray(ai, jnp.float32).ravel()[0] + al.ravel()[0]
    outs, _ = forward(spec, params, ai[None], train=True, compute_dtype=jnp.bfloat16)
    tgt = al[None].astype(jnp.int32)
    loss, _ = deep_supervision_loss(outs, tgt, 4, 0, True, True, True)
    return loss


def scanned(depth, with_grad):
    def fn(params, img, lab, keys, salt):
        def body(acc, item):
            im, lb, k = item
            k = jax.random.fold_in(k, salt)
            im = im + (acc * 1e-30).astype(im.dtype)
            if with_grad:
                g = jax.grad(
                    lambda p: item_parts(p, im, lb, k, depth=depth)
                )(params)
                out = jax.tree.leaves(g)[0].ravel()[0]
            else:
                out = item_parts(params, im, lb, k, depth=depth)
            return acc + jnp.asarray(out, jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (img, lab, keys))
        return acc
    return jax.jit(fn)


def timeloop(fn, *args, iters=6):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(*a, acc + jnp.float32(i)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


for name, depth, wg in [("simaug", 0, False), ("value", 1, False), ("grad", 1, True)]:
    ts = {}
    for B in (2, 6):
        img, lab, keys = make_batch(B)
        ts[B] = timeloop(scanned(depth, wg), params, img, lab, keys)
    slope = (ts[6] - ts[2]) / 4
    icept = ts[2] - 2 * slope
    print(f"{name:7s}: per-item {slope:7.2f} ms  per-call {icept:7.2f} ms "
          f"(B2 {ts[2]:.1f}, B6 {ts[6]:.1f})", flush=True)

# full step
from unet_studio_tpu.engine.optimizer import init_opt_state
from unet_studio_tpu.engine.train import TrainParam, build_train_step
from unet_studio_tpu.parallel.mesh import make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(n_data=1)
rep = NamedSharding(mesh, P())
sh = NamedSharding(mesh, P("data"))
params = jax.device_put(params, rep)
ts = {}
for B in (2, 6):
    step_fn, _ = build_train_step(model, TrainParam(batch_size=B), mesh)
    opt_state = jax.device_put(init_opt_state(params), rep)
    img, lab, keys = make_batch(B)
    img, lab = jax.device_put(img, sh), jax.device_put(lab, sh)
    keys = jax.device_put(keys, sh)
    tmpl = jax.device_put(np.ones(B, bool), sh)
    shf = jax.device_put(np.zeros(B, bool), sh)
    p, o, m = step_fn(params, opt_state, img, lab, tmpl, shf, keys, 1e-3)
    _ = np.asarray(m)
    p, o, m = step_fn(p, o, img, lab, tmpl, shf, keys, 1e-3)
    _ = np.asarray(m)
    n = 5
    t0 = time.perf_counter()
    for _i in range(n):
        p, o, m = step_fn(p, o, img, lab, tmpl, shf, keys, 1e-3)
    _ = np.asarray(m)
    ts[B] = (time.perf_counter() - t0) / n * 1e3
slope = (ts[6] - ts[2]) / 4
icept = ts[2] - 2 * slope
print(f"step   : per-item {slope:7.2f} ms  per-call {icept:7.2f} ms "
      f"(B2 {ts[2]:.1f}, B6 {ts[6]:.1f})", flush=True)
