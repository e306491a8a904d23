"""Refined on-chip segments: fixed-input fwd+loss value vs FULL-TREE grad
(no DCE of dw kernels), and scan-accum overhead isolation.

Segments (per-item slope between B=2 and B=6):
  flv   : forward(train=True) + ds-loss on a FIXED input, value only
  flg   : same, jax.grad wrt params, output touches EVERY grad leaf
  itemg : sim + aug + fwd + loss grad, full-tree output
  accum : itemg scanned with a zero-init grad accumulator tree (the
          device_step body, no psum/clip/sgd)
Compare: step (from step_segments.py) - accum = optimizer+psum cost.
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


def fwdloss(params, x, tgt):
    outs, _ = forward(spec, params, x[None], train=True, compute_dtype=jnp.bfloat16)
    loss, _ = deep_supervision_loss(outs, tgt[None], 4, 0, True, True, True)
    return loss


def tree_probe(g):
    return sum(jnp.asarray(v, jnp.float32).ravel()[0] for v in jax.tree.leaves(g))


def item_grad(params, img, lab, key):
    k_sim, k_aug = jax.random.split(key)
    x = simulate_modality_template(img[..., 0], lab, 4, k_sim)
    ai, al = visual_perception_augmentation(x[..., None], lab, k_aug, opts, True)
    ai = jax.lax.stop_gradient(ai)
    al = jax.lax.stop_gradient(al)
    return jax.grad(fwdloss)(params, ai, al.astype(jnp.int32))


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


def make_batch(B):
    img = jnp.asarray(np.clip(rng.random((B, D, H, W, 1), np.float32), 0, 1))
    lab = jnp.asarray((rng.random((B, D, H, W)) * 4).astype(np.float32) // 1)
    keys = jax.random.split(jax.random.key(0), B)
    return img, lab, keys


def scanned(kind):
    def fn(params, img, lab, keys, salt):
        if kind == "flv" or kind == "flg":
            def body(acc, item):
                im, lb, _k = item
                im = im + (acc * 1e-30).astype(im.dtype)
                if kind == "flv":
                    out = fwdloss(params, im, lb.astype(jnp.int32))
                else:
                    out = tree_probe(
                        jax.grad(fwdloss)(params, im, lb.astype(jnp.int32))
                    )
                return acc + jnp.asarray(out, jnp.float32), None
            acc, _ = jax.lax.scan(body, salt, (img, lab, keys))
            return acc
        if kind == "itemg":
            def body(acc, item):
                im, lb, k = item
                k = jax.random.fold_in(k, salt)
                im = im + (acc * 1e-30).astype(im.dtype)
                g = item_grad(params, im, lb, k)
                return acc + tree_probe(g), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), (img, lab, keys))
            return acc
        if kind == "accum":
            zero = jax.tree.map(jnp.zeros_like, params)
            def body(carry, item):
                gacc, acc = carry
                im, lb, k = item
                k = jax.random.fold_in(k, salt)
                im = im + (acc * 1e-30).astype(im.dtype)
                g = item_grad(params, im, lb, k)
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (gacc, acc + 1.0), None
            (gacc, _), _ = jax.lax.scan(
                body, (zero, jnp.float32(0)), (img, lab, keys)
            )
            return tree_probe(gacc)
        raise ValueError(kind)
    return jax.jit(fn)


for kind in ("flv", "flg", "itemg", "accum"):
    ts = {}
    for B in (2, 6):
        img, lab, keys = make_batch(B)
        ts[B] = timeloop(scanned(kind), params, img, lab, keys)
    slope = (ts[6] - ts[2]) / 4
    icept = ts[2] - 2 * slope
    print(f"{kind:6s}: per-item {slope:7.2f} ms  per-call {icept:7.2f} ms "
          f"(B2 {ts[2]:.1f}, B6 {ts[6]:.1f})", flush=True)
