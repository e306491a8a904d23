"""On-chip isolation of the deep-supervision loss pyramid: forward value
vs gradient wrt the logits list (what the train step's backward pays on
top of the conv/norm VJPs), plus the level-0 calc_losses alone.

Run on TPU: python scratch/loss_bwd_ab.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops.losses import calc_losses, deep_supervision_loss

D, H, W, C = 192, 224, 192, 4
rng = np.random.default_rng(0)
outs = []
d, h, w = D, H, W
for k in range(5):
    outs.append(jnp.asarray(rng.normal(0, 2, (1, d, h, w, C)).astype(np.float32)))
    d, h, w = d // 2, h // 2, w // 2
tgt = jnp.asarray((rng.random((1, D, H, W)) * 4).astype(np.int32))


def slope(fn, args, n1=6, n2=18):
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


def ds_value(*args):
    o, t = list(args[:5]), args[5]
    loss, _ = deep_supervision_loss(o, t, 4, 0, True, True, True)
    return loss


def ds_grad(*args):
    o, t = list(args[:5]), args[5]
    def f(o):
        loss, _ = deep_supervision_loss(o, t, 4, 0, True, True, True)
        return loss
    return jax.grad(f)(o)


def ds_grad_collapse(*args):
    o, t = list(args[:5]), args[5]
    def f(o):
        loss, _ = deep_supervision_loss(o, t, 4, 2, True, True, True)
        return loss
    return jax.grad(f)(o)


def l0_value(*args):
    o, t = args[0], args[5]
    return jnp.stack(calc_losses(o, t, 4, 0))


args = tuple(outs) + (tgt,)
print(f"ds loss value : {slope(ds_value, args):7.2f} ms", flush=True)
print(f"ds loss grad  : {slope(ds_grad, args):7.2f} ms", flush=True)
print(f"ds grad w/ collapse: {slope(ds_grad_collapse, args):7.2f} ms", flush=True)
print(f"level0 value  : {slope(l0_value, args):7.2f} ms", flush=True)
