"""On-chip A/B: inference packed forward with vs without deferred-norm
fusion (round-5), plus parity vs XLA.  Slope-timed fori loops."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
from unet_studio_tpu.models.dsl import default_architecture
from unet_studio_tpu.models.unet3d import UNet3d, forward, no_pallas_conv

model = UNet3d.create(1, 4, default_architecture(4), seed=0)
spec = model.spec
params = {k: jnp.asarray(v) for k, v in model.params.items()}
x = jnp.asarray(np.random.default_rng(0).random((1, 192, 224, 192, 1), np.float32), jnp.bfloat16)

def make_fwd():
    def f(params, x):
        outs, _ = forward(spec, params, x, train=False, compute_dtype=jnp.bfloat16)
        return jnp.asarray(outs[0], jnp.float32)
    return f

# parity first
os.environ.pop("UNET_TPU_NO_NORM_FUSION", None)
y_f = jax.jit(make_fwd())(params, x)
os.environ["UNET_TPU_NO_NORM_FUSION"] = "1"
y_u = jax.jit(make_fwd())(params, x)
os.environ.pop("UNET_TPU_NO_NORM_FUSION", None)
with jax.disable_jit(False):
    pass
def xla_fwd(params, x):
    with no_pallas_conv():
        outs, _ = forward(spec, params, x, train=False, compute_dtype=jnp.bfloat16)
    return jnp.asarray(outs[0], jnp.float32)
y_x = jax.jit(xla_fwd)(params, x)
mag = float(jnp.max(jnp.abs(y_x)))
print("fused vs unfused max rel:", float(jnp.max(jnp.abs(y_f - y_u))) / mag, flush=True)
print("fused vs xla    max rel:", float(jnp.max(jnp.abs(y_f - y_x))) / mag, flush=True)

def slope(fn, n1=8, n2=24):
    @jax.jit
    def loop(params, x, n):
        def body(i, acc):
            o = fn(params, x + acc.astype(x.dtype))
            return acc + o.ravel()[0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    import functools
    loop2 = jax.jit(loop, static_argnums=2)
    _ = float(loop2(params, x, n1)); _ = float(loop2(params, x, n2))
    t0 = time.perf_counter(); _ = float(loop2(params, x, n1)); t1 = time.perf_counter()
    _ = float(loop2(params, x, n2)); t2 = time.perf_counter()
    return ((t2-t1)-(t1-t0))/(n2-n1)*1e3

ms_f = slope(make_fwd())
os.environ["UNET_TPU_NO_NORM_FUSION"] = "1"
ms_u = slope(make_fwd())
os.environ.pop("UNET_TPU_NO_NORM_FUSION", None)
print(f"fused   : {ms_f:.2f} ms", flush=True)
print(f"unfused : {ms_u:.2f} ms", flush=True)
