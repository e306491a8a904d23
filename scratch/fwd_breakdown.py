"""On-chip forward breakdown: where do the 40 ms go?

Times (slope method, two loop lengths, one D2H sync each):
  - packed s1 conv C=16/32/64 at their flagship grids
  - instance norm C=16 full grid
  - full packed forward
  - XLA-route forward
Run: python scratch/fwd_breakdown.py  (claims the real chip)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def slope_time(fn, args, n1=6, n2=18):
    """Per-call seconds via two fori_loop lengths (cancels sync latency)."""

    def loop(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(*a, acc)
                return out

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return run

    r1, r2 = loop(n1), loop(n2)
    _ = float(r1(*args)); _ = float(r2(*args))  # compile
    t0 = time.perf_counter(); _ = float(r1(*args)); t1 = time.perf_counter()
    _ = float(r2(*args)); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    from unet_studio_tpu.ops.pallas_conv import conv3d_s1
    from unet_studio_tpu.models.dsl import default_architecture
    from unet_studio_tpu.models.unet3d import UNet3d, forward, no_pallas_conv

    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0].device_kind, flush=True)

    # per-C s1 conv at its flagship level grid
    for c, (d, h, wd) in ((16, (192, 224, 192)), (32, (96, 112, 96)), (64, (48, 56, 48))):
        x = jnp.asarray(rng.random((d, h, wd, c), np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.random((3, 3, 3, c, c), np.float32) * 0.1, jnp.bfloat16)
        b = jnp.zeros((c,), jnp.float32)

        def f(x, w, b, acc, c=c):
            y = conv3d_s1(x + acc.astype(x.dtype), w, b)
            return acc + jnp.asarray(y, jnp.float32).ravel()[0]

        dt = slope_time(f, (x, w, b))
        dense_tf = 2 * d * h * wd * 27 * c * c / 1e12
        print(
            f"s1 conv C={c} @{d}x{h}x{wd}: {dt*1e3:.2f} ms "
            f"(dense {dense_tf:.3f} TF -> {dense_tf/dt/197:.1%} MFU)",
            flush=True,
        )

    # instance norm C=16 full grid (fwd only)
    from unet_studio_tpu.models.unet3d import _instance_norm

    x = jnp.asarray(rng.random((1, 192, 224, 192, 16), np.float32), jnp.bfloat16)
    wn = jnp.ones((16,), jnp.float32)
    bn = jnp.zeros((16,), jnp.float32)

    def fnorm(x, acc):
        y = _instance_norm(x + acc.astype(x.dtype), wn, bn)
        return acc + jnp.asarray(y, jnp.float32).ravel()[0]

    print(f"inst-norm C=16 full grid: {slope_time(fnorm, (x,))*1e3:.2f} ms", flush=True)

    # full forwards
    model = UNet3d.create(1, 4, default_architecture(4), seed=0)
    spec = model.spec
    params = {k: jnp.asarray(v) for k, v in model.params.items()}
    xin = jnp.asarray(rng.random((1, 192, 224, 192, 1), np.float32), jnp.bfloat16)

    def fpacked(x, acc):
        outs, _ = forward(spec, params, x + acc.astype(x.dtype), train=False,
                          compute_dtype=jnp.bfloat16)
        return acc + jnp.asarray(outs[0], jnp.float32).ravel()[0]

    print(f"packed forward: {slope_time(fpacked, (xin,), 3, 9)*1e3:.2f} ms", flush=True)

    def fxla(x, acc):
        with no_pallas_conv():
            outs, _ = forward(spec, params, x + acc.astype(x.dtype), train=False,
                              compute_dtype=jnp.bfloat16)
        return acc + jnp.asarray(outs[0], jnp.float32).ravel()[0]

    print(f"xla forward: {slope_time(fxla, (xin,), 3, 9)*1e3:.2f} ms", flush=True)

    # parity of the halo-packed kernel on REAL hardware
    yp = jax.jit(lambda x: forward(spec, params, x, train=False,
                                   compute_dtype=jnp.bfloat16)[0][0])(xin)
    def _x(x):
        with no_pallas_conv():
            return forward(spec, params, x, train=False,
                           compute_dtype=jnp.bfloat16)[0][0]
    yr = jax.jit(_x)(xin)
    err = float(jnp.max(jnp.abs(jnp.asarray(yp, jnp.float32) - jnp.asarray(yr, jnp.float32))))
    mag = float(jnp.max(jnp.abs(jnp.asarray(yr, jnp.float32))))
    print(f"packed-vs-xla parity on chip: rel {err/max(mag,1e-6):.4f}", flush=True)

    # aug cost with stamps/perlin ALWAYS on (gate-independent measurement)
    from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation

    img = jnp.asarray(rng.random((192, 224, 192, 1), np.float32))
    lab = jnp.asarray((rng.random((192, 224, 192)) * 4).astype(np.float32) // 1)
    key0 = jax.random.key(3)

    for name, opts in (
        ("default", AugOptions()),
        ("stamps always", AugOptions(rubber_stamping=4, perlin_texture=0, zero_background=0)),
        ("perlin always", AugOptions(rubber_stamping=0, perlin_texture=4, zero_background=0)),
        ("bg off", AugOptions(rubber_stamping=0, perlin_texture=0, zero_background=0)),
    ):
        def faug(img, lab, acc, opts=opts):
            k = jax.random.fold_in(key0, acc.astype(jnp.int32))
            oi, ol = visual_perception_augmentation(img, lab, k, opts, True)
            return acc + oi.ravel()[0] + ol.ravel()[0]

        dt = slope_time(faug, (img, lab), 3, 9)
        print(f"aug [{name}]: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
