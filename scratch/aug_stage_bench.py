"""Per-stage cost breakdown of visual_perception_augmentation on chip.

Times full aug with (a) every probability gate OFF (the unconditional
geometry warp + normalize only), then (b) each stage forced ALWAYS-ON one
at a time — the delta vs (a) is that stage's cost.  Static gates resolve
at trace time, so each config is its own executable with no cond overhead.

Keyed timeloop (fold i into the key) so draws vary; loop body depends on
the accumulator (defeats LICM).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation

D, H, W = 192, 224, 192
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((D, H, W, 1)).astype(np.float32))
lab = jnp.asarray((rng.random((D, H, W)) * 4).astype(np.float32) // 1)

GATES = [
    "cropping", "truncation_z", "downsample_x", "downsample_y",
    "downsample_z", "noise", "ambient", "diffuse", "specular",
    "distortion", "zero_background", "rubber_stamping", "perlin_texture",
]
OFF = AugOptions(**{g: 0 for g in GATES}, lens_distortion=0.0, perspective=0.0)


def timeloop_keyed(opts, iters=8):
    @jax.jit
    def loop(a, b):
        def body(i, acc):
            k = jax.random.fold_in(jax.random.key(7), i)
            o = visual_perception_augmentation(
                a + (acc * 1e-30).astype(a.dtype), b, k, opts, True)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(img, lab))
    t0 = time.perf_counter()
    _ = float(loop(img, lab))
    return (time.perf_counter() - t0) / iters * 1e3


t_off = timeloop_keyed(OFF)
print(f"all-off (affine warp + normalize): {t_off:8.2f} ms", flush=True)

for g in GATES:
    opts = dataclasses.replace(OFF, **{g: 4})
    t = timeloop_keyed(opts)
    print(f"+{g:18s}: {t:8.2f} ms  (delta {t - t_off:+7.2f})", flush=True)

for name, kw in [("lens", dict(lens_distortion=0.1)),
                 ("perspective", dict(perspective=0.1))]:
    opts = dataclasses.replace(OFF, **kw)
    t = timeloop_keyed(opts)
    print(f"+{name:18s}: {t:8.2f} ms  (delta {t - t_off:+7.2f})", flush=True)

t_def = timeloop_keyed(AugOptions())
print(f"defaults (gated mix): {t_def:8.2f} ms", flush=True)
