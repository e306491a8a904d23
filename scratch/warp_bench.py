"""On-chip timing: supercell warp vs corner-cell warp, sim, full aug.

Run on the TPU (axon) backend from /root/repo (no PYTHONPATH override —
that clobbers the axon sitecustomize path).

HARNESS RULE: the loop body MUST depend on the carried accumulator —
XLA's while-loop LICM hoists loop-invariant bodies out of fori_loop, so a
body with constant args times ~1 iteration split across N (this bit us:
17.9 "ms" for a 142 ms warp).  Every input below is perturbed by
acc * 1e-30 so the chain is real but numerically inert.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from unet_studio_tpu.ops.resample import (
    sample_warp_image_label, sample_warp_image_label_supercell,
    meshgrid_xyz, affine_matrix, apply_affine)
from unet_studio_tpu.ops.simulate import simulate_modality_template

D, H, W = 192, 224, 192
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((D, H, W)).astype(np.float32))
lab = jnp.asarray((rng.random((D, H, W)) * 4).astype(np.float32) // 1)
grid = meshgrid_xyz((D, H, W))
m = affine_matrix(rotation=(0.1, 0.15, -0.1), scaling=(1.1, 0.95, 1.05),
                  translation=(3.0, -2.0, 1.0), shape_dhw=(D, H, W))
coords = apply_affine(grid + 1.5 * jnp.sin(grid * 0.05), m)


def timeloop(fn, *args, iters=10, perturb=0):
    """args[perturb] gets + acc*1e-30 each iteration (defeats LICM)."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            aa = list(a)
            aa[perturb] = aa[perturb] + (acc * 1e-30).astype(aa[perturb].dtype)
            o = fn(*aa)
            first = jax.tree.leaves(o)[0]
            return acc + jnp.asarray(first, jnp.float32).ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(*args))
    t0 = time.perf_counter()
    _ = float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


t_cc = timeloop(sample_warp_image_label, img, lab, coords, perturb=2)
print(f"corner-cell warp: {t_cc:8.2f} ms", flush=True)
t_sc = timeloop(sample_warp_image_label_supercell, img, lab, coords,
                perturb=2)
print(f"supercell warp:   {t_sc:8.2f} ms  ({t_cc/t_sc:.2f}x)", flush=True)

t_sim = timeloop(lambda a, b, k: simulate_modality_template(a, b, 4, k),
                 img, lab, jax.random.key(0))
print(f"sim template:     {t_sim:8.2f} ms", flush=True)

# full augmentation (default options, is_label) — dominates the step
from unet_studio_tpu.ops.augment import AugOptions, visual_perception_augmentation
opts = AugOptions()
t_aug = timeloop(
    lambda a, b, k: visual_perception_augmentation(a, b, k, opts, True),
    img[..., None], lab, jax.random.key(1))
print(f"full aug (supercell on): {t_aug:8.2f} ms", flush=True)

import os
os.environ["UNET_TPU_NO_SUPERCELL"] = "1"
from unet_studio_tpu.ops import augment as am
aug_nosc = jax.jit(
    am.visual_perception_augmentation.__wrapped__, static_argnums=(3, 4)
)
t_aug0 = timeloop(
    lambda a, b, k: aug_nosc(a, b, k, opts, True),
    img[..., None], lab, jax.random.key(1))
print(f"full aug (no sc): {t_aug0:8.2f} ms", flush=True)
del os.environ["UNET_TPU_NO_SUPERCELL"]
