"""Random MR-contrast simulation ("simulate_modality", train.cpp:43-180).

Synthesizes a random imaging modality from a normalized T1w volume so one
template can train a contrast-agnostic model:

* template variant: a per-label random lookup (0.4-0.6) builds a "tissue"
  field z, double-Gaussian-smoothed; intensity is remapped by a random
  20-term polynomial in {x, 1-x, z, 1-z} with powers 0-3 and random
  weights, then a random gamma in [0.6, 1.8]; re-normalized over the
  foreground; input voxels <= 0.02 are clamped to 0.
* subject variant: same, but z is a smoothed copy of the image itself.

TPU mapping: the 20-term polynomial is evaluated with four (V,4)x(4,20)
matmuls (powers gathered by one-hot contraction) — no per-voxel loops.
RNG is a clean keyed contract (jax.random) reproducing the reference's
distributions, not its sequential RNG stream (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TERM_COUNT = 20


def gaussian3(vol: jnp.ndarray) -> jnp.ndarray:
    """Separable [1,2,1]/4 smoothing per axis == the classic 3^3 binomial
    kernel TIPL's ``filter::gaussian`` applies.  vol: (D,H,W).

    One edge-pad per axis, then three overlapping slices feed a fused
    weighted sum (the earlier concat form materialized two full copies
    per axis)."""

    def blur_axis(v, axis):
        n = v.shape[axis]
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad, mode="edge")
        lo = jax.lax.slice_in_dim(vp, 0, n, axis=axis)
        hi = jax.lax.slice_in_dim(vp, 2, n + 2, axis=axis)
        return 0.25 * lo + 0.5 * v + 0.25 * hi

    for ax in range(3):
        vol = blur_axis(vol, ax)
    return vol


def _random_terms(key):
    """Random polynomial terms: (a,b) jointly uniform over the 15 pairs with
    a+b>0 (the reference's rejection loop), c,d uniform 0-3, w uniform."""
    k_ab, k_c, k_d, k_w = jax.random.split(key, 4)
    idx = jax.random.randint(k_ab, (TERM_COUNT,), 1, 16)  # 1..15
    a = idx // 4
    b = idx % 4
    c = jax.random.randint(k_c, (TERM_COUNT,), 0, 4)
    d = jax.random.randint(k_d, (TERM_COUNT,), 0, 4)
    w = jax.random.uniform(k_w, (TERM_COUNT,))
    return a, b, c, d, w


def _poly_remap(x: jnp.ndarray, z: jnp.ndarray, key):
    """s = sum_t w_t x^a (1-x)^c z^b (1-z)^d, then s^gamma.  x,z: (D,H,W).

    Exponents are integers 0..3, so each factor is a scalar-predicate
    select over the four precomputed powers — the whole 20-term sum is
    ONE fused elementwise kernel (read x,z / write s).  The earlier
    one-hot-matmul form materialized four (V,20) intermediates, ~2.6 GB
    of HBM traffic at the flagship grid for a compute-trivial op."""
    k_terms, k_gamma = jax.random.split(key)
    a, b, c, d, w = _random_terms(k_terms)
    gamma = 0.6 + 1.2 * jax.random.uniform(k_gamma, ())

    def powers(v):  # tuple [1, v, v^2, v^3]; fused into the consumer
        v2 = v * v
        return (jnp.ones_like(v), v, v2, v2 * v)

    px, pz = powers(x), powers(z)
    qx, qz = powers(1.0 - x), powers(1.0 - z)

    def sel(p, e):  # p[e] for a traced integer e in 0..3
        return jnp.where(
            e == 0, p[0], jnp.where(e == 1, p[1], jnp.where(e == 2, p[2], p[3]))
        )

    s = jnp.zeros_like(x)
    for t in range(TERM_COUNT):
        s = s + w[t] * (
            sel(px, a[t]) * sel(pz, b[t]) * sel(qx, c[t]) * sel(qz, d[t])
        )
    return jnp.exp(gamma * jnp.log(jnp.maximum(s, 1e-20)))


def _renormalize(out, fg_mask):
    """min/max over the foreground, rescale all voxels, clamp to [0,1]
    (train.cpp:111-116)."""
    big = jnp.float32(3.4e38)
    mn = jnp.min(jnp.where(fg_mask, out, big))
    mx = jnp.max(jnp.where(fg_mask, out, -big))
    scale = jnp.where(mx > mn, 1.0 / (mx - mn), 1.0)
    return jnp.clip(jnp.where(mx > mn, (out - mn) * scale, out), 0.0, 1.0)


@partial(jax.jit, static_argnames=("max_label",))
def simulate_modality_template(
    t1w: jnp.ndarray, label: jnp.ndarray, max_label: int, key
) -> jnp.ndarray:
    """Template variant (train.cpp:43-117).  t1w normalized [0,1] (D,H,W);
    label integer (D,H,W); max_label = model out_count."""
    k_lut, k_poly = jax.random.split(key)
    lut = 0.4 + 0.2 * jax.random.uniform(k_lut, (max_label + 1,))
    tissue = lut[jnp.clip(label.astype(jnp.int32), 0, max_label)]
    z = gaussian3(gaussian3(tissue))

    body = t1w > 0.02
    out = _poly_remap(t1w, z, k_poly)
    out = jnp.where(body, out, 0.0)
    fg = body & (label.astype(jnp.int32) != 0)
    return _renormalize(out, fg)


@jax.jit
def simulate_modality_subject(t1w: jnp.ndarray, key) -> jnp.ndarray:
    """Subject variant (train.cpp:119-180): z = smoothed image itself;
    renormalization over all remapped voxels."""
    z = gaussian3(gaussian3(t1w))
    body = t1w > 0.02
    out = _poly_remap(t1w, z, key)
    out = jnp.where(body, out, 0.0)
    return _renormalize(out, body)
