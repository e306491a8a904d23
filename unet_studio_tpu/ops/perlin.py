"""Perlin gradient noise, jittable (reference:
visual_perception_augmentation.cpp:110-155, .cu:200-281).

The reference hashes lattice points through a shuffled 256-entry
permutation table.  Table lookups are gathers — slow on the TPU VPU — so
we use a integer mix hash (same role, pure ALU, vectorizes) feeding the
identical gradient-selection function.  The noise field is statistically
equivalent; augmentation only consumes its distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash3(xi, yi, zi, seed):
    """Integer mix of lattice coordinates -> uint32."""
    h = (
        xi.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        ^ yi.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
        ^ zi.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)
        ^ seed.astype(jnp.uint32)
    )
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    return h


def _grad(h, x, y, z):
    """The classic Perlin gradient function (12 directions), vectorized
    (visual_perception_augmentation.cpp:112-117)."""
    h = (h & 15).astype(jnp.int32)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin3(coords: jnp.ndarray, seed) -> jnp.ndarray:
    """coords (...,3) float -> noise (...,) in ~[-1, 1]."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    zi = jnp.floor(z).astype(jnp.int32)
    xf, yf, zf = x - xi, y - yi, z - zi
    u, v, w = _fade(xf), _fade(yf), _fade(zf)
    seed = jnp.asarray(seed, jnp.uint32)

    def corner(dx, dy, dz):
        h = _hash3(xi + dx, yi + dy, zi + dz, seed)
        return _grad(h, xf - dx, yf - dy, zf - dz)

    def lerp(t, a, b):
        return a + t * (b - a)

    x1 = lerp(u, corner(0, 0, 0), corner(1, 0, 0))
    x2 = lerp(u, corner(0, 1, 0), corner(1, 1, 0))
    y1 = lerp(v, x1, x2)
    x1 = lerp(u, corner(0, 0, 1), corner(1, 0, 1))
    x2 = lerp(u, corner(0, 1, 1), corner(1, 1, 1))
    y2 = lerp(v, x1, x2)
    return lerp(w, y1, y2)


def perlin_octaves(shape_dhw, zoom, seed, octaves: int = 4) -> jnp.ndarray:
    """4-octave fractal noise then fractional-part folding x2
    (visual_perception_augmentation.cpp:392-411)."""
    d, h, w = shape_dhw
    z = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    y = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    x = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    coords = jnp.stack([x, y, z], axis=-1)
    out = jnp.zeros((d, h, w), jnp.float32)
    for octave in range(octaves):
        pow_octave = 0.5**octave
        out = out + perlin3(coords * (zoom * pow_octave), seed) * pow_octave
    out = out * 2.0
    return out - jnp.floor(out)
