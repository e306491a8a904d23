"""Pallas TPU kernel for the supercell warp's extract+combine tail.

The supercell warp (ops/resample.py: sample_warp_image_label_supercell,
reference semantics tipl::resample + majority label,
/root/reference/visual_perception_augmentation.cpp:281-335) fetches one
6x6x6 window row per 2x2x2 output block and then extracts each voxel's 8
trilinear corners from the row with staged one-hot contractions.  In XLA
those stages materialize (N,8,2,6,6)-class intermediates in HBM — 27.8 ms
at the flagship grid even in the fused mul-reduce form.  This kernel runs
the whole extraction + trilinear blend + majority vote per VMEM tile:
HBM traffic collapses to read-rows + write-two-(N,8)-outputs.

Layout: everything minor-N.  The gathered rows arrive AS GATHERED in
(N, 216) — the kernel transposes each (B, 216) tile once in VMEM (the
XLA-side transpose this replaces was an HBM round trip, 6.2 ms measured
at the flagship grid) so every subsequent op is a full (8 sublane,
128 lane) vreg: the voxel dim v=8 rides the sublanes, N rides the
lanes.  Per window row (z,y,i) the kernel does 2 FMAs (taps tx=0,1)
against precomputed one-hot masks — 624 (8,B) FMAs per tile total, the
same 624 FMA/voxel the staged contraction always needed, now at VMEM
speed with zero HBM intermediates.

No VJP: augmentation is stop-gradient in the train step (the reference
augments on the host, outside autograd, train.cpp:604-707).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SC_L = 6  # window width per axis (must match ops.resample._SC_L)
_ROWS = _SC_L**3
_B = 512  # N-tile width (lanes); per-tile VMEM ~2 MB


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(g_ref, oz_ref, oy_ref, ox_ref, fz_ref, fy_ref, fx_ref, v_ref,
            img_ref, lab_ref):
    """g (B,216) packed rows AS GATHERED (N-major — the XLA-side
    transpose used to cost 6.2 ms at the flagship grid; a single in-VMEM
    transpose here is free by comparison); o* (8,B) i32; f*/valid (8,B)
    f32.  Writes img (8,B) = trilinear blend of the packed image part
    (un-scaled: caller multiplies by peak/65535) and lab (8,B) =
    majority label."""
    f32 = jnp.float32
    gt = g_ref[...].T  # (216, B) in VMEM
    oz, oy, ox = oz_ref[...], oy_ref[...], ox_ref[...]

    # one-hot masks per (tap, window index): (8,B) each
    def masks(o):
        return [
            [(o + t == i).astype(f32) for i in range(_SC_L)] for t in (0, 1)
        ]

    mx, my, mz = masks(ox), masks(oy), masks(oz)

    # pass 1: contract x.  u1[tx][z][y] (8,B)
    u1 = [[[None] * _SC_L for _ in range(_SC_L)] for _ in range(2)]
    for z in range(_SC_L):
        for y in range(_SC_L):
            base = z * (_SC_L * _SC_L) + y * _SC_L
            acc0 = None
            acc1 = None
            for i in range(_SC_L):
                row = gt[base + i, :][None, :]  # (1,B) -> bcast (8,B)
                t0 = row * mx[0][i]
                t1 = row * mx[1][i]
                acc0 = t0 if acc0 is None else acc0 + t0
                acc1 = t1 if acc1 is None else acc1 + t1
            u1[0][z][y] = acc0
            u1[1][z][y] = acc1

    # pass 2: contract y.  u2[tx][ty][z] (8,B)
    u2 = [[[None] * _SC_L for _ in range(2)] for _ in range(2)]
    for tx in range(2):
        for ty in range(2):
            for z in range(_SC_L):
                acc = None
                for y in range(_SC_L):
                    t = u1[tx][z][y] * my[ty][y]
                    acc = t if acc is None else acc + t
                u2[tx][ty][z] = acc

    # pass 3: contract z.  corners[tz][ty][tx] (8,B)
    corner = {}
    for tx in range(2):
        for ty in range(2):
            for tz in range(2):
                acc = None
                for z in range(_SC_L):
                    t = u2[tx][ty][z] * mz[tz][z]
                    acc = t if acc is None else acc + t
                corner[(tz, ty, tx)] = acc

    # combine: unpack label*65536 + img16, trilinear blend + majority vote
    fz, fy, fx = fz_ref[...], fy_ref[...], fx_ref[...]
    wz = (1.0 - fz, fz)
    wy = (1.0 - fy, fy)
    wx = (1.0 - fx, fx)
    labs, imgs, wgts = [], [], []
    for tz in (0, 1):
        for ty in (0, 1):
            for tx in (0, 1):
                v = corner[(tz, ty, tx)]
                lb = jnp.floor(v * (1.0 / 65536.0))
                imgs.append(v - lb * 65536.0)
                labs.append(lb)
                wgts.append(wz[tz] * wy[ty] * wx[tx])

    out_img = None
    for w, im in zip(wgts, imgs):
        t = w * im
        out_img = t if out_img is None else out_img + t

    best_label = labs[0]
    best_score = None
    for c in range(8):
        score = None
        for j in range(8):
            t = wgts[j] * (labs[j] == labs[c]).astype(f32)
            score = t if score is None else score + t
        if best_score is None:
            best_score = score
        else:
            better = score > best_score
            best_score = jnp.where(better, score, best_score)
            best_label = jnp.where(better, labs[c], best_label)

    vf = v_ref[...]
    img_ref[...] = out_img * vf
    lab_ref[...] = best_label * vf


def extract_combine_packed(rows, oz, oy, ox, fz, fy, fx, valid, peak):
    """Kernel-fused equivalent of
    ``_extract_corners`` + ``_combine_packed_corners``:
    rows (N,216) f32 packed window rows; o* (N,8) i32 in [0,4];
    f* (N,8) f32; valid (N,8) bool; peak traced scalar.
    Returns (img (N,8) f32, lab (N,8) f32)."""
    n = rows.shape[0]
    npad = -(-n // _B) * _B
    pad = npad - n

    def prep(a, dtype):
        a = a.astype(dtype).T  # (8, N)
        return jnp.pad(a, ((0, 0), (0, pad))) if pad else a

    g_nm = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows  # (npad, 216)
    args = (
        g_nm,
        prep(oz, jnp.int32), prep(oy, jnp.int32), prep(ox, jnp.int32),
        prep(fz, jnp.float32), prep(fy, jnp.float32), prep(fx, jnp.float32),
        prep(valid, jnp.float32),
    )
    grid = (npad // _B,)
    row_spec = pl.BlockSpec((_B, _ROWS), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((8, _B), lambda t: (0, t), memory_space=pltpu.VMEM)
    img8, lab8 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec] + [v_spec] * 7,
        out_specs=(v_spec, v_spec),
        out_shape=(
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
            jax.ShapeDtypeStruct((8, npad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_interpret(),
    )(*args)
    img = img8[:, :n].T * (peak / 65535.0)
    lab = lab8[:, :n].T
    return img, lab
