"""Probe 2: cost of the native-kernel lane<->sublane shuffle chains.
Times a grid of tiles doing to_c (native->compute) with the 6-step
supported chain vs composite-permutation variants, plus to_native.
Run on TPU:  python scratch/shuffle_probe.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

GY, AX = 8, 96
D, H, W = 192, 224, 192
AZ, AY = D // 2, H // 2
NG = AY // GY


def to_c_6(blk):
    a = blk.reshape(2, GY, 2, W)
    a = a.transpose(0, 2, 1, 3)
    a = a.transpose(0, 1, 3, 2)
    a = a.reshape(2, 2, AX, 2, GY)
    a = a.transpose(0, 1, 3, 2, 4)
    a = a.transpose(0, 1, 2, 4, 3)
    return a.reshape(8 * GY, AX)


def to_c_2(blk):
    a = blk.reshape(2, GY, 2, W)
    a = a.transpose(0, 2, 3, 1)          # (vz, vy, W, j)
    a = a.reshape(2, 2, AX, 2, GY)       # (vz, vy, axb, vx, j)
    a = a.transpose(0, 1, 3, 4, 2)       # (vz, vy, vx, j, axb)
    return a.reshape(8 * GY, AX)


def to_n_4(c):
    a = c.reshape(2, 2, 2, GY, AX)
    a = a.transpose(0, 1, 2, 4, 3)
    a = a.transpose(0, 1, 3, 2, 4)
    a = a.reshape(2, 2, W, GY)
    a = a.transpose(0, 1, 3, 2)
    a = a.transpose(0, 2, 1, 3)
    return a.reshape(2, 2 * GY, W)


def to_n_2(c):
    a = c.reshape(2, 2, 2, GY, AX)
    a = a.transpose(0, 1, 4, 2, 3)       # (vz, vy, axb, vx, j)
    a = a.reshape(2, 2, W, GY)
    a = a.transpose(0, 3, 1, 2)          # (vz, j, vy, W)
    return a.reshape(2, 2 * GY, W)


def make(fn, inv=False):
    def kern(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...]) + 0.0
    in_shape = (8 * GY, AX) if inv else (2, 2 * GY, W)
    out_shape = (2, 2 * GY, W) if inv else (8 * GY, AX)
    in_spec = (
        pl.BlockSpec((8 * GY, AX), lambda z, t: (z * NG + t, 0))
        if inv
        else pl.BlockSpec((2, 2 * GY, W), lambda z, t: (z, t, 0))
    )
    out_spec = (
        pl.BlockSpec((2, 2 * GY, W), lambda z, t: (z, t, 0))
        if inv
        else pl.BlockSpec((8 * GY, AX), lambda z, t: (z * NG + t, 0))
    )
    arr_in = (AZ * NG * 8 * GY, AX) if inv else (D, H, W)
    arr_out = (D, H, W) if inv else (AZ * NG * 8 * GY, AX)

    def run(x):
        return pl.pallas_call(
            kern, grid=(AZ, NG),
            in_specs=[in_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(arr_out, jnp.float32),
        )(x)
    return run, arr_in


def timeloop(fn, x, iters=20):
    @jax.jit
    def loop(a):
        def body(i, acc):
            o = fn(a + (acc * 1e-30).astype(a.dtype))
            return acc + o.ravel()[0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = float(loop(x)); t0 = time.perf_counter(); _ = float(loop(x))
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.default_rng(0)
for name, fn, inv in (
    ("to_c 6-step", to_c_6, False),
    ("to_c 2-T", to_c_2, False),
    ("to_native 6-step", to_n_4, True),
    ("to_native 2-T", to_n_2, True),
):
    try:
        run, arr_in = make(fn, inv)
        x = jnp.asarray(rng.random(arr_in).astype(np.float32))
        t = timeloop(run, x)
        print(f"{name:18s} {t:7.2f} ms/volume", flush=True)
    except Exception as e:
        print(f"{name:18s} FAIL {str(e).splitlines()[0][:90]}", flush=True)

# correctness cross-check in interpret-free numpy terms
x = rng.random((2, 2 * GY, W)).astype(np.float32)
a6 = np.asarray(jax.jit(to_c_6)(jnp.asarray(x)))
a2 = np.asarray(jax.jit(to_c_2)(jnp.asarray(x)))
print("to_c variants equal:", np.array_equal(a6, a2))
c = rng.random((8 * GY, AX)).astype(np.float32)
n4 = np.asarray(jax.jit(to_n_4)(jnp.asarray(c)))
n2 = np.asarray(jax.jit(to_n_2)(jnp.asarray(c)))
print("to_native variants equal:", np.array_equal(n4, n2))
print("roundtrip:", np.array_equal(np.asarray(jax.jit(to_n_2)(jnp.asarray(a2))), x))
