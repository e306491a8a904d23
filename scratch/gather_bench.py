"""Microbenchmark: TPU gather cost vs row width, for the supercell warp design.

Current warp: 8.2M output voxels x one (D,H,W,8) corner-cell row gather
(32 B/row, ~17 ns/row measured) = ~142 ms.
Supercell idea: pack (4^3 or 5^3) neighborhoods per 2x2x2 output block ->
~1.03M rows of 256-500 B. Wins iff ns/row stays ~flat as K grows.

Also: 3D brick gather via lax.gather slice_sizes (skips the packed-table
build entirely), and minor-axis take_along_axis (select-8-of-64 fallback).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
dev = jax.devices()[0]
rng = np.random.default_rng(0)


def timeit(fn, *args, reps=6):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


# --- 1. row-gather width sweep: (n_idx rows fetched from n_rows table) ---
# Mirror the real shapes: big-N small-K (current warp) vs small-N big-K
# (supercell warp). Total fetched bytes constant-ish.
CONFIGS = [
    # (n_idx, K, dtype)  -> current warp: 8.2M x 8 f32
    (8_300_000, 8, jnp.float32),
    (1_040_000, 64, jnp.float32),
    (1_040_000, 125, jnp.float32),
    (1_040_000, 128, jnp.bfloat16),
    (1_040_000, 256, jnp.bfloat16),
]
for n_idx, K, dt in CONFIGS:
    n_rows = 1_040_000 if K > 8 else 8_300_000
    tbl = jax.device_put(jnp.zeros((n_rows, K), dt), dev)
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, n_rows, n_idx, dtype=np.int32)), dev)

    @jax.jit
    def g(t, i):
        return jnp.sum(t[i].astype(jnp.float32), axis=-1)

    d = timeit(g, tbl, idx)
    bytes_row = K * np.dtype(dt.dtype if hasattr(dt, "dtype") else dt).itemsize if False else K * jnp.zeros((), dt).dtype.itemsize
    print(f"rows={n_idx/1e6:4.2f}M K={K:3d} {str(jnp.zeros((), dt).dtype):9s}"
          f" ({bytes_row:4d}B): {d*1e3:8.2f} ms  {d/n_idx*1e9:7.2f} ns/row  "
          f"{n_idx*bytes_row/d/1e9:7.1f} GB/s", flush=True)
    del tbl, idx

# --- 2. 3D brick gather via lax.gather slice_sizes -----------------------
vol = jax.device_put(jnp.zeros((192, 224, 192), jnp.float32), dev)
for L in (4,):
    nb = 1_040_000
    starts = np.stack([
        rng.integers(0, 192 - L, nb),
        rng.integers(0, 224 - L, nb),
        rng.integers(0, 192 - L, nb),
    ], axis=-1).astype(np.int32)
    sidx = jax.device_put(jnp.asarray(starts), dev)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))

    @jax.jit
    def brick(v, s):
        out = jax.lax.gather(v, s, dn, slice_sizes=(L, L, L), mode="clip")
        return jnp.sum(out, axis=(1, 2, 3))

    d = timeit(brick, vol, sidx)
    print(f"brick L={L}: {d*1e3:8.2f} ms for {nb/1e6:.2f}M bricks  "
          f"{d/nb*1e9:7.1f} ns/brick", flush=True)

# --- 3. minor-axis take_along_axis: select 8 of 64 lanes per row ---------
n = 8_300_000
tbl8 = jax.device_put(jnp.zeros((n // 8, 64), jnp.float32), dev)
sel = jax.device_put(
    jnp.asarray(rng.integers(0, 64, (n // 8, 8), dtype=np.int32)), dev)

@jax.jit
def taa(t, s):
    return jnp.sum(jnp.take_along_axis(t, s, axis=-1), axis=-1)

d = timeit(taa, tbl8, sel)
print(f"take_along_axis minor 8-of-64 x {n//8/1e6:.2f}M rows: {d*1e3:8.2f} ms",
      flush=True)

# --- 4. weighted 64-lane reduce (separable-weight alternative) -----------
wx = jax.device_put(jnp.zeros((n // 8, 4), jnp.float32), dev)

@jax.jit
def wred(t, a):
    w = (a[:, :, None, None] * a[:, None, :, None] * a[:, None, None, :])
    return jnp.sum(t.reshape(-1, 4, 4, 4) * w, axis=(1, 2, 3))

d = timeit(wred, tbl8, wx)
print(f"separable 64-lane weighted reduce x {n//8/1e6:.2f}M rows: "
      f"{d*1e3:8.2f} ms", flush=True)
