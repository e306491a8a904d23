"""Tracing / profiling (SURVEY.md §5.1).

The reference has only scoped wall-clock markers; here:
* ``trace(path)`` — context manager around the JAX profiler: captures an
  XPlane trace viewable in TensorBoard/Perfetto.
* ``RateMeter`` — steps/sec + volumes/sec meter with EMA, serving the
  BASELINE throughput metrics.
* ``device_time`` — robust kernel timing: runs the body k times inside one
  jitted loop and syncs ONCE via a D2H fetch (on remote-execution backends
  ``block_until_ready`` is unreliable and per-dispatch overhead is ~4-25 ms,
  which silently corrupts naive timings).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate = 0.0
        self._last: float | None = None

    def tick(self, n: int = 1) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = n / max(now - self._last, 1e-9)
            self.rate = inst if self.rate == 0 else (
                self.ema * self.rate + (1 - self.ema) * inst
            )
        self._last = now
        return self.rate


def device_time(body, *args, iters: int = 50) -> float:
    """Median-free single-shot device timing: returns seconds per call.

    ``body(*args, key)`` must return an array (or pytree); each iteration's
    key differs so loop-invariant code motion cannot hoist the work.

    Two measured hazards on the axon remote backend (round 2):
    * a FIXED ~28 ms overhead per jitted-loop call — use ``iters`` >= 50
      so the per-iteration quotient is meaningful, and subtract a
      calibration run (a trivial body) for sub-ms kernels;
    * the loop consumes only one element of the body's output, so XLA
      dead-code-eliminates pure elementwise/pad/reshape bodies to a
      single-element computation.  Only opaque ops (conv, matmul,
      pallas_call) are reliably timed — wrap elementwise pipelines so an
      opaque consumer reads their full result.
    """

    @jax.jit
    def loop(*args):
        def it(i, acc):
            out = body(*args, jax.random.fold_in(jax.random.key(0), i))
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, it, jnp.float32(0))

    _ = float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    _ = float(loop(*args))  # one D2H sync
    return (time.perf_counter() - t0) / iters
