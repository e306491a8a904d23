"""Benchmark: skull-strip inference + one-template training throughput on
the flagship model grid.

Runs on whatever accelerator jax sees (the driver provides one real TPU
chip).  Prints one JSON line per metric:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N|null}

Metrics (the two BASELINE.json judged axes):
  * t1w_volumes_per_sec_skullstrip_infer_192x224x192 — jitted forward +
    softmax/argmax postproc
  * train_items_per_sec_per_chip — contrast sim + full visual-perception
    augmentation + fwd/bwd + SGD step, all on device (train.cpp hot loop)

The reference publishes no numbers (BASELINE.md), so vs_baseline is null;
the driver's BENCH_r{N}.json history is the comparison across rounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unet_studio_tpu.models.dsl import default_architecture
    from unet_studio_tpu.models.unet3d import UNet3d, forward

    # flagship: default 6-level U-Net, default 192x224x192 grid, 4 classes
    model = UNet3d.create(1, 4, default_architecture(4), seed=0)
    spec = model.spec
    params = {k: jnp.asarray(v) for k, v in model.params.items()}

    @jax.jit
    def infer(params, x):
        outs, _ = forward(spec, params, x, train=False, compute_dtype=jnp.bfloat16)
        prob = jax.nn.softmax(jnp.asarray(outs[0], jnp.float32), axis=-1)
        fg = 1.0 - prob[..., 0]
        label = jnp.where(fg > 0.5, jnp.argmax(prob, axis=-1).astype(jnp.int32), 0)
        return label, fg

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 192, 224, 192, 1), np.float32),
        jnp.bfloat16,
    )

    # time k inferences inside ONE jitted loop: on remote-execution
    # backends block_until_ready is unreliable and per-call dispatch adds
    # tens of ms, so the loop runs on device and we sync once via a D2H
    # fetch of a scalar that depends on every iteration.
    n_iters = 10

    @jax.jit
    def timed_loop(params, x):
        def body(i, acc):
            label, fg = infer(params, x + acc.astype(x.dtype))
            return acc + fg.ravel()[0]
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0))

    _ = float(timed_loop(params, x))  # compile + warm
    t0 = time.perf_counter()
    _ = float(timed_loop(params, x))  # device-bound, one sync
    dt = time.perf_counter() - t0
    vps = n_iters / dt

    print(
        json.dumps(
            {
                "metric": "t1w_volumes_per_sec_skullstrip_infer_192x224x192",
                "value": round(vps, 4),
                "unit": "volumes/sec",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )

    # ---- one-template training throughput (items/sec/chip) ---------------
    from unet_studio_tpu.engine.optimizer import init_opt_state
    from unet_studio_tpu.engine.train import TrainParam, build_train_step
    from unet_studio_tpu.parallel.mesh import make_mesh

    from jax.sharding import NamedSharding, PartitionSpec as P

    B = 4  # accumulated via lax.scan; per-item cost is batch-invariant
    mesh = make_mesh(n_data=1)
    tparam = TrainParam(batch_size=B)
    rng = np.random.default_rng(1)
    # commit EVERYTHING to the mesh up front: uncommitted params make the
    # first post-warmup call recompile (ROUND1_NOTES finding 7), and numpy
    # inputs would re-upload ~270 MB per call over the dev tunnel
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(init_opt_state(params), rep)
    img = jax.device_put(
        np.clip(rng.random((B, 192, 224, 192, 1), np.float32), 0, 1), sh
    )
    lab = jax.device_put(
        rng.integers(0, 4, (B, 192, 224, 192)).astype(np.float32), sh
    )
    tmpl = jax.device_put(np.ones(B, bool), sh)
    shift = jax.device_put(np.zeros(B, bool), sh)
    keys = jax.device_put(jax.random.split(jax.random.key(0), B), sh)
    lr = 1e-3

    def time_train_step():
        step_fn, _ = build_train_step(model, tparam, mesh)
        p, o, m = step_fn(params, opt_state, img, lab, tmpl, shift, keys, lr)
        _ = np.asarray(m)  # compile + warm, sync via D2H
        p, o, m = step_fn(p, o, img, lab, tmpl, shift, keys, lr)
        _ = np.asarray(m)  # second warmup: first call with committed outputs
        n_steps = 2
        t0 = time.perf_counter()
        for _i in range(n_steps):
            p, o, m = step_fn(p, o, img, lab, tmpl, shift, keys, lr)
        _ = np.asarray(m)  # one sync; steps chain through param deps
        return n_steps * B / (time.perf_counter() - t0)

    try:
        ips = time_train_step()
    except Exception as e:  # noqa: BLE001
        # safety net for the packed-kernel train path: fall back to the
        # XLA train step so the driver still records a number
        print(f"packed train step failed ({type(e).__name__}); "
              "retrying with UNET_TPU_NO_PALLAS", file=sys.stderr)
        from unet_studio_tpu.models import unet3d as _u

        _u._PALLAS_CONV_ENABLED = False
        ips = time_train_step()

    print(
        json.dumps(
            {
                "metric": "train_items_per_sec_per_chip",
                "value": round(ips, 4),
                "unit": "items/sec/chip",
                "vs_baseline": None,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
