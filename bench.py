"""Benchmark: skull-strip inference + one-template training throughput on
the flagship model grid.

Runs on whatever accelerator jax sees (the driver provides one real TPU
chip).  Prints one JSON line per metric:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N|null}

Judged metrics (the two BASELINE.json axes):
  * t1w_volumes_per_sec_skullstrip_infer_192x224x192 — the REAL evaluate
    engine graph (fov_pre resample -> forward -> fov_post resample ->
    softmax/argmax postproc) on a 182x218x182 @1mm native T1w grid
    (evaluate.cpp:211-246 analog), not a bare forward.
  * train_items_per_sec_per_chip — contrast sim + full visual-perception
    augmentation + fwd/bwd + SGD step, all on device (train.cpp hot loop)

Secondary metrics: packed-forward latency, MFU and HBM-roofline fractions
(absolute utilization, from the analytic model in utils/flops.py).

HONESTY RULES (round-2 verdict items 2 and 6):
  * Before ANY packed-path number is timed, the packed forward is compared
    against the XLA forward ON CHIP at bf16 tolerance and the measured
    error is printed as its own metric line.  A perf number on a wrong
    network is void — round 2 shipped exactly that.
  * If the packed path fails parity or crashes, the fallback number is
    reported under a DISTINCT ``*_xla_fallback`` metric name so the
    driver's history can never read "flagship path broken" as "flat".

RESILIENCE RULES (round-3 verdict item 1 — BENCH_r03 died rc=1 on ONE
unretried transient tunnel error before any metric was emitted):
  * Model init is host-side numpy; no device work happens before the
    first metric line is printed.
  * Every device stage runs under bounded retries with backoff on
    transient backend errors (axon remote_compile/tunnel hiccups),
    within an overall wall-clock deadline (UNET_BENCH_DEADLINE_S,
    default 2400 s).
  * Metrics are emitted incrementally per stage; a stage failure is
    reported and later stages still run, so a partial outage still
    records everything measurable.

The reference publishes no numbers (BASELINE.md), so vs_baseline is null;
the driver's BENCH_r{N}.json history is the comparison across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

_START = time.monotonic()
_DEADLINE_S = float(os.environ.get("UNET_BENCH_DEADLINE_S", "2400"))

# Backend/transport failure classes only.  Deliberately NOT listed: bare
# "INTERNAL" — genuine compile bugs surface as INTERNAL on this backend
# too, and retrying a code bug 5x costs ~3.5 min of sleeps before the real
# error propagates (round-4 verdict, weak #4).  Transient INTERNAL errors
# from the axon tunnel carry one of the transport markers below anyway.
_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body",
    "read body",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection",
    "connection",
    "socket",
    "tunnel",
    "RESOURCE_EXHAUSTED",
    "ABORTED",
)


def emit(metric: str, value: float, unit: str) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 4),
                "unit": unit,
                "vs_baseline": None,
            }
        ),
        flush=True,
    )


def log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _START:.0f}s] {msg}", file=sys.stderr, flush=True)


def _is_transient(e: Exception) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in _TRANSIENT_MARKERS)


def retry(name: str, fn, tries: int = 5, sleeps=(15, 30, 60, 120)):
    """Run fn with bounded retries on transient backend errors, inside the
    overall wall-clock deadline.  Non-transient errors propagate at once
    (they are code bugs; retrying would just repeat them)."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            remaining = _DEADLINE_S - (time.monotonic() - _START)
            if not _is_transient(e) or attempt + 1 == tries or remaining < 30:
                raise
            wait = min(sleeps[min(attempt, len(sleeps) - 1)], max(remaining - 30, 1))
            log(
                f"{name}: transient backend failure "
                f"(attempt {attempt + 1}/{tries}: {type(e).__name__}: "
                f"{str(e)[:200]}); retrying in {wait:.0f}s"
            )
            time.sleep(wait)
    raise RuntimeError("unreachable")


def main() -> int:
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
    from unet_studio_tpu.models.unet3d import (
        UNet3d,
        forward,
        no_pallas_conv,
        set_pallas_conv_enabled,
    )
    from unet_studio_tpu.utils.flops import chip_peaks, forward_cost, train_step_flops

    # flagship: default 6-level U-Net, default 192x224x192 grid, 4 classes.
    # Init is HOST-SIDE numpy — zero device traffic before the first metric.
    model = UNet3d.create(1, 4, default_architecture(4), seed=0)
    spec = model.spec
    model_dhw = model.dim_dhw

    # static metrics first: recorded even if the device is unreachable
    fwd_flops, fwd_bytes = forward_cost(spec, model_dhw, bytes_per_el=2)
    emit("flagship_forward_tflops", fwd_flops / 1e12, "TFLOP")

    peaks = None
    try:
        kind = retry("device probe", lambda: jax.devices()[0].device_kind)
        log(f"device: {kind}")
        peaks = chip_peaks(kind)
    except Exception as e:  # noqa: BLE001
        log(f"device probe failed ({type(e).__name__}: {e}); MFU lines skipped")

    np_params = model.params
    params = retry(
        "param upload",
        lambda: {k: jax.device_put(jnp.asarray(v)) for k, v in np_params.items()},
    )

    x = jnp.asarray(
        np.random.default_rng(0).random((1, *model_dhw, 1), np.float32),
        jnp.bfloat16,
    )

    # ---- on-chip numerics gate: packed forward vs XLA forward -------------
    # (round-2 verdict item 2: the 19.46 vols/s figure measured a network
    # with ~80% relative error; no perf number is valid without this)
    @jax.jit
    def fwd_packed(params, x):
        outs, _ = forward(spec, params, x, train=False, compute_dtype=jnp.bfloat16)
        return jnp.asarray(outs[0], jnp.float32)

    @jax.jit
    def fwd_xla(params, x):
        with no_pallas_conv():
            outs, _ = forward(
                spec, params, x, train=False, compute_dtype=jnp.bfloat16
            )
        return jnp.asarray(outs[0], jnp.float32)

    packed_ok = True
    try:
        def parity_gate():
            yp = fwd_packed(params, x)
            yr = fwd_xla(params, x)
            ref_mag = float(jnp.max(jnp.abs(yr)))
            err = float(jnp.max(jnp.abs(yp - yr)))
            return err / max(ref_mag, 1e-6)

        rel = retry("conv parity gate", parity_gate)
        emit("packed_forward_max_rel_err_vs_xla", rel, "ratio")
        if rel > 0.05:
            log(f"PARITY FAILURE: packed forward rel err {rel:.4f} — XLA fallback")
            packed_ok = False
    except Exception as e:  # noqa: BLE001
        log(f"packed forward failed ({type(e).__name__}: {e}); XLA fallback")
        packed_ok = False

    if not packed_ok:
        set_pallas_conv_enabled(False)

    # ---- judged axis 1: the evaluate-engine graph on a native T1w grid ----
    # (round-3 verdict item 3: time the product path, not a bare forward)
    from unet_studio_tpu.engine.evaluate import make_infer_graph

    image_dhw = (182, 218, 182)  # MNI152-sized 1mm T1w
    image_vs = np.array([1.0, 1.0, 1.0], np.float32)
    run_graph = make_infer_graph(model, image_dhw, image_vs, jnp.bfloat16)
    state: dict = {}
    native = jnp.asarray(
        np.random.default_rng(2).random((*image_dhw, 1), np.float32)
    )

    # ---- on-chip numerics gate #1b: packed-head fov_post vs canonical ----
    # (the judged infer metric rides the packed-head separable fov_post;
    # same honesty rule — gate the NEW path against its exact fallback
    # before timing it, and time the fallback under a distinct name if it
    # fails)
    infer_suffix = ""
    if packed_ok:
        try:
            os.environ["UNET_TPU_NO_PACKED_HEAD"] = "1"
            run_graph_std = make_infer_graph(
                model, image_dhw, image_vs, jnp.bfloat16
            )
            del os.environ["UNET_TPU_NO_PACKED_HEAD"]

            def head_gate():
                _, p1, _ = jax.jit(run_graph)(params, state, native)
                _, p2, _ = jax.jit(run_graph_std)(params, state, native)
                mag = float(jnp.max(jnp.abs(p2)))
                return float(jnp.max(jnp.abs(p1 - p2))) / max(mag, 1e-6)

            rel_h = retry("packed-head fov gate", head_gate)
            emit("infer_packed_head_max_rel_err", rel_h, "ratio")
            if rel_h > 0.02:
                log(
                    f"PARITY FAILURE: packed-head fov rel err {rel_h:.4f}"
                    " — canonical-head route"
                )
                run_graph = run_graph_std
                infer_suffix = "_packed_head_off"
        except Exception as e:  # noqa: BLE001
            log(
                f"packed-head gate failed ({type(e).__name__}: {e});"
                " canonical-head route"
            )
            os.environ["UNET_TPU_NO_PACKED_HEAD"] = "1"
            run_graph = make_infer_graph(model, image_dhw, image_vs, jnp.bfloat16)
            del os.environ["UNET_TPU_NO_PACKED_HEAD"]
            infer_suffix = "_packed_head_off"

    # TIMING METHOD: run k iterations inside ONE jitted device loop (on
    # remote-execution backends block_until_ready is unreliable and each
    # dispatch+D2H sync costs a ~100-145 ms tunnel round trip), at TWO
    # loop lengths, and report the SLOPE (t(n2)-t(n1))/(n2-n1) — the
    # fixed per-call cost cancels exactly, so the number reflects the
    # steady-state device rate a colocated production host would see.
    n1, n2 = 8, 32

    def make_loop(body):
        @partial(jax.jit, static_argnames=("n",))
        def run(params, chunk, n):
            return jax.lax.fori_loop(0, n, partial(body, params, chunk), jnp.float32(0))

        return run

    def slope_time(loop, args, n1, n2):
        _ = float(loop(*args, n=n1))  # compile + warm both lengths
        _ = float(loop(*args, n=n2))
        t0 = time.perf_counter()
        _ = float(loop(*args, n=n1))
        t1 = time.perf_counter()
        _ = float(loop(*args, n=n2))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1)

    def infer_body(params, chunk, i, acc):
        label, prob, fg = run_graph(params, state, chunk + acc.astype(chunk.dtype))
        return (
            acc
            + jnp.float32(fg.ravel()[0])
            + jnp.float32(label.ravel()[0])
            + prob.ravel()[0] * 0.0
        )

    infer_loop = make_loop(infer_body)

    infer_metric = "t1w_volumes_per_sec_skullstrip_infer_192x224x192"
    if not packed_ok:
        infer_metric += "_xla_fallback"
    else:
        infer_metric += infer_suffix
    infer_ms = None
    try:
        per_vol = retry(
            "evaluate-graph timing",
            lambda: slope_time(infer_loop, (params, native), n1, n2),
        )
        infer_ms = per_vol * 1e3
        emit(infer_metric, 1.0 / per_vol, "volumes/sec")
    except Exception as e:  # noqa: BLE001
        log(f"evaluate-graph stage FAILED ({type(e).__name__}: {e})")

    # ---- secondary: bare packed forward latency + absolute utilization ----
    def fwd_body(params, x, i, acc):
        outs, _ = forward(
            spec, params, x + acc.astype(x.dtype), train=False,
            compute_dtype=jnp.bfloat16,
        )
        return acc + jnp.asarray(outs[0], jnp.float32).ravel()[0]

    fwd_loop = make_loop(fwd_body)

    fwd_ms = None
    try:
        fwd_ms = retry(
            "bare forward timing",
            lambda: slope_time(fwd_loop, (params, x), n1, n2) * 1e3,
        )
        name = "packed_forward_ms" if packed_ok else "xla_forward_ms"
        emit(name, fwd_ms, "ms")
        if peaks:
            emit("mfu_forward_pct", 100.0 * fwd_flops / (fwd_ms * 1e-3) / peaks[0], "%")
            emit(
                "hbm_roofline_forward_pct",
                100.0 * fwd_bytes / (fwd_ms * 1e-3) / peaks[1],
                "%",
            )
        if infer_ms is not None:
            emit("infer_graph_overhead_ms", infer_ms - fwd_ms, "ms")
    except Exception as e:  # noqa: BLE001
        log(f"bare-forward stage failed ({type(e).__name__}: {e})")

    # ---- on-chip numerics gate #2: supercell warp vs corner-cell warp ----
    # (the train step's augmentation routes through the supercell sampler;
    # same honesty rule as the conv gate — no timing a wrong pipeline)
    from unet_studio_tpu.ops.resample import (
        affine_matrix,
        apply_affine,
        meshgrid_xyz,
        sample_warp_image_label,
        sample_warp_image_label_supercell,
    )

    wrng = np.random.default_rng(7)
    wimg = jnp.asarray(wrng.random(model_dhw, np.float32))
    wlab = jnp.asarray((wrng.random(model_dhw) * 4).astype(np.float32) // 1)
    wm = affine_matrix(
        rotation=(0.1, 0.15, -0.1),
        scaling=(1.1, 0.95, 1.05),
        translation=(3.0, -2.0, 1.0),
        shape_dhw=model_dhw,
    )
    wcoords = apply_affine(meshgrid_xyz(model_dhw), wm)
    try:
        def warp_gate():
            si, sl = jax.jit(sample_warp_image_label_supercell)(wimg, wlab, wcoords)
            bi, bl = jax.jit(sample_warp_image_label)(wimg, wlab, wcoords)
            return float(jnp.max(jnp.abs(si - bi))), float(jnp.mean(sl == bl))

        img_err, lab_match = retry("supercell warp gate", warp_gate)
        emit("supercell_warp_max_abs_err_vs_corner_cell", img_err, "value")
        if img_err > 1e-3 or lab_match < 0.999:
            log(
                f"WARP PARITY FAILURE: img err {img_err:.5f}, label match "
                f"{lab_match:.5f} — disabling the supercell route"
            )
            os.environ["UNET_TPU_NO_SUPERCELL"] = "1"
    except Exception as e:  # noqa: BLE001
        log(
            f"supercell warp gate failed ({type(e).__name__}: {e}); "
            "disabling the supercell route"
        )
        os.environ["UNET_TPU_NO_SUPERCELL"] = "1"
    del wimg, wlab, wcoords

    # ---- judged axis 2: one-template training throughput ------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_studio_tpu.engine.optimizer import init_opt_state
    from unet_studio_tpu.engine.train import TrainParam, build_train_step
    from unet_studio_tpu.parallel.mesh import make_mesh

    B = 4  # accumulated via lax.scan; per-item cost is batch-invariant
    mesh = make_mesh(n_data=1)
    tparam = TrainParam(batch_size=B)
    rng = np.random.default_rng(1)
    # commit EVERYTHING to the mesh up front: uncommitted params make the
    # first post-warmup call recompile (ROUND1_NOTES finding 7), and numpy
    # inputs would re-upload ~270 MB per call over the dev tunnel
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))

    n_steps = 4

    def stage_train_inputs():
        # one key batch PER STEP: the augmentation's 25-75% probability
        # gates are real lax.cond branches, so a single fixed key batch
        # would time one arbitrary gate draw; n_steps*B draws sample the
        # average mix the training loop actually pays
        key_batches = [
            jax.device_put(
                jax.random.split(jax.random.fold_in(jax.random.key(0), s), B),
                sh,
            )
            for s in range(n_steps)
        ]
        return (
            jax.device_put(params, rep),
            jax.device_put(init_opt_state(params), rep),
            jax.device_put(
                np.clip(rng.random((B, *model_dhw, 1), np.float32), 0, 1), sh
            ),
            jax.device_put(
                rng.integers(0, 4, (B, *model_dhw)).astype(np.float32), sh
            ),
            jax.device_put(np.ones(B, bool), sh),
            jax.device_put(np.zeros(B, bool), sh),
            key_batches,
        )

    lr = 1e-3

    def time_train_step():
        tp, opt_state, img, lab, tmpl, shift, key_batches = retry(
            "train input staging", stage_train_inputs
        )
        step_fn, _ = build_train_step(model, tparam, mesh)

        def timed():
            p, o, m = step_fn(tp, opt_state, img, lab, tmpl, shift, key_batches[0], lr)
            _ = np.asarray(m)  # compile + warm, sync via D2H
            p, o, m = step_fn(p, o, img, lab, tmpl, shift, key_batches[0], lr)
            _ = np.asarray(m)  # second warmup: first call w/ committed outputs
            # slope over two chained-step counts: the one D2H sync per
            # segment (~100-145 ms tunnel round trip) cancels exactly
            k1, k2 = n_steps, 3 * n_steps
            t0 = time.perf_counter()
            for i in range(k1):
                p, o, m = step_fn(p, o, img, lab, tmpl, shift, key_batches[i % n_steps], lr)
            _ = np.asarray(m)  # sync; steps chain through param deps
            t1 = time.perf_counter()
            for i in range(k2):
                p, o, m = step_fn(p, o, img, lab, tmpl, shift, key_batches[i % n_steps], lr)
            _ = np.asarray(m)
            t2 = time.perf_counter()
            return (k2 - k1) * B / ((t2 - t1) - (t1 - t0))

        return retry("train step timing", timed)

    train_metric = "train_items_per_sec_per_chip"
    if os.environ.get("UNET_TPU_NO_SUPERCELL"):
        train_metric += "_supercell_off"
    train_fallback = not packed_ok
    ips = None
    try:
        ips = time_train_step()
    except Exception as e:  # noqa: BLE001
        if train_fallback:
            log(f"train stage FAILED on the XLA path ({type(e).__name__}: {e})")
        else:
            # safety net so the driver still records a number — but under a
            # DISTINCT metric name: a broken flagship path must be visible
            # in the bench history, not disguised as "flat"
            log(
                f"packed train step failed ({type(e).__name__}: {e}); "
                "retrying on the XLA path"
            )
            set_pallas_conv_enabled(False)
            train_fallback = True
            try:
                ips = time_train_step()
            except Exception as e2:  # noqa: BLE001
                log(f"train stage FAILED on the XLA path too ({type(e2).__name__}: {e2})")

    if ips is not None:
        if train_fallback:
            train_metric += "_xla_fallback"
        emit(train_metric, ips, "items/sec/chip")
        if peaks:
            emit(
                "mfu_train_step_pct",
                100.0 * train_step_flops(spec, model_dhw) * ips / peaks[0],
                "%",
            )

    # ---- learning evidence: one-template convergence on chip --------------
    # (round-4 verdict item 1: step-time numbers without any proof the
    # steps LEARN; this stage trains the flagship ARCHITECTURE at a 64^3
    # grid on a synthetic 4-class phantom for 60 epochs and reports the
    # validation dice-error drop.  ~3 min incl compile; skipped when the
    # wall-clock deadline is nearly spent.)
    remaining = _DEADLINE_S - (time.monotonic() - _START)
    if remaining > 420:
        try:
            drop, d_first, d_last = retry(
                "convergence stage",
                lambda: _convergence_stage(jax, jnp),
            )
            emit("train_dice_error_drop_pct_60epochs_64cube", 100.0 * drop, "%")
            log(
                f"convergence: val dice error {d_first:.4f} -> {d_last:.4f}"
            )
        except Exception as e:  # noqa: BLE001
            log(f"convergence stage failed ({type(e).__name__}: {e})")
    else:
        log(f"convergence stage skipped ({remaining:.0f}s left of deadline)")

    ok = infer_ms is not None and ips is not None
    log("bench complete" if ok else "bench INCOMPLETE (see stage failures above)")
    return 0 if ok else 1


def _convergence_stage(jax, jnp):
    """Train the flagship architecture (train.cpp:1054-1069) at a 64^3
    grid on a synthetic phantom through the REAL train step (sim + aug +
    fwd/bwd + SGD) and measure the validation dice-error drop."""
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_studio_tpu.engine.optimizer import init_opt_state, poly_lr
    from unet_studio_tpu.engine.train import TrainParam, build_train_step
    from unet_studio_tpu.models.dsl import default_architecture
    from unet_studio_tpu.models.unet3d import UNet3d
    from unet_studio_tpu.ops.augment import AugOptions
    from unet_studio_tpu.parallel.mesh import make_mesh

    n = 64
    epochs, bsz, lr0 = 60, 4, 0.02
    model = UNet3d.create(1, 4, default_architecture(4), seed=1)
    model.dim = (n, n, n)
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    label = (r < n / 3).astype(np.float32)
    label[r < n / 4.5] = 2.0
    label[r < n / 9] = 3.0
    img = np.clip(1.0 - r / (n / 2), 0, 1).astype(np.float32) * (label > 0)

    mesh = make_mesh(n_data=1)
    tparam = TrainParam(batch_size=bsz, epoch=epochs, learning_rate=lr0)
    step_fn, valid_fn = build_train_step(model, tparam, mesh)
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P("data"))
    params = jax.device_put(
        {k: jnp.asarray(v) for k, v in model.params.items()}, rep
    )
    opt = jax.device_put(init_opt_state(params), rep)
    imgs = jax.device_put(
        np.broadcast_to(img[None, ..., None], (bsz, n, n, n, 1)).copy(), sh
    )
    labs = jax.device_put(
        np.broadcast_to(label[None], (bsz, n, n, n)).copy(), sh
    )
    tmpl = jax.device_put(np.ones(bsz, bool), sh)
    shift = jax.device_put(np.zeros(bsz, bool), sh)
    vimg = jnp.asarray(img[None, ..., None])
    vlab = jnp.asarray(label[None])

    d_first = None
    for e in range(epochs):
        keys = jax.device_put(
            jax.random.split(jax.random.fold_in(jax.random.key(7), e), bsz), sh
        )
        lr = float(poly_lr(lr0, e, epochs))
        params, opt, _ = step_fn(params, opt, imgs, labs, tmpl, shift, keys, lr)
        if e == 0:
            d_first = float(np.asarray(valid_fn(params, vimg, vlab))[1])
    d_last = float(np.asarray(valid_fn(params, vimg, vlab))[1])
    if not (np.isfinite(d_first) and np.isfinite(d_last)) or d_first <= 0:
        raise RuntimeError(f"non-finite dice errors {d_first} {d_last}")
    return 1.0 - d_last / d_first, d_first, d_last


if __name__ == "__main__":
    sys.exit(main())
