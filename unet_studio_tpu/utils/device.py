"""Device probe + boot-time capability report (the check_cuda analog,
cuda.cu:34-74) and multi-host initialization.
"""

from __future__ import annotations

from . import log


def check_tpu() -> str:
    """Probe the accelerator, run a tiny self-test, report capabilities.
    Returns an empty string on success, an error message otherwise."""
    try:
        import jax
        import jax.numpy as jnp

        devices = jax.devices()
        for d in devices:
            stats = {}
            try:
                stats = d.memory_stats() or {}
            except Exception:  # noqa: BLE001
                pass
            hbm = stats.get("bytes_limit")
            hbm_s = f", {hbm / 2**30:.1f} GiB HBM" if hbm else ""
            log.out(f"device {d.id}: {d.device_kind} ({d.platform}){hbm_s}")
        # self-test: one tiny matmul must round-trip
        x = jnp.ones((8, 128), jnp.bfloat16)
        y = (x @ x.T).block_until_ready()
        if not bool(jnp.isfinite(y).all()):
            return "device self-test produced non-finite values"
        return ""
    except Exception as e:  # noqa: BLE001
        return f"accelerator probe failed: {e}"


def init_multihost(coordinator: str | None = None) -> None:
    """Initialize jax.distributed for multi-host pods (SURVEY.md §5.8);
    no-op when already initialized or single-host."""
    import jax

    try:
        if coordinator:
            jax.distributed.initialize(coordinator_address=coordinator)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single host or already initialized
