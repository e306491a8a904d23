"""bench.py retry policy: genuine code bugs must fail fast (round-4
verdict, weak #4 — bare "INTERNAL" used to be classified transient, so a
real compile bug was retried 5x / ~3.5 min before propagating)."""

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def test_code_bug_propagates_on_first_attempt(monkeypatch):
    calls = []

    def boom():
        calls.append(1)
        raise ValueError("shapes do not match")

    monkeypatch.setattr(time, "sleep", lambda s: calls.append(("slept", s)))
    with pytest.raises(ValueError):
        bench.retry("stage", boom)
    assert calls == [1], f"expected exactly one attempt, got {calls}"


def test_bare_internal_is_not_transient():
    # an XlaRuntimeError-style INTERNAL with no transport marker is a
    # compile bug on this backend, not an outage
    assert not bench._is_transient(RuntimeError("INTERNAL: unsupported op"))


@pytest.mark.parametrize(
    "msg",
    [
        "UNAVAILABLE: TPU backend setup/compile error",
        "INTERNAL: remote_compile stream reset",
        "failed reading response body",
        "tunnel closed",
        "DEADLINE_EXCEEDED: rpc timed out",
    ],
)
def test_transport_errors_are_transient(msg):
    assert bench._is_transient(RuntimeError(msg))


def test_transient_error_is_retried(monkeypatch):
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("UNAVAILABLE: tunnel hiccup")
        return "ok"

    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert bench.retry("stage", flaky) == "ok"
    assert len(attempts) == 3
