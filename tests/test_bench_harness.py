"""bench.py harness robustness (the BENCH_r02 failure mode).

Round 2's official perf record died because one transient TPU-tunnel
error during metric 1 of 8 aborted the whole benchmark (rc 1, no JSON).
These tests pin the hardened harness contract: per-metric retry with
backoff, isolation (one dead metric cannot erase the others), and error
reporting. Pure host-side logic — no device work.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _run_metric  # noqa: E402


def test_retry_recovers_from_transient_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 42.0

    errors = {}
    val = _run_metric("m", flaky, errors, attempts=3, backoff=(0.0, 0.0))
    assert val == 42.0
    assert calls["n"] == 3
    assert len(errors["m"]) == 2
    assert "FAILED_PRECONDITION" in errors["m"][0]


def test_total_failure_returns_none_and_records_all_attempts():
    errors = {}

    def dead():
        raise ValueError("boom")

    val = _run_metric("m", dead, errors, attempts=3, backoff=(0.0, 0.0))
    assert val is None
    assert len(errors["m"]) == 3


def test_isolation_between_metrics():
    errors = {}
    assert _run_metric("bad", lambda: 1 / 0, errors, attempts=2,
                       backoff=(0.0,)) is None
    assert _run_metric("good", lambda: 7, errors) == 7
    assert list(errors) == ["bad"]


def test_keyboard_interrupt_propagates():
    import pytest

    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        _run_metric("m", interrupted, {}, attempts=3, backoff=(0.0, 0.0))
