"""Profiling helper tests (the observability layer, SURVEY §5)."""

import jax.numpy as jnp

from pddp_tpu.utils.profiling import PhaseTimer, block_and_time


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t("x"):
        jnp.ones(16).sum()
    with t("x"):
        jnp.ones(16).sum()
    with t("y"):
        pass
    assert t.counts["x"] == 2 and t.counts["y"] == 1
    assert t.totals["x"] > 0.0
    s = t.summary()
    assert "x" in s and "y" in s
    t.reset()
    assert not t.totals and not t.counts


def test_block_and_time_returns_output():
    sec, out = block_and_time(lambda: jnp.arange(4.0).sum(), n=2, warmup=1)
    assert sec > 0
    assert float(out) == 6.0
