"""Benchmark harness: cartpole DDP on TPU.

Measures the BASELINE.json headline metrics:
 * wall-clock per DDP iteration (forward derivatives + Riccati backward +
   batched line search) on cartpole at H=200 — north star < 5 ms;
 * independent solves/sec with 1024 problems vmapped on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...}

vs_baseline is the ratio (target 5 ms) / (measured ms): > 1 means faster
than the BASELINE.md north-star target. The torch reference publishes no
numbers and cannot run in this environment (torch 0.4 APIs), so the target
from BASELINE.md is the baseline.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from pddp_tpu.controllers.ilqr import (ILQROptions, default_fit_alphas,
                                       local_model, rollout, solve)
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.ops.backward_kernel import pallas_backward_nu1
from pddp_tpu.ops.fused_rollout import fused_control_law

H = 200
ENCODING = StateEncoding.IGNORE_UNCERTAINTY
BATCH = 1024
TARGET_MS = 5.0


def _time(fn, *args, n=100, warmup=5, repeats=3):
    """Best-of-repeats mean (the TPU tunnel adds bursty latency noise)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def bench_iteration_ms(model, cost):
    """One full DDP iteration at H=200, mirroring the solve-loop body:
    analytic+vmapped local model (no sequential rollout — the accepted
    trajectory is reused from the line search), the Riccati backward as
    ONE Pallas kernel, and the line search + cost accumulation as ONE
    Pallas kernel."""
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U0 = 0.1 * jnp.ones((H, 1))
    alphas = default_fit_alphas(U0.dtype)

    @jax.jit
    def iteration(Z, U):
        derivs = local_model(Z, U, (), model, cost, ENCODING)
        k, K, ok = pallas_backward_nu1(*derivs, reg=0.0)
        Z_b, U_b, J_b = fused_control_law(model, Z, U, k, K, alphas,
                                          ENCODING, cost=cost)
        amin = jnp.argmin(J_b)
        return Z_b[:, amin], U_b[:, amin], J_b[amin]

    Z0, _ = jax.jit(
        lambda z, u: rollout(model, z, u, ENCODING, unroll=8))(z0, U0)
    return _time(iteration, Z0, U0) * 1e3


def bench_batched_solves(model, cost):
    """1024 independent full solves (5 iterations each), vmapped."""
    opts = ILQROptions(n_iterations=5, max_evals=15)
    key = jax.random.PRNGKey(0)
    z0s = 0.05 * jax.random.normal(key, (BATCH, 4))
    U0s = 0.1 * jnp.ones((BATCH, H, 1))

    @jax.jit
    def solve_batch(z0s, U0s):
        def one(z0, U0):
            r = solve(model, cost, z0, U0, opts, encoding=ENCODING)
            return r.J_opt

        return jax.vmap(one)(z0s, U0s)

    sec = _time(solve_batch, z0s, U0s, n=3, warmup=1)
    return BATCH / sec  # solves/sec


def main():
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()

    iter_ms = bench_iteration_ms(model, cost)
    solves_per_sec = bench_batched_solves(model, cost)

    print(json.dumps({
        "metric": "ddp_iteration_ms_cartpole_h200",
        "value": round(iter_ms, 4),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / iter_ms, 3),
        "extras": {
            "batched_solves_per_sec_b1024_h200_5iter": round(
                solves_per_sec, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
