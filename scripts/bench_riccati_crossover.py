"""Measure the sequential-vs-associative Riccati crossover (round-3
verdict item 6): one chip, f32, cartpole-shaped local model (nz=4, nu=1),
H in {200, 1024, 4096, 16384}.

The claim under test (docs/PERFORMANCE.md §9, parallel/horizon.py): the
associative-scan Riccati (O(log N) depth of batched matrix algebra,
ops/riccati.py) overtakes the sequential reverse lax.scan
(controllers/ilqr.py backward, the reference's per-step recursion
/root/reference/pddp/controllers/ilqr.py:627-672 made branchless) once H
is large enough that sequential-scan dispatch depth dominates.

Usage: python scripts/bench_riccati_crossover.py [--horizons 1024 4096 16384]
Prints one JSON object with per-H timings for both backends.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import backward, local_model, rollout
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.ops.riccati import parallel_backward


def _time(fn, *args, n=20, warmup=3, repeats=3):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--horizons", type=int, nargs="+",
                   default=[200, 1024, 4096, 16384])
    p.add_argument("--n", type=int, default=20)
    args = p.parse_args()

    enc = StateEncoding.IGNORE_UNCERTAINTY
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0], jnp.float32)

    seq = jax.jit(lambda d: backward(*d, reg=0.1))
    assoc = jax.jit(lambda d: parallel_backward(*d, reg=0.1))

    out = {"device": str(jax.devices()[0]), "dtype": "float32",
           "problem": "cartpole nz=4 nu=1", "rows": []}
    for H in args.horizons:
        U0 = 0.1 * jnp.ones((H, 1), jnp.float32)
        derivs = jax.jit(lambda z, u: local_model(
            rollout(model, z, u, enc)[0], u, (), model, cost, enc))(z0, U0)
        derivs = jax.block_until_ready(derivs)
        t_seq = _time(seq, derivs, n=args.n) * 1e3
        t_assoc = _time(assoc, derivs, n=args.n) * 1e3
        row = {"H": H, "sequential_ms": round(t_seq, 3),
               "associative_ms": round(t_assoc, 3),
               "assoc_speedup": round(t_seq / t_assoc, 2)}
        out["rows"].append(row)
        print(f"[crossover] {row}", file=sys.stderr)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
