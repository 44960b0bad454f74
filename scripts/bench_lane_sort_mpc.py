"""Difficulty-sorted lane scheduling on an MPC-style batched workload.

docs/PERFORMANCE.md §8b kills lane *compaction* (dynamic shapes) and
notes every 256-lane chunk of the B=1024 batched-PDDP workload contains
at least one max-eval lane, so each chunk's vmapped while_loop runs at
its slowest lane's trip count. Round-4 verdict item 6: in the MPC
(receding-horizon, warm-started) regime the solver DOES have per-lane
difficulty knowledge — the previous step's eval counts. This script
measures whether sorting lanes by last-solve evals before chunking
(concentrating expensive lanes into few chunks, cheap lanes into
all-cheap chunks) harvests the ~28% trained-mix headroom.

Protocol: B=1024 lanes of the trained cartpole BNN (H=25, 100
particles, Cholesky belief), K MPC steps. Each step solves all lanes
(5 iterations, max 15 evals) through parallel.batched_solve
(chunk=256 — the measured winner), then advances each lane to its
solver-predicted next belief state with the shift-left warm start
(reference ilqr.py:359-362). Variants share one compiled chunk program:

  natural  fixed lane->chunk assignment (bench.py's layout);
  sorted   permute lanes by the previous step's eval count before
           dispatch (host-side argsort — µs against ~1 s chunks),
           inverse-permute results after.

Run on the TPU:  python scripts/bench_lane_sort_mpc.py [--steps 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pddp_tpu.controllers.ilqr import ILQROptions
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory, load_bnn_npz
from pddp_tpu.parallel import batched_solve

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N, B, CHUNK = 25, 1024, 256


def run_sequence(model, cost, z0s, U0s, opts, n_steps, sort):
    """K MPC steps over all lanes; returns (total_wall_s, per-step evals)."""
    z = np.asarray(z0s)
    U = np.asarray(U0s)
    prev_evals = np.zeros(B)
    walls, evals_hist, chunk_maxes = [], [], []
    for step in range(n_steps):
        order = (np.argsort(prev_evals, kind="stable") if sort
                 else np.arange(B))
        inv = np.argsort(order)
        t0 = time.perf_counter()
        r = batched_solve(model, cost, jnp.asarray(z[order]),
                          jnp.asarray(U[order]), opts, encoding=ENC,
                          chunk=CHUNK)
        evals_sorted = np.asarray(r.evals)
        Z_sorted = np.asarray(r.Z)
        U_sorted = np.asarray(r.U)
        walls.append(time.perf_counter() - t0)
        evals = evals_sorted[inv]
        # Advance: solver-predicted next belief + shift-left warm start.
        z = Z_sorted[inv][:, 1]
        U_opt = U_sorted[inv]
        U = np.concatenate([U_opt[:, 1:], U_opt[:, -1:]], axis=1)
        prev_evals = evals
        evals_hist.append(evals)
        chunk_maxes.append([float(evals_sorted[i:i + CHUNK].max())
                            for i in range(0, B, CHUNK)])
    return walls, evals_hist, chunk_maxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    cost = CartpoleCost()
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    model = load_bnn_npz(model, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "tests", "golden", "trained_bnn_cartpole.npz"))
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    z0s = z0 + 0.01 * jax.random.normal(jax.random.PRNGKey(7),
                                        (B,) + z0.shape)
    U0s = 0.1 * jnp.ones((B, N, 1))
    opts = ILQROptions(n_iterations=5, max_evals=15)

    # Warm the one compiled chunk program (shared by both variants).
    t0 = time.perf_counter()
    jax.block_until_ready(batched_solve(
        model, cost, z0s[:CHUNK], U0s[:CHUNK], opts, encoding=ENC).J_opt)
    print(f"compile/warm: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for sort in (False, True):
        name = "sorted" if sort else "natural"
        walls, evals_hist, chunk_maxes = run_sequence(
            model, cost, z0s, U0s, opts, args.steps, sort)
        # Step 0 has no difficulty signal yet (identical work in both
        # variants); the sustained metric is steps 1..K-1.
        sustained = B * (len(walls) - 1) / sum(walls[1:])
        results[name] = sustained
        print(f"{name}: per-step wall "
              f"{['%.2f' % w for w in walls]} s; sustained (steps 1+) "
              f"{sustained:.1f} solves/s", flush=True)
        for s, (ev, cm) in enumerate(zip(evals_hist, chunk_maxes)):
            print(f"  step {s}: mean evals {ev.mean():.2f}, p90 "
                  f"{np.percentile(ev, 90):.0f}, max {ev.max():.0f}, "
                  f"chunk maxes {cm}", flush=True)
    if results.get("natural"):
        print(f"sorted/natural speedup: "
              f"{results['sorted'] / results['natural']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip the multi-minute tunnel teardown
