"""A/B: scan vs stateful-fused line search in the BNN DDP iteration.

Measures bench.py's pddp_bnn_iteration composition (local_model +
Pallas nu=1 backward + 10-candidate line search, P=100,
Cholesky-encoded belief) with the line search either as

  scan   control_law (lax.scan, costs hoisted to a batched post-pass —
         the round-3 configuration bench.py records), or
  fused  fused_control_law (the round-4 stateful Pallas kernel,
         docs/PERFORMANCE.md §7b) + the same batched cost post-pass.

Options (round-4 verdict item 5):
  --h N       horizon (default 25 = the bench shape; the kernel's
              predicted-win regime is H >= 100)
  --trained   load tests/golden/trained_bnn_cartpole.npz — stable
              dynamics, so the scan-vs-fused trajectory comparison
              converges instead of chaotically amplifying the per-step
              ~1e-5 kernel roundoff (the full25-parity caveat in §7b)
  --n CALLS   timed calls per repeat (default 50)

Run on the TPU:  python scripts/bench_bnn_fused_ab.py [--h 100] [--trained]
Timing protocol: best-of-3 repeats (CLAUDE.md: tunnel variance).
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

from pddp_tpu.controllers.ilqr import (control_law, default_fit_alphas,
                                       local_model, rollout,
                                       trajectory_cost)
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory, load_bnn_npz
from pddp_tpu.ops.backward_kernel import pallas_backward_nu1
from pddp_tpu.ops.fused_rollout import fused_control_law

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY


def _time(fn, *args, n=50, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=25, help="horizon")
    ap.add_argument("--n", type=int, default=50, help="timed calls/repeat")
    ap.add_argument("--reg", type=float, default=0.0,
                    help="Riccati regularization (trained nets near the "
                         "equilibrium have indefinite Q_uu at reg=0 — the "
                         "solve's retry ladder would bump reg, but this raw "
                         "single-iteration A/B has no retry, so J goes nan; "
                         "pass e.g. 1e-2 for finite-J parity checks)")
    ap.add_argument("--trained", action="store_true",
                    help="use the committed trained cartpole BNN")
    args = ap.parse_args()
    N = args.h

    cost = CartpoleCost()
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    if args.trained:
        model = load_bnn_npz(model, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "tests", "golden", "trained_bnn_cartpole.npz"))
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    alphas = default_fit_alphas(U0.dtype)

    def _amin(J_b):
        # The solver's accept logic masks non-finite candidates (a
        # diverging alpha rollout must not poison the step); raw argmin
        # would return the nan lane. Same masking in both arms.
        return jnp.argmin(jnp.where(jnp.isfinite(J_b), J_b, jnp.inf))

    @jax.jit
    def iteration_scan(Z, U, AUX):
        derivs = local_model(Z, U, AUX, model, cost, ENC)
        k, K, ok = pallas_backward_nu1(*derivs, reg=args.reg)
        Z_b, U_b, J_b, AUX_b = control_law(model, Z, U, k, K, alphas, ENC,
                                           cost=cost, with_aux=True)
        amin = _amin(J_b)
        AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)
        return Z_b[:, amin], U_b[:, amin], AUX_new, J_b[amin]

    @jax.jit
    def iteration_fused(Z, U, AUX):
        derivs = local_model(Z, U, AUX, model, cost, ENC)
        k, K, ok = pallas_backward_nu1(*derivs, reg=args.reg)
        Z_b, U_b, AUX_b = fused_control_law(model, Z, U, k, K, alphas, ENC,
                                            cost=None, with_aux=True)
        J_b = trajectory_cost(cost, Z_b, U_b, ENC)
        amin = _amin(J_b)
        AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)
        return Z_b[:, amin], U_b[:, amin], AUX_new, J_b[amin]

    Z0, AUX0 = jax.jit(
        lambda z, u: rollout(model, z, u, ENC, unroll=4))(z0, U0)

    tag = f"H={N}{' trained' if args.trained else ''}{f" reg={args.reg:g}" if args.reg else ''}"
    for name, fn in (("scan", iteration_scan), ("fused", iteration_fused)):
        t0 = time.time()
        out = fn(Z0, U0, AUX0)
        jax.block_until_ready(out)
        print(f"[{tag}] {name}: first call (compile) {time.time() - t0:.1f}s",
              flush=True)
    for name, fn in (("scan", iteration_scan), ("fused", iteration_fused)):
        ms = _time(fn, Z0, U0, AUX0, n=args.n) * 1e3
        print(f"[{tag}] {name}: {ms:.3f} ms/iteration (best-of-3, "
              f"n={args.n})", flush=True)
    # Numerical cross-check: one iteration — J and the winning trajectory.
    Zs, Us, _, Js = iteration_scan(Z0, U0, AUX0)
    Zf, Uf, _, Jf = iteration_fused(Z0, U0, AUX0)
    dZ = float(jnp.max(jnp.abs(Zs - Zf)))
    scale = float(jnp.max(jnp.abs(Zs)))
    print(f"[{tag}] J scan={float(Js):.6e} fused={float(Jf):.6e} "
          f"rel={abs(float(Js - Jf)) / max(abs(float(Js)), 1e-9):.2e}  "
          f"max|dZ|={dZ:.2e} (traj scale {scale:.2e}, "
          f"rel {dZ / max(scale, 1e-9):.2e})",
          flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip the multi-minute tunnel teardown
