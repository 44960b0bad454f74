"""A/B: Cholesky jitter-ladder depth on the BNN DDP iteration hot path.

docs/PERFORMANCE.md §7 locates the BNN iteration's cost in per-step op
count (latency-bound scans), and §7b pins the per-candidate loss center
on the codec/Cholesky machinery. Each `safe_cholesky` ladder rung is a
full unrolled 4x4 factorization + finite-check + select, executed once
per scan step per alpha-candidate in the line search AND differentiated
per tangent inside local_model. `BNNDynamicsModel.chol_jitter` makes the
depth a static knob; this script measures the bench iteration
(local_model + Pallas backward + 10-candidate line-search scan, H=25,
P=100, Cholesky belief) at depths 5 (reference ladder), 2, and 1, plus
the phase split, and cross-checks J across depths (bit-identical
whenever the smallest rung factorizes).

Run on the TPU:  python scripts/bench_chol_ladder_ab.py [--n 50]
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

from pddp_tpu.controllers.ilqr import (control_law, default_fit_alphas,
                                       local_model, rollout)
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.ops.backward_kernel import pallas_backward_nu1
from pddp_tpu.struct import replace

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N = 25

LADDERS = {
    "rungs5 (default)": None,
    "rungs2": (1e-12, 1e-6),
    "rungs1": (1e-12,),
}


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
    ap.add_argument("--n", type=int, default=50)
    args = ap.parse_args()

    cost = CartpoleCost()
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    base = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    alphas = default_fit_alphas(U0.dtype)

    @jax.jit
    def iteration(model, Z, U, AUX):
        derivs = local_model(Z, U, AUX, model, cost, ENC)
        k, K, ok = pallas_backward_nu1(*derivs, reg=0.0)
        Z_b, U_b, J_b, AUX_b = control_law(model, Z, U, k, K, alphas, ENC,
                                           cost=cost, with_aux=True)
        amin = jnp.argmin(J_b)
        AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)
        return Z_b[:, amin], U_b[:, amin], AUX_new, J_b[amin]

    @jax.jit
    def phase_local(model, Z, U, AUX):
        return local_model(Z, U, AUX, model, cost, ENC)

    @jax.jit
    def phase_cl(model, Z, U, k, K):
        return control_law(model, Z, U, k, K, alphas, ENC, cost=cost,
                           with_aux=True)

    Z0, AUX0 = jax.jit(
        lambda z, u: rollout(base, z, u, ENC, unroll=4))(z0, U0)
    derivs0 = phase_local(base, Z0, U0, AUX0)
    k0, K0, _ = pallas_backward_nu1(*derivs0, reg=0.0)
    jax.block_until_ready((k0, K0))

    Js = {}
    for name, ladder in LADDERS.items():
        model = base if ladder is None else replace(base, chol_jitter=ladder)
        t0 = time.time()
        out = iteration(model, Z0, U0, AUX0)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        ms = _time(iteration, model, Z0, U0, AUX0, n=args.n) * 1e3
        lm_ms = _time(phase_local, model, Z0, U0, AUX0, n=args.n) * 1e3
        cl_ms = _time(phase_cl, model, Z0, U0, k0, K0, n=args.n) * 1e3
        Js[name] = float(out[3])
        print(f"{name}: iteration {ms:.3f} ms  (local_model {lm_ms:.3f}, "
              f"line-search {cl_ms:.3f}; compile {compile_s:.1f}s)",
              flush=True)
    ref = Js["rungs5 (default)"]
    for name, J in Js.items():
        print(f"  J[{name}] = {J:.9e}  rel-vs-5rung "
              f"{abs(J - ref) / max(abs(ref), 1e-12):.2e}", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)  # skip the multi-minute tunnel teardown
