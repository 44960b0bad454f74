"""Sweep knobs for the PDDP BNN inner iteration (bench item
pddp_bnn_iteration_ms_h25_p100) to close the latency gap (round-1 verdict
item 6: 2.12 ms -> target < 1 ms).

Times (a) the full iteration under knob variants and (b) its three phases
compiled on FRESH default-layout arrays (per CLAUDE.md: cross-jit
micro-timings on another jit's outputs lie; fresh arrays are the honest
way to attribute time).

Run on the TPU: python scripts/bench_bnn_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import (backward, control_law,
                                       default_fit_alphas, local_model,
                                       rollout)
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.ops.riccati import parallel_backward

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N = 25


def _time(fn, *args, n=100, warmup=5, repeats=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    cost = CartpoleCost()
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    alphas = default_fit_alphas(U0.dtype)

    Z0, AUX0 = jax.jit(
        lambda z, u: rollout(model, z, u, ENC, unroll=4))(z0, U0)
    Z0 = jnp.asarray(Z0)
    AUX0 = jnp.asarray(AUX0)

    def make_iteration(bw="parallel", cl_unroll=4, bw_unroll=1):
        @jax.jit
        def iteration(Z, U, AUX):
            derivs = local_model(Z, U, AUX, model, cost, ENC)
            if bw == "parallel":
                k, K, ok = parallel_backward(*derivs, reg=0.0)
            else:
                k, K, ok = backward(*derivs, reg=0.0, unroll=bw_unroll)
            Z_b, U_b, J_b, AUX_b = control_law(
                model, Z, U, k, K, alphas, ENC, unroll=cl_unroll, cost=cost,
                with_aux=True)
            amin = jnp.argmin(J_b)
            AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)
            return Z_b[:, amin], U_b[:, amin], AUX_new, J_b[amin]
        return iteration

    # --- Phase attribution on fresh arrays --------------------------------
    lm = jax.jit(lambda Z, U, AUX: local_model(Z, U, AUX, model, cost, ENC))
    t_lm = _time(lm, Z0, U0, AUX0)
    derivs = jax.tree_util.tree_map(jnp.asarray, lm(Z0, U0, AUX0))

    t_bw_par = _time(jax.jit(
        lambda *d: parallel_backward(*d, reg=0.0)), *derivs)
    t_bw_scan = _time(jax.jit(
        lambda *d: backward(*d, reg=0.0)), *derivs)
    t_bw_scan25 = _time(jax.jit(
        lambda *d: backward(*d, reg=0.0, unroll=25)), *derivs)

    k, K, _ = jax.jit(lambda *d: parallel_backward(*d, reg=0.0))(*derivs)
    k, K = jnp.asarray(k), jnp.asarray(K)

    for u in (1, 4, 8, 25):
        t_cl = _time(jax.jit(
            lambda Z, U, k, K, u=u: control_law(
                model, Z, U, k, K, alphas, ENC, unroll=u, cost=cost,
                with_aux=True)), Z0, U0, k, K)
        print(f"phase control_law unroll={u}: {t_cl:.3f} ms")

    for u in (1, 4, 8, 25):
        t_ro = _time(jax.jit(
            lambda z, U, u=u: rollout(model, z, U, ENC, unroll=u)), z0, U0)
        print(f"phase rollout unroll={u}: {t_ro:.3f} ms")

    print(f"phase local_model: {t_lm:.3f} ms")
    print(f"phase backward parallel: {t_bw_par:.3f} ms")
    print(f"phase backward scan u1: {t_bw_scan:.3f} ms")
    print(f"phase backward scan u25: {t_bw_scan25:.3f} ms")

    # --- End-to-end variants ---------------------------------------------
    for name, kw in [
        ("baseline par/u4", dict(bw="parallel", cl_unroll=4)),
        ("par/u8", dict(bw="parallel", cl_unroll=8)),
        ("par/u25", dict(bw="parallel", cl_unroll=25)),
        ("scan-u25/u25", dict(bw="scan", cl_unroll=25, bw_unroll=25)),
        ("scan-u8/u8", dict(bw="scan", cl_unroll=8, bw_unroll=8)),
    ]:
        it = make_iteration(**kw)
        t = _time(it, Z0, U0, AUX0, n=50)
        print(f"iteration {name}: {t:.3f} ms")


if __name__ == "__main__":
    main()
