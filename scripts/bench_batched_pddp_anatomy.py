"""Anatomy of the BATCHED PDDP solve (the north-star throughput metric).

bench.py's pddp_bnn_solves_per_sec runs B=1024 BNN solves as 4 chunks of
one compiled 256-wide program (~2.6 s total, ~390 solves/s round 1+2).
This script budgets where one 256-wide chunk's time goes: rollout,
derivatives (local_model), Riccati backward, line search — each timed as
a fresh-array jitted program at the chunk shape, plus the end-to-end
chunk solve itself. Run on TPU.

NOTE (CLAUDE.md): cross-jit piece timings are indicative only — inside
the single-jit solve XLA picks different layouts/fusions. The end-to-end
number is the ground truth; the pieces bound which phase dominates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import (ILQROptions, backward, control_law,
                                       default_fit_alphas, local_model,
                                       rollout, solve)
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.models.bnn import bnn_dynamics_model_factory

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N, B, P = 25, 256, 100


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
    return best * 1e3


def main():
    from pddp_tpu.struct import replace
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    # This script vmaps `solve` directly (parallel.batched_solve would
    # resolve the auto setting itself), so opt into the batched-scale
    # derivative path explicitly.
    model = replace(
        cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1),
        structured_jacobians=True)
    from pddp_tpu.examples.cartpole import CartpoleCost
    cost = CartpoleCost()

    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    z0s = z0 + 0.01 * jax.random.normal(jax.random.PRNGKey(7),
                                        (B,) + z0.shape)
    U0s = 0.1 * jnp.ones((B, N, 1))
    nz = z0.shape[0]

    # --- end-to-end chunk ---------------------------------------------------
    opts = ILQROptions(n_iterations=5, max_evals=15)

    @jax.jit
    def chunk(z0s, U0s):
        def one(z0, U0):
            r = solve(model, cost, z0, U0, opts, encoding=ENC)
            return r.J_opt, r.evals

        return jax.vmap(one)(z0s, U0s)

    t_chunk = _time(chunk, z0s, U0s, n=3, warmup=1)
    J, evals = chunk(z0s, U0s)
    print("chunk solve (B=%d, 5 iters): %.1f ms  -> %.0f solves/s "
          "(mean evals %.1f)" % (B, t_chunk, B / (t_chunk / 1e3),
                                 float(evals.mean())))

    # --- pieces -------------------------------------------------------------
    @jax.jit
    def roll(z0s, U0s):
        return jax.vmap(lambda z, u: rollout(model, z, u, ENC))(z0s, U0s)

    t_roll = _time(roll, z0s, U0s)
    print("rollout:        %.2f ms" % t_roll)

    Z, AUX = jax.tree_util.tree_map(jnp.asarray, roll(z0s, U0s))
    Z = jnp.asarray(Z)

    @jax.jit
    def lm(Z, U, AUX):
        return jax.vmap(
            lambda z, u, a: local_model(z, u, a, model, cost, ENC))(
            Z, U, AUX)

    t_lm = _time(lm, Z, U0s, AUX)
    print("local_model:    %.2f ms" % t_lm)

    derivs = jax.tree_util.tree_map(jnp.asarray, lm(Z, U0s, AUX))

    @jax.jit
    def bwd(derivs):
        return jax.vmap(lambda d: backward(*d, reg=0.0))(derivs)

    t_bwd = _time(bwd, derivs)
    print("backward:       %.2f ms" % t_bwd)

    k, K, ok = jax.tree_util.tree_map(jnp.asarray, bwd(derivs))
    alphas = default_fit_alphas(U0s.dtype)

    for in_scan in (False, True):
        @jax.jit
        def cl(Z, U, k, K):
            return jax.vmap(
                lambda z, u, k1, K1: control_law(
                    model, z, u, k1, K1, alphas, ENC, cost=cost,
                    with_aux=True, cost_in_scan=in_scan)[2])(Z, U, k, K)

        t_cl = _time(cl, Z, U0s, k, K)
        print("control_law (cost_in_scan=%s): %.2f ms" % (in_scan, t_cl))

    # estimated iteration = lm + bwd + cl; solve does ~5 iterations + ~1
    # rollout; evals can exceed 5 (retries re-run cl only).
    print("\nper-iteration estimate: lm %.2f + bwd %.2f + cl %.2f" %
          (t_lm, t_bwd, t_cl))

    # --- MLP-only scan floor at the line-search shape ------------------------
    # control_law rolls B x 10 alpha-lanes of P particles for 25 sequential
    # steps. This times JUST the particle-MLP portion of that scan (fixed
    # particles, no codec/covar/feedback), bounding how much of cl the MLP
    # traffic explains — and what bf16 can save.
    import jax.lax as lax

    A_CAND = 10
    lanes = B * A_CAND
    X_lanes = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (lanes, P, 4))
    U_scan = 0.1 * jnp.ones((N, lanes, 1))

    def mlp_scan(m):
        def run(X, U):
            def body(c, u):
                out = jax.vmap(
                    lambda x, uu: m.forward_particles(x, uu, 0))(c, u)
                return out, ()

            out, _ = lax.scan(body, X, U)
            return out

        return jax.jit(run)

    t_mlp32 = _time(mlp_scan(model), X_lanes, U_scan, n=10)
    print("MLP-only cl-shape scan (f32):  %.2f ms" % t_mlp32)

    # --- reduced-precision MLP variant (compute_dtype=bfloat16) -------------
    cls16 = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                       non_angular_indices=(0, 1, 3),
                                       compute_dtype=jnp.bfloat16)
    model16 = replace(
        cls16.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1),
        structured_jacobians=True)

    @jax.jit
    def chunk16(z0s, U0s):
        def one(z0, U0):
            r = solve(model16, cost, z0, U0, opts, encoding=ENC)
            return r.J_opt, r.evals

        return jax.vmap(one)(z0s, U0s)

    t_mlp16 = _time(mlp_scan(model16), X_lanes, U_scan, n=10)
    print("MLP-only cl-shape scan (bf16): %.2f ms" % t_mlp16)

    t_chunk16 = _time(chunk16, z0s, U0s, n=3, warmup=1)
    J16, evals16 = chunk16(z0s, U0s)
    print("\nbf16-MLP chunk solve: %.1f ms -> %.0f solves/s (mean evals "
          "%.1f; J agree rtol %.3g)" % (
              t_chunk16, B / (t_chunk16 / 1e3), float(evals16.mean()),
              float(jnp.nanmedian(jnp.abs(J16 - J) / jnp.abs(J)))))

    @jax.jit
    def cl16(Z, U, k, K):
        return jax.vmap(
            lambda z, u, k1, K1: control_law(
                model16, z, u, k1, K1, alphas, ENC, cost=cost,
                with_aux=True, cost_in_scan=False)[2])(Z, U, k, K)

    t_cl16 = _time(cl16, Z, U0s, k, K)
    print("control_law bf16 (cost_in_scan=False): %.2f ms" % t_cl16)


if __name__ == "__main__":
    main()
