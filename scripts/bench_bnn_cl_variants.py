"""Prototype variants of the BNN line-search rollout to attribute the
~0.5 ms gap between the bare model-step scan (0.574 ms) and the full
control_law (1.078 ms), and the payoff of value-only noise inference.

Variants (all at A=10, P=100, H=25, cartpole/CHOL):
  v0: control_law as in the library (in-scan cost, in-scan eps, aux)     baseline
  v1: cost OUT of the scan (post trajectory_cost over (N, A))
  v2: v1 + no aux recording
  v3: v1 + value-only noise (X = prev_output; record X as aux)
  v4: v3 + post-pass eps recovery for the winner (the full redesign)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import (backward, control_law,
                                       default_fit_alphas, local_model,
                                       rollout, trajectory_cost)
from pddp_tpu.encoding import (StateEncoding, decode_covar_sqrt, decode_mean,
                               encode)
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.utils.linalg import mm, tria_solve

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N, A, P = 25, 10, 100


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
    from pddp_tpu.examples.cartpole import CartpoleCost

    cost = CartpoleCost()
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    alphas = default_fit_alphas(U0.dtype)

    Z0, AUX0 = jax.jit(lambda z, u: rollout(model, z, u, ENC))(z0, U0)
    derivs = jax.jit(
        lambda Z, U, AUX: local_model(Z, U, AUX, model, cost, ENC))(
            Z0, U0, AUX0)
    k, K, _ = jax.jit(lambda *d: backward(*d, reg=0.0))(*derivs)
    Z0, k, K = map(jnp.asarray, (Z0, k, K))

    # v0: library control_law
    t0 = _time(jax.jit(lambda Z, U, k, K: control_law(
        model, Z, U, k, K, alphas, ENC, cost=cost, with_aux=True)),
        Z0, U0, k, K)
    print(f"v0 library (in-scan cost+eps+aux): {t0:.3f} ms")

    def make_scan(with_cost, with_aux, value_noise):
        def run(Z, U, k, K):
            z0_b = jnp.broadcast_to(Z[0], (A,) + Z[0].shape)
            mstate0 = model.init_state(batch_shape=(A,))

            def body(carry, inp):
                z_new, mstate, J = carry
                z_i, u_i, k_i, K_i, i = inp
                dz = z_new - z_i[None, :]
                du = alphas[:, None] * k_i[None, :] + mm(dz, K_i.T)
                u_new = u_i[None, :] + du
                if with_cost:
                    J = J + cost(z_new, u_new, i, terminal=False,
                                 encoding=ENC)

                if value_noise:
                    def step_one(z, u, st):
                        mean = decode_mean(z, ENC, 4)
                        U_chol = decode_covar_sqrt(z, ENC, 4)
                        eps0 = model.eps_in[i].astype(z.dtype)
                        X0 = mean + jnp.matmul(eps0, U_chol)
                        d = jnp.diagonal(U_chol)
                        ok = (jnp.min(jnp.abs(d)) > 1e-30) & jnp.all(
                            jnp.isfinite(st.prev_output))
                        use_prev = jnp.logical_and(
                            jnp.asarray(i > 0), ok)
                        X = jnp.where(use_prev, st.prev_output, X0)
                        out = model.forward_particles(X, u, i)
                        z_next = model._moment_match(out, ENC, z.dtype)
                        new_st = type(st)(
                            prev_output=jax.lax.stop_gradient(out))
                        return z_next, new_st, X
                else:
                    def step_one(z, u, st):
                        return model.step(z, u, i, st, ENC)

                z_next, mstate, aux = jax.vmap(step_one)(z_new, u_new,
                                                         mstate)
                out = (z_next, u_new, aux) if with_aux else (z_next, u_new)
                return (z_next, mstate, J), out

            (z_T, _, J), outs = lax.scan(
                body, (z0_b, mstate0, jnp.zeros(A, U.dtype)),
                (Z[:-1], U, k, K, jnp.arange(N)))
            Z_new = jnp.concatenate([z0_b[None], outs[0]], axis=0)
            U_new = outs[1]
            if with_cost:
                J = J + cost(z_T, None, N, terminal=True, encoding=ENC)
            else:
                J = trajectory_cost(cost, Z_new, U_new, ENC)
            res = [Z_new, U_new, J]
            if with_aux:
                res.append(outs[2])
            return tuple(res)
        return run

    t1 = _time(jax.jit(make_scan(False, True, False)), Z0, U0, k, K)
    print(f"v1 post-cost, in-scan eps+aux:     {t1:.3f} ms")
    t2 = _time(jax.jit(make_scan(False, False, False)), Z0, U0, k, K)
    print(f"v2 post-cost, no aux:              {t2:.3f} ms")
    t3 = _time(jax.jit(make_scan(False, True, True)), Z0, U0, k, K)
    print(f"v3 post-cost, value-noise, X-aux:  {t3:.3f} ms")

    # v4: v3 + winner eps recovery (the full redesign, incl. argmin)
    scan3 = make_scan(False, True, True)

    @jax.jit
    def v4(Z, U, k, K):
        Z_new, U_new, J, Xrec = scan3(Z, U, k, K)
        amin = jnp.argmin(J)
        Zw = Z_new[:, amin]
        Xw = Xrec[:, amin]  # (N, P, nz) input particles of the winner

        def eps_of(z, X, i):
            mean = decode_mean(z, ENC, 4)
            U_chol = decode_covar_sqrt(z, ENC, 4)
            eps = tria_solve(U_chol, (X - mean).T, trans=True).T
            eps = jnp.where(jnp.all(jnp.isfinite(eps)), eps,
                            model.eps_in[i].astype(z.dtype))
            return jax.lax.stop_gradient(eps)

        EPS = jax.vmap(eps_of)(Zw[:-1], Xw, jnp.arange(N))
        return Zw, U_new[:, amin], J[amin], EPS

    t4 = _time(v4, Z0, U0, k, K)
    print(f"v4 = v3 + winner eps recovery:     {t4:.3f} ms")

    # Numerical check: v4 winner eps equals the library's in-scan eps.
    Zl, Ul, Jl, AUXl = jax.jit(lambda Z, U, k, K: control_law(
        model, Z, U, k, K, alphas, ENC, cost=cost, with_aux=True))(
            Z0, U0, k, K)
    amin = int(jnp.argmin(Jl))
    Zw, Uw, Jw, EPSw = v4(Z0, U0, k, K)
    import numpy as np
    print("winner match:", amin == int(jnp.argmin(Jw)) if hasattr(Jw, 'shape') and Jw.shape == () else amin)
    print("J diff:", float(jnp.abs(Jl[amin] - Jw)))
    print("Z diff:", float(jnp.abs(Zl[:, amin] - Zw).max()))
    print("EPS diff:", float(jnp.abs(AUXl[:, amin] - EPSw).max()))


if __name__ == "__main__":
    main()
