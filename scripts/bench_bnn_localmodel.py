"""Ablate local_model for the BNN iteration: how much of the ~0.70 ms is
dynamics jacfwd vs cost quadratization vs the codec/moment-match chain?

Run on TPU after bench.py (shares the compile cache).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import local_model, rollout
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.utils.evaluation import linearize_dynamics, quadratize_cost

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N, P = 25, 100


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
    model = cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    Z0, AUX0 = jax.jit(lambda z, u: rollout(model, z, u, ENC))(z0, U0)
    Z0, AUX0 = jnp.asarray(Z0), jnp.asarray(AUX0)

    t_full = _time(jax.jit(
        lambda Z, U, AUX: local_model(Z, U, AUX, model, cost, ENC)),
        Z0, U0, AUX0)
    print(f"local_model full:        {t_full:.3f} ms")

    t_dyn = _time(jax.jit(
        lambda Z, U, AUX: linearize_dynamics(model, Z[:-1], U, AUX, ENC)),
        Z0, U0, AUX0)
    print(f"linearize_dynamics:      {t_dyn:.3f} ms")

    t_cost = _time(jax.jit(
        lambda Z, U: quadratize_cost(cost, Z[:-1], U, ENC)), Z0, U0)
    print(f"quadratize_cost (vmap):  {t_cost:.3f} ms")

    deriv_fn = getattr(cost, "eval_derivatives", None)
    if deriv_fn is not None:
        idx = jnp.arange(N)
        t_cost_an = _time(jax.jit(
            lambda Z, U: deriv_fn(Z[:-1], U, idx, terminal=False,
                                  encoding=ENC, approximate=False)), Z0, U0)
        print(f"cost analytic batch:     {t_cost_an:.3f} ms")

    # Lower bound: jacfwd through the MLP pushforward only (no codec, no
    # moment matching) — what a perfectly-fused derivative phase would pay.
    X0 = jnp.zeros((N, P, 4))

    def mlp_only(X, U):
        def one(x, u, i):
            def fn(xu):
                return model.forward_particles(
                    x + xu[:4][None, :], u + xu[4:], i).reshape(-1)
            return jax.jacfwd(fn)(jnp.zeros(5))
        return jax.vmap(one)(X, U, jnp.arange(N))

    t_mlp = _time(jax.jit(mlp_only), X0, U0)
    print(f"jacfwd MLP-only bound:   {t_mlp:.3f} ms")


if __name__ == "__main__":
    main()
