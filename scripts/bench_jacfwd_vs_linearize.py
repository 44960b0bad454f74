"""jacfwd vs linearize for the BNN dynamics Jacobians.

jax.jacfwd vmaps jvp over the tangent basis, re-evaluating the PRIMAL
computation once per tangent (XLA may or may not CSE the broadcasted
primal). jax.linearize evaluates the primal once and yields a cheap
tangent map to vmap. At 15 tangents x 25 steps x 100 particles the primal
dedup could matter. Run on TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from pddp_tpu.controllers.ilqr import rollout
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.models.bnn import bnn_dynamics_model_factory

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
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U0 = 0.1 * jnp.ones((N, 1))
    Z0, AUX0 = jax.jit(lambda z, u: rollout(model, z, u, ENC))(z0, U0)
    Z0, AUX0 = jnp.asarray(Z0), jnp.asarray(AUX0)
    nz = Z0.shape[-1]
    nzu = nz + 1

    def f_of(z, u, i, aux):
        def fn(zu):
            return model.apply(zu[:nz], zu[nz:], i, aux, ENC)
        return fn

    @jax.jit
    def with_jacfwd(Z, U, AUX):
        def one(z, u, i, aux):
            fn = f_of(z, u, i, aux)
            zu = jnp.concatenate([z, u])
            J = jax.jacfwd(fn)(zu)
            return J[:, :nz], J[:, nz:]
        return jax.vmap(one)(Z[:-1], U, jnp.arange(N), AUX)

    @jax.jit
    def with_linearize(Z, U, AUX):
        def one(z, u, i, aux):
            fn = f_of(z, u, i, aux)
            zu = jnp.concatenate([z, u])
            _, f_jvp = jax.linearize(fn, zu)
            J = jax.vmap(f_jvp)(jnp.eye(nzu, dtype=zu.dtype)).T
            return J[:, :nz], J[:, nz:]
        return jax.vmap(one)(Z[:-1], U, jnp.arange(N), AUX)

    t_j = _time(with_jacfwd, Z0, U0, AUX0)
    t_l = _time(with_linearize, Z0, U0, AUX0)
    print(f"jacfwd:    {t_j:.3f} ms")
    print(f"linearize: {t_l:.3f} ms")

    Fa, Fb = with_jacfwd(Z0, U0, AUX0)
    La, Lb = with_linearize(Z0, U0, AUX0)
    import numpy as np
    print("max diff F_z:", float(jnp.abs(Fa - La).max()),
          "F_u:", float(jnp.abs(Fb - Lb).max()))


if __name__ == "__main__":
    main()
