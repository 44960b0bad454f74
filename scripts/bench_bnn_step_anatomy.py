"""Anatomy of the BNN line-search step: which part of the ~43 us/step
is MLP, moment matching, codec, or noise inference?

Times scans of progressively larger step bodies at the line-search shape
(A=10 alphas x P=100 particles, H=25, cartpole). Run on TPU.
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

from pddp_tpu.encoding import StateEncoding, decode_covar_sqrt, decode_mean, encode
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.models.bnn.model import _BNNState

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
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1)
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    z0b = jnp.broadcast_to(z0, (A,) + z0.shape)
    u0b = 0.1 * jnp.ones((A, 1))

    # (a) scan of the FULL vmapped step (mirrors control_law's model work)
    @jax.jit
    def scan_full(zb):
        st = model.init_state(batch_shape=(A,))

        def body(carry, i):
            z, st = carry
            z2, st2, aux = jax.vmap(
                lambda z, s: model.step(z, u0b[0], i, s, ENC))(z, st)
            return (z2, st2), ()

        (zT, _), _ = lax.scan(body, (zb, st), jnp.arange(N))
        return zT

    # (b) MLP only: particles through forward_particles, no codec work
    X0 = jnp.zeros((A, P, 4))

    @jax.jit
    def scan_mlp(X):
        def body(X, i):
            X2 = jax.vmap(
                lambda x: model.forward_particles(x, u0b[0], i))(X)
            return X2, ()

        XT, _ = lax.scan(body, X, jnp.arange(N))
        return XT

    # (c) MLP + moment match + re-sample with PRESET eps (no inference)
    @jax.jit
    def scan_mlp_mm(zb):
        def body(z, i):
            mean = jax.vmap(lambda z: decode_mean(z, ENC, 4))(z)
            U_chol = jax.vmap(lambda z: decode_covar_sqrt(z, ENC, 4))(z)
            eps = model.eps_in[0]
            X = mean[:, None, :] + jnp.matmul(
                jnp.broadcast_to(eps, (A,) + eps.shape), U_chol)
            out = jax.vmap(
                lambda x: model.forward_particles(x, u0b[0], i))(X)
            z2 = jax.vmap(
                lambda o: model._moment_match(o, ENC, z.dtype))(out)
            return z2, ()

        zT, _ = lax.scan(body, zb, jnp.arange(N))
        return zT

    print("full step scan:   {:.3f} ms".format(_time(scan_full, z0b)))
    print("mlp only scan:    {:.3f} ms".format(_time(scan_mlp, X0)))
    print("mlp+mm scan:      {:.3f} ms".format(_time(scan_mlp_mm, z0b)))


if __name__ == "__main__":
    main()
