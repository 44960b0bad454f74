"""Dual-form primitives: the Mosaic-safe in-kernel lowerings must equal
the general XLA forms bit-for-bit (docs/PERFORMANCE.md §7b).

The fused-rollout equivalence tests already cover these transitively
(interpret-mode kernels trace with the flag set); these pin each
primitive directly so a regression localizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import (StateEncoding, _flatten_triu,
                               _unflatten_triu, encode)
from pddp_tpu.utils.kernel_mode import in_pallas_kernel, \
    pallas_kernel_tracing
from pddp_tpu.utils.linalg import safe_cholesky


def _rand_triu(key, b, n):
    U = jax.random.normal(key, (b, n, n))
    return jnp.triu(U + 2.0 * jnp.eye(n))


def test_flag_nests_and_restores():
    assert not in_pallas_kernel()
    with pallas_kernel_tracing():
        assert in_pallas_kernel()
        with pallas_kernel_tracing():
            assert in_pallas_kernel()
        assert in_pallas_kernel()
    assert not in_pallas_kernel()


@pytest.mark.parametrize("n", [2, 3, 4, 6])
def test_triu_codecs_dual_forms_identical(n):
    key = jax.random.PRNGKey(n)
    U = _rand_triu(key, 5, n)
    flat_gen = _flatten_triu(U)
    with pallas_kernel_tracing():
        flat_ker = _flatten_triu(U)
        U_ker = _unflatten_triu(flat_gen, n)
    np.testing.assert_array_equal(np.asarray(flat_gen),
                                  np.asarray(flat_ker))
    np.testing.assert_array_equal(np.asarray(_unflatten_triu(flat_gen, n)),
                                  np.asarray(U_ker))


def test_safe_cholesky_dual_forms_identical():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (6, 4, 4))
    C = jnp.matmul(jnp.swapaxes(A, -1, -2), A) + 0.1 * jnp.eye(4)
    # Include a singular / indefinite matrix to exercise the ladder and
    # the diagonal fallback.
    C = C.at[0].set(jnp.zeros((4, 4)))
    C = C.at[1].set(-jnp.eye(4))
    U_gen = safe_cholesky(C)
    with pallas_kernel_tracing():
        U_ker = safe_cholesky(C)
    np.testing.assert_array_equal(np.asarray(U_gen), np.asarray(U_ker))


def test_effective_eps_dual_forms_identical():
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory

    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    cls = bnn_dynamics_model_factory(2, 1, [8], angular_indices=(),
                                     non_angular_indices=(0, 1))
    model = cls.init(jax.random.PRNGKey(0), n_particles=4, horizon=3)
    z = encode(jnp.zeros(2), V=1e-2 * jnp.ones(2), encoding=enc)
    u = jnp.array([0.1])
    st0 = model.init_state()
    z1_gen, st1_gen, eps_gen = model.step(z, u, 1, st0, enc)
    with pallas_kernel_tracing():
        z1_ker, st1_ker, eps_ker = model.step(z, u, 1, st0, enc)
    np.testing.assert_array_equal(np.asarray(z1_gen), np.asarray(z1_ker))
    np.testing.assert_array_equal(np.asarray(eps_gen), np.asarray(eps_ker))
