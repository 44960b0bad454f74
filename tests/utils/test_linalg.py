"""Small-matrix linalg tests.

The unrolled factorizations/solves (utils.linalg SMALL_N fast paths) must
agree with the LAPACK-style lowerings exactly — they sit on every solver
hot path (encode/decode, boxqp, Riccati combines, mass-matrix solves).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.utils.linalg import (JITTER_LEVELS, mm, psd_clamp,
                                   psd_inverse_clamped, safe_cholesky,
                                   small_cholesky, small_det, small_inv,
                                   small_solve, tria_solve)


def _spd(rng, n, batch=()):
    A = rng.randn(*batch, n, n)
    return jnp.asarray(np.matmul(A, np.swapaxes(A, -1, -2)) + n * np.eye(n))


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8])
def test_small_cholesky_matches_lapack(n):
    rng = np.random.RandomState(n)
    C = _spd(rng, n, (5,))
    U = small_cholesky(C)
    U_ref = jnp.swapaxes(jnp.linalg.cholesky(C), -1, -2)
    np.testing.assert_allclose(U, U_ref, rtol=1e-10, atol=1e-12)
    # Non-PD -> NaN, same contract as jnp.linalg.cholesky.
    bad = -jnp.eye(n)[None]
    assert bool(jnp.any(jnp.isnan(small_cholesky(bad))))


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_small_det_inv_solve(n):
    rng = np.random.RandomState(n)
    A = jnp.asarray(rng.randn(6, n, n) + 2 * np.eye(n))
    np.testing.assert_allclose(small_det(A), jnp.linalg.det(A),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(small_inv(A), jnp.linalg.inv(A),
                               rtol=1e-8, atol=1e-10)
    b = jnp.asarray(rng.randn(6, n))
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(small_solve(A, b), ref, rtol=1e-8, atol=1e-10)
    B = jnp.asarray(rng.randn(6, n, 3))
    np.testing.assert_allclose(small_solve(A, B), jnp.linalg.solve(A, B),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
@pytest.mark.parametrize("trans", [False, True])
def test_tria_solve_unrolled(n, trans):
    rng = np.random.RandomState(n)
    C = _spd(rng, n, (4,))
    U = safe_cholesky(C)
    b = jnp.asarray(rng.randn(4, n))
    x = tria_solve(U, b, trans=trans)
    M = jnp.swapaxes(U, -1, -2) if trans else U
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", M, x), b,
                               rtol=1e-8, atol=1e-9)


def test_safe_cholesky_jitter_ladder():
    # A singular PSD matrix: only the jittered factorizations are finite.
    C = jnp.zeros((3, 3)).at[0, 0].set(1.0)
    U = safe_cholesky(C)
    assert bool(jnp.all(jnp.isfinite(U)))
    reconstructed = mm(U.T, U)
    # Must be within the largest jitter of the original.
    assert float(jnp.max(jnp.abs(reconstructed - C))) <= max(JITTER_LEVELS)


def test_psd_clamp_and_inverse():
    rng = np.random.RandomState(0)
    A = rng.randn(4, 4)
    Q = jnp.asarray(A + A.T)  # indefinite
    Qc, e, E = psd_clamp(Q)
    assert float(jnp.min(e)) >= 0.0
    inv = psd_inverse_clamped(Q, extra=0.5)
    assert bool(jnp.all(jnp.isfinite(inv)))
    # 1x1 fast path.
    inv1 = psd_inverse_clamped(jnp.asarray([[-2.0]]), extra=0.5)
    np.testing.assert_allclose(inv1, 1.0 / (1e-12 + 0.5))


def test_small_paths_jit_and_vmap():
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.randn(3, 3) + 3 * np.eye(3))
    f = jax.jit(small_inv)
    np.testing.assert_allclose(f(A), jnp.linalg.inv(A), rtol=1e-8,
                               atol=1e-10)
    Ab = jnp.stack([A, 2 * A])
    np.testing.assert_allclose(jax.vmap(small_inv)(Ab), jnp.linalg.inv(Ab),
                               rtol=1e-8, atol=1e-10)
