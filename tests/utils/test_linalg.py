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
                                   small_solve, tria_solve,
                                   tria_solve_right)


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


@pytest.mark.parametrize("n", [1, 2, 4, 8, 12])
def test_tria_solve_right(n):
    # X @ U = D, both the unrolled (n <= SMALL_N) and fallback paths.
    rng = np.random.RandomState(n)
    C = _spd(rng, n, (4,))
    U = safe_cholesky(C)
    D = jnp.asarray(rng.randn(4, 7, n))
    X = tria_solve_right(U, D)
    np.testing.assert_allclose(jnp.einsum("bmn,bnk->bmk", X, U), D,
                               rtol=1e-7, atol=1e-8)
    # Bit-identical to the transposed tria_solve formulation it replaced
    # on the BNN noise-inference path (models/bnn/model.py:_effective_eps).
    ref = jnp.swapaxes(tria_solve(U, jnp.swapaxes(D, -1, -2), trans=True),
                       -1, -2)
    if n <= 8:  # both sides unrolled: same operation order
        np.testing.assert_array_equal(np.asarray(X), np.asarray(ref))
    else:
        np.testing.assert_allclose(X, ref, rtol=1e-9, atol=1e-11)


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


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 8])
def test_small_eigh_matches_lapack(n):
    """Fixed-sweep Jacobi must reproduce jnp.linalg.eigh: ascending
    eigenvalues, orthonormal eigenvectors, exact reconstruction."""
    from pddp_tpu.utils.linalg import small_eigh
    rng = np.random.RandomState(n)
    A = rng.randn(5, n, n)
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    e, E = small_eigh(A)
    e_ref = jnp.linalg.eigh(A)[0]
    np.testing.assert_allclose(e, e_ref, rtol=1e-10, atol=1e-12)
    recon = mm(E * e[..., None, :], jnp.swapaxes(E, -1, -2))
    np.testing.assert_allclose(recon, A, rtol=1e-10, atol=1e-12)
    eye = jnp.broadcast_to(jnp.eye(n), A.shape)
    np.testing.assert_allclose(mm(E, jnp.swapaxes(E, -1, -2)), eye,
                               atol=1e-12)


def test_small_eigh_unsorted_reconstruction():
    """sort=False skips the ordering network but the spectral
    reconstruction (all the clamp path needs) is unchanged."""
    from pddp_tpu.utils.linalg import small_eigh
    rng = np.random.RandomState(0)
    A = rng.randn(4, 4)
    A = jnp.asarray(A + A.T)
    e, E = small_eigh(A, sort=False)
    recon = mm(E * e[None, :], E.T)
    np.testing.assert_allclose(recon, A, rtol=1e-10, atol=1e-12)


def test_small_eigh_f32_and_degenerate():
    """f32 default sweeps reach f32 precision; exactly-diagonal and
    repeated-eigenvalue inputs stay finite (the tau-overflow guard)."""
    from pddp_tpu.utils.linalg import small_eigh
    rng = np.random.RandomState(1)
    A = rng.randn(3, 5, 5).astype(np.float32)
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    e, E = small_eigh(A)
    e_ref = np.linalg.eigh(np.asarray(A, np.float64))[0]
    np.testing.assert_allclose(np.asarray(e, np.float64), e_ref,
                               rtol=1e-4, atol=1e-5)
    # Already-diagonal: rotations are all identity (apq == 0 guard).
    D = jnp.asarray(np.diag([3.0, -1.0, 2.0]))
    e, E = small_eigh(D)
    np.testing.assert_allclose(e, jnp.asarray([-1.0, 2.0, 3.0]), atol=1e-14)
    # Repeated eigenvalues (identity): any orthonormal basis is valid.
    e, E = small_eigh(jnp.eye(4))
    np.testing.assert_allclose(e, jnp.ones(4), atol=1e-14)
    np.testing.assert_allclose(mm(E, E.T), jnp.eye(4), atol=1e-12)


def test_small_eigh_jit_vmap_grad_safe():
    from pddp_tpu.utils.linalg import small_eigh
    rng = np.random.RandomState(2)
    A = rng.randn(7, 3, 3)
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    e_j, _ = jax.jit(small_eigh)(A)
    e_v, _ = jax.vmap(small_eigh)(A)
    e_ref = jnp.linalg.eigh(A)[0]
    np.testing.assert_allclose(e_j, e_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(e_v, e_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("xshape,yshape", [
    ((3, 3), (3, 3)),      # plain matmat
    ((5, 3, 3), (3, 3)),   # batched X, broadcast Y (matmul broadcasting)
    ((5, 3, 3), (5, 3, 3)),
    ((3, 3), (3,)),        # matvec
    ((5, 2, 3), (3,)),     # batched matvec
    ((2, 4, 6), (6, 5)),   # non-square
])
def test_small_mm_matches_matmul(xshape, yshape):
    """small_mm is aliased as `mm` across the solver: it must reproduce
    jnp.matmul semantics exactly (including batch broadcasting and the
    1-D-vector rule) for every supported shape combination."""
    from pddp_tpu.utils.linalg import small_mm
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(*xshape))
    Y = jnp.asarray(rng.randn(*yshape))
    np.testing.assert_allclose(small_mm(X, Y), jnp.matmul(X, Y),
                               rtol=1e-12, atol=1e-13)
