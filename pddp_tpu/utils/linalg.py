"""Numerically-robust small-matrix linear algebra for TPU.

The reference library leans on exception-driven fallbacks (Cholesky jitter
escalation in /root/reference/pddp/utils/encoding.py:536-564, eigenvalue
clamping in /root/reference/pddp/controllers/ilqr.py:631-634). Under jit
there are no exceptions, so every fallback here is branchless: all candidate
factorizations are computed and the first finite one is selected with
``jnp.where``. The matrices involved are tiny (state sizes 2-8, encoded
sizes up to ~44), so the redundant factorizations are cheap relative to an
HBM round-trip; everything stays fused on-chip.

All matmuls in this module force float32 accumulation
(``lax.Precision.HIGHEST``) — TPU matmul units default to bfloat16
multiplication, which is catastrophic for Riccati recursions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "mm",
    "safe_cholesky",
    "psd_inverse_clamped",
    "psd_clamp",
    "tria_solve",
    "JITTER_LEVELS",
]

# Jitter escalation levels, mirroring the reference's x10 ladder
# (1e-12 -> 10) but evaluated branchlessly in one shot.
JITTER_LEVELS = (1e-12, 1e-9, 1e-6, 1e-3, 1e-1)

# Precision-pinned matmul: never let the MXU downcast Riccati algebra.
mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def _sym(C):
    return 0.5 * (C + jnp.swapaxes(C, -1, -2))


def safe_cholesky(C, jitter_levels=JITTER_LEVELS):
    """Upper-triangular Cholesky factor U with C = U^T U, with jitter fallback.

    Mirrors the reference convention (torch ``potrf`` returns the *upper*
    factor; /root/reference/pddp/utils/encoding.py:560) so that encoded
    states store the upper triangle and ``eps @ U`` has covariance C.

    Branchless escalation: factorizations at every jitter level are computed
    and the first finite one selected. If all fail, falls back to the
    diagonal square root of the clamped variances (a valid, if crude, PSD
    square root) so downstream code never sees NaNs.

    Args:
        C (Array<..., n, n>): symmetric PSD matrices.
        jitter_levels: increasing diagonal jitter magnitudes to try.

    Returns:
        Array<..., n, n>: upper-triangular factors.
    """
    C = _sym(C)
    n = C.shape[-1]
    eye = jnp.eye(n, dtype=C.dtype)

    # Final fallback: diagonal sqrt of clamped variances.
    diag = jnp.clip(jnp.diagonal(C, axis1=-2, axis2=-1), 1e-12, None)
    result = jnp.sqrt(diag)[..., :, None] * eye

    # Walk the ladder from largest jitter to smallest so the smallest finite
    # one wins the final `where`.
    for j in reversed(jitter_levels):
        L = jnp.linalg.cholesky(C + jnp.asarray(j, C.dtype) * eye)
        U = jnp.swapaxes(L, -1, -2)
        ok = jnp.all(jnp.isfinite(U), axis=(-2, -1), keepdims=True)
        result = jnp.where(ok, U, result)

    return result


def psd_clamp(Q, floor=1e-12, extra=0.0):
    """Eigenvalue-clamped PSD projection: eigh, clamp negatives, add `extra`.

    The TPU-native equivalent of the reference's eig-clamp regularization
    (/root/reference/pddp/controllers/ilqr.py:631-634, 645).

    Returns:
        Tuple of (Q_clamped, eigenvalues_clamped, eigenvectors).
    """
    e, E = jnp.linalg.eigh(_sym(Q))
    e = jnp.where(e < 0, jnp.asarray(floor, e.dtype), e) + extra
    Qc = mm(E * e[..., None, :], jnp.swapaxes(E, -1, -2))
    return _sym(Qc), e, E


def psd_inverse_clamped(Q, floor=1e-12, extra=0.0):
    """Inverse of the eigenvalue-clamped matrix: E diag(1/e) E^T.

    Fast path for 1x1 matrices (the common cartpole/pendulum action size)
    avoids eigh entirely — the eigendecomposition of a scalar is itself.
    """
    m = Q.shape[-1]
    if m == 1:
        e = jnp.where(Q < 0, jnp.asarray(floor, Q.dtype), Q) + extra
        return 1.0 / e
    e, E = jnp.linalg.eigh(_sym(Q))
    e = jnp.where(e < 0, jnp.asarray(floor, e.dtype), e) + extra
    return mm(E / e[..., None, :], jnp.swapaxes(E, -1, -2))


def tria_solve(U, B, trans=False):
    """Solve with an upper-triangular factor U (C = U^T U).

    trans=False: solves U x = b. trans=True: solves U^T x = b.
    Replaces the reference's ``torch.trtrs`` calls
    (/root/reference/pddp/utils/particles.py:101).
    """
    return jax.scipy.linalg.solve_triangular(
        U, B, trans=1 if trans else 0, lower=False)
