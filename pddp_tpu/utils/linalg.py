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
    "small_cholesky",
    "small_det",
    "small_inv",
    "small_solve",
    "psd_inverse_clamped",
    "psd_clamp",
    "tria_solve",
    "JITTER_LEVELS",
    "SMALL_N",
]

#: static size up to which factorizations/solves are unrolled elementwise.
#: XLA's batched LAPACK-style kernels loop over columns with dynamic
#: slicing — poor on TPU for the tiny matrices this library lives on
#: (state sizes 2-8); fully unrolled versions fuse into a handful of
#: vectorized elementwise ops (and they lower inside Pallas kernels).
SMALL_N = 8

# Jitter escalation levels, mirroring the reference's x10 ladder
# (1e-12 -> 10) but evaluated branchlessly in one shot.
JITTER_LEVELS = (1e-12, 1e-9, 1e-6, 1e-3, 1e-1)

# Precision-pinned matmul: never let the MXU downcast Riccati algebra.
mm = functools.partial(jnp.matmul, precision=lax.Precision.HIGHEST)


def _sym(C):
    return 0.5 * (C + jnp.swapaxes(C, -1, -2))


def _minor(A, i, j):
    n = A.shape[-1]
    rows = [r for r in range(n) if r != i]
    cols = [c for c in range(n) if c != j]
    return jnp.stack(
        [jnp.stack([A[..., r, c] for c in cols], axis=-1) for r in rows],
        axis=-2)


def small_det(A):
    """Determinant by Laplace expansion, unrolled for static n <= 4."""
    n = A.shape[-1]
    if n == 1:
        return A[..., 0, 0]
    out = 0.0
    for j in range(n):
        term = A[..., 0, j] * small_det(_minor(A, 0, j))
        out = out + term if j % 2 == 0 else out - term
    return out


def small_inv(A):
    """Closed-form inverse via the adjugate, unrolled for static n <= 4.

    XLA's batched LU on tiny matrices is column-loop-bound on TPU; the
    adjugate is a fixed handful of fused elementwise ops (and lowers inside
    Pallas kernels). Fine for the well-conditioned tiny systems this
    library solves (mass matrices, I + C J Riccati combines).
    """
    n = A.shape[-1]
    if n == 1:
        return 1.0 / A
    d = small_det(A)
    cof_T = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            m = small_det(_minor(A, i, j))
            cof_T[j][i] = m if (i + j) % 2 == 0 else -m  # transposed
    adj = jnp.stack(
        [jnp.stack(row, axis=-1) for row in cof_T], axis=-2)
    return adj / d[..., None, None]


def small_solve(A, b):
    """A^{-1} b for static n <= 4 (see small_inv); b (..., n) or (..., n, k)."""
    inv = small_inv(A)
    if b.ndim == A.ndim - 1:
        return jnp.einsum("...ij,...j->...i", inv, b)
    return jnp.matmul(inv, b)


def small_cholesky(C):
    """Unrolled Cholesky-Crout for static n <= SMALL_N: returns the
    *upper* factor U with C = U^T U (NaN where not positive definite,
    matching jnp.linalg.cholesky semantics)."""
    n = C.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = C[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                # sqrt(neg) -> NaN: the ladder/clamp upstream handles it.
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(C[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)],
                      axis=-1) for i in range(n)]
    Lm = jnp.stack(rows, axis=-2)
    return jnp.swapaxes(Lm, -1, -2)


def _cholesky_upper(C):
    """Upper Cholesky factor, unrolled for small static sizes."""
    if C.shape[-1] <= SMALL_N:
        return small_cholesky(C)
    return jnp.swapaxes(jnp.linalg.cholesky(C), -1, -2)


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

    # Final fallback: diagonal sqrt of clamped variances. Static extraction
    # instead of jnp.diagonal: batched diagonal lowers to a >2D gather,
    # which Mosaic rejects inside Pallas kernels.
    diag = jnp.stack([C[..., i, i] for i in range(n)], axis=-1)
    diag = jnp.clip(diag, 1e-12, None)
    result = jnp.sqrt(diag)[..., :, None] * eye

    # Walk the ladder from largest jitter to smallest so the smallest finite
    # one wins the final `where`.
    for j in reversed(jitter_levels):
        U = _cholesky_upper(C + jnp.asarray(j, C.dtype) * eye)
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
    (/root/reference/pddp/utils/particles.py:101). Unrolled substitution
    for small static sizes (see SMALL_N).
    """
    n = U.shape[-1]
    if n <= SMALL_N:
        was_vec = B.ndim == U.ndim - 1
        Bm = B[..., :, None] if was_vec else B

        # Element access via static slices only: [..., r, c, None]-style
        # mixed indexing lowers through gather, which Mosaic rejects
        # inside Pallas kernels.
        def uelem(r, c):
            return jnp.squeeze(U[..., r:r + 1, c:c + 1], -1)  # (..., 1)

        def brow(r):
            return jnp.squeeze(Bm[..., r:r + 1, :], -2)       # (..., m)

        xs = [None] * n
        if trans:
            # U^T x = b: lower-triangular forward substitution.
            for i in range(n):
                s = brow(i)
                for k in range(i):
                    s = s - uelem(k, i) * xs[k]
                xs[i] = s / uelem(i, i)
        else:
            # U x = b: back substitution.
            for i in range(n - 1, -1, -1):
                s = brow(i)
                for k in range(i + 1, n):
                    s = s - uelem(i, k) * xs[k]
                xs[i] = s / uelem(i, i)
        X = jnp.stack(xs, axis=-2)
        return jnp.squeeze(X, -1) if was_vec else X
    return jax.scipy.linalg.solve_triangular(
        U, B, trans=1 if trans else 0, lower=False)
