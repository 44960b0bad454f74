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

from .kernel_mode import in_pallas_kernel

__all__ = [
    "mm",
    "small_mm",
    "safe_cholesky",
    "small_cholesky",
    "small_det",
    "small_eigh",
    "small_inv",
    "small_solve",
    "psd_inverse_clamped",
    "psd_clamp",
    "tria_solve",
    "tria_solve_right",
    "JITTER_LEVELS",
    "SMALL_EIGH_N",
    "SMALL_MM_N",
    "SMALL_N",
]

#: static size up to which the unrolled Jacobi eigensolver (small_eigh) is
#: used on solver hot paths. Rotation count grows O(n^2 * sweeps) and each
#: rotation unrolls to ~4n scalar ops, so past ~4 the emitted graph (and
#: its XLA compile time, especially inside Pallas kernels) blows up; every
#: bundled problem has action_size <= 4.
SMALL_EIGH_N = 4

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


#: static contraction-dim bound for small_mm's unrolled path. Separate
#: from SMALL_N (the factorization-unroll cap) so the two can be tuned
#: independently. 8 covers every solver-critical contraction at
#: IGNORE_UNCERTAINTY plus all action blocks; raising it to 16 (covering
#: 14-wide Cholesky-encoded cartpole states) measured within noise on the
#: batched-PDDP benchmark — the BNN jacobian work dominates there, so the
#: default stays at 8.
SMALL_MM_N = 8


def small_mm(X, Y):
    """Matrix product for tiny static contraction dims, unrolled into
    broadcast-multiply-adds (VPU) instead of ``dot_general`` (MXU).

    Batched tiny matmuls are pathological on TPU: under a large problem
    batch (P5 vmapped solves) XLA lowers (B, n, n) dot_generals with
    layouts that serialize — measured ~14x slower than the identical math
    as n unrolled outer-product accumulations inside the Riccati scan at
    B=1024, n=4. Elementwise f32 multiplies also never downcast, so this
    keeps the HIGHEST-precision contract of ``mm``.

    Falls back to ``mm`` when the contraction dim exceeds SMALL_MM_N
    (the unrolled graph grows linearly with it) or when X is 1-D.

    Semantics match ``jnp.matmul``: Y is a vector only when ``Y.ndim ==
    1`` (a higher-rank Y is a — possibly batch-broadcast — matrix; the
    unrolled product broadcasts batch dims exactly like matmul).
    """
    k = X.shape[-1]
    # Static shape check (free at trace time): the unrolled paths below
    # rely on broadcasting, which would silently accept a mismatched
    # length-1 contraction dim that jnp.matmul rejects.
    y_k = Y.shape[-1] if Y.ndim == 1 else Y.shape[-2]
    if y_k != k:
        raise TypeError(
            "small_mm contraction mismatch: X {} vs Y {}".format(
                X.shape, Y.shape))
    if X.ndim < 2 or k > SMALL_MM_N:
        return mm(X, Y)
    if Y.ndim == 1:
        # Matvec: one broadcast multiply + lane reduction.
        return jnp.sum(X * Y, axis=-1)
    out = None
    for i in range(k):
        t = X[..., :, i:i + 1] * Y[..., i:i + 1, :]
        out = t if out is None else out + t
    return out


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


def small_eigh(A, sweeps=None, sort=True):
    """Symmetric eigendecomposition by fixed-sweep cyclic Jacobi, fully
    unrolled for static n <= SMALL_N (past that it falls back to
    ``jnp.linalg.eigh``; the solver's own gate for choosing this routine
    is the tighter SMALL_EIGH_N).

    The TPU-native stand-in for ``jnp.linalg.eigh`` on tiny matrices
    (action blocks, 1-8 dims): XLA's eigh lowers to a column-loop QR
    routine that is dynamic-slice-bound on TPU and does not lower inside
    Pallas kernels at all. A cyclic Jacobi sweep is a fixed sequence of
    branchless plane rotations on scalars — it fuses into elementwise
    vector ops and is Mosaic-compatible (no gathers, no dynamic slices).

    The rotation count is static: ``sweeps`` full upper-triangle sweeps
    (default 8 — quadratic convergence puts n<=8 matrices at machine
    precision well before that).

    Args:
        A (Array<..., n, n>): symmetric matrices (only the values are read;
            symmetrized internally).
        sweeps: number of full Jacobi sweeps (static). Default: 8 in f64,
            5 in f32/bf16 (quadratic convergence: off-diagonals shrink past
            the dtype epsilon in fewer sweeps at lower precision).
        sort: when False, skip the ascending sort of the eigenpairs — for
            spectral-function use (f(A) = E f(e) E^T is order-invariant)
            the compare-exchange network is pure overhead, which matters
            inside latency-bound Pallas kernels.

    Returns:
        Tuple of (eigenvalues (..., n) ascending unless ``sort=False``,
        eigenvectors (..., n, n) with columns matching), like
        ``jnp.linalg.eigh``.
    """
    n = A.shape[-1]
    if n > SMALL_N:
        # The unrolled rotation network is O(sweeps * n^2) scalar ops —
        # past the intended bound it emits an enormous graph for no win,
        # so hand off to XLA's eigh (sort order already matches).
        w, E = jnp.linalg.eigh(_sym(A))
        return w, E
    if n == 1:
        return A[..., 0], jnp.ones_like(A)
    if sweeps is None:
        sweeps = 8 if jnp.finfo(A.dtype).bits >= 64 else 5
    A = _sym(A)

    # Scalarized representation: a[i][j] and v[i][j] are batch-shaped
    # scalars. Static extraction keeps every op elementwise.
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    one = jnp.ones_like(a[0][0])
    zero = jnp.zeros_like(one)
    v = [[one if i == j else zero for j in range(n)] for i in range(n)]

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app, aqq, apq = a[p][p], a[q][q], a[p][q]
                # Branchless Jacobi rotation annihilating a[p][q]
                # (Golub & Van Loan 8.4): guard apq == 0 with a dummy
                # divisor and select the identity rotation after.
                nz_mask = apq != 0
                apq_safe = jnp.where(nz_mask, apq, one)
                tau = (aqq - app) / (2.0 * apq_safe)
                # Clip so tau^2 cannot overflow (f32: apq ~1e-13 relative
                # gives tau ~1e13, tau^2 ~1e26; but near-converged entries
                # can push past float max). Beyond the clip t < 1/(2*clip)
                # is below machine epsilon anyway — identity rotation.
                big = jnp.sqrt(jnp.finfo(tau.dtype).max) * 0.25
                tau = jnp.clip(tau, -big, big)
                sgn = jnp.where(tau >= 0, one, -one)
                t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                t = jnp.where(nz_mask, t, zero)
                c = jnp.where(nz_mask, c, one)
                s = jnp.where(nz_mask, s, zero)

                for k in range(n):
                    if k != p and k != q:
                        akp, akq = a[k][p], a[k][q]
                        new_kp = c * akp - s * akq
                        new_kq = s * akp + c * akq
                        a[k][p] = new_kp
                        a[p][k] = new_kp
                        a[k][q] = new_kq
                        a[q][k] = new_kq
                a[p][p] = app - t * apq
                a[q][q] = aqq + t * apq
                a[p][q] = zero
                a[q][p] = zero

                for k in range(n):
                    vkp, vkq = v[k][p], v[k][q]
                    v[k][p] = c * vkp - s * vkq
                    v[k][q] = s * vkp + c * vkq

    # Ascending sort (eigh contract) via a static compare-exchange network
    # (bubble network: fine for n <= 8) swapping eigenvalue + column pairs.
    e = [a[i][i] for i in range(n)]
    cols = [[v[k][j] for k in range(n)] for j in range(n)]  # cols[j][k]
    for i in range(n - 1 if sort else 0):
        for j in range(n - 1 - i):
            swap = e[j] > e[j + 1]
            lo = jnp.where(swap, e[j + 1], e[j])
            hi = jnp.where(swap, e[j], e[j + 1])
            e[j], e[j + 1] = lo, hi
            new_a = [jnp.where(swap, cb, ca)
                     for ca, cb in zip(cols[j], cols[j + 1])]
            new_b = [jnp.where(swap, ca, cb)
                     for ca, cb in zip(cols[j], cols[j + 1])]
            cols[j], cols[j + 1] = new_a, new_b

    evals = jnp.stack(e, axis=-1)
    evecs = jnp.stack(
        [jnp.stack([cols[j][k] for j in range(n)], axis=-1)
         for k in range(n)], axis=-2)
    return evals, evecs


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
    # which Mosaic rejects inside Pallas kernels. In-kernel the stack of
    # C[..., i, i] slices is also out — each slice keeps its {i,i}
    # sublane/lane offset and tpu.concatenate requires uniform layouts
    # (the probe_fused_stateful `mm` kill) — so there the diagonal is a
    # masked row sum instead (probe_micro5 f4, exact).
    if in_pallas_kernel():
        diag = jnp.sum(C * eye, axis=-1)
    else:
        diag = jnp.stack([C[..., i, i] for i in range(n)], axis=-1)
    diag = jnp.clip(diag, 1e-12, None)
    result = jnp.sqrt(diag)[..., :, None] * eye

    # Walk the ladder from largest jitter to smallest so the smallest finite
    # one wins the final select. In-kernel the finite check reduces one
    # axis at a time with keepdims and selects via an arithmetic blend:
    # multi-axis reductions and sub-2-D intermediates abort Mosaic's
    # vector-layout inference, and a broadcast jnp.where on the whole
    # matrix does too (scripts/probe_micro3.py t6d/r3 PASS vs t6b/t3
    # kills). Outside kernels the multi-axis form stays — same selection
    # bit-for-bit, fewer VPU ops on the hot scan paths.
    kernel = in_pallas_kernel()
    for j in reversed(jitter_levels):
        U = _cholesky_upper(C + jnp.asarray(j, C.dtype) * eye)
        finite = jnp.isfinite(U)
        if kernel:
            U_safe = jnp.where(finite, U, jnp.zeros_like(U))
            ok = jnp.min(jnp.min(finite.astype(C.dtype), axis=-1,
                                 keepdims=True), axis=-2, keepdims=True)
            result = U_safe * ok + result * (1.0 - ok)
        else:
            ok = jnp.all(finite, axis=(-2, -1), keepdims=True)
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


def tria_solve_right(U, D):
    """Solve X @ U = D for upper-triangular U; D is (..., m, n).

    Equivalent to ``tria_solve(U, D.T, trans=True).T`` (the reference's
    transposed ``torch.trtrs``, /root/reference/pddp/utils/particles.py:101)
    but operates on the row-major (m, n) layout directly — no transposes.
    That matters inside Pallas kernels, where Mosaic handles the
    column-sweep forward substitution on (m, n) tiles but chokes on the
    transposed formulation (see scripts/probe_micro.py findings).
    """
    n = U.shape[-1]
    if n <= SMALL_N:
        def uelem(r, c):
            return jnp.squeeze(U[..., r:r + 1, c:c + 1], -1)  # (..., 1)

        def dcol(c):
            return jnp.squeeze(D[..., :, c:c + 1], -1)        # (..., m)

        # X U = D column sweep: X[:, j] = (D[:, j] - sum_{k<j} X[:, k]
        # * U[k, j]) / U[j, j].
        xs = [None] * n
        for j in range(n):
            s = dcol(j)
            for k in range(j):
                s = s - xs[k] * uelem(k, j)
            xs[j] = s / uelem(j, j)
        return jnp.stack(xs, axis=-1)
    return jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            U, jnp.swapaxes(D, -1, -2), trans=1, lower=False), -1, -2)
