"""State-distribution encoding: the universal currency of the framework.

Every state is a Gaussian distribution over the true state, flattened into a
single vector ``z`` so that derivatives w.r.t. the *distribution* (mean and
covariance) flow through one autodiff pass. Re-implements the contract of
/root/reference/pddp/utils/encoding.py (StateEncoding enum at :25-43,
encode at :99-141, decode family at :144-362) as pure jnp functions:

 * `encoding` is always a static Python value — under jit every branch here
   resolves at trace time, so each encoding compiles to its own minimal
   program with static shapes.
 * All functions broadcast over arbitrary leading batch dimensions (time,
   line-search candidates, particles, batched solves) — the TPU build's
   replacement for the reference's dim()==1/2/3 case analysis.
 * Cholesky jitter escalation (reference :536-564) is branchless — see
   `pddp_tpu.utils.linalg.safe_cholesky`.
"""

from __future__ import annotations

import math
from enum import IntEnum

import jax
import jax.numpy as jnp
import numpy as np

from .utils.kernel_mode import in_pallas_kernel
from .utils.linalg import safe_cholesky

__all__ = [
    "StateEncoding",
    "infer_encoded_state_size",
    "infer_state_size",
    "encode",
    "decode_mean",
    "decode_covar",
    "decode_var",
    "decode_std",
    "decode_covar_sqrt",
]


class StateEncoding(IntEnum):
    """State encoding types (parity: reference encoding.py:25-43)."""

    #: Encode the full covariance matrix: size n + n^2.
    FULL_COVARIANCE_MATRIX = 0

    #: Encode the upper-triangular Cholesky factor of the covariance
    #: (default): size n + n(n+1)/2.
    UPPER_TRIANGULAR_CHOLESKY = 1

    #: Encode the variance only: size 2n.
    VARIANCE_ONLY = 2

    #: Encode the standard deviation only: size 2n.
    STANDARD_DEVIATION_ONLY = 3

    #: Encode the mean only, ignoring uncertainty: size n. Reduces PDDP to
    #: plain iLQR.
    IGNORE_UNCERTAINTY = 4

    DEFAULT = 1


# Hard-coded "unit" uncertainty used when decoding IGNORE_UNCERTAINTY
# states (reference encoding.py:202, 244, 287, 348).
_IGNORE_VAR = 1e-6
_IGNORE_STD = 1e-3


def infer_encoded_state_size(state_size: int,
                             encoding: StateEncoding = StateEncoding.DEFAULT
                             ) -> int:
    """Encoded vector size for a given state size (reference :46-67)."""
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        return state_size + state_size**2
    if encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        return (3 * state_size + state_size**2) // 2
    if encoding in (StateEncoding.VARIANCE_ONLY,
                    StateEncoding.STANDARD_DEVIATION_ONLY):
        return 2 * state_size
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return state_size
    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))


def infer_state_size(encoded_state_size: int,
                     encoding: StateEncoding = StateEncoding.DEFAULT) -> int:
    """State size from an encoded vector size (reference :70-96)."""
    n = encoded_state_size
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        return int(0.5 * (-1 + math.sqrt(1 + 4 * n)))
    if encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        return int(round(0.5 * (-3 + math.sqrt(9 + 8 * n))))
    if encoding in (StateEncoding.VARIANCE_ONLY,
                    StateEncoding.STANDARD_DEVIATION_ONLY):
        return n // 2
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return n
    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))


def _triu_indices(n: int):
    iu = np.triu_indices(n)
    return iu[0], iu[1]


def _triu_sel(k: int, n: int, m: int, dtype):
    """Selection mask S_k (n, m): S_k[j, l] = 1 iff flat position l holds
    row k's element j (row-major triu), i.e. l == offset(k) + j - k and
    j >= k. Built from broadcasted_iota so Pallas kernels capture no
    array constants."""
    ofs = k * n - (k * (k - 1)) // 2
    j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return ((ll == ofs + j - k) & (j >= k)).astype(dtype)


def _onehot_row(k: int, n: int, dtype):
    return (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == k).astype(
        dtype)


def _flatten_triu(U):
    """Row-major upper-triangle of (..., n, n) as (..., n(n+1)/2).

    General path: static slices + one concatenate (no gather:
    XLA-friendlier). In-kernel path: masked single-axis sums — slices
    keep their source lane offsets in Mosaic vector layouts and
    ``tpu.concatenate`` requires uniform layouts (probe_micro4 s1 kill;
    probe_micro5 g1 PASS, exact), so rows are extracted by one-hot
    reduction and placed by VPU selection sums instead."""
    n = U.shape[-1]
    if not in_pallas_kernel():
        return jnp.concatenate([U[..., i, i:] for i in range(n)], axis=-1)
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        row_k = jnp.sum(U * _onehot_row(k, n, U.dtype), axis=-2)
        piece = jnp.sum(row_k[..., :, None] * _triu_sel(k, n, m, U.dtype),
                        axis=-2)
        out = piece if out is None else out + piece
    return out


def _unflatten_triu(X, n: int):
    """Inverse of _flatten_triu: (..., n(n+1)/2) -> upper-triangular
    (..., n, n), scatter-free. General path: padded static slices.
    In-kernel path: VPU selection sums (probe_micro5 g2, exact) — see
    _flatten_triu for why concatenation of slices is out."""
    if not in_pallas_kernel():
        rows = []
        ofs = 0
        zeros_shape = X.shape[:-1]
        for i in range(n):
            width = n - i
            row_vals = X[..., ofs:ofs + width]
            if i:
                pad = jnp.zeros(zeros_shape + (i,), X.dtype)
                row_vals = jnp.concatenate([pad, row_vals], axis=-1)
            rows.append(row_vals)
            ofs += width
        return jnp.stack(rows, axis=-2)
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        row_vals = jnp.sum(X[..., None, :] * _triu_sel(k, n, m, X.dtype),
                           axis=-1)
        U_k = _onehot_row(k, n, X.dtype) * row_vals[..., None, :]
        out = U_k if out is None else out + U_k
    return out


def _C_from(C=None, V=None, S=None):
    """Covariance matrices from whichever uncertainty measure was given."""
    if C is not None:
        return C
    V = _V_from(C, V, S)
    n = V.shape[-1]
    return V[..., :, None] * jnp.eye(n, dtype=V.dtype)


def _diag(C):
    """Batched matrix diagonal via static slices (jnp.diagonal lowers to a
    >2D gather, which Mosaic rejects inside Pallas kernels)."""
    n = C.shape[-1]
    return jnp.stack([C[..., i, i] for i in range(n)], axis=-1)


def _V_from(C=None, V=None, S=None):
    if V is not None:
        return V
    if S is not None:
        return jnp.square(S)
    if C is not None:
        return _diag(C)
    raise ValueError("At least one of C, V, S must be specified")


def _S_from(C=None, V=None, S=None):
    if S is not None:
        return S
    return jnp.sqrt(_V_from(C, V, S))


def encode(M, C=None, V=None, S=None,
           encoding: StateEncoding = StateEncoding.DEFAULT,
           jitter_levels=None):
    """Encodes a state distribution (broadcasts over leading batch dims).

    At least one of C, V, S must be given (parity: reference :99-141).

    Args:
        M (Array<..., n>): mean vector(s).
        C (Array<..., n, n>): covariance matrices.
        V (Array<..., n>): variance vector(s).
        S (Array<..., n>): standard deviation vector(s).
        encoding: StateEncoding enum (static).
        jitter_levels: optional override for the Cholesky jitter ladder
            (utils.linalg.JITTER_LEVELS default). Hot scan paths pass a
            shallow ladder — bit-identical whenever the smallest rung
            factorizes (the "smallest finite rung wins" select), fewer
            sequential VPU ops per step (docs/PERFORMANCE.md §7c).

    Returns:
        Encoded state vector(s) (Array<..., encoded_state_size>).
    """
    n = M.shape[-1]
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return M
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        Cm = _C_from(C, V, S)
        other = Cm.reshape(Cm.shape[:-2] + (n * n,))
    elif encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        if C is None and (V is not None or S is not None):
            # Diagonal fast path: the Cholesky factor of diag(v) is
            # diag(sqrt(v)); skip the factorization ladder entirely.
            U = jnp.sqrt(jnp.clip(_V_from(C, V, S), 0.0, None))[
                ..., :, None] * jnp.eye(n, dtype=M.dtype)
        elif jitter_levels is not None:
            U = safe_cholesky(_C_from(C, V, S), jitter_levels=jitter_levels)
        else:
            U = safe_cholesky(_C_from(C, V, S))
        other = _flatten_triu(U)
    elif encoding == StateEncoding.VARIANCE_ONLY:
        other = _V_from(C, V, S)
    elif encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
        other = _S_from(C, V, S)
    else:
        raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))

    other = jnp.broadcast_to(other, M.shape[:-1] + other.shape[-1:])
    return jnp.concatenate([M, other], axis=-1)


def _split(Z, encoding: StateEncoding, state_size=None):
    """Split encoded vector(s) into (mean, other, state_size)."""
    if state_size is None:
        state_size = infer_state_size(Z.shape[-1], encoding)
    mean = Z[..., :state_size]
    other = Z[..., state_size:]
    return mean, other, state_size


def decode_mean(Z, encoding: StateEncoding = StateEncoding.DEFAULT,
                state_size=None):
    """Mean vector(s) from encoded state(s) (reference :144-156)."""
    mean, _, _ = _split(Z, encoding, state_size)
    return mean


def _U_from_flat_triu(X, n: int):
    """Unflatten an upper-triangular factor (reference :481-504)."""
    return _unflatten_triu(X, n)


def _diag_embed(v):
    return v[..., :, None] * jnp.eye(v.shape[-1], dtype=v.dtype)


def decode_covar(Z, encoding: StateEncoding = StateEncoding.DEFAULT,
                 state_size=None):
    """Covariance matrices from encoded state(s) (reference :159-218)."""
    _, other, n = _split(Z, encoding, state_size)
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        return other.reshape(other.shape[:-1] + (n, n))
    if encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        U = _U_from_flat_triu(other, n)
        return jnp.matmul(jnp.swapaxes(U, -1, -2), U)
    if encoding == StateEncoding.VARIANCE_ONLY:
        return _diag_embed(other)
    if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
        return _diag_embed(jnp.square(other))
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        C = _IGNORE_VAR * jnp.eye(n, dtype=Z.dtype)
        return jnp.broadcast_to(C, Z.shape[:-1] + (n, n))
    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))


def decode_var(Z, encoding: StateEncoding = StateEncoding.DEFAULT,
               state_size=None):
    """Variance vector(s) from encoded state(s) (reference :221-260)."""
    _, other, n = _split(Z, encoding, state_size)
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        C = other.reshape(other.shape[:-1] + (n, n))
        return _diag(C)
    if encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        U = _U_from_flat_triu(other, n)
        return jnp.sum(jnp.square(U), axis=-2)
    if encoding == StateEncoding.VARIANCE_ONLY:
        return other
    if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
        return jnp.square(other)
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return jnp.full(Z.shape, _IGNORE_VAR, dtype=Z.dtype)
    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))


def decode_std(Z, encoding: StateEncoding = StateEncoding.DEFAULT,
               state_size=None):
    """Standard deviation vector(s) from encoded state(s) (ref :263-301)."""
    if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
        _, other, _ = _split(Z, encoding, state_size)
        return other
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return jnp.full(Z.shape, _IGNORE_STD, dtype=Z.dtype)
    return jnp.sqrt(decode_var(Z, encoding, state_size))


def decode_covar_sqrt(Z, encoding: StateEncoding = StateEncoding.DEFAULT,
                      state_size=None):
    """Upper-triangular factor U with C = U^T U from encoded state(s).

    Convention matches the reference (torch potrf upper factor;
    reference :304-362): particle sampling is ``X = mean + eps @ U``.
    """
    _, other, n = _split(Z, encoding, state_size)
    if encoding == StateEncoding.FULL_COVARIANCE_MATRIX:
        C = other.reshape(other.shape[:-1] + (n, n))
        return safe_cholesky(C)
    if encoding == StateEncoding.UPPER_TRIANGULAR_CHOLESKY:
        return _U_from_flat_triu(other, n)
    if encoding == StateEncoding.VARIANCE_ONLY:
        return _diag_embed(jnp.sqrt(jnp.clip(other, 0.0, None)))
    if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
        return _diag_embed(other)
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        U = _IGNORE_STD * jnp.eye(n, dtype=Z.dtype)
        return jnp.broadcast_to(U, Z.shape[:-1] + (n, n))
    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))
