"""Angular state utilities: exact trig moment matching for Gaussian angles.

Re-implements /root/reference/pddp/utils/angular.py (itself ported from
kusanagi): angular state components theta are replaced by [sin(theta),
cos(theta)] with *exact* propagation of Gaussian uncertainty:
E[sin theta] = e^{-v/2} sin(mu), etc. Index sets are static Python tuples so
all gathers compile to fixed slices; everything broadcasts over leading
batch dimensions.

Layout parity (reference :262-263): augmented vector is
[non_angular_states, sin(a1), cos(a1), sin(a2), cos(a2), ...].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..encoding import StateEncoding, decode_covar, decode_mean, decode_var, encode

__all__ = [
    "complementary_indices",
    "augment_state",
    "reduce_state",
    "augment_encoded_state",
    "infer_augmented_state_size",
    "infer_reduced_state_size",
]


def _as_tuple(idx):
    return tuple(int(i) for i in np.asarray(idx).reshape(-1))


def complementary_indices(indices, size: int):
    """Complementary indices of an index vector (reference :26-44)."""
    idx = set(_as_tuple(indices))
    return tuple(i for i in range(size) if i not in idx)


def infer_augmented_state_size(angular_indices, non_angular_indices) -> int:
    """Size after augmentation (reference :329-340)."""
    return len(_as_tuple(non_angular_indices)) + 2 * len(
        _as_tuple(angular_indices))


def infer_reduced_state_size(angular_indices, non_angular_indices) -> int:
    """Size after reduction (reference :343-354)."""
    return len(_as_tuple(non_angular_indices)) + len(_as_tuple(angular_indices))


def _interleave(a, b):
    """Interleave two (..., k) arrays into (..., 2k): [a0,b0,a1,b1,...]."""
    stacked = jnp.stack([a, b], axis=-1)
    return stacked.reshape(stacked.shape[:-2] + (-1,))


def _take(x, idx, axis=-1):
    """x indexed by a *static* index tuple along ``axis``, emitted as
    stacked static slices: no constant index arrays appear in the jaxpr
    (XLA prefers slices over gathers, and Pallas kernels may not capture
    array constants)."""
    idx = _as_tuple(idx)
    if len(idx) == 0:
        return jnp.take(x, jnp.arange(0), axis=axis)
    parts = [jax.lax.index_in_dim(x, i, axis=axis, keepdims=False)
             for i in idx]
    return jnp.stack(parts, axis=axis if axis >= 0 else
                     parts[0].ndim + 1 + axis)


def _scatter_columns(parts, positions, size):
    """Assemble (..., size) by placing parts[k] at column positions[k]
    (statically), the inverse of _take along the last axis."""
    cols = [None] * size
    for pos, part in zip(positions, parts):
        cols[pos] = part
    return jnp.stack(cols, axis=-1)


def augment_state(x, angular_indices, non_angular_indices):
    """Replace angular components by [sin, cos] pairs (reference :251-286).

    Args:
        x (Array<..., state_size>): state vector(s).

    Returns:
        Array<..., non_angular + 2*angular>.
    """
    ai = _as_tuple(angular_indices)
    if len(ai) == 0:
        return x
    nai = _as_tuple(non_angular_indices)
    mi = _take(x, ai)
    Ma = _interleave(jnp.sin(mi), jnp.cos(mi))
    Mna = _take(x, nai)
    return jnp.concatenate([Mna, Ma], axis=-1)


def reduce_state(x_, angular_indices, non_angular_indices):
    """Inverse of augment_state via atan2 (reference :289-326)."""
    ai = _as_tuple(angular_indices)
    n_angles = len(ai)
    if n_angles == 0:
        return x_
    nai = _as_tuple(non_angular_indices)
    n_others = len(nai)

    others = x_[..., :n_others]
    sin_cos = x_[..., n_others:]
    angles = jnp.arctan2(sin_cos[..., ::2], sin_cos[..., 1::2])

    parts = ([angles[..., j] for j in range(n_angles)]
             + [others[..., j] for j in range(n_others)])
    return _scatter_columns(parts, ai + nai, n_angles + n_others)


def _augment_var(m, v, angular_indices, non_angular_indices):
    """Moment-matched augmentation of mean/variance vectors (ref :87-158).

    Exact diagonal second moments of [sin theta, cos theta] for Gaussian
    theta ~ N(mi, vi):
        Var[sin] = 0.5*((1 - e^{-v}) - (e^{-2v} - e^{-v}) cos(2m))
        Var[cos] = 0.5*((1 - e^{-v}) + (e^{-2v} - e^{-v}) cos(2m))
    """
    ai = _as_tuple(angular_indices)
    if len(ai) == 0:
        return m, v
    nai = _as_tuple(non_angular_indices)

    mi = _take(m, ai)
    vi = _take(v, ai)

    exp_vi_h = jnp.exp(-0.5 * vi)
    Ma = _interleave(exp_vi_h * jnp.sin(mi), exp_vi_h * jnp.cos(mi))

    # Diagonal of the reference's U3/U4 matrices (angular.py:135-148).
    exp_m_vi = jnp.exp(-vi)
    exp_m_2vi = jnp.exp(-2.0 * vi)
    U3 = 1.0 - exp_m_vi
    U4 = (exp_m_2vi - exp_m_vi) * jnp.cos(2.0 * mi)
    Va = 0.5 * _interleave(U3 - U4, U3 + U4)

    M = jnp.concatenate([_take(m, nai), Ma], axis=-1)
    V = jnp.concatenate([_take(v, nai), Va], axis=-1)
    return M, V


def _augment_covar(m, c, angular_indices, non_angular_indices):
    """Moment-matched augmentation with full covariance (reference :161-248).

    Computes the full joint covariance of [non-angular, sin/cos pairs]
    including input-output cross terms via C @ Ca (reference :242-246).
    """
    ai = _as_tuple(angular_indices)
    Da = 2 * len(ai)
    if Da == 0:
        return m, c
    nai = _as_tuple(non_angular_indices)
    Dna = len(nai)
    D = m.shape[-1]
    na = len(ai)

    mi = _take(m, ai)
    ci = _take(_take(c, ai, axis=-2), ai, axis=-1)  # (..., na, na)
    # Static diagonal (batched jnp.diagonal is a >2D gather — not
    # Pallas-lowerable).
    cii = jnp.stack([ci[..., j, j] for j in range(na)], axis=-1)

    exp_cii_h = jnp.exp(-0.5 * cii)
    Ma_sin = exp_cii_h * jnp.sin(mi)
    Ma_cos = exp_cii_h * jnp.cos(mi)
    Ma = _interleave(Ma_sin, Ma_cos)

    lq = -0.5 * (cii[..., :, None] + cii[..., None, :])
    q = jnp.exp(lq)
    exp_lq_p_ci = jnp.exp(lq + ci)
    exp_lq_m_ci = jnp.exp(lq - ci)
    dm = mi[..., :, None] - mi[..., None, :]
    sm = mi[..., :, None] + mi[..., None, :]
    U1 = (exp_lq_p_ci - q) * jnp.sin(dm)
    U2 = (exp_lq_m_ci - q) * jnp.sin(sm)
    U3 = (exp_lq_p_ci - q) * jnp.cos(dm)
    U4 = (exp_lq_m_ci - q) * jnp.cos(sm)

    # Interleaved (sin/cos) covariance block Va (..., 2na, 2na):
    # [ss sc; cs cc] blocks (reference :220-224).
    blocks = jnp.stack([
        jnp.stack([U3 - U4, U1 + U2], axis=-1),          # sin row: [ss, sc]
        jnp.stack([jnp.swapaxes(U1 + U2, -1, -2), U3 + U4], axis=-1),
    ], axis=-2)  # (..., na, na, 2(row-part), 2(col-part))
    # Rearrange (..., na, na, 2, 2) -> (..., na, 2, na, 2) -> (..., 2na, 2na)
    Va = 0.5 * jnp.moveaxis(blocks, -2, -3).reshape(
        blocks.shape[:-4] + (2 * na, 2 * na))

    # Input-output covariance helper Ca (..., D, 2na): rows = original state
    # dims, cols = interleaved sin/cos (reference :227-230). Assembled by
    # stacking static rows — no scatters (Mosaic cannot lower scatter
    # inside Pallas kernels).
    batch = m.shape[:-1]
    row_of = {a: kk for kk, a in enumerate(ai)}
    zero_row = jnp.zeros(batch + (2 * na,), m.dtype)
    zero1 = jnp.zeros(batch + (1,), m.dtype)
    rows = []
    for d in range(D):
        if d in row_of:
            kk = row_of[d]
            parts = ([zero1] * (2 * kk)
                     + [Ma_cos[..., kk:kk + 1], -Ma_sin[..., kk:kk + 1]]
                     + [zero1] * (2 * na - 2 * kk - 2))
            rows.append(jnp.concatenate(parts, axis=-1))
        else:
            rows.append(zero_row)
    Ca = jnp.stack(rows, axis=-2)

    M = jnp.concatenate([_take(m, nai), Ma], axis=-1)

    # Block covariance assembled by concatenation (scatter-free):
    #   [ Vna    cross ]
    #   [ cross^T  Va  ]
    if Dna > 0:
        Vna = _take(_take(c, nai, axis=-2), nai, axis=-1)
        # Cross covariances: (C^T Ca) restricted to non-angular rows
        # (reference :244-246).
        cross = _take(jnp.einsum("...ji,...jk->...ik", c, Ca), nai, axis=-2)
        top = jnp.concatenate([Vna, cross], axis=-1)
        bottom = jnp.concatenate([jnp.swapaxes(cross, -1, -2), Va], axis=-1)
        C = jnp.concatenate([top, bottom], axis=-2)
    else:
        C = Va

    return M, C


def augment_encoded_state(z, angular_indices, non_angular_indices,
                          encoding: StateEncoding = StateEncoding.DEFAULT,
                          state_size=None):
    """Distribution-level augmentation of an encoded state (ref :47-84)."""
    if encoding == StateEncoding.IGNORE_UNCERTAINTY:
        return augment_state(z, angular_indices, non_angular_indices)

    mean = decode_mean(z, encoding, state_size)

    if encoding in (StateEncoding.FULL_COVARIANCE_MATRIX,
                    StateEncoding.UPPER_TRIANGULAR_CHOLESKY):
        covar = decode_covar(z, encoding, state_size)
        M, C = _augment_covar(mean, covar, angular_indices,
                              non_angular_indices)
        return encode(M, C=C, encoding=encoding)

    if encoding in (StateEncoding.VARIANCE_ONLY,
                    StateEncoding.STANDARD_DEVIATION_ONLY):
        var = decode_var(z, encoding, state_size)
        M, V = _augment_var(mean, var, angular_indices, non_angular_indices)
        return encode(M, V=V, encoding=encoding)

    raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))
