"""Quadratic expected-cost families.

Re-implements /root/reference/pddp/costs/quadratic.py as pytree dataclasses
operating on encoded Gaussian state distributions:

 * QRCost (reference :24-99):
     E[L(x, u)] = tr(Q Sigma) + (mu - x*)^T Q (mu - x*) + (u - u*)^T R (u - u*)
 * SaturatingQRCost (reference :102-183): the PILCO-style saturating cost
     1 - exp(-0.5 d^T S1 d) / sqrt(det(I + Sigma Q)), exact under Gaussian
     inputs.

Both broadcast over arbitrary leading batch dims (time, line-search
candidates, batched solves) — no separate single/batched code paths.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..encoding import StateEncoding, decode_covar, decode_mean
from ..struct import pytree_dataclass
from ..utils.linalg import mm
from .base import Cost

__all__ = ["QRCost", "SaturatingQRCost", "augmented_qr_derivatives"]


def augmented_qr_derivatives(Q, R, x_goal, u_goal, x, u, terminal,
                             angular_indices=(), non_angular_indices=()):
    """Closed-form Taylor coefficients of an (angular-augmented) QR cost.

    For L(x, u) = d^T Q d + du^T R du with d = aug(x) - x*, du = u - u*,
    the quadratic model in augmented space is constant (l_y = (Q+Q^T) d,
    l_yy = Q+Q^T), and the augmentation aug (utils/angular.augment_state)
    is elementwise, so its Jacobian J and curvature are a handful of sparse
    trig entries:

        l_x  = J^T l_y
        l_xx = J^T (Q+Q^T) J + diag(curv),
        curv[a_k] = -sin(th_k) l_y[s_k] - cos(th_k) l_y[c_k].

    Replaces autodiff grad-of-grad through the augmentation — the dominant
    per-iteration cost on TPU (hundreds of tiny HLOs -> ~10 einsums).
    Mean-state (IGNORE_UNCERTAINTY) only; x is the raw state vector.

    Returns:
        (l, l_z, l_u, l_zz, l_uz, l_uu); u-entries None when terminal.
    """
    ai = tuple(int(a) for a in angular_indices)
    nai = tuple(int(a) for a in non_angular_indices)
    nx = x.shape[-1]
    batch = x.shape[:-1]
    dtype = x.dtype
    M = Q + Q.T

    if ai:
        # Fully batched and scatter-free: the Jacobian's rows are one-hot
        # outer products (constant non-angular rows, trig angular rows).
        nna = len(nai)
        th = jnp.stack([x[..., a] for a in ai], axis=-1)      # (..., na)
        s, c = jnp.sin(th), jnp.cos(th)
        sc = jnp.stack([s, c], axis=-1).reshape(batch + (-1,))
        xna = (jnp.stack([x[..., p] for p in nai], axis=-1)
               if nna else x[..., :0])
        y = jnp.concatenate([xna, sc], axis=-1)                # (..., ny)

        eye = np.eye(nx)
        rows = [jnp.broadcast_to(jnp.asarray(eye[p], dtype), batch + (nx,))
                for p in nai]
        for k, a in enumerate(ai):
            e_a = jnp.asarray(eye[a], dtype)
            rows.append(c[..., k, None] * e_a)
            rows.append(-s[..., k, None] * e_a)
        J = jnp.stack(rows, axis=-2)                           # (..., ny, nx)
    else:
        y = x
        J = None

    d = y - x_goal
    l = jnp.sum(d * jnp.matmul(d, Q.T), axis=-1)
    l_y = jnp.matmul(d, M.T)

    if J is None:
        l_z = l_y
        l_zz = jnp.broadcast_to(M.astype(dtype), batch + M.shape)
    else:
        l_z = jnp.einsum("...yi,...y->...i", J, l_y)
        MJ = jnp.einsum("yw,...wi->...yi", M.astype(dtype), J)
        l_zz = jnp.einsum("...yi,...yj->...ij", J, MJ)
        # Augmentation curvature: d2(sin)/dth2 = -sin, d2(cos)/dth2 = -cos.
        curv_rows = []
        for k, a in enumerate(ai):
            w = (-s[..., k] * l_y[..., nna + 2 * k]
                 - c[..., k] * l_y[..., nna + 2 * k + 1])
            curv_rows.append(w[..., None] * jnp.asarray(np.eye(nx)[a], dtype))
        curv = sum(curv_rows)
        l_zz = l_zz + curv[..., :, None] * jnp.eye(nx, dtype=dtype)

    if terminal:
        return l, l_z, None, l_zz, None, None

    MR = (R + R.T).astype(dtype)
    du = u - u_goal
    l = l + jnp.sum(du * jnp.matmul(du, R.T), axis=-1)
    l_u = jnp.matmul(du, MR.T)
    l_uu = jnp.broadcast_to(MR, u.shape[:-1] + MR.shape)
    l_uz = jnp.zeros(u.shape[:-1] + (u.shape[-1], nx), dtype)
    return l, l_z, l_u, l_zz, l_uz, l_uu


def _quad_form(d, M):
    """(..., n) x (n, n) -> (...): d^T M d batched over leading dims."""
    return jnp.sum(jnp.matmul(d, M) * d, axis=-1)


@pytree_dataclass
class QRCost(Cost):
    """Quadratic cost on the state distribution (reference :24-99)."""

    Q: jnp.ndarray
    R: jnp.ndarray
    Q_term: jnp.ndarray = None
    x_goal: jnp.ndarray = 0.0
    u_goal: jnp.ndarray = 0.0

    def __post_init__(self):
        if self.Q_term is None:
            object.__setattr__(self, "Q_term", self.Q)
        object.__setattr__(self, "x_goal", jnp.asarray(self.x_goal))
        object.__setattr__(self, "u_goal", jnp.asarray(self.u_goal))

    def __call__(self, z, u, i, terminal=False,
                 encoding: StateEncoding = StateEncoding.DEFAULT, **kwargs):
        Q = self.Q_term if terminal else self.Q
        mean = decode_mean(z, encoding)
        dx = mean - self.x_goal
        cost = _quad_form(dx, Q)

        if not terminal:
            du = u - self.u_goal
            cost = cost + _quad_form(du, self.R)

        if encoding != StateEncoding.IGNORE_UNCERTAINTY:
            # tr(Sigma Q) computed batched as sum(Sigma * Q^T)
            # (reference :92-97). One axis per reduction: multi-axis
            # reductions abort Mosaic's vector-layout inference when this
            # traces inside the fused rollout kernel (probe_micro3), and
            # XLA emits the same program either way outside it.
            C = decode_covar(z, encoding)
            cost = cost + jnp.sum(jnp.sum(C * Q.T, axis=-1), axis=-1)

        return cost

    #: static augmentation applied by __call__ in subclasses that wrap the
    #: state through utils.angular.augment_state (the example costs); plain
    #: QRCost applies none.
    aug_angular_indices = ()
    aug_non_angular_indices = ()
    #: subclasses whose __call__ is exactly augment(aug_*) -> QRCost must
    #: set this True to enable the analytic fast path below.
    call_is_augmented_qr = False

    def eval_derivatives(self, z, u, i, terminal=False,
                         encoding: StateEncoding = StateEncoding.DEFAULT,
                         approximate=False, **kwargs):
        """Analytic Taylor coefficients (utils.evaluation.eval_cost fast
        path). Returns None — meaning 'use autodiff' — for uncertainty
        encodings (the tr(Sigma Q) term differentiates through the
        moment-matched augmentation), Gauss-Newton mode, or subclasses
        that customize __call__ beyond augmentation."""
        if (encoding != StateEncoding.IGNORE_UNCERTAINTY or approximate
                or kwargs):
            return None
        if (type(self).__call__ is not QRCost.__call__
                and not type(self).call_is_augmented_qr):
            return None
        Q = self.Q_term if terminal else self.Q
        return augmented_qr_derivatives(
            Q, self.R, self.x_goal, self.u_goal, z, u, terminal,
            angular_indices=self.aug_angular_indices,
            non_angular_indices=self.aug_non_angular_indices)


@pytree_dataclass
class SaturatingQRCost(Cost):
    """Saturating quadratic cost (reference :102-183).

    Under a Gaussian state, the expected saturating cost has the closed form
        E[L] = 1 - exp(-0.5 d^T S1 d) / sqrt(det(I + Sigma Q)),
    with S1 = Q (I + Sigma Q)^{-1} (reference :155-176).
    """

    Q: jnp.ndarray
    R: jnp.ndarray
    Q_term: jnp.ndarray = None
    x_goal: jnp.ndarray = 0.0
    u_goal: jnp.ndarray = 0.0

    def __post_init__(self):
        if self.Q_term is None:
            object.__setattr__(self, "Q_term", self.Q)
        object.__setattr__(self, "x_goal", jnp.asarray(self.x_goal))
        object.__setattr__(self, "u_goal", jnp.asarray(self.u_goal))

    def __call__(self, z, u, i, terminal=False,
                 encoding: StateEncoding = StateEncoding.DEFAULT, **kwargs):
        Q = self.Q_term if terminal else self.Q
        mean = decode_mean(z, encoding)
        dx = mean - self.x_goal

        if encoding != StateEncoding.IGNORE_UNCERTAINTY:
            C = decode_covar(z, encoding)
            CQ = jnp.matmul(C, Q)
            n = dx.shape[-1]
            IpCQ = jnp.eye(n, dtype=z.dtype) + CQ
            # S1 = Q (I + CQ)^{-1}: solve (I + CQ)^T X^T = Q^T.
            S1 = jnp.swapaxes(
                jnp.linalg.solve(jnp.swapaxes(IpCQ, -1, -2),
                                 jnp.broadcast_to(Q.T, IpCQ.shape)),
                -1, -2)
            det = jnp.sqrt(jnp.linalg.det(IpCQ))
            S1dx = jnp.squeeze(jnp.matmul(S1, dx[..., :, None]), -1)
            cost = 1.0 - jnp.exp(-0.5 * jnp.sum(dx * S1dx, axis=-1)) / det
        else:
            cost = 1.0 - jnp.exp(-0.5 * _quad_form(dx, Q))

        if not terminal:
            du = u - self.u_goal
            cost = cost + _quad_form(du, self.R)

        return cost
