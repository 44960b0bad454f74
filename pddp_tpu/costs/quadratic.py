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

from ..encoding import StateEncoding, decode_covar, decode_mean
from ..struct import pytree_dataclass
from ..utils.linalg import mm
from .base import Cost

__all__ = ["QRCost", "SaturatingQRCost"]


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
            # (reference :92-97).
            C = decode_covar(z, encoding)
            cost = cost + jnp.sum(C * Q.T, axis=(-2, -1))

        return cost


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
