"""Multi-vehicle rendezvous dynamics model.

Parity: /root/reference/pddp/examples/rendezvous/model.py:79-119 — linear
damped point-mass dynamics for two vehicles, Euler integration. Note the
full covariance (not just the variance) is passed through the encode step,
matching the reference's use of decode_covar/encode(C=...).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...encoding import StateEncoding, decode_covar, decode_mean, encode
from ...models.base import DynamicsModel
from ...struct import pytree_dataclass

__all__ = ["RendezvousDynamicsModel"]


@pytree_dataclass
class RendezvousDynamicsModel(DynamicsModel):
    """Rendezvous: state [x0, y0, x1, y1, x0', y0', x1', y1'],
    action [Fx0, Fy0, Fx1, Fy1]."""

    dt: jnp.ndarray = 0.1
    m: jnp.ndarray = 1.0
    alpha: jnp.ndarray = 0.1

    state_size = 8
    action_size = 4
    angular_indices = ()
    non_angular_indices = (0, 1, 2, 3, 4, 5, 6, 7)

    def _acceleration(self, x_dot, u):
        # Reproduces the reference formula verbatim (model.py:117-119).
        x_dot_dot = x_dot * (1.0 - self.alpha * self.dt / self.m)
        x_dot_dot = x_dot_dot + u * self.dt / self.m
        return x_dot_dot

    def apply(self, z, u, i, aux, encoding: StateEncoding = StateEncoding.DEFAULT,
              **kwargs):
        dt = self.dt
        x = decode_mean(z, encoding)
        covar = decode_covar(z, encoding)

        mean_next = jnp.stack(
            [
                x[..., 0] + x[..., 4] * dt,
                x[..., 1] + x[..., 5] * dt,
                x[..., 2] + x[..., 6] * dt,
                x[..., 3] + x[..., 7] * dt,
                x[..., 4] + self._acceleration(x[..., 4], u[..., 0]) * dt,
                x[..., 5] + self._acceleration(x[..., 5], u[..., 1]) * dt,
                x[..., 6] + self._acceleration(x[..., 6], u[..., 2]) * dt,
                x[..., 7] + self._acceleration(x[..., 7], u[..., 3]) * dt,
            ],
            axis=-1)

        return encode(mean_next, C=covar, encoding=encoding)
