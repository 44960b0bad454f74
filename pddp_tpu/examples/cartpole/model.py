"""Cartpole dynamics model.

Parity: /root/reference/pddp/examples/cartpole/model.py:88-140 — damped
cartpole with symplectic Euler integration; theta = 0 pointing up,
increasing clockwise.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...encoding import StateEncoding, decode_mean, decode_var, encode
from ...models.base import DynamicsModel
from ...struct import pytree_dataclass

__all__ = ["CartpoleDynamicsModel"]


@pytree_dataclass
class CartpoleDynamicsModel(DynamicsModel):
    """Cartpole: state [x, x', theta, theta'], action [F]."""

    dt: jnp.ndarray = 0.1
    mc: jnp.ndarray = 0.5
    mp: jnp.ndarray = 0.5
    l: jnp.ndarray = 0.5
    mu: jnp.ndarray = 0.1
    g: jnp.ndarray = 9.82

    state_size = 4
    action_size = 1
    angular_indices = (2,)
    non_angular_indices = (0, 1, 3)

    def apply(self, z, u, i, aux, encoding: StateEncoding = StateEncoding.DEFAULT,
              **kwargs):
        dt, mc, mp, l, mu, g = self.dt, self.mc, self.mp, self.l, self.mu, self.g

        mean = decode_mean(z, encoding)
        var = decode_var(z, encoding)

        x = mean[..., 0]
        x_dot = mean[..., 1]
        theta = mean[..., 2]
        theta_dot = mean[..., 3]
        F = u[..., 0]

        sin_theta = jnp.sin(theta)
        cos_theta = jnp.cos(theta)

        a0 = mp * l * theta_dot**2 * sin_theta
        a1 = g * sin_theta
        a2 = F - mu * x_dot
        a3 = 4.0 * (mc + mp) - 3.0 * mp * cos_theta**2

        theta_dot_dot = -3.0 * (a0 * cos_theta + 2.0 * (
            (mc + mp) * a1 + a2 * cos_theta)) / (l * a3)
        x_dot_dot = (2.0 * a0 + 3.0 * mp * a1 * cos_theta + 4.0 * a2) / a3

        new_x_dot = x_dot + x_dot_dot * dt
        new_theta_dot = theta_dot + theta_dot_dot * dt

        mean_next = jnp.stack(
            [
                x + new_x_dot * dt,
                new_x_dot,
                theta + new_theta_dot * dt,
                new_theta_dot,
            ],
            axis=-1)
        return encode(mean_next, V=var, encoding=encoding)
