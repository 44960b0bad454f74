"""Pendulum dynamics model.

Parity: /root/reference/pddp/examples/pendulum/model.py:84-119 (Euler
integration, damped pendulum; theta = 0 pointing up, increasing
counter-clockwise). Physical constants are pytree leaves, so the model
itself is differentiable/learnable like the reference's grad-enabled
Parameters.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...encoding import StateEncoding, decode_mean, decode_var, encode
from ...models.base import DynamicsModel
from ...struct import pytree_dataclass

__all__ = ["PendulumDynamicsModel"]


@pytree_dataclass
class PendulumDynamicsModel(DynamicsModel):
    """Pendulum: state [theta, theta'], action [torque]."""

    dt: jnp.ndarray = 0.1
    m: jnp.ndarray = 1.0
    l: jnp.ndarray = 1.0
    mu: jnp.ndarray = 0.1
    g: jnp.ndarray = 9.80665

    state_size = 2
    action_size = 1
    angular_indices = (0,)
    non_angular_indices = (1,)

    def apply(self, z, u, i, aux, encoding: StateEncoding = StateEncoding.DEFAULT,
              **kwargs):
        mean = decode_mean(z, encoding)
        var = decode_var(z, encoding)

        theta = mean[..., 0]
        theta_dot = mean[..., 1]
        torque = u[..., 0]

        temp = self.m * self.l
        theta_dot_dot = (torque - self.mu * theta_dot
                         - 0.5 * temp * self.g * jnp.sin(theta))
        theta_dot_dot = 3.0 * theta_dot_dot / (temp * self.l)

        mean_next = jnp.stack(
            [
                theta + theta_dot * self.dt,
                theta_dot + theta_dot_dot * self.dt,
            ],
            axis=-1)
        if encoding == StateEncoding.IGNORE_UNCERTAINTY:
            return mean_next
        return encode(mean_next, V=var, encoding=encoding)
