"""Double cartpole dynamics model.

Parity: /root/reference/pddp/examples/double_cartpole/model.py:100-194 —
builds the 3x3 mass matrix A and solves A q'' = b each step (reference
uses torch.gesv at :177), symplectic Euler integration. The linear solve
batches over arbitrary leading dims via jnp.linalg.solve.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...encoding import StateEncoding, decode_mean, decode_var, encode
from ...models.base import DynamicsModel
from ...struct import pytree_dataclass

__all__ = ["DoubleCartpoleDynamicsModel"]


@pytree_dataclass
class DoubleCartpoleDynamicsModel(DynamicsModel):
    """Double cartpole: state [x, x', th1, th1', th2, th2'], action [F]."""

    dt: jnp.ndarray = 0.1
    mc: jnp.ndarray = 0.5
    mp1: jnp.ndarray = 0.5
    mp2: jnp.ndarray = 0.5
    l1: jnp.ndarray = 0.6
    l2: jnp.ndarray = 0.6
    mu: jnp.ndarray = 0.1
    g: jnp.ndarray = 9.80665

    state_size = 6
    action_size = 1
    angular_indices = (2, 4)
    non_angular_indices = (0, 1, 3, 5)

    def apply(self, z, u, i, aux, encoding: StateEncoding = StateEncoding.DEFAULT,
              **kwargs):
        dt = self.dt
        mc, mp1, mp2 = self.mc, self.mp1, self.mp2
        l1, l2, mu, g = self.l1, self.l2, self.mu, self.g

        mean = decode_mean(z, encoding)
        var = decode_var(z, encoding)

        x = mean[..., 0]
        x_dot = mean[..., 1]
        theta1 = mean[..., 2]
        theta1_dot = mean[..., 3]
        theta2 = mean[..., 4]
        theta2_dot = mean[..., 5]
        F = u[..., 0]

        sin_theta1 = jnp.sin(theta1)
        cos_theta1 = jnp.cos(theta1)
        sin_theta2 = jnp.sin(theta2)
        cos_theta2 = jnp.cos(theta2)
        sin_dtheta = jnp.sin(theta1 - theta2)
        cos_dtheta = jnp.cos(theta1 - theta2)

        a0 = mp2 + 2.0 * mc
        a1 = mc * l2
        a2 = l1 * theta1_dot**2
        a3 = a1 * theta2_dot**2

        ones = jnp.ones_like(x)

        # Mass matrix rows (..., 3): matches the reference's stacked
        # construction at model.py:134-152 (A is assembled column-major then
        # transposed; net effect is the row layout below).
        A = jnp.stack([
            jnp.stack([2.0 * (mp1 + mp2 + mc) * ones,
                       -a0 * l1 * cos_theta1,
                       -a1 * cos_theta2], axis=-1),
            jnp.stack([-3.0 * a0 * cos_theta1,
                       (2.0 * a0 + 2.0 * mc) * l1 * ones,
                       3.0 * a1 * cos_dtheta], axis=-1),
            jnp.stack([-3.0 * cos_theta2,
                       3.0 * l1 * cos_dtheta,
                       2.0 * l2 * ones], axis=-1),
        ], axis=-2)

        b = jnp.stack([
            2.0 * F - 2.0 * mu * x_dot - a0 * a2 * sin_theta1
            - a3 * sin_theta2,
            3.0 * a0 * g * sin_theta1 - 3.0 * a3 * sin_dtheta,
            3.0 * a2 * sin_dtheta + 3.0 * g * sin_theta2,
        ], axis=-1)

        # 3x3 system inside the rollout scan: unrolled adjugate solve
        # (batched LU is column-loop-bound on TPU at this size).
        from ...utils.linalg import small_solve
        sol = small_solve(A, b)

        new_x_dot = x_dot + sol[..., 0] * dt
        new_theta1_dot = theta1_dot + sol[..., 1] * dt
        new_theta2_dot = theta2_dot + sol[..., 2] * dt

        mean_next = jnp.stack(
            [
                x + new_x_dot * dt,
                new_x_dot,
                theta1 + new_theta1_dot * dt,
                new_theta1_dot,
                theta2 + new_theta2_dot * dt,
                new_theta2_dot,
            ],
            axis=-1)
        return encode(mean_next, V=var, encoding=encoding)
