"""Particle utilities: distribution -> particles -> distribution bridge.

Re-implements /root/reference/pddp/utils/particles.py: ``particulate_model``
(:22-133) wraps any deterministic dynamics model into a particle-based
model with moment matching, and ``particles_covar`` (:136-149) computes
sample covariances. The cached-noise dictionaries become pre-sampled arrays
plus a rolling state, identical in structure to the BNN dynamics model
(see pddp_tpu.models.bnn.model for the full rationale).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..encoding import StateEncoding, decode_covar_sqrt, decode_mean, encode
from ..struct import pytree_dataclass, replace, static_field
from .linalg import tria_solve_right

__all__ = ["ParticleDynamicsModel", "particulate_model", "particles_covar"]


def particles_covar(x):
    """Covariance of a particle set over axis 0 (reference :136-149)."""
    deltas = x - x.mean(axis=0)
    return jnp.einsum("p...i,p...j->...ij", deltas,
                      deltas) / (x.shape[0] - 1)


def _standardize(eps):
    """Standardize noise over the particle axis (reference particles.py:86).

    ddof=1: torch.Tensor.std defaults to the unbiased estimator, so the
    reference's standardized noise has unit SAMPLE std — matched exactly
    for the seeded head-to-head parity tests."""
    return (eps - eps.mean(axis=0)) / eps.std(axis=0, ddof=1)


@pytree_dataclass
class _ParticleState:
    prev_output: jnp.ndarray  # (..., P, state_size)


@pytree_dataclass(meta=("n_particles", "horizon", "infer_noise_variables"))
class ParticleDynamicsModel:
    """Wraps a deterministic model into a particle distribution model.

    At each step: decode z -> (mean, U), draw/infer standardized noise,
    push X = mean + eps @ U through the inner model with
    IGNORE_UNCERTAINTY, moment-match the outputs back (reference :51-132).
    """

    inner: Any
    eps: jnp.ndarray  # (H, P, state_size) standardized episode noise
    n_particles: int = static_field(default=100)
    horizon: int = static_field(default=100)
    infer_noise_variables: bool = static_field(default=True)

    @property
    def state_size(self):
        return self.inner.state_size

    @property
    def action_size(self):
        return self.inner.action_size

    @property
    def angular_indices(self):
        return self.inner.angular_indices

    @property
    def non_angular_indices(self):
        return self.inner.non_angular_indices

    @classmethod
    def create(cls, inner, key, n_particles=100, horizon=100,
               infer_noise_variables=True, dtype=jnp.float32):
        eps = jax.vmap(_standardize)(jax.random.normal(
            key, (horizon, n_particles, inner.state_size), dtype))
        return cls(inner=inner, eps=eps, n_particles=n_particles,
                   horizon=horizon,
                   infer_noise_variables=infer_noise_variables)

    def resample(self, key):
        eps = jax.vmap(_standardize)(jax.random.normal(
            key, self.eps.shape, self.eps.dtype))
        inner = self.inner
        if hasattr(inner, "resample"):
            key, sub = jax.random.split(key)
            inner = inner.resample(sub)
        return replace(self, inner=inner, eps=eps)

    def init_state(self, batch_shape=()):
        shape = tuple(batch_shape) + (self.n_particles, self.state_size)
        return _ParticleState(prev_output=jnp.zeros(shape))

    def aux_zero(self):
        return jnp.zeros((self.n_particles, self.state_size))

    def _effective_eps(self, z, i, state, encoding):
        mean = decode_mean(z, encoding, self.state_size)
        U_chol = decode_covar_sqrt(z, encoding, self.state_size)
        eps0 = self.eps[i].astype(z.dtype)
        if not self.infer_noise_variables:
            return eps0, mean, U_chol
        deltas = state.prev_output - mean
        # eps @ U = deltas, solved in the (P, n) layout with the
        # Mosaic-friendly fallback blend (see BNNDynamicsModel's variant).
        eps_inf = jax.lax.stop_gradient(tria_solve_right(U_chol, deltas))
        finite = jnp.isfinite(eps_inf)
        eps_safe = jnp.where(finite, eps_inf, jnp.zeros_like(eps_inf))
        bad = ~jnp.all(finite)
        use0 = jnp.logical_or(jnp.asarray(i == 0), bad)
        w = use0.astype(z.dtype)
        return eps0 * w + eps_safe * (1.0 - w), mean, U_chol

    def _push(self, X, u, i, encoding):
        P = self.n_particles
        u_b = jnp.broadcast_to(u, (P,) + u.shape)
        return self.inner.apply(X, u_b, i, (),
                                StateEncoding.IGNORE_UNCERTAINTY)

    def _moment_match(self, output, encoding):
        M = output.mean(axis=0)
        if encoding in (StateEncoding.FULL_COVARIANCE_MATRIX,
                        StateEncoding.UPPER_TRIANGULAR_CHOLESKY):
            C = particles_covar(output)
            return encode(M, C=C, encoding=encoding)
        S = output.std(axis=0)
        return encode(M, S=S, encoding=encoding)

    def step(self, z, u, i, state, encoding=StateEncoding.DEFAULT, **kwargs):
        eps, mean, U_chol = self._effective_eps(z, i, state, encoding)
        X = mean + jnp.matmul(eps, U_chol)
        output = self._push(X, u, i, encoding)
        z_next = self._moment_match(output, encoding)
        return z_next, _ParticleState(
            prev_output=jax.lax.stop_gradient(output)), eps

    def apply(self, z, u, i, aux, encoding=StateEncoding.DEFAULT, **kwargs):
        mean = decode_mean(z, encoding, self.state_size)
        U_chol = decode_covar_sqrt(z, encoding, self.state_size)
        X = mean + jnp.matmul(aux, U_chol)
        output = self._push(X, u, i, encoding)
        return self._moment_match(output, encoding)

    def __call__(self, z, u, i, encoding=StateEncoding.DEFAULT, **kwargs):
        z_next, _, _ = self.step(z, u, i, self.init_state(), encoding)
        return z_next

    def fit(self, X, U, dX, **kwargs):
        inner = self.inner.fit(X, U, dX, **kwargs)
        return replace(self, inner=inner)


def particulate_model(model, key, n_particles=100, **kwargs):
    """Converts a DynamicsModel instance into a ParticleDynamicsModel
    (reference :22-36 operates on classes; here on pytree instances)."""
    return ParticleDynamicsModel.create(model, key, n_particles=n_particles,
                                        **kwargs)
