"""Multivariate Gaussian random variable as an immutable pytree.

Re-implements the contract of
/root/reference/pddp/utils/gaussian_variable.py:22-275 — the env <->
controller state type — as a frozen dataclass pytree. The reference's lazy
mutable caching (:68-106) becomes on-demand pure computation: the variable
stores exactly one uncertainty representation and derives the others, which
is cheap at these sizes and keeps the pytree structure deterministic.
Device moves / detach / dtype plumbing (:178-256) are unnecessary — JAX
arrays are immutable and device placement is handled by jit/sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .encoding import (StateEncoding, decode_covar, decode_mean, decode_std,
                       decode_var, encode)
from .struct import pytree_dataclass, replace

__all__ = ["GaussianVariable"]


@pytree_dataclass
class GaussianVariable:
    """Multivariate Gaussian random variable.

    At least one of `covar`, `var`, `std` must be provided; the rest are
    derived on demand.
    """

    _mean: jax.Array
    _covar: Optional[jax.Array] = None
    _var: Optional[jax.Array] = None
    _std: Optional[jax.Array] = None

    def __repr__(self):
        return "GaussianVariable({})".format(tuple(self.shape))

    @property
    def shape(self):
        return self._mean.shape

    @property
    def dtype(self):
        return self._mean.dtype

    def mean(self):
        """Mean vector (Array<n>)."""
        return self._mean

    def covar(self):
        """Full covariance matrix (Array<n, n>)."""
        if self._covar is not None:
            return self._covar
        v = self.var()
        return v[..., :, None] * jnp.eye(v.shape[-1], dtype=v.dtype)

    def var(self):
        """Variance vector (Array<n>)."""
        if self._var is not None:
            return self._var
        if self._covar is not None:
            return jnp.diagonal(self._covar, axis1=-2, axis2=-1)
        if self._std is not None:
            return jnp.square(self._std)
        raise NotImplementedError("Cannot compute variance")

    def std(self):
        """Standard deviation vector (Array<n>)."""
        if self._std is not None:
            return self._std
        return jnp.sqrt(self.var())

    def sample(self, key, sample_shape=()):
        """Draws a sample (explicit PRNG key replaces torch's global RNG).

        Args:
            key: PRNG key.
            sample_shape: leading sample shape.

        Returns:
            Array<*sample_shape, n>.
        """
        n = self.shape[-1]
        eps = jax.random.normal(key, tuple(sample_shape) + self.shape,
                                dtype=self.dtype)
        if self._covar is not None:
            # Sample through the covariance square root.
            from .utils.linalg import safe_cholesky
            U = safe_cholesky(self._covar)
            return self._mean + jnp.matmul(eps, U)
        return self._mean + eps * self.std()

    def encode(self, encoding: StateEncoding = StateEncoding.DEFAULT):
        """Encodes itself into a flat state vector (reference :125-147)."""
        if encoding in (StateEncoding.FULL_COVARIANCE_MATRIX,
                        StateEncoding.UPPER_TRIANGULAR_CHOLESKY):
            return encode(self.mean(), C=self.covar(), encoding=encoding)
        if encoding == StateEncoding.VARIANCE_ONLY:
            return encode(self.mean(), V=self.var(), encoding=encoding)
        if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
            return encode(self.mean(), S=self.std(), encoding=encoding)
        if encoding == StateEncoding.IGNORE_UNCERTAINTY:
            return encode(self.mean(), V=self.var(), encoding=encoding)
        raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))

    @classmethod
    def decode(cls, z, encoding: StateEncoding = StateEncoding.DEFAULT,
               state_size=None):
        """Builds a GaussianVariable from an encoded state (ref :149-176)."""
        mean = decode_mean(z, encoding, state_size)
        if encoding in (StateEncoding.FULL_COVARIANCE_MATRIX,
                        StateEncoding.UPPER_TRIANGULAR_CHOLESKY):
            return cls(mean, _covar=decode_covar(z, encoding, state_size))
        if encoding == StateEncoding.VARIANCE_ONLY:
            return cls(mean, _var=decode_var(z, encoding, state_size))
        if encoding == StateEncoding.STANDARD_DEVIATION_ONLY:
            return cls(mean, _std=decode_std(z, encoding, state_size))
        if encoding == StateEncoding.IGNORE_UNCERTAINTY:
            return cls(mean, _var=decode_var(z, encoding, state_size))
        raise NotImplementedError("Unknown StateEncoding: {}".format(encoding))

    def clone(self):
        """Pytree copy (arrays are immutable; provided for API parity)."""
        return replace(self)

    detach = clone

    @classmethod
    def random(cls, key, n, reg=1e-1, dtype=jnp.float32):
        """Random valid GaussianVariable of size n (reference :258-275)."""
        k1, k2 = jax.random.split(key)
        mean = jax.random.normal(k1, (n,), dtype=dtype)
        L = jax.random.normal(k2, (n, n), dtype=dtype)
        covar = L.T @ L + reg * jnp.eye(n, dtype=dtype)
        return cls(mean, _covar=covar)
