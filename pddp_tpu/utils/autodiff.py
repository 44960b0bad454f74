"""Autodiff helpers (parity: /root/reference/pddp/utils/autodiff.py).

The reference hand-rolls Jacobians on torch 0.4 (row-by-row grad loops at
:42-57, the replicate-input batch trick at :59-90). In JAX these are the
built-in transforms; thin wrappers are kept so tests can cross-check the
vectorized paths against them, mirroring the reference test strategy
(tests/models/test_bnn.py:72-80).
"""

from __future__ import annotations

import jax

__all__ = ["grad", "jacobian", "batch_jacobian"]


def grad(fn, argnums=0):
    """Gradient transform; disconnected inputs yield zeros like ref :20-39."""
    return jax.grad(fn, argnums=argnums)


def jacobian(fn, argnums=0):
    """Reverse-mode Jacobian (reference's row-by-row loop, :42-57)."""
    return jax.jacrev(fn, argnums=argnums)


def batch_jacobian(fn, argnums=0):
    """Forward-mode Jacobian (reference's batched identity trick, :59-90)."""
    return jax.jacfwd(fn, argnums=argnums)
