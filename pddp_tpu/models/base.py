"""Dynamics model contract.

Re-imagines /root/reference/pddp/models/base.py:23-83 for JAX. A model is a
frozen pytree (parameters are leaves, sizes are static class attributes)
exposing a *two-level* interface that makes stochastic rollouts jit-safe:

 * ``step(z, u, i, state, encoding)``: one rollout step. Returns
   ``(z_next, state_next, aux)`` where ``state`` is the model's rolling
   carry (e.g. previous particle outputs for noise inference) and ``aux``
   captures the per-step noise constants actually used. Deterministic
   models carry nothing.
 * ``apply(z, u, i, aux, encoding)``: the pure, smooth function of (z, u)
   with ``aux`` held fixed; ``step`` must satisfy
   ``step(...)[0] == apply(z, u, i, aux, encoding)``. Jacobians F_z, F_u
   are taken through ``apply`` via jacfwd — the TPU-native replacement for
   the reference's replicate-input autograd trick
   (/root/reference/pddp/utils/evaluation.py:269-280) and its cached-eps
   dictionaries (/root/reference/pddp/models/bnn/modules.py:320-358).

This mirrors the reference semantics exactly: noise is fixed (and detached)
within an episode, so per-step derivatives treat it as a constant.
"""

from __future__ import annotations

from ..encoding import StateEncoding

__all__ = ["DynamicsModel"]


class DynamicsModel:
    """Base dynamics model (mixin for pytree dataclasses).

    Class attributes (static):
        state_size (int): state dimension.
        action_size (int): action dimension.
        angular_indices (tuple<int>): indices of angular state components.
        non_angular_indices (tuple<int>): complementary indices.
    """

    state_size: int = None
    action_size: int = None
    angular_indices: tuple = ()
    non_angular_indices: tuple = ()

    # -- rollout interface ---------------------------------------------------

    def init_state(self, batch_shape=()):
        """Initial rolling carry for a fresh rollout."""
        return ()

    def step(self, z, u, i, state, encoding: StateEncoding = StateEncoding.DEFAULT):
        """One rollout step: (z_next, state_next, aux)."""
        z_next = self.apply(z, u, i, (), encoding)
        return z_next, state, ()

    def aux_zero(self):
        """A zero/placeholder aux with the right pytree structure."""
        return ()

    def apply(self, z, u, i, aux, encoding: StateEncoding = StateEncoding.DEFAULT):
        """Pure smooth dynamics: encoded state + action -> next encoded state."""
        raise NotImplementedError

    def __call__(self, z, u, i, encoding: StateEncoding = StateEncoding.DEFAULT,
                 **kwargs):
        """Convenience single-step call (stateless, aux regenerated)."""
        z_next, _, _ = self.step(z, u, i, self.init_state(), encoding)
        return z_next

    # -- learning interface --------------------------------------------------

    def fit(self, X, U, dX, **kwargs):
        """Fits the model to state transitions; returns the updated model.

        Analytic models are exact: fitting is the identity
        (cf. reference examples, e.g. pendulum/model.py:72-84).
        """
        return self

    def resample(self, key):
        """Returns a model with fresh episode noise (stochastic models)."""
        return self

    def reset_parameters(self, key):
        """Returns a freshly-initialized copy (reference models/base.py:
        27-40) — the functional counterpart of torch's in-place re-init.
        Analytic models carry fixed physical parameters: identity."""
        return self
