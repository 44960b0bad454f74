"""Cost and dynamics derivative evaluation: the local quadratic model.

Re-implements /root/reference/pddp/utils/evaluation.py with native JAX
transforms. The reference emulates vectorized Jacobians/Hessians on
torch 0.4 by replicating inputs and back-propagating identity matrices
(:203-225, :269-280); here the same quantities come from ``jax.jacfwd`` /
``jax.hessian`` and batching over the horizon is a ``vmap`` — structurally
simpler and fused by XLA into batched matmuls on the MXU.

Naming parity: ``l_z, l_u, l_zz, l_uz, l_uu`` (cost Taylor coefficients)
and ``F_z, F_u`` (dynamics Jacobians), all w.r.t. the *encoded* state, so
derivatives flow through the distribution's mean and covariance together.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoding import StateEncoding

__all__ = [
    "eval_cost",
    "eval_dynamics",
    "batch_eval_cost",
    "batch_eval_dynamics",
    "quadratize_cost",
    "linearize_dynamics",
]


def eval_cost(cost, z, u, i, terminal=False,
              encoding: StateEncoding = StateEncoding.DEFAULT,
              approximate=False, **kwargs):
    """Cost value and first/second derivatives at (z, u).

    Args:
        cost (Cost): cost function.
        z (Array<encoded_state_size>): encoded state.
        u (Array<action_size> or None): action (None if terminal).
        i: time index.
        terminal: whether this is the terminal cost.
        encoding: StateEncoding enum (static).
        approximate: Gauss-Newton outer-product Hessians instead of exact
            (reference evaluation.py:77-81).

    Returns:
        Tuple (l, l_z, l_u, l_zz, l_uz, l_uu); the u-entries are None when
        terminal.
    """
    # Costs with closed-form local models (QR families) skip autodiff —
    # eval_derivatives returns None where only autodiff is exact.
    deriv_fn = getattr(cost, "eval_derivatives", None)
    if deriv_fn is not None:
        out = deriv_fn(z, u, i, terminal=terminal, encoding=encoding,
                       approximate=approximate, **kwargs)
        if out is not None:
            return out

    nz = z.shape[-1]

    if terminal:
        def fn(zz):
            return cost(zz, None, i, terminal=True, encoding=encoding,
                        **kwargs)

        l, l_z = jax.value_and_grad(fn)(z)
        if approximate:
            l_zz = jnp.outer(l_z, l_z)
        else:
            l_zz = jax.hessian(fn)(z)
        return l, l_z, None, l_zz, None, None

    zu = jnp.concatenate([z, u], axis=-1)

    def fn(zu_):
        return cost(zu_[:nz], zu_[nz:], i, terminal=False, encoding=encoding,
                    **kwargs)

    l, g = jax.value_and_grad(fn)(zu)
    l_z, l_u = g[:nz], g[nz:]

    if approximate:
        l_zz = jnp.outer(l_z, l_z)
        l_uz = jnp.outer(l_u, l_z)
        l_uu = jnp.outer(l_u, l_u)
    else:
        H = jax.hessian(fn)(zu)
        l_zz = H[:nz, :nz]
        l_uz = H[nz:, :nz]
        l_uu = H[nz:, nz:]

    return l, l_z, l_u, l_zz, l_uz, l_uu


def eval_dynamics(model, z, u, i, encoding: StateEncoding = StateEncoding.DEFAULT,
                  aux=None, **kwargs):
    """Next state and Jacobians F_z, F_u at (z, u).

    ``aux`` is the per-step noise constant recorded during the rollout
    (see DynamicsModel.step); omitted for deterministic models.
    """
    if aux is None:
        aux = model.aux_zero()
    # Models exposing a structured Jacobian (e.g. the particle BNN, which
    # factors the tangent sweep through its low-dimensional net-input
    # bottleneck — models/bnn/model.py:jacobians) shortcut the generic
    # autodiff; None means "unsupported here, use the generic path".
    jac_fn = getattr(model, "jacobians", None)
    if jac_fn is not None:
        res = jac_fn(z, u, i, aux, encoding=encoding, **kwargs)
        if res is not None:
            return res
    nz = z.shape[-1]
    zu = jnp.concatenate([z, u], axis=-1)

    def fn(zu_):
        return model.apply(zu_[:nz], zu_[nz:], i, aux, encoding, **kwargs)

    # linearize instead of jacfwd: the primal evaluates ONCE, then the
    # tangent map sweeps the nz+nu basis vectors — jacfwd's vmapped jvp
    # re-evaluates the (expensive for the particle BNN) primal per
    # tangent. Bit-identical Jacobians, ~10% faster at the PDDP BNN shape
    # (scripts/bench_jacfwd_vs_linearize.py).
    z_next, f_jvp = jax.linearize(fn, zu)
    basis = jnp.eye(zu.shape[0], dtype=zu.dtype)
    # Under shard_map, tangents must carry the primal's varying-manual-axes
    # type (e.g. z varies over the batch axis of a dp x pp mesh while the
    # fresh identity basis starts unvarying).
    vma = getattr(jax.typeof(zu), "vma", None)
    if vma:
        basis = jax.lax.pcast(basis, tuple(vma), to="varying")
    J = jax.vmap(f_jvp)(basis).T
    return z_next, J[:, :nz], J[:, nz:]


# The reference's "batch" variants exist only to emulate vectorized autodiff
# on torch 0.4 (evaluation.py:134-288); with jacfwd/hessian the exact and
# batched paths coincide.
batch_eval_cost = eval_cost
batch_eval_dynamics = eval_dynamics


def quadratize_cost(cost, Z_run, U, encoding: StateEncoding,
                    approximate=False, **kwargs):
    """Running-cost Taylor coefficients along a whole trajectory, vmapped.

    Args:
        Z_run (Array<N, nz>): encoded states z_0..z_{N-1}.
        U (Array<N, nu>): actions.

    Returns:
        Tuple (L, L_z, L_u, L_zz, L_uz, L_uu) stacked over time.
    """
    N = U.shape[0]
    idx = jnp.arange(N)

    def one(z, u, i):
        return eval_cost(cost, z, u, i, terminal=False, encoding=encoding,
                         approximate=approximate, **kwargs)

    return jax.vmap(one)(Z_run, U, idx)


def linearize_dynamics(model, Z_run, U, AUX, encoding: StateEncoding,
                       **kwargs):
    """Dynamics Jacobians along a whole trajectory, vmapped over time.

    Args:
        Z_run (Array<N, nz>): encoded states z_0..z_{N-1}.
        U (Array<N, nu>): actions.
        AUX: per-step aux pytree stacked over time (from the rollout scan).

    Returns:
        Tuple (Z_next, F_z, F_u) stacked over time.
    """
    N = U.shape[0]
    idx = jnp.arange(N)

    def one(z, u, i, aux):
        return eval_dynamics(model, z, u, i, encoding=encoding, aux=aux,
                             **kwargs)

    return jax.vmap(one)(Z_run, U, idx, AUX)
