"""Fused Pallas line-search rollout kernel.

The iLQR line search (controllers/ilqr.py:control_law; reference
pddp/controllers/ilqr.py:677-723) is the last sequential O(N) loop in the
solve iteration after the parallel Riccati backward. As a ``lax.scan`` it
pays per-step dispatch overhead on shapes far below TPU tile sizes
(state (A, nz) ~ (10, 4)); at H=200 the scan dominates the iteration
(~1.9 ms of ~2 ms).

This module runs the *entire* rollout — feedback control law, action
clamping, per-step cost accumulation, dynamics step — inside ONE Pallas
kernel as a ``fori_loop`` over the horizon, with all state resident in
VMEM. The model's and cost's jnp code is traced directly into the kernel
body (they are pure functions of tiny arrays), so the kernel is generic
over any stateless model/cost pair; models that carry rollout state or
per-step noise aux (e.g. the particle BNN) fall back to the scan path.

Same math as control_law(cost=...): numerics verified element-wise against
the scan implementation in tests/ops/test_fused_rollout.py.

Scope note: this is a *single-solve latency* optimization. Under vmap
(P5 batched solves) pallas_call lowers to a serialized program grid —
measured ~15x SLOWER than the scan path at B=1024 — so batched solves
should keep fused_rollout=False; the scan path is already wide there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encoding import StateEncoding
from ..utils.constraint import clamp

__all__ = ["fused_control_law", "supports_fused_rollout"]


def supports_fused_rollout(model):
    """The kernel handles stateless models only (no rolling carry, no
    per-step noise aux): their step() is fully determined by (z, u, i)."""
    try:
        return model.init_state() == () and model.aux_zero() == ()
    except Exception:
        return False


def _pack(tree):
    """Flattens a pytree into >=2D arrays Pallas can take as VMEM inputs
    (kernels may not capture array constants), plus restore metadata."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs, shapes = [], []
    for leaf in leaves:
        a = jnp.asarray(leaf)
        shapes.append(a.shape)
        arrs.append(a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    return arrs, shapes, treedef


def _unpack(refs, shapes, treedef):
    leaves = [r[...].reshape(s) for r, s in zip(refs, shapes)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fused_control_law(model, Z, U, k, K, alphas,
                      encoding: StateEncoding = StateEncoding.DEFAULT,
                      cost=None, cost_opts=None, u_min=None, u_max=None,
                      interpret=None):
    """Pallas-fused batched-alpha closed-loop rollout with cost.

    Args mirror controllers.ilqr.control_law(with_aux=False); requires
    ``supports_fused_rollout(model)``.

    Returns:
        (Z_new (N+1, A, nz), U_new (N, A, nu), J (A,)) — J only when
        ``cost`` is given, else (Z_new, U_new).
    """
    if interpret is None:
        # Mosaic compiles on TPU only; elsewhere (CPU tests) interpret.
        interpret = jax.default_backend() != "tpu"
    cost_opts = cost_opts or {}
    N, nu = U.shape
    nz = Z.shape[-1]
    A = alphas.shape[0]
    dtype = U.dtype
    with_cost = cost is not None

    model_arrs, model_shapes, model_def = _pack(model)
    cost_arrs, cost_shapes, cost_def = _pack(cost)
    bounds = []
    if u_min is not None and u_max is not None:
        bounds = [jnp.asarray(u_min).reshape(1, -1),
                  jnp.asarray(u_max).reshape(1, -1)]
    n_m, n_c = len(model_arrs), len(cost_arrs)

    def kernel(*refs):
        Z_ref, U_ref, k_ref, K_ref, alphas_ref = refs[:5]
        model_k = _unpack(refs[5:5 + n_m], model_shapes, model_def)
        cost_k = _unpack(refs[5 + n_m:5 + n_m + n_c], cost_shapes, cost_def)
        if bounds:
            u_min_k = refs[5 + n_m + n_c][0]
            u_max_k = refs[5 + n_m + n_c + 1][0]
        Z_out, U_out, J_out = refs[-3:]
        a_col = alphas_ref[:]  # (A, 1)
        z0 = jnp.broadcast_to(Z_ref[0:1, :], (A, nz))
        Z_out[0] = z0

        def body(i, carry):
            z_new, J = carry
            z_i = Z_ref[pl.ds(i, 1), :]          # (1, nz)
            u_i = U_ref[pl.ds(i, 1), :]          # (1, nu)
            k_i = k_ref[pl.ds(i, 1), :]          # (1, nu)
            K_i = K_ref[i]                        # (nu, nz)

            dz = z_new - z_i
            du = a_col * k_i + jax.lax.dot_general(
                dz, K_i, (((1,), (1,)), ((), ())),
                preferred_element_type=dtype)     # (A, nu)
            u_new = u_i + du
            if bounds:
                u_new = clamp(u_new, u_min_k, u_max_k)

            if with_cost:
                J = J + cost_k(z_new, u_new, i, terminal=False,
                               encoding=encoding, **cost_opts)

            z_next = model_k.apply(z_new, u_new, i, (), encoding)

            Z_out[pl.ds(i + 1, 1)] = z_next[None]
            U_out[pl.ds(i, 1)] = u_new[None]
            return z_next, J

        z_T, J = lax.fori_loop(0, N, body, (z0, jnp.zeros(A, dtype)))
        if with_cost:
            J = J + cost_k(z_T, None, N, terminal=True, encoding=encoding,
                           **cost_opts)
            J_out[0, :] = J
        else:
            J_out[0, :] = jnp.zeros(A, dtype)

    out_shape = (
        jax.ShapeDtypeStruct((N + 1, A, nz), dtype),
        jax.ShapeDtypeStruct((N, A, nu), dtype),
        jax.ShapeDtypeStruct((1, A), dtype),
    )
    inputs = [Z, U, k, K, alphas[:, None]] + model_arrs + cost_arrs + bounds
    Z_new, U_new, J = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=interpret,
    )(*inputs)

    if with_cost:
        return Z_new, U_new, J[0]
    return Z_new, U_new
