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
over any model/cost pair whose ops lower in Mosaic — including the
*stateful* particle BNN: its rolling carry (previous particle outputs)
threads through the fori carry, and the per-step noise aux is recorded
into output refs so the winner can feed the local quadratic model.

Prerequisites handled elsewhere in this codebase: the encoding codecs and
angular utilities emit static slices (no constant index arrays), and all
small-matrix factorizations/solves are unrolled (utils.linalg.SMALL_N), so
everything the example models and the BNN need lowers inside the kernel.

Same math as control_law(cost=..., with_aux=...): numerics verified
element-wise against the scan implementation in
tests/ops/test_fused_rollout.py.

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
from ..utils.kernel_mode import pallas_kernel_tracing
from ..utils.linalg import SMALL_N

__all__ = ["fused_control_law", "supports_fused_rollout"]

_MATRIX_CODECS = (StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
                  StateEncoding.FULL_COVARIANCE_MATRIX)


def supports_fused_rollout(model, encoding=None, allow_stateful=False):
    """Whether (model, encoding) can run in the fused kernel.

    Matrix-codec encodings factorize covariances on the way through; that
    lowers in-kernel only via the unrolled small Cholesky, i.e. for state
    sizes <= utils.linalg.SMALL_N (every bundled example qualifies).

    Stateful models (the particle BNN) are fully supported — the rolling
    carry threads through the fori loop, per-step aux records into
    output refs, and since the round-4 Mosaic-safe redesign
    (docs/PERFORMANCE.md §7b) the kernel COMPILES on TPU (full2 parity
    4.8e-7 vs interpret). It stays gated off by default because it
    MEASURES SLOWER than the scan line search at the H=25 bench shape
    (1.477 vs 1.354 ms/iteration: the per-candidate codec/Cholesky VPU
    work lowers better under XLA's batched scan); pass
    allow_stateful=True to use it — worth re-measuring for long-horizon
    belief-state workloads.
    """
    if encoding in _MATRIX_CODECS:
        state_size = getattr(model, "state_size", None)
        if state_size is None or state_size > SMALL_N:
            return False
    if not allow_stateful:
        try:
            if model.init_state() != () or model.aux_zero() != ():
                return False
        except Exception:
            return False
    return True


def _pack(tree, ref_fields=()):
    """Flattens a pytree into >=2D arrays Pallas can take as VMEM inputs
    (kernels may not capture array constants), plus restore metadata.

    Leaves whose field name is in ``ref_fields`` are flagged to stay as
    raw Refs inside the kernel: Mosaic cannot lower dynamic_slice on
    *values*, so per-timestep tables (e.g. the BNN's pre-sampled noise
    eps_in[i]) must be indexed through the Ref instead.
    """
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(tree)
    arrs, shapes, as_ref = [], [], []
    for path, leaf in leaves_p:
        a = jnp.asarray(leaf)
        name = getattr(path[-1], "name", None) if path else None
        keep_ref = name in ref_fields
        shapes.append(a.shape)
        as_ref.append(keep_ref)
        arrs.append(a if keep_ref else
                    a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    return arrs, (shapes, as_ref), treedef


def _unpack(refs, meta, treedef):
    shapes, as_ref = meta
    leaves = [r if keep else r[...].reshape(s)
              for r, s, keep in zip(refs, shapes, as_ref)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fused_control_law(model, Z, U, k, K, alphas,
                      encoding: StateEncoding = StateEncoding.DEFAULT,
                      cost=None, cost_opts=None, u_min=None, u_max=None,
                      interpret=None, with_aux=False):
    """Pallas-fused batched-alpha closed-loop rollout with cost.

    Args mirror controllers.ilqr.control_law; requires
    ``supports_fused_rollout(model, encoding)``.

    Returns:
        (Z_new (N+1, A, nz), U_new (N, A, nu))
        [, J (A,) when cost is given]
        [, AUX (N, A, ...) when with_aux] — matching control_law.
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

    ref_fields = tuple(getattr(model, "pallas_ref_fields", ()))
    model_arrs, model_shapes, model_def = _pack(model, ref_fields)
    cost_arrs, cost_shapes, cost_def = _pack(cost)
    bounds = []
    if u_min is not None and u_max is not None:
        bounds = [jnp.asarray(u_min).reshape(1, -1),
                  jnp.asarray(u_max).reshape(1, -1)]
    n_m, n_c, n_b = len(model_arrs), len(cost_arrs), len(bounds)

    # Rolling model state (e.g. BNN previous particle outputs), batched
    # over alphas; built outside and threaded through the fori carry.
    mstate0 = model.init_state(batch_shape=(A,))
    mstate_leaves, mstate_def = jax.tree_util.tree_flatten(mstate0)
    n_s = len(mstate_leaves)

    # Per-step aux structure (noise constants) recorded per candidate.
    # TPU pads the last two Ref dims to tile boundaries, so a trailing
    # dim of e.g. 4 would pad 32x; and merging minor dims with an
    # in-kernel reshape is a Mosaic kill (probe_micro2 t6c). Leaves with
    # per-candidate rank < 2 store flattened to (N, A, size) — only a
    # leading axis is added, no minor-dim merge. Rank-2 (P, n) leaves
    # (the BNN noise) store as (N, n, A, P): each lane column is
    # extracted by a masked single-axis sum and written at a static n
    # index, and the host-side result transposes back to (N, A, P, n).
    aux_zero = model.aux_zero()
    aux_leaves0, aux_def = jax.tree_util.tree_flatten(aux_zero)
    aux_shapes = [a.shape for a in aux_leaves0]
    aux_sizes = [max(1, int(jnp.size(a))) for a in aux_leaves0]
    aux_split = [len(s) == 2 for s in aux_shapes]
    n_a = len(aux_leaves0) if with_aux else 0

    def kernel(*refs):
        ofs = 5
        Z_ref, U_ref, k_ref, K_ref, alphas_ref = refs[:5]
        model_k = _unpack(refs[ofs:ofs + n_m], model_shapes, model_def)
        ofs += n_m
        cost_k = _unpack(refs[ofs:ofs + n_c], cost_shapes, cost_def)
        ofs += n_c
        if bounds:
            u_min_k = refs[ofs][0]
            u_max_k = refs[ofs + 1][0]
            ofs += 2
        mstate_refs = refs[ofs:ofs + n_s]
        Z_out, U_out, J_out = refs[ofs + n_s:ofs + n_s + 3]
        aux_out = refs[ofs + n_s + 3:ofs + n_s + 3 + n_a]

        a_col = alphas_ref[:]  # (A, 1)
        z0 = jnp.broadcast_to(Z_ref[0:1, :], (A, nz))
        Z_out[0] = z0
        mstate_init = [r[...] for r in mstate_refs]

        def body(i, carry):
            z_new, J = carry[0], carry[1]
            mstate = jax.tree_util.tree_unflatten(mstate_def, carry[2:])
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

            def step_one(z, u, st):
                return model_k.step(z, u, i, st, encoding)

            z_next, mstate, aux = jax.vmap(step_one)(z_new, u_new, mstate)

            Z_out[pl.ds(i + 1, 1)] = z_next[None]
            U_out[pl.ds(i, 1)] = u_new[None]
            if with_aux:
                for r, leaf, split in zip(
                        aux_out, jax.tree_util.tree_leaves(aux),
                        aux_split):
                    if split:
                        # (A, P, n) -> n stores of (A, P): masked
                        # single-axis sums, no reshape (see aux comment).
                        n_lane = leaf.shape[-1]
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (leaf.shape[-2], n_lane), 1)
                        for j in range(n_lane):
                            col = jnp.sum(
                                leaf * (lane == j).astype(leaf.dtype)[None],
                                axis=-1)
                            r[pl.ds(i, 1), j] = col[None]
                    else:
                        r[pl.ds(i, 1)] = leaf.reshape(1, A, -1)
            return (z_next, J) + tuple(jax.tree_util.tree_leaves(mstate))

        carry = lax.fori_loop(
            0, N, body, (z0, jnp.zeros(A, dtype)) + tuple(mstate_init))
        z_T, J = carry[0], carry[1]
        if with_cost:
            J = J + cost_k(z_T, None, N, terminal=True, encoding=encoding,
                           **cost_opts)
            J_out[0, :] = J
        else:
            J_out[0, :] = jnp.zeros(A, dtype)

    out_shape = [
        jax.ShapeDtypeStruct((N + 1, A, nz), dtype),
        jax.ShapeDtypeStruct((N, A, nu), dtype),
        jax.ShapeDtypeStruct((1, A), dtype),
    ]
    if with_aux:
        out_shape += [
            jax.ShapeDtypeStruct((N, s[1], A, s[0]), dtype) if split
            else jax.ShapeDtypeStruct((N, A, sz), dtype)
            for s, sz, split in zip(aux_shapes, aux_sizes, aux_split)]
    inputs = ([Z, U, k, K, alphas[:, None]] + model_arrs + cost_arrs
              + bounds + list(mstate_leaves))
    # pallas_call traces `kernel` synchronously here; the kernel-tracing
    # mark switches dual-form primitives (triu codecs, safe_cholesky
    # diagonal) to their Mosaic-safe lowerings — see utils/kernel_mode.
    with pallas_kernel_tracing():
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(len(out_shape))),
            interpret=interpret,
        )(*inputs)

    Z_new, U_new, J = outs[0], outs[1], outs[2]
    result = (Z_new, U_new)
    if with_cost:
        result = result + (J[0],)
    if with_aux:
        aux_arrs = [jnp.transpose(o, (0, 2, 3, 1)) if split
                    else o.reshape((N, A) + s)
                    for o, s, split in zip(outs[3:], aux_shapes, aux_split)]
        AUX = jax.tree_util.tree_unflatten(aux_def, aux_arrs)
        result = result + (AUX,)
    return result
