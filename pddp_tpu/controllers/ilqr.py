"""Iterative Linear Quadratic Regulator — TPU-native functional core.

Re-designs /root/reference/pddp/controllers/ilqr.py for XLA:

 * The three hot loops (forward rollout+derivatives at :458, Riccati
   backward at :627, line-search rollout at :701) become ``lax.scan``s; the
   per-step derivative work is *hoisted out of the sequential rollout* and
   vmapped over the whole horizon so the MXU sees batched matmuls.
 * The reference's batched line search (all alphas rolled out at once via a
   broadcast column vector, :693-699) keeps its shape: vmap over alpha.
 * Exception-driven regularization (RuntimeError -> retry with higher mu,
   :124-145) becomes a branchless status machine inside a single jitted
   ``lax.while_loop``: non-PD and NaN conditions are detected by value and
   the Tassa mu/delta schedule (:364-390) updates by ``where``.
 * Eigenvalue clamping of Q_uu (:631-634) has a closed-form fast path for
   1-dimensional actions (no eigh at all).
 * The whole solve is one jit-compiled function of pytree inputs — it
   vmaps over batches of problems (P5 in SURVEY §2.4) and shards over
   device meshes unchanged.

The stateful ``iLQRController`` wrapper at the bottom preserves the
reference's fit/step/forward API surface and warm-start behavior.
"""

from __future__ import annotations

from enum import IntEnum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..encoding import StateEncoding, decode_mean
from ..struct import pytree_dataclass, replace, static_field
from ..utils.constraint import boxqp, chol_solve, clamp
from ..utils.evaluation import eval_cost, eval_dynamics
# All solver matmuls are tiny-matrix algebra; small_mm unrolls them into
# broadcast-multiply-adds (VPU), which is ~14x faster than batched
# dot_general under large vmapped solve batches (see utils.linalg).
from ..utils.linalg import small_mm as mm
from .base import Controller

__all__ = [
    "iLQRState",
    "iLQRController",
    "ILQROptions",
    "ILQRResult",
    "rollout",
    "forward",
    "Q",
    "backward",
    "control_law",
    "linear_control_law",
    "trajectory_cost",
    "solve",
    "default_fit_alphas",
    "default_step_alphas",
]


class iLQRState(IntEnum):
    """iLQR optimization step state (reference :35-64)."""

    UNDEFINED = 0
    ACCEPTED = 1
    REJECTED = 2
    NOT_PD = 3
    MAX_REG = 4
    CONVERGED = 5

    def should_retry(self):
        return self in (iLQRState.UNDEFINED, iLQRState.NOT_PD,
                        iLQRState.REJECTED)

    def is_terminal(self):
        return self in (iLQRState.CONVERGED, iLQRState.MAX_REG)


def _is_terminal_arr(state):
    return (state == iLQRState.CONVERGED) | (state == iLQRState.MAX_REG)


def default_fit_alphas(dtype=jnp.float32):
    """Backtracking schedule used by fit (reference :282)."""
    return (1.025**(-jnp.arange(10.0)**2)).astype(dtype)


def default_step_alphas(dtype=jnp.float32):
    """Backtracking schedule used by bare step/MPC calls (reference :189)."""
    return (10.0**jnp.linspace(0.0, -3.0, 11)).astype(dtype)


@pytree_dataclass
class ILQROptions:
    """Solver options. Array-valued fields are dynamic (no recompilation);
    structure-affecting fields are static."""

    n_iterations: jnp.ndarray = 50
    tol: jnp.ndarray = 5e-6
    max_reg: jnp.ndarray = 1e10
    mu_min: jnp.ndarray = 1e-6
    delta_0: jnp.ndarray = 2.0
    alphas: Optional[jnp.ndarray] = None
    u_min: Optional[jnp.ndarray] = None
    u_max: Optional[jnp.ndarray] = None
    #: total backward+line-search evaluation budget (static loop bound
    #: surrogate; the reference's retry loop is unbounded).
    max_evals: jnp.ndarray = 200
    #: regularize V_zz instead of Q_uu (reference backward :584-625).
    v_zz_reg: bool = static_field(default=False)
    #: Gauss-Newton Hessian approximation (reference evaluation.py:77-81).
    approximate_hessians: bool = static_field(default=False)
    #: Riccati backward implementation: "scan" (sequential lax.scan,
    #: the default), "parallel" (O(log N) associative scan, ops.riccati),
    #: or "kernel" (fused Pallas recursion, ops.backward_kernel; applies
    #: to action_size <= utils.linalg.SMALL_EIGH_N via the in-kernel
    #: Jacobi eigen-clamp, falls back to "scan" otherwise). "parallel" and
    #: "kernel" fall back to "scan" when constrained or v_zz_reg.
    riccati_mode: str = static_field(default="scan")
    #: deprecated alias for riccati_mode="parallel".
    parallel_riccati: bool = static_field(default=False)
    #: lax.scan unroll factor for the sequential hot loops (rollout,
    #: backward, line search). The loops are latency-bound on TPU (tiny
    #: per-step math, sequential dependence): unrolling amortizes the
    #: per-step dispatch overhead.
    scan_unroll: int = static_field(default=1)
    #: run the line-search rollout as one fused Pallas kernel
    #: (ops.fused_rollout) — applies to stateless models (no rollout carry
    #: or per-step noise aux) with no model_opts; others fall back to scan.
    fused_rollout: bool = static_field(default=False)
    #: accumulate line-search candidate costs INSIDE the rollout scan
    #: instead of the default batched post-pass. The post-pass wins for
    #: latency-bound single solves (the scan body stays minimal); in-scan
    #: wins for compute-bound large-batch vmapped solves of cheap analytic
    #: models, where the add fuses for free and the post-pass re-reads the
    #: whole (N, A, B, nz) trajectory from HBM (see control_law docstring
    #: for measurements).
    cost_in_scan: bool = static_field(default=False)


@pytree_dataclass
class ILQRResult:
    """Solution + warm-start state of one solve."""

    Z: jnp.ndarray          # (N+1, nz) encoded state path
    U: jnp.ndarray          # (N, nu) action path
    K: jnp.ndarray          # (N, nu, nz) feedback gains
    J_opt: jnp.ndarray      # scalar cost
    state: jnp.ndarray      # int32 iLQRState
    mu: jnp.ndarray
    delta: jnp.ndarray
    iterations: jnp.ndarray  # accepted iterations
    evals: jnp.ndarray       # total backward/line-search evaluations


# ---------------------------------------------------------------------------
# Forward rollout + local model
# ---------------------------------------------------------------------------


def rollout(model, z0, U, encoding: StateEncoding, u_min=None, u_max=None,
            unroll=1):
    """Sequential rollout recording per-step noise aux (one lax.scan).

    Returns (Z (N+1, nz), AUX stacked over time). ``unroll`` trades code
    size for fewer scan-step dispatches (the loop is latency-bound on TPU:
    tiny per-step math, sequential dependence).
    """
    N = U.shape[0]

    def body(carry, inp):
        z, mstate = carry
        u, i = inp
        if u_min is not None and u_max is not None:
            u = clamp(u, u_min, u_max)
        z_next, mstate, aux = model.step(z, u, i, mstate, encoding)
        return (z_next, mstate), (z_next, aux)

    (_, _), (Z_next, AUX) = lax.scan(
        body, (z0, model.init_state()), (U, jnp.arange(N)), unroll=unroll)
    Z = jnp.concatenate([z0[None], Z_next], axis=0)
    return Z, AUX


def local_model(Z, U, AUX, model, cost,
                encoding: StateEncoding = StateEncoding.DEFAULT,
                model_opts=None, cost_opts=None, u_min=None, u_max=None,
                approximate_hessians=False):
    """Local quadratic model of an already-rolled-out trajectory.

    Pure vmapped derivative work — no sequential scan. All N
    Jacobians/Hessians evaluate in parallel (the TPU-native replacement
    for the reference's per-step derivative loop, ilqr.py:458-473).

    Returns:
        (Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu) with the reference's
        shapes: L/L_z/L_zz cover N+1 entries (terminal included).
    """
    model_opts = model_opts or {}
    cost_opts = cost_opts or {}
    N = U.shape[0]
    Z_run = Z[:-1]

    U_eff = U
    if u_min is not None and u_max is not None:
        U_eff = clamp(U, u_min, u_max)

    idx = jnp.arange(N)

    # Costs with a closed-form local model evaluate the whole trajectory in
    # one batched call (~10 einsums); otherwise vmapped autodiff.
    cost_batch = None
    deriv_fn = getattr(cost, "eval_derivatives", None)
    if deriv_fn is not None and not approximate_hessians:
        cost_batch = deriv_fn(Z_run, U_eff, idx, terminal=False,
                              encoding=encoding,
                              approximate=approximate_hessians, **cost_opts)
    if cost_batch is not None:
        L_run, L_z_run, L_u, L_zz_run, L_uz, L_uu = cost_batch
    else:
        def cost_one(z, u, i):
            return eval_cost(cost, z, u, i, terminal=False,
                             encoding=encoding,
                             approximate=approximate_hessians, **cost_opts)

        L_run, L_z_run, L_u, L_zz_run, L_uz, L_uu = jax.vmap(cost_one)(
            Z_run, U_eff, idx)

    def dyn_one(z, u, i, aux):
        return eval_dynamics(model, z, u, i, encoding=encoding, aux=aux,
                             **model_opts)

    _, F_z, F_u = jax.vmap(dyn_one)(Z_run, U_eff, idx, AUX)

    l_T, l_z_T, _, l_zz_T, _, _ = eval_cost(
        cost, Z[-1], None, N, terminal=True, encoding=encoding,
        approximate=approximate_hessians, **cost_opts)

    L = jnp.concatenate([L_run, l_T[None]])
    L_z = jnp.concatenate([L_z_run, l_z_T[None]])
    L_zz = jnp.concatenate([L_zz_run, l_zz_T[None]])

    return Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu


def forward(z0, U, model, cost, encoding: StateEncoding = StateEncoding.DEFAULT,
            model_opts=None, cost_opts=None, u_min=None, u_max=None,
            approximate_hessians=False, unroll=1):
    """Forward pass: rollout + full local quadratic model.

    Parity with reference forward() (:393-486): one cheap sequential scan
    (rollout), then all derivative work vmapped (see local_model).
    """
    Z, AUX = rollout(model, z0, U, encoding, u_min=u_min, u_max=u_max,
                     unroll=unroll)
    return local_model(Z, U, AUX, model, cost, encoding, model_opts,
                       cost_opts, u_min=u_min, u_max=u_max,
                       approximate_hessians=approximate_hessians)


# ---------------------------------------------------------------------------
# Backward Riccati recursion
# ---------------------------------------------------------------------------


def Q(F_z, F_u, L_z, L_u, L_zz, L_uz, L_uu, V_z, V_zz):
    """Q-function derivatives (reference :489-526), symmetrized."""
    F_zT = F_z.T
    F_uT = F_u.T
    Q_z = L_z + mm(F_zT, V_z)
    Q_u = L_u + mm(F_uT, V_z)
    V_zz_F_z = mm(V_zz, F_z)
    Q_zz = L_zz + mm(F_zT, V_zz_F_z)
    Q_zz = 0.5 * (Q_zz + Q_zz.T)
    Q_uz = L_uz + mm(F_uT, V_zz_F_z)
    Q_uu = L_uu + mm(F_uT, mm(V_zz, F_u))
    Q_uu = 0.5 * (Q_uu + Q_uu.T)
    return Q_z, Q_u, Q_zz, Q_uz, Q_uu


def _psd_clamp_with_reg(Q_uu, reg):
    """(Q_uu_reg, Q_uu_inv) via eigen clamping (reference :631-636), with a
    closed-form fast path for 1x1 action blocks and unrolled fixed-sweep
    Jacobi (utils.linalg.small_eigh) for other small action blocks — XLA's
    eigh on tiny matrices is column-loop-bound on TPU and serializes under
    vmap, while the Jacobi sweeps are elementwise and batch freely."""
    m = Q_uu.shape[-1]
    floor = jnp.asarray(1e-12, Q_uu.dtype)
    if m == 1:
        e = jnp.where(Q_uu < 0, floor, Q_uu) + reg
        return e, 1.0 / e
    from ..utils.linalg import SMALL_EIGH_N, small_eigh
    if m <= SMALL_EIGH_N:
        e, E = small_eigh(Q_uu, sort=False)
    else:
        e, E = jnp.linalg.eigh(0.5 * (Q_uu + Q_uu.T))
    e = jnp.where(e < 0, floor, e) + reg
    ET = E.T
    Q_uu_reg = mm(E * e[None, :], ET)
    Q_uu_inv = mm(E / e[None, :], ET)
    return Q_uu_reg, Q_uu_inv


def backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=0.0,
             v_zz_reg=False, u_min=None, u_max=None, U=None, unroll=1):
    """Backward Riccati pass as a reverse lax.scan (reference :529-674).

    Returns:
        (k (N, nu), K (N, nu, nz), ok (bool)): ok is False when a non-PD /
        NaN condition was detected anywhere in the recursion — the
        branchless stand-in for the reference's RuntimeError.
    """
    N, nu = L_u.shape
    nz = Z.shape[-1]
    # The scan carry must be dtype-stable: with mixed-precision inputs
    # (e.g. f32 dynamics Jacobians against f64 cost derivatives under
    # jax_enable_x64) the body promotes V_z/V_zz/k while the init would
    # stay at the narrower dtype — a carry-type error at trace time.
    dtype = jnp.result_type(Z, F_z, L_z, L_u,
                            *(() if u_min is None else (u_min, u_max)))
    reg = jnp.asarray(reg, dtype)
    constrained = u_min is not None and u_max is not None

    V_z0 = jnp.asarray(L_z[-1], dtype)
    V_zz0 = jnp.asarray(L_zz[-1], dtype)
    reg_eye = reg * jnp.eye(nz, dtype=dtype) if v_zz_reg else None

    def step(carry, inp):
        V_z, V_zz, k_next, ok = carry
        if constrained:
            F_z_i, F_u_i, L_z_i, L_u_i, L_zz_i, L_uz_i, L_uu_i, U_i = inp
        else:
            F_z_i, F_u_i, L_z_i, L_u_i, L_zz_i, L_uz_i, L_uu_i = inp

        Q_z, Q_u, Q_zz, Q_uz, Q_uu = Q(F_z_i, F_u_i, L_z_i, L_u_i, L_zz_i,
                                       L_uz_i, L_uu_i, V_z, V_zz)

        if v_zz_reg:
            # Regularize through V_zz (reference :584-592): recompute the
            # u-blocks against V_zz + reg*I.
            _, Q_u_r, _, Q_uz_r, Q_uu_r = Q(F_z_i, F_u_i, L_z_i, L_u_i,
                                            L_zz_i, L_uz_i, L_uu_i, V_z,
                                            V_zz + reg_eye)
            lin_Q_u, lin_Q_uz = Q_u_r, Q_uz_r
            Q_uu_reg = Q_uu_r
            from ..utils.linalg import SMALL_N, small_cholesky
            if nu <= SMALL_N:
                U_chol = small_cholesky(Q_uu_reg)
            else:
                U_chol = jnp.linalg.cholesky(Q_uu_reg).T
            step_ok = jnp.all(jnp.isfinite(U_chol))
            if not constrained:
                kK = -chol_solve(U_chol,
                                 jnp.concatenate([lin_Q_u[:, None], lin_Q_uz],
                                                 axis=-1))
                k_i = kK[:, 0]
                K_i = kK[:, 1:]
        else:
            lin_Q_u, lin_Q_uz = Q_u, Q_uz
            Q_uu_reg, Q_uu_inv = _psd_clamp_with_reg(Q_uu, reg)
            if not constrained:
                kK = -mm(Q_uu_inv,
                         jnp.concatenate([Q_u[:, None], Q_uz], axis=-1))
                step_ok = jnp.all(jnp.isfinite(kK))
                k_i = kK[:, 0]
                K_i = kK[:, 1:]

        if constrained:
            lower = u_min - U_i
            upper = u_max - U_i
            res = boxqp(k_next, Q_uu_reg, lin_Q_u, lower, upper)
            k_i = res.x
            step_ok = res.result >= 1
            if v_zz_reg:
                step_ok = step_ok & jnp.all(jnp.isfinite(res.U_free))
            free_f = res.free.astype(dtype)
            K_i = -chol_solve(res.U_free,
                              lin_Q_uz * free_f[:, None]) * free_f[:, None]

        K_iT = K_i.T
        # V updates use the *unregularized* Q_uu/Q_uz with correction terms
        # since k, K were computed from regularized quantities (ref :664-672).
        V_z_new = Q_z + mm(K_iT, Q_u) + mm(K_iT, mm(Q_uu, k_i)) + mm(
            Q_uz.T, k_i)
        V_zz_new = Q_zz + mm(K_iT, mm(Q_uu, K_i))
        V_zz_new = V_zz_new + mm(K_iT, Q_uz) + mm(Q_uz.T, K_i)
        V_zz_new = 0.5 * (V_zz_new + V_zz_new.T)

        ok = ok & step_ok
        return (V_z_new, V_zz_new, k_i, ok), (k_i, K_i)

    xs = (F_z, F_u, L_z[:-1], L_u, L_zz[:-1], L_uz, L_uu)
    if constrained:
        xs = xs + (U,)

    init = (V_z0, V_zz0, jnp.zeros(nu, dtype), jnp.asarray(True))
    (_, _, _, ok), (k_rev, K_rev) = lax.scan(step, init, xs, reverse=True,
                                             unroll=unroll)
    # reverse=True scans from the end but stacks outputs in input order.
    return k_rev, K_rev, ok


# ---------------------------------------------------------------------------
# Line search
# ---------------------------------------------------------------------------


def control_law(model, Z, U, k, K, alphas,
                encoding: StateEncoding = StateEncoding.DEFAULT,
                model_opts=None, u_min=None, u_max=None, unroll=1,
                cost=None, cost_opts=None, with_aux=False,
                cost_in_scan=False):
    """Batched-alpha closed-loop rollout (reference :677-723).

    All line-search candidates roll out simultaneously: the scan carries an
    (A, nz) batch of states and the model is vmapped over the alpha axis.

    When ``cost`` is given, candidate costs are evaluated in one batched
    (N x A) pass AFTER the scan by default. The scan is latency-bound
    (each step is tiny sequential work, so wall time ~ ops-per-step x N);
    hoisting the cost out of the body cut the BNN line search from 1.15
    to 0.81 ms at H=25 on TPU v5e, while the post-pass itself is a single
    parallel op. Set ``cost_in_scan=True`` to accumulate inside the scan
    body instead — measured faster for compute-bound LARGE-BATCH vmapped
    solves of cheap analytic models (B=1024 cartpole: 17.1k vs 14.3k
    solves/s), where the in-scan add fuses for free and the post-pass
    re-reads the (N, A, B, nz) trajectory from HBM. (The fused Pallas
    path keeps the cost in-kernel — everything there is one program
    anyway.)

    When ``with_aux`` is True, the per-step model aux (noise constants) is
    recorded per candidate, so the winning trajectory can feed local_model
    directly without being re-rolled-out.

    Returns:
        (Z_new (N+1, A, nz), U_new (N, A, nu))
        [, J (A,) when cost is given]
        [, AUX (N, A, ...) when with_aux].
    """
    model_opts = model_opts or {}
    cost_opts = cost_opts or {}
    A = alphas.shape[0]
    N = U.shape[0]
    dtype = U.dtype

    z0_b = jnp.broadcast_to(Z[0], (A,) + Z[0].shape)
    mstate0 = model.init_state(batch_shape=(A,))

    in_scan = cost is not None and cost_in_scan

    def body(carry, inp):
        if in_scan:
            z_new, mstate, J = carry
        else:
            z_new, mstate = carry
        z_i, u_i, k_i, K_i, i = inp
        dz = z_new - z_i[None, :]
        du = alphas[:, None] * k_i[None, :] + mm(dz, K_i.T)
        u_new = u_i[None, :] + du
        if u_min is not None and u_max is not None:
            u_new = clamp(u_new, u_min, u_max)

        if in_scan:
            J = J + cost(z_new, u_new, i, terminal=False, encoding=encoding,
                         **cost_opts)

        def step_one(z, u, st):
            return model.step(z, u, i, st, encoding, **model_opts)

        z_next, mstate, aux = jax.vmap(step_one)(z_new, u_new, mstate)
        out = (z_next, u_new, aux) if with_aux else (z_next, u_new)
        carry = (z_next, mstate, J) if in_scan else (z_next, mstate)
        return carry, out

    init = ((z0_b, mstate0, jnp.zeros(A, dtype)) if in_scan else
            (z0_b, mstate0))
    final, outs = lax.scan(
        body, init, (Z[:-1], U, k, K, jnp.arange(N)), unroll=unroll)
    z_T = final[0]

    Z_next, U_new = outs[0], outs[1]
    Z_new = jnp.concatenate([z0_b[None], Z_next], axis=0)
    result = (Z_new, U_new)
    if cost is not None:
        if in_scan:
            J = final[2] + cost(z_T, None, N, terminal=True,
                                encoding=encoding, **cost_opts)
        else:
            J = trajectory_cost(cost, Z_new, U_new, encoding, cost_opts)
        result = result + (J,)
    if with_aux:
        result = result + (outs[2],)
    return result


def linear_control_law(Z, U, F_z, F_u, k, K, alphas, u_min=None, u_max=None):
    """Linearized line-search rollout (fixed reference :726-761).

    Propagates deviations through the stored Jacobians instead of the model
    — cheaper when model evaluations dominate.
    """
    A = alphas.shape[0]
    N = U.shape[0]
    z0_b = jnp.broadcast_to(Z[0], (A,) + Z[0].shape)

    def body(z_new, inp):
        z_i, z_ip1, u_i, F_z_i, F_u_i, k_i, K_i = inp
        dz = z_new - z_i[None, :]
        du = alphas[:, None] * k_i[None, :] + mm(dz, K_i.T)
        if u_min is not None and u_max is not None:
            du = clamp(du, u_min - u_i, u_max - u_i)
        dz_next = mm(dz, F_z_i.T) + mm(du, F_u_i.T)
        z_next = z_ip1[None, :] + dz_next
        return z_next, (z_next, u_i[None, :] + du)

    _, (Z_next, U_new) = lax.scan(
        body, z0_b, (Z[:-1], Z[1:], U, F_z, F_u, k, K))
    Z_new = jnp.concatenate([z0_b[None], Z_next], axis=0)
    return Z_new, U_new


def trajectory_cost(cost, Z, U, encoding: StateEncoding = StateEncoding.DEFAULT,
                    cost_opts=None):
    """Total trajectory cost, batched over trailing batch dims of Z/U
    (reference :764-791). Z: (N+1, ..., nz), U: (N, ..., nu)."""
    cost_opts = cost_opts or {}
    N = U.shape[0]
    idx = jnp.arange(N)

    def run_one(z, u, i):
        return cost(z, u, i, terminal=False, encoding=encoding, **cost_opts)

    L = jax.vmap(run_one)(Z[:-1], U, idx)
    l_T = cost(Z[-1], None, N, terminal=True, encoding=encoding, **cost_opts)
    return L.sum(axis=0) + l_T


# ---------------------------------------------------------------------------
# The jitted solve loop
# ---------------------------------------------------------------------------


def _increase_reg(mu, delta, mu_min, delta_0):
    """Tassa schedule increase (reference :376-390)."""
    delta = jnp.maximum(1.0, delta) * delta_0
    mu = jnp.maximum(mu_min, mu * delta)
    return mu, delta


def _decrease_reg(mu, delta, mu_min, delta_0):
    """Tassa schedule decrease (reference :369-374)."""
    delta = jnp.minimum(1.0, delta) / delta_0
    mu = mu * delta
    mu = jnp.where(mu <= mu_min, 0.0, mu)
    return mu, delta


def solve(model, cost, z0, U0, opts: ILQROptions,
          encoding: StateEncoding = StateEncoding.DEFAULT,
          model_opts=None, cost_opts=None, mu0=0.0, delta0=None,
          n_iterations=None, on_iteration=None) -> ILQRResult:
    """Full iLQR solve as one jitted while_loop (reference fit, :237-316).

    Nested jitted while_loops with the reference's fit/step structure: the
    outer loop recomputes the local quadratic model once per accepted step;
    the inner loop retries backward + line search with escalating
    regularization — the reference's exception-driven retry semantics,
    branchless.

    Args:
        on_iteration: optional host callback (iteration, state, Z, U, J);
            invoked via jax.debug.callback once per outer iteration
            (matching the reference's per-fit-iteration callback,
            ilqr.py:289-296).
    """
    N, nu = U0.shape
    nz = z0.shape[-1]
    u_min, u_max = opts.u_min, opts.u_max

    def local_fn(Z, U, AUX):
        return local_model(Z, U, AUX, model, cost, encoding, model_opts,
                           cost_opts, u_min=u_min, u_max=u_max,
                           approximate_hessians=opts.approximate_hessians)

    # The while_loop carries must be dtype-stable, but the model/cost can
    # promote (e.g. f32 z0/U0 against f64 cost constants under
    # jax_enable_x64): a carry initialized at U0.dtype would then clash
    # with the promoted body outputs at trace time. Probe the promoted
    # dtype abstractly (eval_shape: no FLOPs, trace-time only) and lift
    # the inputs to it before anything runs.
    def _probe(z, U):
        Zp, AUXp = rollout(model, z, U, encoding, u_min=u_min, u_max=u_max,
                           unroll=opts.scan_unroll)
        return local_fn(Zp, U, AUXp)

    probe = jax.eval_shape(_probe, z0, U0)
    dtype = jnp.result_type(
        U0.dtype, z0.dtype,
        *(s.dtype for s in jax.tree_util.tree_leaves(probe)
          if jnp.issubdtype(s.dtype, jnp.floating)))
    z0 = jnp.asarray(z0, dtype)
    U0 = jnp.asarray(U0, dtype)
    if u_min is not None:
        u_min = jnp.asarray(u_min, dtype)
    if u_max is not None:
        u_max = jnp.asarray(u_max, dtype)

    alphas = jnp.asarray(
        opts.alphas if opts.alphas is not None else default_fit_alphas(dtype),
        dtype)
    n_iter = jnp.asarray(
        opts.n_iterations if n_iterations is None else n_iterations,
        jnp.int32)
    tol = jnp.asarray(opts.tol, dtype)
    max_reg = jnp.asarray(opts.max_reg, dtype)
    mu_min = jnp.asarray(opts.mu_min, dtype)
    delta_0 = jnp.asarray(opts.delta_0, dtype)
    max_evals = jnp.asarray(opts.max_evals, jnp.int32)

    # One rollout up front; afterwards the accepted trajectory always comes
    # out of the line-search scan (with its aux recorded), so no further
    # sequential rollouts are ever needed — only vmapped derivative work.
    Z0, AUX0 = rollout(model, z0, U0, encoding, u_min=u_min, u_max=u_max,
                       unroll=opts.scan_unroll)
    derivs0 = local_fn(Z0, U0, AUX0)
    J0 = derivs0[3].sum()

    def backward_fn(derivs, U_cur, mu):
        Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = derivs
        constrained = u_min is not None and u_max is not None
        mode = "parallel" if opts.parallel_riccati else opts.riccati_mode
        if constrained or opts.v_zz_reg:
            mode = "scan"
        from ..utils.linalg import SMALL_EIGH_N
        if mode == "kernel" and nu > SMALL_EIGH_N:
            mode = "scan"
        if mode == "parallel":
            from ..ops.riccati import parallel_backward
            return parallel_backward(
                Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=mu)
        if mode == "kernel":
            from ..ops.backward_kernel import pallas_backward
            return pallas_backward(
                Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=mu)
        return backward(
            Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=mu,
            v_zz_reg=opts.v_zz_reg, u_min=u_min, u_max=u_max, U=U_cur,
            unroll=opts.scan_unroll)

    def line_search_fn(Z, U_cur, k, K_new):
        # Cost accumulation is fused into the rollout (one pass over the
        # horizon), and per-step aux is recorded so the winner can feed
        # local_model directly.
        use_fused = opts.fused_rollout and not model_opts
        if use_fused:
            from ..ops.fused_rollout import (fused_control_law,
                                             supports_fused_rollout)
            use_fused = supports_fused_rollout(model, encoding)
        if use_fused:
            from ..ops.fused_rollout import fused_control_law
            if encoding == StateEncoding.IGNORE_UNCERTAINTY:
                # Deterministic states: the cost accumulates in-kernel
                # (one program, measured fastest — BENCH r03).
                return fused_control_law(
                    model, Z, U_cur, k, K_new, alphas, encoding, cost=cost,
                    cost_opts=cost_opts, u_min=u_min, u_max=u_max,
                    with_aux=True)
            # Belief-state encodings: hoist the cost out of the kernel
            # into one batched (N x A) post-pass — the uncertainty cost's
            # angular cross-covariance assembly does not lower in Mosaic
            # (docs/PERFORMANCE.md §7b), and the hoisted form measured
            # FASTER than in-scan accumulation at these shapes anyway
            # (§7 round-3: 1.15 -> 0.81 ms).
            Z_b, U_b, AUX_b = fused_control_law(
                model, Z, U_cur, k, K_new, alphas, encoding, cost=None,
                cost_opts=cost_opts, u_min=u_min, u_max=u_max,
                with_aux=True)
            J_b = trajectory_cost(cost, Z_b, U_b, encoding, cost_opts)
            return Z_b, U_b, J_b, AUX_b
        return control_law(
            model, Z, U_cur, k, K_new, alphas, encoding, model_opts,
            u_min=u_min, u_max=u_max, unroll=opts.scan_unroll, cost=cost,
            cost_opts=cost_opts, with_aux=True,
            cost_in_scan=opts.cost_in_scan)

    # Nested loops, exactly the reference's fit/step structure
    # (ilqr.py:237-316 around :183-235): the outer loop recomputes the
    # local quadratic model once per accepted step; the inner loop retries
    # backward + line search with escalating regularization. (The nesting
    # also matters for vmapped batches of solves: under vmap a lax.cond
    # runs both branches for all lanes, so a flat loop would pay the
    # derivative evaluation on every retry.)
    carry0 = dict(
        Z=Z0,
        U=U0,
        AUX=AUX0,
        K=jnp.zeros((N, nu, nz), dtype),
        derivs=derivs0,
        J_opt=J0,
        mu=jnp.asarray(mu0, dtype),
        delta=jnp.asarray(opts.delta_0 if delta0 is None else delta0, dtype),
        state=jnp.asarray(int(iLQRState.UNDEFINED), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        evals=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return (~_is_terminal_arr(c["state"])
                & (c["accepted"] < n_iter)
                & (c["evals"] < max_evals))

    def body(c):
        derivs = c["derivs"]
        J_opt = c["J_opt"]

        def inner_cond(ic):
            return ic["retry"] & (ic["evals"] < max_evals)

        def inner_body(ic):
            k, K_new, ok = backward_fn(derivs, c["U"], ic["mu"])
            Z_b, U_b, J_b, AUX_b = line_search_fn(derivs[0], c["U"], k,
                                                  K_new)
            # A diverged candidate (large alpha blowing up the rollout)
            # yields NaN, and argmin PICKS NaN over finite costs — which
            # would discard the healthy candidates and burn a retry.
            # Treat non-finite candidates as +inf instead (the reference's
            # torch.argmin has the same NaN quirk; this is strictly more
            # robust, identical when all candidates are finite).
            amin = jnp.argmin(jnp.where(jnp.isfinite(J_b), J_b, jnp.inf))
            J_new = J_b[amin]
            Z_new = Z_b[:, amin]
            U_new = U_b[:, amin]
            AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)

            accept = ok & jnp.isfinite(J_new) & (J_new < J_opt)
            converged = accept & (jnp.abs(J_opt - J_new) / J_opt < tol)

            mu_inc, delta_inc = _increase_reg(ic["mu"], ic["delta"], mu_min,
                                              delta_0)
            mu_dec, delta_dec = _decrease_reg(ic["mu"], ic["delta"], mu_min,
                                              delta_0)
            reg_exceeded = mu_inc >= max_reg

            state = jnp.where(
                accept,
                jnp.where(converged, jnp.int32(int(iLQRState.CONVERGED)),
                          jnp.int32(int(iLQRState.ACCEPTED))),
                jnp.where(
                    reg_exceeded, jnp.int32(int(iLQRState.MAX_REG)),
                    jnp.where(ok, jnp.int32(int(iLQRState.REJECTED)),
                              jnp.int32(int(iLQRState.NOT_PD)))))

            sel = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), new, old)

            out = dict(
                Z=sel(Z_new, ic["Z"]),
                U=sel(U_new, ic["U"]),
                AUX=sel(AUX_new, ic["AUX"]),
                K=sel(K_new, ic["K"]),
                J=jnp.where(accept, J_new, ic["J"]),
                mu=jnp.where(accept, mu_dec, mu_inc),
                delta=jnp.where(accept, delta_dec, delta_inc),
                state=state,
                evals=ic["evals"] + 1,
                retry=~accept & ~reg_exceeded,
                accept=accept,
            )
            return out

        ic0 = dict(
            Z=c["Z"], U=c["U"], AUX=c["AUX"], K=c["K"], J=J_opt,
            mu=c["mu"], delta=c["delta"],
            state=jnp.asarray(int(iLQRState.UNDEFINED), jnp.int32),
            evals=c["evals"], retry=jnp.asarray(True),
            accept=jnp.asarray(False),
        )
        ic = lax.while_loop(inner_cond, inner_body, ic0)

        # Refresh the local model only after an accepted step — the one
        # lax.cond per outer iteration.
        derivs_new = lax.cond(
            ic["accept"],
            lambda: local_fn(ic["Z"], ic["U"], ic["AUX"]),
            lambda: derivs)

        out = dict(
            Z=ic["Z"], U=ic["U"], AUX=ic["AUX"], K=ic["K"],
            derivs=derivs_new,
            J_opt=ic["J"], mu=ic["mu"], delta=ic["delta"],
            state=ic["state"],
            accepted=c["accepted"] + ic["accept"].astype(jnp.int32),
            evals=ic["evals"],
        )

        if on_iteration is not None:
            jax.debug.callback(
                on_iteration, out["accepted"] - 1, out["state"], out["Z"],
                out["U"], out["J_opt"], ordered=True)

        return out

    c = lax.while_loop(cond, body, carry0)

    return ILQRResult(
        Z=c["Z"], U=c["U"], K=c["K"], J_opt=c["J_opt"], state=c["state"],
        mu=c["mu"], delta=c["delta"], iterations=c["accepted"],
        evals=c["evals"])


def step_once(model, cost, z0, U0, opts: ILQROptions,
              encoding: StateEncoding = StateEncoding.DEFAULT,
              model_opts=None, cost_opts=None, mu0=0.0,
              delta0=None) -> ILQRResult:
    """A single iLQR step with retry semantics (reference step(), :183-235):
    one forward pass, then backward+line-search retries until accepted or
    terminal. Used by the MPC path."""
    return solve(model, cost, z0, U0,
                 replace(opts, alphas=(opts.alphas if opts.alphas is not None
                                       else default_step_alphas(U0.dtype))),
                 encoding=encoding, model_opts=model_opts,
                 cost_opts=cost_opts, mu0=mu0, delta0=delta0, n_iterations=1)


def _backend_supports_host_callbacks():
    """Whether in-graph host callbacks (jax.debug.callback inside jitted
    while_loops) are safe to COMPILE on the active backend.

    Local backends (CPU, directly-attached TPU) are fine. The axon TPU
    tunnel's remote AOT compiler is not: compiling a callback-bearing
    program is observed to hang indefinitely — and, the compile helper
    being shared, to block every subsequent fresh compile on the machine —
    so the error-driven fallback below never gets a chance to run. Detect
    the tunnel from its environment markers and pre-emptively take the
    callback-free path (per-iteration telemetry degrades to one final
    report). Set PDDP_TPU_FORCE_INGRAPH_CALLBACKS=1 to override.
    """
    import os
    force = os.environ.get("PDDP_TPU_FORCE_INGRAPH_CALLBACKS", "")
    if force.lower() not in ("", "0", "false"):
        return True
    if jax.default_backend() == "cpu":
        return True
    return not any(k.startswith("AXON_") or k.startswith("PALLAS_AXON_")
                   for k in os.environ)


# ---------------------------------------------------------------------------
# Stateful controller wrapper (reference API parity)
# ---------------------------------------------------------------------------


class iLQRController(Controller):
    """Iterative Linear Quadratic Regulator controller.

    Stateful convenience wrapper over the functional core above, matching
    the reference's constructor and fit/step/forward surface
    (reference :67-390). All heavy work happens inside jitted functions;
    the wrapper only holds warm-start state (Z/U/K nominal, mu/delta).
    """

    def __init__(self, env, model, cost, model_opts=None, cost_opts=None,
                 riccati_mode="scan", fused_rollout=False, scan_unroll=1,
                 v_zz_reg=False, **kwargs):
        """Args beyond the reference's (env, model, cost, *_opts):

        riccati_mode / fused_rollout / scan_unroll: TPU fast-path knobs
        threaded into every solve (see ILQROptions); the defaults are the
        portable scan paths.

        v_zz_reg: regularize V_zz instead of Q_uu in the backward pass
        (the reference's alternate mode, ilqr.py:584-625). Q_uu
        regularization (the default) only damps the control direction and
        usually converges in fewer iterations; V_zz regularization damps
        the full state-value curvature — sturdier when F_z itself is
        ill-conditioned (e.g. early BNN models with wild Jacobians), at
        the price of more conservative steps.
        """
        super().__init__()
        self.env = env
        self.model = model
        self.cost = cost
        self._model_opts = model_opts or {}
        self._cost_opts = cost_opts or {}
        self._riccati_mode = riccati_mode
        self._fused_rollout = fused_rollout
        self._scan_unroll = scan_unroll
        self._v_zz_reg = v_zz_reg

        self._mu = 0.0
        self._mu_min = 1e-6
        self._delta_0 = 2.0
        self._delta = self._delta_0

        self._Z_nominal = None
        self._U_nominal = None
        self._K = None
        self._on_iteration_cb = None

        self._solve_jit = jax.jit(
            partial(self._solve_impl),
            static_argnames=("encoding", "n_iterations_static",
                             "with_callback"))

    # -- jit plumbing --------------------------------------------------------

    def _emit_iteration(self, i, s, Z, U, J):
        """Stable host trampoline for user on_iteration callbacks: keeps
        the jitted solve cached across fit() calls with different
        callbacks (a per-call closure would retrace every time, and an
        unjitted solve dispatches op-by-op — catastrophic over a remote
        device transport)."""
        cb = self._on_iteration_cb
        if cb is not None:
            cb(int(i), iLQRState(int(s)), Z, U, J)

    def _solve_impl(self, model, cost, z0, U, opts, mu0, delta0, encoding,
                    n_iterations_static=None, with_callback=False):
        return solve(model, cost, z0, U, opts, encoding=encoding,
                     model_opts=self._model_opts, cost_opts=self._cost_opts,
                     mu0=mu0, delta0=delta0,
                     n_iterations=n_iterations_static,
                     on_iteration=(self._emit_iteration if with_callback
                                   else None))

    def _make_opts(self, n_iterations, tol, max_reg, u_min, u_max, alphas,
                   max_evals=None):
        if max_evals is None:
            max_evals = 2 * int(n_iterations) + 64
        return ILQROptions(
            n_iterations=n_iterations, tol=tol, max_reg=max_reg,
            mu_min=self._mu_min, delta_0=self._delta_0, alphas=alphas,
            u_min=None if u_min is None else jnp.asarray(u_min),
            u_max=None if u_max is None else jnp.asarray(u_max),
            max_evals=max_evals, riccati_mode=self._riccati_mode,
            fused_rollout=self._fused_rollout,
            scan_unroll=self._scan_unroll, v_zz_reg=self._v_zz_reg)

    # -- public API ----------------------------------------------------------

    def fit(self, U, encoding: StateEncoding = StateEncoding.DEFAULT,
            n_iterations=50, tol=5e-6, max_reg=1e10, quiet=False,
            on_iteration=None, u_min=None, u_max=None, **kwargs):
        """Determines the optimal path to minimize the cost (ref :237-316).

        Returns:
            Tuple (Z (N+1, nz), U (N, nu), state (iLQRState)).
        """
        U = jnp.asarray(U)
        z0 = self.env.get_state().encode(encoding)
        z0 = jnp.asarray(z0, U.dtype)
        self._reset_reg()

        opts = self._make_opts(n_iterations, tol, max_reg, u_min, u_max,
                               default_fit_alphas(U.dtype))

        self._on_iteration_cb = on_iteration
        with_callback = (on_iteration is not None
                         and _backend_supports_host_callbacks())
        emit_final = on_iteration is not None and not with_callback
        try:
            try:
                result = self._solve_jit(
                    self.model, self.cost, z0, U, opts,
                    jnp.asarray(self._mu, U.dtype),
                    jnp.asarray(self._delta, U.dtype),
                    encoding=encoding, with_callback=with_callback)
            except jax.errors.JaxRuntimeError:
                if not with_callback:
                    raise
                # Some remote backends cannot compile host callbacks inside
                # jitted while_loops (observed: the axon TPU tunnel fails
                # with "TPU backend setup/compile error"). Degrade to a
                # callback-free solve and report the final state once.
                result = self._solve_jit(
                    self.model, self.cost, z0, U, opts,
                    jnp.asarray(self._mu, U.dtype),
                    jnp.asarray(self._delta, U.dtype),
                    encoding=encoding, with_callback=False)
                emit_final = True
        finally:
            if on_iteration is not None:
                jax.effects_barrier()  # flush pending debug callbacks
            self._on_iteration_cb = None

        if emit_final:
            on_iteration(int(result.iterations) - 1,
                         iLQRState(int(result.state)), result.Z, result.U,
                         float(result.J_opt))

        self._store(result)
        return self._Z_nominal, self._U_nominal, iLQRState(int(result.state))

    def step(self, z0, U=None, i=0,
             encoding: StateEncoding = StateEncoding.DEFAULT, u_min=None,
             u_max=None, tol=5e-6, max_reg=1e10, **kwargs):
        """Evaluates a single optimization step of iLQR (reference :183)."""
        if U is None:
            U = self._U_nominal
        U = jnp.asarray(U)
        z0 = jnp.asarray(z0, U.dtype)
        opts = self._make_opts(1, tol, max_reg, u_min, u_max,
                               default_step_alphas(U.dtype), max_evals=64)
        result = self._solve_jit(self.model, self.cost, z0, U, opts,
                                 jnp.asarray(self._mu, U.dtype),
                                 jnp.asarray(self._delta, U.dtype),
                                 encoding=encoding,
                                 n_iterations_static=None)
        self._store(result)
        return iLQRState(int(result.state))

    def forward(self, z, i, encoding: StateEncoding = StateEncoding.DEFAULT,
                mpc=False, ignore_uncertainty=True, u_min=None, u_max=None,
                warm_reg=False, **kwargs):
        """Single-step optimal control (reference :318-362).

        mpc=False: feedback policy around the fitted nominal trajectory.
        mpc=True: receding-horizon re-optimization with warm-started U.

        warm_reg (mpc=True only): carry the regularization schedule
        (mu, delta) over from the previous MPC step instead of the
        reference's reset-to-zero (:356-358). The reference-faithful
        cold reset costs ~7 backward+line-search evaluations per step at
        H=200 (the mu escalation re-discovers the working regularization
        every step); warming it typically needs 1-2. Off by default for
        parity — a documented fast mode (docs/PERFORMANCE.md).
        """
        if not mpc:
            if self._U_nominal is None:
                raise RuntimeError(
                    "You need to either call fit or initialize _U_nominal")
            if self._Z_nominal is not None:
                if ignore_uncertainty:
                    x = decode_mean(z, encoding)
                    x_nom = decode_mean(self._Z_nominal[i], encoding)
                    dx = x - x_nom
                    D = x.shape[0]
                    du = self._K[i, :, :D] @ dx
                else:
                    dz = z - self._Z_nominal[i]
                    du = self._K[i] @ dz
                return self._U_nominal[i] + du
            return self._U_nominal[i]

        # MPC: one warm-started iLQR step from the current state, then
        # shift-left the nominal actions (reference :355-362).
        if not warm_reg:
            self._reset_reg()
        self.step(z, i=i, encoding=encoding, u_min=u_min, u_max=u_max,
                  **kwargs)
        u = self._U_nominal[0]
        self._U_nominal = jnp.concatenate(
            [self._U_nominal[1:], self._U_nominal[-1:]], axis=0)
        return u

    # -- checkpoint / resume ---------------------------------------------------

    def state_dict(self):
        """Warm-start state for checkpointing (the implicit persistence of
        the reference's Module attributes, ilqr.py:98-100, 167-169)."""
        return {
            "Z_nominal": self._Z_nominal,
            "U_nominal": self._U_nominal,
            "K": self._K,
            "mu": jnp.asarray(self._mu),
            "delta": jnp.asarray(self._delta),
        }

    def load_state_dict(self, state):
        """Restores warm-start state saved by :meth:`state_dict`."""
        self._Z_nominal = state.get("Z_nominal")
        self._U_nominal = state.get("U_nominal")
        self._K = state.get("K")
        if "mu" in state:
            self._mu = float(state["mu"])
        if "delta" in state:
            self._delta = float(state["delta"])
        return self

    # -- internals -----------------------------------------------------------

    def _store(self, result: ILQRResult):
        self._Z_nominal = result.Z
        self._U_nominal = result.U
        self._K = result.K
        self._mu = float(result.mu)
        self._delta = float(result.delta)

    def _reset_reg(self):
        self._mu = 0.0
        self._delta = self._delta_0
