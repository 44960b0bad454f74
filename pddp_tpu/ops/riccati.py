"""Parallel-in-time Riccati recursion via associative scan.

The reference's backward pass is an O(N) sequential Python loop
(/root/reference/pddp/controllers/ilqr.py:627-672); our sequential
``lax.scan`` version (controllers/ilqr.py:backward) still has N dependent
steps of tiny matrix algebra — latency-bound on TPU (~9 us/step at
H=200). This module reformulates the affine-LQR backward pass as an
*associative* operation and evaluates it with ``jax.lax.associative_scan``
in O(log N) depth of batched (N-wide) matmuls/solves — the shape the MXU
wants (PAPERS.md: temporal parallelization of Riccati / dynamic
programming, arXiv:1809.06360 & Särkkä et al.).

Formulation. Each step contributes a *conditional value function*
element e = (A, b, C, eta, J) representing

    V(x, z) = min cost of starting at x and arriving at z
            = 1/2 (z - A x - b)^T C^+ (z - A x - b)
              + 1/2 x^T J x - eta^T x  (+ const)

Cross terms and linear terms are removed per step by completing the
square in u (requires L_uu > 0, which holds for QR-family costs with
R > 0). Composition of two adjacent elements (a then b) is associative:

    M = I + C_a J_b
    A = A_b M^{-1} A_a
    b = A_b M^{-1} (b_a + C_a eta_b) + b_b
    C = A_b M^{-1} C_a A_b^T + C_b
    eta = A_a^T (I + J_b C_a)^{-1} (eta_b - J_b b_a) + eta_a
    J = A_a^T (I + J_b C_a)^{-1} J_b A_a + J_a

A suffix scan of these elements yields every value function
V_i(x) = 1/2 x^T S_i x + s_i^T x (S_i = J, s_i = -eta) simultaneously;
the per-step gains k_i, K_i then evaluate in one vmap.

Semantics vs the sequential backward: identical when reg == 0 and no
eigenvalue clamping triggers (verified to ~1e-10 in f64 tests). With
reg > 0 this variant regularizes the *gains* (Q_uu + reg I at gain
computation) while the value recursion stays exact — a valid trust-region
scheme that differs from the reference's V-coupled regularization only in
the retry path. Constrained (boxqp) steps are not expressible as an
associative element; the solver falls back to the sequential pass there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.linalg import small_mm

__all__ = ["parallel_backward"]


def _combine(a, b):
    """Associative composition of conditional value functions (a then b).

    C1 and J2 are symmetric, so N = I + J2 C1 = (I + C1 J2)^T = M^T and a
    single batched inverse serves both half-updates (one LU per combine
    instead of two).
    """
    A1, b1, C1, e1, J1 = a
    A2, b2, C2, e2, J2 = b
    n = A1.shape[-1]
    I = jnp.eye(n, dtype=A1.dtype)

    M = I + small_mm(C1, J2)
    if n <= 4:
        from ..utils.linalg import small_inv
        Minv = small_inv(M)
    else:
        Minv = jnp.linalg.inv(M)
    A2Minv = small_mm(A2, Minv)
    A = small_mm(A2Minv, A1)
    b_ = jnp.squeeze(
        small_mm(A2Minv, (b1 + jnp.squeeze(
            small_mm(C1, e2[..., :, None]), -1))[..., :, None]), -1) + b2
    C = small_mm(small_mm(A2Minv, C1), jnp.swapaxes(A2, -1, -2)) + C2
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))

    # A1^T N^{-1} = A1^T (M^{-1})^T = (M^{-1} A1)^T.
    A1TNinv = jnp.swapaxes(small_mm(Minv, A1), -1, -2)
    rhs = e2 - jnp.squeeze(small_mm(J2, b1[..., :, None]), -1)
    eta = jnp.squeeze(small_mm(A1TNinv, rhs[..., :, None]), -1) + e1
    J = small_mm(small_mm(A1TNinv, J2), A1) + J1
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))

    return A, b_, C, eta, J


def _psd_clamp_inv_with_reg(Q_uu, reg):
    """Inverse of the eigenvalue-clamped, regularized Q_uu (mirrors
    controllers/ilqr._psd_clamp_with_reg)."""
    m = Q_uu.shape[-1]
    floor = jnp.asarray(1e-12, Q_uu.dtype)
    if m == 1:
        e = jnp.where(Q_uu < 0, floor, Q_uu) + reg
        return 1.0 / e
    from ..utils.linalg import SMALL_EIGH_N, small_eigh
    if m <= SMALL_EIGH_N:
        # This call sees the whole (N, m, m) horizon batch at once; the
        # unrolled Jacobi sweeps are elementwise over N (batched eigh
        # column-loops are not — see utils.linalg.small_eigh).
        e, E = small_eigh(Q_uu, sort=False)
    else:
        e, E = jnp.linalg.eigh(0.5 * (Q_uu + jnp.swapaxes(Q_uu, -1, -2)))
    e = jnp.where(e < 0, floor, e) + reg
    return small_mm(E / e[..., None, :], jnp.swapaxes(E, -1, -2))


def parallel_backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=0.0):
    """Riccati backward pass in O(log N) depth.

    Same interface/returns as controllers.ilqr.backward (unconstrained
    mode): (k (N, nu), K (N, nu, nz), ok).
    """
    del L  # values not needed for gains
    N, nu = L_u.shape
    nz = Z.shape[-1]
    dtype = Z.dtype
    reg = jnp.asarray(reg, dtype)

    L_z_run, L_zz_run = L_z[:-1], L_zz[:-1]
    l_z_T, l_zz_T = L_z[-1], L_zz[-1]

    # Complete the square in u to remove cross/linear control terms.
    # v = u + L_uu^{-1} (L_uz z + L_u):
    #   F~ = F_z - F_u L_uu^{-1} L_uz         (closed-loop-in-v dynamics)
    #   c~ = -F_u L_uu^{-1} L_u
    #   X~ = L_zz - L_uz^T L_uu^{-1} L_uz     (Schur state cost)
    #   r~ = L_z - L_uz^T L_uu^{-1} L_u
    if nu <= 4:
        from ..utils.linalg import small_inv
        Luu_inv = small_inv(L_uu)
        lsolve = lambda B: small_mm(Luu_inv, B)
    else:
        lsolve = lambda B: jnp.linalg.solve(L_uu, B)
    Li_uz = lsolve(L_uz)                                   # (N, nu, nz)
    Li_u = lsolve(L_u[..., :, None])                       # (N, nu, 1)
    F_tilde = F_z - small_mm(F_u, Li_uz)
    c_tilde = -jnp.squeeze(small_mm(F_u, Li_u), -1)
    L_uzT = jnp.swapaxes(L_uz, -1, -2)
    X_tilde = L_zz_run - small_mm(L_uzT, Li_uz)
    X_tilde = 0.5 * (X_tilde + jnp.swapaxes(X_tilde, -1, -2))
    r_tilde = L_z_run - jnp.squeeze(small_mm(L_uzT, Li_u), -1)
    # C = F_u L_uu^{-1} F_u^T (control reachability weighted by cost).
    C = small_mm(F_u, lsolve(jnp.swapaxes(F_u, -1, -2)))
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))

    # Elements for steps 0..N-1 plus the terminal element (A=0, C=0 encodes
    # the unconditional terminal value function).
    zmat = jnp.zeros((1, nz, nz), dtype)
    elems = (
        jnp.concatenate([F_tilde, zmat], axis=0),
        jnp.concatenate([c_tilde, jnp.zeros((1, nz), dtype)], axis=0),
        jnp.concatenate([C, zmat], axis=0),
        jnp.concatenate([-r_tilde, -l_z_T[None]], axis=0),
        jnp.concatenate([X_tilde, l_zz_T[None]], axis=0),
    )

    # Suffix combination: out[i] = e_i * e_{i+1} * ... * e_N. JAX implements
    # reverse=True by flipping inputs around a forward scan, which also flips
    # the (non-commutative) operator's argument order — so swap args here.
    _, _, _, eta, J = lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True)
    S = J       # (N+1, nz, nz): V_i(x) = 1/2 x^T S x + s^T x
    s = -eta    # (N+1, nz)

    S_next = S[1:]
    s_next = s[1:]

    # Gains from the true (untransformed) local model, vmapped over time.
    F_uT = jnp.swapaxes(F_u, -1, -2)
    Q_u = L_u + jnp.squeeze(small_mm(F_uT, s_next[..., :, None]), -1)
    S_F_z = small_mm(S_next, F_z)
    Q_uz = L_uz + small_mm(F_uT, S_F_z)
    Q_uu = L_uu + small_mm(F_uT, small_mm(S_next, F_u))
    Q_uu = 0.5 * (Q_uu + jnp.swapaxes(Q_uu, -1, -2))

    Q_uu_inv = _psd_clamp_inv_with_reg(Q_uu, reg)
    kK = -small_mm(Q_uu_inv,
                     jnp.concatenate([Q_u[..., :, None], Q_uz], axis=-1))
    k = kK[..., 0]
    K = kK[..., 1:]

    ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
    return k, K, ok
