"""Backward-pass regularization modes.

The reference implements TWO regularization schemes in its Riccati
recursion (reference ilqr.py:529-674): the default eigen-clamped Q_uu
regularization (:631-636) and the V_zz-regularized Cholesky mode
(:584-625). Both are pinned here against an independent numpy
re-derivation of the recursion, and the v_zz mode is exercised through
the public controller.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (ILQROptions, backward, forward,
                                       iLQRController, iLQRState, solve)
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.pendulum import (PendulumCost, PendulumDynamicsModel,
                                        PendulumEnv)

IGN = StateEncoding.IGNORE_UNCERTAINTY


def _random_problem(key, N=12, nz=4, nu=2, dtype=np.float64):
    """Random local quadratic model with PSD cost blocks."""
    rng = np.random.default_rng(key)
    F_z = 0.9 * rng.normal(size=(N, nz, nz)) / np.sqrt(nz)
    F_u = rng.normal(size=(N, nz, nu))
    L_z = rng.normal(size=(N + 1, nz))
    L_u = rng.normal(size=(N, nu))

    def psd(n, count):
        A = rng.normal(size=(count, n, n))
        return np.einsum("bij,bkj->bik", A, A) / n + 0.1 * np.eye(n)

    L_zz = psd(nz, N + 1)
    L_uu = psd(nu, N)
    L_uz = 0.1 * rng.normal(size=(N, nu, nz))
    Z = rng.normal(size=(N + 1, nz))
    L = rng.normal(size=(N + 1,))
    return tuple(
        jnp.asarray(a, dtype)
        for a in (Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu))


def _numpy_backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg,
                    v_zz_reg):
    """Straight-line numpy transcription of the reference recursion
    (reference :584-672), independent of the scan implementation."""
    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = map(
        np.asarray, (Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu))
    N, nu = L_u.shape
    nz = Z.shape[-1]
    V_z = L_z[-1].copy()
    V_zz = L_zz[-1].copy()
    ks, Ks = np.zeros((N, nu)), np.zeros((N, nu, nz))
    for i in reversed(range(N)):
        Q_z = L_z[i] + F_z[i].T @ V_z
        Q_u = L_u[i] + F_u[i].T @ V_z
        Q_zz = L_zz[i] + F_z[i].T @ V_zz @ F_z[i]
        Q_zz = 0.5 * (Q_zz + Q_zz.T)
        Q_uz = L_uz[i] + F_u[i].T @ V_zz @ F_z[i]
        Q_uu = L_uu[i] + F_u[i].T @ V_zz @ F_u[i]
        Q_uu = 0.5 * (Q_uu + Q_uu.T)

        if v_zz_reg:
            V_zz_r = V_zz + reg * np.eye(nz)
            Q_uz_r = L_uz[i] + F_u[i].T @ V_zz_r @ F_z[i]
            Q_uu_r = L_uu[i] + F_u[i].T @ V_zz_r @ F_u[i]
            Q_uu_r = 0.5 * (Q_uu_r + Q_uu_r.T)
            k = -np.linalg.solve(Q_uu_r, Q_u)
            K = -np.linalg.solve(Q_uu_r, Q_uz_r)
        else:
            e, E = np.linalg.eigh(Q_uu)
            e = np.where(e < 0, 1e-12, e) + reg
            Q_uu_inv = (E / e[None, :]) @ E.T
            k = -Q_uu_inv @ Q_u
            K = -Q_uu_inv @ Q_uz

        ks[i], Ks[i] = k, K
        V_z = Q_z + K.T @ Q_u + K.T @ Q_uu @ k + Q_uz.T @ k
        V_zz = Q_zz + K.T @ Q_uu @ K + K.T @ Q_uz + Q_uz.T @ K
        V_zz = 0.5 * (V_zz + V_zz.T)
    return ks, Ks


@pytest.mark.proof
@pytest.mark.parametrize("v_zz_reg", [False, True])
@pytest.mark.parametrize("reg", [0.0, 0.37])
def test_backward_matches_numpy_recursion(v_zz_reg, reg):
    data = _random_problem(0)
    k, K, ok = backward(*data, reg=reg, v_zz_reg=v_zz_reg)
    assert bool(ok)
    k_np, K_np = _numpy_backward(*data, reg=reg, v_zz_reg=v_zz_reg)
    np.testing.assert_allclose(np.asarray(k), k_np, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K), K_np, rtol=1e-8, atol=1e-10)


def test_vzz_reg_zero_matches_default_mode():
    """At reg=0 both modes solve the same unregularized system."""
    data = _random_problem(1)
    k0, K0, ok0 = backward(*data, reg=0.0, v_zz_reg=False)
    k1, K1, ok1 = backward(*data, reg=0.0, v_zz_reg=True)
    assert bool(ok0) and bool(ok1)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1), rtol=1e-7,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(K0), np.asarray(K1), rtol=1e-7,
                               atol=1e-9)


def test_vzz_reg_constrained_matches_bounds():
    """Constrained v_zz mode: boxqp solutions stay within the bounds and
    the recursion stays finite."""
    data = _random_problem(2)
    N, nu = data[5].shape
    U = jnp.asarray(np.random.default_rng(3).normal(size=(N, nu)))
    u_min = -0.5 * jnp.ones(nu)
    u_max = 0.5 * jnp.ones(nu)
    k, K, ok = backward(*data, reg=0.1, v_zz_reg=True, u_min=u_min,
                        u_max=u_max, U=U)
    assert bool(ok)
    # k is a *delta* from U: U + k must satisfy the box.
    U_new = np.asarray(U) + np.asarray(k)
    assert np.all(U_new <= np.asarray(u_max) + 1e-8)
    assert np.all(U_new >= np.asarray(u_min) - 1e-8)
    assert np.all(np.isfinite(np.asarray(K)))


def test_controller_vzz_reg_swings_up():
    """The v_zz_reg mode is reachable through the public controller and
    solves the known-dynamics pendulum swing-up."""
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost(),
                          v_zz_reg=True)
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (50, 1))
    Z, U, state = ctrl.fit(U0, encoding=IGN, n_iterations=50)
    assert state in (iLQRState.ACCEPTED, iLQRState.CONVERGED)
    theta_T = float(Z[-1, 0])
    assert abs(abs(theta_T) - np.pi) < 0.2, theta_T


def test_solve_vzz_reg_option():
    """solve() honors ILQROptions.v_zz_reg (functional API)."""
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    z0 = jnp.array([0.0, 0.0], jnp.float64)
    U0 = 0.1 * jnp.ones((20, 1), jnp.float64)
    r = solve(model, cost, z0, U0,
              ILQROptions(n_iterations=10, v_zz_reg=True), encoding=IGN)
    r0 = solve(model, cost, z0, U0, ILQROptions(n_iterations=10),
               encoding=IGN)
    assert bool(jnp.isfinite(r.J_opt))
    # Both modes optimize; they need not agree exactly but should land in
    # the same cost basin on this easy problem.
    assert float(r.J_opt) < 1.5 * float(r0.J_opt) + 1e-6
