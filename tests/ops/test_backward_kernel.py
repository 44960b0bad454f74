"""Fused Pallas Riccati backward (ops.backward_kernel) tests.

Interpret mode on CPU; numerics must be bit-level-close to the sequential
scan backward with identical regularization semantics, including active
Q_uu clamping, and the full solver must converge with the kernel enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (ILQROptions, backward, forward,
                                       solve)
from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.ops.backward_kernel import (pallas_backward,
                                          pallas_backward_nu1,
                                          supports_pallas_backward)


def _random_lqr(seed, N, nz, nu=1, dtype=jnp.float64):
    rng = np.random.RandomState(seed)

    def psd(n, k):
        A = rng.randn(k, n, n)
        return np.matmul(A, A.transpose(0, 2, 1)) / n + 0.5 * np.eye(n)

    F_z = jnp.asarray(
        np.stack([np.eye(nz) + 0.05 * rng.randn(nz, nz) for _ in range(N)]),
        dtype)
    F_u = jnp.asarray(0.1 * rng.randn(N, nz, nu), dtype)
    L_zz = jnp.asarray(psd(nz, N + 1), dtype)
    L_uu = jnp.asarray(psd(nu, N), dtype)
    L_uz = jnp.asarray(0.05 * rng.randn(N, nu, nz), dtype)
    L_z = jnp.asarray(rng.randn(N + 1, nz), dtype)
    L_u = jnp.asarray(rng.randn(N, nu), dtype)
    L = jnp.asarray(rng.randn(N + 1), dtype)
    Z = jnp.zeros((N + 1, nz), dtype)
    return Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu


@pytest.mark.parametrize("seed,N,nz", [(0, 30, 5), (1, 64, 3), (2, 1, 2)])
@pytest.mark.parametrize("reg", [0.0, 0.37])
def test_matches_scan_backward(seed, N, nz, reg):
    derivs = _random_lqr(seed, N, nz)
    k_s, K_s, ok_s = backward(*derivs, reg=reg)
    k_p, K_p, ok_p = pallas_backward_nu1(*derivs, reg=reg)
    assert bool(ok_s) and bool(ok_p)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("seed,N,nz,nu", [(1, 30, 8, 4), (3, 64, 10, 2),
                                          (4, 20, 6, 3)])
@pytest.mark.parametrize("reg", [0.0, 0.37])
def test_matches_scan_backward_wide_actions(seed, N, nz, nu, reg):
    """nu > 1 takes the in-kernel Jacobi eigen-clamp (small_eigh); must
    track the scan's jnp.linalg.eigh-based clamp to eigensolver tolerance.
    """
    derivs = _random_lqr(seed, N, nz, nu)
    k_s, K_s, ok_s = backward(*derivs, reg=reg)
    k_p, K_p, ok_p = pallas_backward(*derivs, reg=reg)
    assert bool(ok_s) and bool(ok_p)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-9, atol=1e-11)


def test_matches_scan_with_active_clamping():
    """On cartpole derivatives with moderate reg the Q_uu clamp triggers;
    the kernel's closed-form clamp must track the scan exactly."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()
    z0 = jnp.zeros(4, jnp.float64)
    U = 1e-2 * jnp.ones((8, 1), jnp.float64)
    derivs = forward(z0, U, model, cost, encoding)

    k_s, K_s, ok_s = backward(*derivs, reg=0.5)
    k_p, K_p, ok_p = pallas_backward_nu1(*derivs, reg=0.5)
    assert bool(ok_s) == bool(ok_p)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-12, atol=1e-14)


def test_supports_gate():
    assert supports_pallas_backward(jnp.zeros((5, 1)))
    assert supports_pallas_backward(jnp.zeros((5, 4)))
    assert not supports_pallas_backward(jnp.zeros((5, 5)))


def test_solver_swingup_with_kernel_backward():
    from pddp_tpu.examples.pendulum import PendulumEnv
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (50, 1))

    z0 = jnp.asarray(env.get_state().encode(encoding), U0.dtype)
    opts = ILQROptions(n_iterations=50, riccati_mode="kernel",
                       fused_rollout=True)
    res = solve(model, cost, z0, U0, opts, encoding=encoding)
    theta_T = float(res.Z[-1, 0])
    assert abs(abs(theta_T) - np.pi) < 0.2, theta_T


def test_kernel_mode_wide_actions_solve():
    """riccati_mode='kernel' with nu=4 takes the fused kernel end-to-end
    (it no longer falls back to the scan) and the solve must stay finite
    and match the scan-mode solve."""
    from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                              RendezvousDynamicsModel)
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = RendezvousDynamicsModel(dt=0.1)
    cost = RendezvousCost()
    z0 = jnp.asarray([-5.0, -5.0, 5.0, 5.0, 0.0, -2.0, 2.0, 0.0],
                     jnp.float64)
    U0 = 0.1 * jnp.ones((10, 4), jnp.float64)
    opts = ILQROptions(n_iterations=5, riccati_mode="kernel")
    res = solve(model, cost, z0, U0, opts, encoding=encoding)
    assert bool(jnp.isfinite(res.J_opt))
    opts_s = ILQROptions(n_iterations=5, riccati_mode="scan")
    res_s = solve(model, cost, z0, U0, opts_s, encoding=encoding)
    np.testing.assert_allclose(res.J_opt, res_s.J_opt, rtol=1e-8)
    np.testing.assert_allclose(res.U, res_s.U, rtol=1e-6, atol=1e-9)
