"""Parallel-in-time Riccati backward (ops.riccati) tests.

The associative-scan backward must be numerically identical (f64, reg=0,
no clamping) to the sequential reverse-scan backward in controllers.ilqr —
both on synthetic convex LQR problems and on real problem derivatives —
and the full solver must converge equally well when it is enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (ILQROptions, backward, forward,
                                       iLQRState, solve)
from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.ops.riccati import parallel_backward


def _random_lqr(seed, N, nz, nu, dtype=jnp.float64):
    """Well-conditioned convex time-varying LQR local model."""
    rng = np.random.RandomState(seed)

    def psd(n, k, scale=1.0):
        A = rng.randn(k, n, n)
        return scale * (np.matmul(A, A.transpose(0, 2, 1)) / n
                        + 0.5 * np.eye(n))

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


@pytest.mark.parametrize("seed,N,nz,nu", [(0, 30, 5, 2), (1, 64, 3, 1),
                                          (2, 7, 8, 4), (3, 1, 2, 1)])
def test_matches_sequential_on_random_lqr(seed, N, nz, nu):
    derivs = _random_lqr(seed, N, nz, nu)
    k_s, K_s, ok_s = backward(*derivs, reg=0.0)
    k_p, K_p, ok_p = parallel_backward(*derivs, reg=0.0)
    assert bool(ok_s) and bool(ok_p)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("encoding", [
    StateEncoding.IGNORE_UNCERTAINTY,
    StateEncoding.VARIANCE_ONLY,
])
def test_matches_sequential_on_rendezvous(encoding):
    """Parity on real problem derivatives. Rendezvous: linear dynamics +
    convex QR cost, so the reg=0 recursion is healthy for both backends."""
    from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                              RendezvousDynamicsModel)
    N = 20
    model = RendezvousDynamicsModel(dt=0.1)
    cost = RendezvousCost()
    nz = infer_encoded_state_size(8, encoding)
    z0 = jnp.zeros(nz, jnp.float64).at[:8].set(
        jnp.asarray([-5.0, -5.0, 5.0, 5.0, 0.0, -2.0, 2.0, 0.0]))
    if encoding != StateEncoding.IGNORE_UNCERTAINTY:
        z0 = z0.at[8:].add(0.1)
    U = 0.1 * jnp.ones((N, 4), jnp.float64)

    derivs = forward(z0, U, model, cost, encoding)
    k_s, K_s, ok_s = backward(*derivs, reg=0.0)
    k_p, K_p, ok_p = parallel_backward(*derivs, reg=0.0)
    assert bool(ok_s) and bool(ok_p)
    np.testing.assert_allclose(k_p, k_s, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(K_p, K_s, rtol=1e-7, atol=1e-9)


def test_parallel_survives_indefinite_state_cost():
    """On angular-augmented costs the stage Hessian L_zz is indefinite; at
    reg=0 the sequential recursion (faithful to the reference's clamping)
    explodes to NaN and flags ok=False, while the exact associative-scan
    value recursion stays finite. Both are acceptable to the solver's retry
    loop; this pins the robustness difference down."""
    N = 20
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    nz = infer_encoded_state_size(2, encoding)
    z0 = jnp.zeros(nz, jnp.float64)
    U = 0.1 * jnp.ones((N, 1), jnp.float64)

    derivs = forward(z0, U, model, cost, encoding)
    k_s, K_s, ok_s = backward(*derivs, reg=0.0)
    k_p, K_p, ok_p = parallel_backward(*derivs, reg=0.0)
    assert not bool(ok_s)  # sequential must *detect* the blow-up
    assert bool(ok_p)
    assert bool(jnp.all(jnp.isfinite(k_p)))
    assert bool(jnp.all(jnp.isfinite(K_p)))


def test_solver_swingup_with_parallel_riccati():
    """End-to-end quality: pendulum swing-up (the known-dynamics notebook
    config) must still reach the top with the parallel backward enabled."""
    from pddp_tpu.examples.pendulum import PendulumEnv
    from pddp_tpu.controllers.ilqr import iLQRController

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (50, 1))

    z0 = env.get_state().encode(encoding)
    opts = ILQROptions(n_iterations=50, parallel_riccati=True)
    res = solve(model, cost, jnp.asarray(z0, U0.dtype), U0, opts,
                encoding=encoding)
    theta_T = float(res.Z[-1, 0])
    assert abs(abs(theta_T) - np.pi) < 0.2, theta_T


def test_parallel_backward_jits_and_vmaps():
    derivs = _random_lqr(5, 16, 4, 2)

    jitted = jax.jit(lambda *d: parallel_backward(*d, reg=0.0))
    k, K, ok = jitted(*derivs)
    assert k.shape == (16, 2) and K.shape == (16, 2, 4)

    # P5 batch axis: vmap over a batch of independent LQR problems.
    batch = [jnp.stack([a, a]) for a in derivs]
    k_b, K_b, ok_b = jax.vmap(
        lambda *d: parallel_backward(*d, reg=0.0))(*batch)
    assert k_b.shape == (2, 16, 2)
    np.testing.assert_allclose(k_b[0], k, rtol=1e-12, atol=0)
