"""Fused Pallas line-search kernel (ops.fused_rollout) tests.

Runs in interpret mode on CPU (the kernel auto-detects backend); numerics
must match the lax.scan control_law exactly, across problems, encodings,
and action bounds, and the solver must converge with the kernel enabled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (ILQROptions, backward, control_law,
                                       default_fit_alphas, local_model,
                                       rollout, solve)
from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel)
from pddp_tpu.ops.fused_rollout import (fused_control_law,
                                        supports_fused_rollout)


def _setup(model, cost, encoding, N, x0, nu, dtype=jnp.float64):
    from pddp_tpu.ops.riccati import parallel_backward
    nz = infer_encoded_state_size(model.state_size, encoding)
    z0 = jnp.zeros(nz, dtype).at[:model.state_size].set(jnp.asarray(x0, dtype))
    if encoding != StateEncoding.IGNORE_UNCERTAINTY:
        z0 = z0.at[model.state_size:].add(0.05)
    U = 0.05 * jnp.ones((N, nu), dtype)
    alphas = default_fit_alphas(dtype)
    Z, AUX = rollout(model, z0, U, encoding)
    derivs = local_model(Z, U, AUX, model, cost, encoding)
    # The exact-value-recursion backward stays finite on indefinite angular
    # costs (see test_riccati.py); sane gains are a test precondition.
    k, K, ok = parallel_backward(*derivs, reg=1.0)
    assert bool(jnp.all(jnp.isfinite(k))) and bool(jnp.all(jnp.isfinite(K)))
    return Z, U, k, K, alphas


CASES = [
    ("cartpole", CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
     [0.0, 0.0, 0.1, 0.0], 1),
    ("pendulum", PendulumDynamicsModel(dt=0.1), PendulumCost(),
     [0.1, 0.0], 1),
    ("rendezvous", RendezvousDynamicsModel(dt=0.1), RendezvousCost(),
     [-5.0, -5.0, 5.0, 5.0, 0.0, -2.0, 2.0, 0.0], 4),
]


@pytest.mark.parametrize("name,model,cost,x0,nu",
                         CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("encoding", [StateEncoding.IGNORE_UNCERTAINTY,
                                      StateEncoding.VARIANCE_ONLY])
def test_matches_scan_control_law(name, model, cost, x0, nu, encoding):
    assert supports_fused_rollout(model)
    Z, U, k, K, alphas = _setup(model, cost, encoding, N=12, x0=x0, nu=nu)

    Z_s, U_s, J_s = control_law(model, Z, U, k, K, alphas, encoding,
                                cost=cost)
    Z_f, U_f, J_f = fused_control_law(model, Z, U, k, K, alphas, encoding,
                                      cost=cost)
    np.testing.assert_allclose(Z_f, Z_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(U_f, U_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(J_f, J_s, rtol=1e-12, atol=1e-12)


def test_matches_scan_with_bounds():
    model, cost = PendulumDynamicsModel(dt=0.1), PendulumCost()
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    Z, U, k, K, alphas = _setup(model, cost, encoding, N=12, x0=[0.1, 0.0],
                                nu=1)
    u_min, u_max = jnp.array([-0.5]), jnp.array([0.5])

    Z_s, U_s, J_s = control_law(model, Z, U, k, K, alphas, encoding,
                                cost=cost, u_min=u_min, u_max=u_max)
    Z_f, U_f, J_f = fused_control_law(model, Z, U, k, K, alphas, encoding,
                                      cost=cost, u_min=u_min, u_max=u_max)
    assert bool(jnp.all(U_f >= u_min - 1e-12))
    assert bool(jnp.all(U_f <= u_max + 1e-12))
    np.testing.assert_allclose(Z_f, Z_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(J_f, J_s, rtol=1e-12, atol=1e-12)


def test_no_cost_variant():
    model, cost = PendulumDynamicsModel(dt=0.1), PendulumCost()
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    Z, U, k, K, alphas = _setup(model, cost, encoding, N=8, x0=[0.1, 0.0],
                                nu=1)
    Z_s, U_s = control_law(model, Z, U, k, K, alphas, encoding)
    Z_f, U_f = fused_control_law(model, Z, U, k, K, alphas, encoding)
    np.testing.assert_allclose(Z_f, Z_s, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(U_f, U_s, rtol=1e-12, atol=1e-12)


def test_solver_swingup_with_fused_rollout():
    """Pendulum swing-up must reach the top with the Pallas line search."""
    from pddp_tpu.examples.pendulum import PendulumEnv
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (50, 1))

    z0 = jnp.asarray(env.get_state().encode(encoding), U0.dtype)
    opts = ILQROptions(n_iterations=50, fused_rollout=True,
                       parallel_riccati=True)
    res = solve(model, cost, z0, U0, opts, encoding=encoding)
    theta_T = float(res.Z[-1, 0])
    assert abs(abs(theta_T) - np.pi) < 0.2, theta_T


def test_bnn_models_fall_back():
    """Stateful (particle BNN) models are rejected by the default gate
    (the current Mosaic compiler crashes on the kernel), but accepted
    with allow_stateful for experimentation."""
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory
    cls = bnn_dynamics_model_factory(2, 1, [8])
    model = cls.init(jax.random.PRNGKey(0), n_particles=4, horizon=5)
    assert not supports_fused_rollout(model)
    assert supports_fused_rollout(model, allow_stateful=True)


def test_stateful_bnn_kernel_matches_scan_interpret():
    """The stateful kernel path (rolling carry through the fori loop,
    per-step aux recorded into output refs) is exact vs the scan — pinned
    in interpret mode while Mosaic compilation is gated off."""
    from pddp_tpu.encoding import encode
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory
    from pddp_tpu.ops.riccati import parallel_backward

    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    N = 6
    cls = bnn_dynamics_model_factory(4, 1, [8, 8], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=8, horizon=N + 1,
                     dtype=jnp.float64)
    cost = CartpoleCost()
    z0 = encode(jnp.zeros(4, jnp.float64),
                V=1e-2 * jnp.ones(4, jnp.float64), encoding=encoding)
    U = 0.1 * jnp.ones((N, 1), jnp.float64)
    alphas = default_fit_alphas(jnp.float64)

    Z, AUX = rollout(model, z0, U, encoding)
    derivs = local_model(Z, U, AUX, model, cost, encoding)
    k, K, ok = parallel_backward(*derivs, reg=1.0)
    assert bool(jnp.all(jnp.isfinite(k)))

    Z_s, U_s, J_s, AUX_s = control_law(model, Z, U, k, K, alphas, encoding,
                                       cost=cost, with_aux=True)
    Z_f, U_f, J_f, AUX_f = fused_control_law(model, Z, U, k, K, alphas,
                                             encoding, cost=cost,
                                             with_aux=True, interpret=True)
    np.testing.assert_allclose(Z_f, Z_s, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(U_f, U_s, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(J_f, J_s, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(AUX_f, AUX_s, rtol=1e-10, atol=1e-10)
