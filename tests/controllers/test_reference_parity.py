"""Numerical parity against the REFERENCE's stored notebook outputs.

The reference ships executed notebooks with recorded cost curves and final
states (/root/reference/notebooks/known_dynamics/{pendulum,cartpole,
rendezvous}.ipynb — SURVEY §0 names them the convergence ground truth).
These tests re-create those exact configurations and pin this framework's
results against the REFERENCE's numbers (not merely against its own past,
which is what tests/golden does).

Tolerances are documented per pin. Two sources of irreducible spread:
the notebooks draw U0 from an unseeded torch.randn, and every env reset
adds 1e-2 Gaussian noise — so each pin uses a quantity that is robust to
both (initial-trajectory costs, converged costs/states of well-conditioned
problems, MPC end states).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (forward, iLQRController, iLQRState,
                                       trajectory_cost)
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import (CartpoleCost, CartpoleDynamicsModel,
                                        CartpoleEnv)
from pddp_tpu.examples.pendulum import (PendulumCost, PendulumDynamicsModel,
                                        PendulumEnv)
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel,
                                          RendezvousEnv)

ENC = StateEncoding.IGNORE_UNCERTAINTY


def test_cartpole_initial_cost_pins_reference():
    """Reference cartpole.ipynb cell 13 records the pre-accept cost of the
    initial trajectory (U0 = 0.1*randn, z0 ~ 1e-2 noise) as 29.147627.
    The quantity is dominated by the deterministic hanging cost over
    N=25 @ dt=0.1, so it pins the cost convention + rollout to ~1%."""
    env = CartpoleEnv(dt=0.1, seed=0)
    model = CartpoleDynamicsModel(dt=0.1)
    cost = CartpoleCost()
    z0 = env.get_state().encode(ENC)
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (25, 1))
    Z, _, _, L, *_ = forward(z0, U0, model, cost, ENC)
    J0 = float(L.sum())
    assert np.isclose(J0, 29.147627, rtol=2e-2), J0
    # trajectory_cost must agree with the in-scan accumulation.
    assert np.isclose(float(trajectory_cost(cost, Z, U0, ENC)), J0,
                      rtol=1e-6)


def test_pendulum_single_iteration_accepts_and_descends():
    """One constrained iLQR iteration through the fit() surface must be
    ACCEPTED with a cost decrease (reference pendulum.ipynb cell 13
    qualitative outcome). The former wide J band (250-650 around the
    reference's unseeded 451.5) is superseded by the tight seeded pins in
    test_reference_headtohead.py, which compare per-iteration J on
    identical inputs."""
    env = PendulumEnv(dt=0.1, seed=1)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = jax.random.normal(jax.random.PRNGKey(1), (40, 1))
    z0 = env.get_state().encode(ENC)
    _, _, _, L, *_ = forward(z0, U0, PendulumDynamicsModel(dt=0.1),
                             PendulumCost(), ENC)
    J_init = float(L.sum())
    Js = []
    Z, U, state = ctrl.fit(
        U0, encoding=ENC, n_iterations=1,
        u_min=jnp.array([-2.5]), u_max=jnp.array([2.5]),
        on_iteration=lambda i, s, Z, U, J: Js.append(float(J)))
    assert state == iLQRState.ACCEPTED
    assert Js[-1] < J_init


def test_rendezvous_converged_solution_pins_reference():
    """Reference rendezvous.ipynb cell 13: linear dynamics + quadratic cost
    make this an LQR with a unique optimum — the converged cost/state is
    independent of U0 up to the 1e-2 reset noise. Reference: CONVERGED at
    J = 48106.332 with final [x0 y0 x1 y1] =
    [2.6123717 -2.6290617 2.6085324 -2.6326635]."""
    env = RendezvousEnv(dt=0.1, seed=2)
    ctrl = iLQRController(env, RendezvousDynamicsModel(dt=0.1),
                          RendezvousCost())
    U0 = jax.random.normal(jax.random.PRNGKey(2), (200, 4))
    Z, U, state = ctrl.fit(U0, encoding=ENC, n_iterations=10, tol=1e-2)
    assert state in (iLQRState.CONVERGED, iLQRState.ACCEPTED)
    J = float(trajectory_cost(RendezvousCost(), Z, U, ENC))
    assert np.isclose(J, 48106.332, rtol=1e-2), J
    final = np.asarray(Z[-1, :4])
    ref_final = np.array([2.6123717, -2.6290617, 2.6085324, -2.6326635])
    np.testing.assert_allclose(final, ref_final, atol=0.15)
    # The two vehicles must actually meet (the cost's defining feature).
    assert np.linalg.norm(final[:2] - final[2:]) < 0.05


def _run_mpc(env, ctrl, U0, H, encoding, u_min, u_max, n_fit_iters=1):
    """The notebooks' MPC execution loop (pendulum.ipynb cell 16)."""
    ctrl.fit(U0, encoding=encoding, n_iterations=n_fit_iters,
             u_min=u_min, u_max=u_max, tol=0.0)
    for i in range(H):
        z = env.get_state().encode(encoding)
        u = ctrl(z, i, encoding, mpc=True, u_min=u_min, u_max=u_max)
        env.apply(u)
    return np.asarray(env.get_state().mean())


@pytest.mark.slow
def test_pendulum_mpc_swings_up_like_reference():
    """Reference pendulum.ipynb cell 16: after H = 3N = 120 MPC steps the
    pendulum balances upright — final planning state
    [+-3.1415925, ~1e-7], planning cost ~1e-8. Pin the physical outcome:
    |theta| = pi (mod 2pi) and near-zero velocity."""
    env = PendulumEnv(dt=0.1, seed=3)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = jax.random.normal(jax.random.PRNGKey(3), (40, 1))
    x = _run_mpc(env, ctrl, U0, H=120, encoding=ENC,
                 u_min=jnp.array([-2.5]), u_max=jnp.array([2.5]))
    theta = (x[0] + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(theta) - np.pi) < 0.1, x
    assert abs(x[1]) < 0.5, x


@pytest.mark.slow
def test_cartpole_mpc_swings_up_like_reference():
    """Reference cartpole.ipynb cell 16: after H = 75 MPC steps the pole is
    upright (theta -> -3.14158, x -> 0, planning cost ~7e-6)."""
    env = CartpoleEnv(dt=0.1, seed=4)
    ctrl = iLQRController(env, CartpoleDynamicsModel(dt=0.1), CartpoleCost())
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (25, 1))
    x = _run_mpc(env, ctrl, U0, H=75, encoding=ENC,
                 u_min=jnp.array([-10.0]), u_max=jnp.array([10.0]))
    theta = (x[2] + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(theta) - np.pi) < 0.15, x
    assert abs(x[3]) < 1.0, x


def test_rendezvous_one_iteration_near_optimal_like_reference():
    """Reference rendezvous.ipynb: iteration 2 already lands 0.28% above
    the converged optimum (48241.5 vs 48106.3) — the LQR-like problem is
    solved essentially in ONE Newton step. Pin that convergence *rate*:
    the first accepted iteration must come within 2% of the final cost."""
    env = RendezvousEnv(dt=0.1, seed=5)
    ctrl = iLQRController(env, RendezvousDynamicsModel(dt=0.1),
                          RendezvousCost())
    U0 = jax.random.normal(jax.random.PRNGKey(5), (200, 4))
    Js = []
    Z, U, state = ctrl.fit(U0, encoding=ENC, n_iterations=10, tol=1e-2,
                           on_iteration=lambda i, s, Z, U, J:
                           Js.append(float(J)))
    assert len(Js) >= 1
    assert Js[0] < 1.02 * Js[-1] + 1e-9, Js
