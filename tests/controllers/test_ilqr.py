"""iLQR tests (mirrors reference tests/controllers/test_ilqr.py: shape
contracts for forward/backward, end-to-end fit smoke tests across
encodings; adds convergence-quality checks the reference can't make)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (backward, control_law, forward,
                                       iLQRController, iLQRState, solve,
                                       ILQROptions, trajectory_cost,
                                       default_fit_alphas)
from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size
from pddp_tpu.examples.pendulum import (PendulumCost, PendulumDynamicsModel,
                                        PendulumEnv)
from pddp_tpu.examples.cartpole import (CartpoleCost, CartpoleDynamicsModel,
                                        CartpoleEnv)

ENCODINGS = [
    StateEncoding.IGNORE_UNCERTAINTY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
]

# The reference parametrizes every controller test over all five encodings
# (tests/controllers/test_ilqr.py:49-51); the cheap shape-contract test
# covers the full set here, the expensive fit tests a representative subset.
ALL_ENCODINGS = ENCODINGS + [
    StateEncoding.STANDARD_DEVIATION_ONLY,
    StateEncoding.FULL_COVARIANCE_MATRIX,
]


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
def test_forward_backward_shapes(encoding):
    N = 3
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    nz = infer_encoded_state_size(2, encoding)
    z0 = jnp.zeros(nz).at[2:].add(0.1)
    U = 0.1 * jnp.ones((N, 1))

    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = forward(
        z0, U, model, cost, encoding)

    assert Z.shape == (N + 1, nz)
    assert F_z.shape == (N, nz, nz)
    assert F_u.shape == (N, nz, 1)
    assert L.shape == (N + 1,)
    assert L_z.shape == (N + 1, nz)
    assert L_u.shape == (N, 1)
    assert L_zz.shape == (N + 1, nz, nz)
    assert L_uz.shape == (N, 1, nz)
    assert L_uu.shape == (N, 1, 1)

    k, K, ok = backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu)
    assert k.shape == (N, 1)
    assert K.shape == (N, 1, nz)
    assert bool(ok)

    Z_new, U_new = control_law(model, Z, U, k, K, default_fit_alphas(Z.dtype),
                               encoding)
    assert Z_new.shape == (N + 1, 10, nz)
    assert U_new.shape == (N, 10, 1)

    J = trajectory_cost(cost, Z_new, U_new, encoding)
    assert J.shape == (10,)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_fit_pendulum_reaches_terminal_or_accepted(encoding):
    env = PendulumEnv(dt=0.1, seed=0)
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    ctrl = iLQRController(env, model, cost)
    U0 = 0.1 * jnp.ones((10, 1))
    Z, U, state = ctrl.fit(U0, encoding=encoding, n_iterations=5)
    assert state in (iLQRState.ACCEPTED, iLQRState.CONVERGED,
                     iLQRState.MAX_REG)
    assert Z.shape[0] == 11 and U.shape == (10, 1)
    assert bool(jnp.all(jnp.isfinite(Z))) and bool(jnp.all(jnp.isfinite(U)))


def test_fit_pendulum_swingup_quality():
    """Known-dynamics pendulum swing-up must actually reach the top
    (validates against the reference's known-dynamics notebook setting)."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    ctrl = iLQRController(env, model, cost)
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42), (50, 1))
    Z, U, state = ctrl.fit(U0, encoding=encoding, n_iterations=50)
    theta_T = float(Z[-1, 0])
    assert abs(abs(theta_T) - np.pi) < 0.2, theta_T


def test_fit_decreases_cost_monotonically_via_callback():
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = 0.1 * jnp.ones((12, 1))
    Js = []

    def on_iteration(i, state, Z, U, J):
        Js.append(float(J))

    ctrl.fit(U0, encoding=encoding, n_iterations=8,
             on_iteration=on_iteration)
    assert len(Js) >= 1
    accepted = np.asarray(Js)
    assert np.all(np.diff(accepted) <= 1e-6)


def test_fit_with_bounds_keeps_actions_in_bounds():
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = 0.1 * jnp.ones((10, 1))
    u_min, u_max = jnp.array([-1.0]), jnp.array([1.0])
    Z, U, state = ctrl.fit(U0, encoding=encoding, n_iterations=5,
                           u_min=u_min, u_max=u_max)
    assert bool(jnp.all(U >= u_min - 1e-6))
    assert bool(jnp.all(U <= u_max + 1e-6))


def test_mpc_forward_and_policy_forward():
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = 0.1 * jnp.ones((8, 1))
    Z, U, _ = ctrl.fit(U0, encoding=encoding, n_iterations=3)

    # Policy mode: feedback around nominal.
    z = Z[0] + 0.01
    u = ctrl.forward(z, 0, encoding=encoding, mpc=False)
    assert u.shape == (1,)

    # MPC mode: warm-started re-optimization + shift.
    U_before = ctrl._U_nominal
    u = ctrl.forward(z, 0, encoding=encoding, mpc=True)
    assert u.shape == (1,)
    assert ctrl._U_nominal.shape == U_before.shape


def test_solver_is_vmappable():
    """P5: the entire solver vmaps over a batch of problems."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    opts = ILQROptions(n_iterations=3, max_evals=12)

    B = 4
    z0s = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, 2))
    U0s = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 6, 1))

    def solve_one(z0, U0):
        r = solve(model, cost, z0, U0, opts, encoding=encoding)
        return r.J_opt, r.state

    J, states = jax.jit(jax.vmap(solve_one))(z0s, U0s)
    assert J.shape == (B,)
    assert bool(jnp.all(jnp.isfinite(J)))


def test_fit_rendezvous_quality():
    """Known-dynamics rendezvous (linear dynamics, convex QR cost) must
    bring both vehicles together (validates against the reference's
    known-dynamics notebook setting)."""
    from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                              RendezvousDynamicsModel,
                                              RendezvousEnv)
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = RendezvousEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, RendezvousDynamicsModel(dt=0.1),
                          RendezvousCost())
    U0 = 0.1 * jnp.ones((100, 4))
    Z, U, state = ctrl.fit(U0, encoding=encoding, n_iterations=50)
    gap_T = float(jnp.linalg.norm(Z[-1, 0:2] - Z[-1, 2:4]))
    gap_0 = float(jnp.linalg.norm(Z[0, 0:2] - Z[0, 2:4]))
    assert gap_T < 0.1 * gap_0, (gap_0, gap_T)


def test_fit_double_cartpole_improves():
    """The stiff 6-dim double cartpole: the solver must make substantial
    progress from a random initialization (the reference README disclaims
    full convergence; we assert a large cost decrease, not swing-up)."""
    from pddp_tpu.examples.double_cartpole import (DoubleCartpoleCost,
                                                   DoubleCartpoleDynamicsModel,
                                                   DoubleCartpoleEnv)
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = DoubleCartpoleEnv(dt=0.05, seed=0)
    ctrl = iLQRController(env, DoubleCartpoleDynamicsModel(dt=0.05),
                          DoubleCartpoleCost())
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (40, 1))
    Js = []
    ctrl.fit(U0, encoding=encoding, n_iterations=30,
             on_iteration=lambda i, s, Z, U, J: Js.append(float(J)))
    assert len(Js) >= 2
    assert Js[-1] < 0.5 * Js[0], (Js[0], Js[-1])


def test_backend_supports_host_callbacks_gating(monkeypatch):
    """In-graph callbacks must be pre-emptively disabled on tunnel
    backends whose remote compiler hangs on callback-bearing programs
    (the error-driven fallback never runs on a hang)."""
    from pddp_tpu.controllers.ilqr import _backend_supports_host_callbacks

    # On the CPU test backend: always supported (full per-iteration
    # telemetry), even with tunnel markers present.
    monkeypatch.setenv("AXON_LOOPBACK_RELAY", "1")
    assert _backend_supports_host_callbacks()

    # The override forces in-graph callbacks regardless.
    monkeypatch.setenv("PDDP_TPU_FORCE_INGRAPH_CALLBACKS", "1")
    assert _backend_supports_host_callbacks()


def test_linear_control_law_exact_for_linear_dynamics():
    """linear_control_law propagates deviations through the stored
    Jacobians (reference :726-761, bug fixed there). For LINEAR dynamics
    (rendezvous) the linearization is exact: it must match the full
    nonlinear control_law rollout to machine precision at every alpha."""
    from pddp_tpu.controllers.ilqr import linear_control_law
    from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                              RendezvousDynamicsModel)

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = RendezvousDynamicsModel(dt=0.1)
    cost = RendezvousCost()
    N = 15
    z0 = jnp.array([-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0],
                   jnp.float64)
    U = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (N, 4), jnp.float64)
    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = forward(
        z0, U, model, cost, encoding)
    k, K, ok = backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu)
    assert bool(ok)

    alphas = default_fit_alphas(jnp.float64)
    Z_nl, U_nl = control_law(model, Z, U, k, K, alphas, encoding)
    Z_lin, U_lin = linear_control_law(Z, U, F_z, F_u, k, K, alphas)
    np.testing.assert_allclose(np.asarray(Z_lin), np.asarray(Z_nl),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(U_lin), np.asarray(U_nl),
                               rtol=1e-9, atol=1e-9)


def test_linear_control_law_first_order_on_nonlinear_dynamics():
    """On nonlinear dynamics (pendulum regulating near upright, where the
    cost is locally convex and the recursion benign) the linearized
    rollout agrees with the nonlinear one to O(alpha^2)."""
    from pddp_tpu.controllers.ilqr import linear_control_law

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    N = 8
    z0 = jnp.array([np.pi - 0.3, 0.1], jnp.float64)
    U = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (N, 1), jnp.float64)
    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = forward(
        z0, U, model, cost, encoding)
    k, K, ok = backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu)
    assert bool(ok)

    errs, devs = [], []
    for alpha in (1e-2, 1e-1):
        alphas = jnp.array([alpha], jnp.float64)
        Z_nl, U_nl = control_law(model, Z, U, k, K, alphas, encoding)
        Z_lin, U_lin = linear_control_law(Z, U, F_z, F_u, k, K, alphas)
        errs.append(np.abs(np.asarray(Z_lin - Z_nl)).max())
        devs.append(np.abs(np.asarray(Z_nl - Z[:, None])).max())
    # Quadratic error decay: 10x smaller alpha -> ~100x smaller error.
    assert errs[0] < errs[1] / 20, errs
    # First-order agreement: the linearization error is a small fraction
    # of the actual deviation from the nominal at the small alpha.
    assert errs[0] < 0.1 * devs[0], (errs, devs)


def test_linear_control_law_respects_bounds():
    from pddp_tpu.controllers.ilqr import linear_control_law

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    N = 10
    z0 = jnp.array([0.0, 0.0], jnp.float64)
    U = jnp.zeros((N, 1), jnp.float64)
    u_min, u_max = jnp.array([-0.5]), jnp.array([0.5])
    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = forward(
        z0, U, model, cost, encoding, u_min=u_min, u_max=u_max)
    k, K, ok = backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu,
                        u_min=u_min, u_max=u_max, U=U)
    alphas = default_fit_alphas(jnp.float64)
    _, U_new = linear_control_law(Z, U, F_z, F_u, k, K, alphas,
                                  u_min=u_min, u_max=u_max)
    assert np.all(np.asarray(U_new) <= 0.5 + 1e-12)
    assert np.all(np.asarray(U_new) >= -0.5 - 1e-12)


def test_mpc_warm_reg_mode():
    """warm_reg=True carries (mu, delta) across MPC steps instead of the
    reference's cold reset — same control quality, fewer evals (the
    documented fast mode)."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = 0.1 * jnp.ones((10, 1))
    ctrl.fit(U0, encoding=encoding, n_iterations=5)

    z = ctrl._Z_nominal[0] + 0.01
    u_cold = ctrl.forward(z, 0, encoding=encoding, mpc=True)
    mu_after_cold = ctrl._mu
    u_warm = ctrl.forward(z, 1, encoding=encoding, mpc=True, warm_reg=True)
    assert u_cold.shape == (1,) and u_warm.shape == (1,)
    assert bool(jnp.all(jnp.isfinite(u_cold)))
    assert bool(jnp.all(jnp.isfinite(u_warm)))
    # Warm mode must have started from the stored schedule, not zero
    # (observable: it never wrote a mu below the stored value's floor
    # during its own solve; the stored mu stays a valid warm start).
    assert ctrl._mu >= 0.0 and mu_after_cold >= 0.0


def test_cost_in_scan_matches_post_pass():
    """The two cost placements in control_law (latency-optimized batched
    post-pass vs throughput-optimized in-scan accumulation) are the same
    math — candidate costs must agree to summation-order tolerance."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    N = 12
    z0 = jnp.array([0.2, -0.1], jnp.float64)
    U = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (N, 1), jnp.float64)
    Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu = forward(
        z0, U, model, cost, encoding)
    k, K, ok = backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=1.0)
    alphas = default_fit_alphas(jnp.float64)

    Z_a, U_a, J_a = control_law(model, Z, U, k, K, alphas, encoding,
                                cost=cost, cost_in_scan=False)
    Z_b, U_b, J_b = control_law(model, Z, U, k, K, alphas, encoding,
                                cost=cost, cost_in_scan=True)
    np.testing.assert_array_equal(np.asarray(Z_a), np.asarray(Z_b))
    np.testing.assert_array_equal(np.asarray(U_a), np.asarray(U_b))
    np.testing.assert_allclose(np.asarray(J_a), np.asarray(J_b),
                               rtol=1e-12)


def test_solve_with_cost_in_scan_option():
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    z0 = jnp.array([0.0, 0.0], jnp.float64)
    U0 = 0.1 * jnp.ones((10, 1), jnp.float64)
    r_a = solve(model, cost, z0, U0, ILQROptions(n_iterations=5),
                encoding=StateEncoding.IGNORE_UNCERTAINTY)
    r_b = solve(model, cost, z0, U0,
                ILQROptions(n_iterations=5, cost_in_scan=True),
                encoding=StateEncoding.IGNORE_UNCERTAINTY)
    np.testing.assert_allclose(float(r_a.J_opt), float(r_b.J_opt),
                               rtol=1e-10)


def test_line_search_survives_nan_candidates():
    """A diverged line-search candidate (NaN cost) must not poison the
    iteration: argmin skips non-finite candidates, so the step is still
    accepted from the healthy ones."""
    from pddp_tpu.costs.base import Cost
    from pddp_tpu.struct import pytree_dataclass

    inner = PendulumCost()

    @pytree_dataclass
    class NaNAboveThreshold(Cost):
        """Pendulum cost, but NaN whenever |u| > 3 (the aggressive
        alpha = 1 candidate trips it; backtracked candidates stay sane)."""

        def __call__(self, z, u, i, terminal=False,
                     encoding=StateEncoding.DEFAULT, **kwargs):
            J = inner(z, u, i, terminal=terminal, encoding=encoding,
                      **kwargs)
            if terminal or u is None:
                return J
            bad = jnp.any(jnp.abs(u) > 3.0, axis=-1)
            return jnp.where(bad, jnp.nan, J)

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = NaNAboveThreshold()
    z0 = jnp.array([0.0, 0.0], jnp.float64)
    # Large enough k-steps that alpha=1 exceeds |u|=3 on early iterations.
    U0 = 0.1 * jnp.ones((15, 1), jnp.float64)
    r = solve(model, cost, z0, U0, ILQROptions(n_iterations=8),
              encoding=encoding)
    assert iLQRState(int(r.state)) in (iLQRState.ACCEPTED,
                                       iLQRState.CONVERGED)
    assert bool(jnp.isfinite(r.J_opt))
    assert bool(jnp.all(jnp.abs(r.U) <= 3.0 + 1e-9))


def test_solve_with_approximate_hessians():
    """Gauss-Newton cost Hessians (reference evaluation.py:77-81) are a
    first-class solve option and still optimize the pendulum."""
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    z0 = jnp.array([0.0, 0.0], jnp.float64)
    U0 = 0.1 * jnp.ones((12, 1), jnp.float64)
    r = solve(model, cost, z0, U0,
              ILQROptions(n_iterations=8, approximate_hessians=True),
              encoding=StateEncoding.IGNORE_UNCERTAINTY)
    assert iLQRState(int(r.state)) in (iLQRState.ACCEPTED,
                                       iLQRState.CONVERGED)
    Z0, *_rest = forward(z0, U0, model, cost,
                         StateEncoding.IGNORE_UNCERTAINTY)
    J0 = float(_rest[2].sum())
    assert float(r.J_opt) < J0
