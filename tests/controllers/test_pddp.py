"""PDDP controller tests (mirrors reference tests/controllers/test_pddp.py:
end-to-end episodic fit with a real BNN, tiny horizon, max_trials bound —
a does-it-run test across encodings, :50-67)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import iLQRState
from pddp_tpu.controllers.pddp import PDDPController, _concat_datasets
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.pendulum import PendulumCost, PendulumEnv
from pddp_tpu.models.bnn import bnn_dynamics_model_factory

ENCODINGS = [
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
]

N = 4  # horizon
P = 8  # particles


def _controller(seed=0):
    env = PendulumEnv(dt=0.1, seed=seed)
    cost = PendulumCost()
    cls = bnn_dynamics_model_factory(
        2, 1, [8, 8], angular_indices=(0,), non_angular_indices=(1,))
    model = cls.init(jax.random.PRNGKey(seed), n_particles=P,
                     horizon=2 * N + 1, dtype=jnp.float64)
    return PDDPController(env, model, cost,
                          training_opts={"n_iter": 20,
                                         "learning_rate": 1e-3}), env


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_fit_runs_end_to_end(encoding):
    ctrl, env = _controller()
    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    trials = []

    def on_trial(trial, X, U):
        trials.append((int(trial), np.asarray(X).shape, np.asarray(U).shape))

    Z, U, state = ctrl.fit(U0, encoding=encoding, max_trials=2,
                           n_initial_sample_trajectories=2,
                           n_iterations=2, on_trial=on_trial,
                           u_min=jnp.array([-2.0]), u_max=jnp.array([2.0]))
    assert isinstance(state, iLQRState)
    assert Z.shape[0] == N + 1
    assert U.shape == (N, 1)
    assert bool(jnp.all(jnp.isfinite(Z)))
    assert bool(jnp.all(jnp.isfinite(U)))
    # 2 initial exploration trials + MPC collection trials.
    assert len(trials) >= 3
    # Initial rollouts are horizon N; MPC collection runs H = 2N.
    assert trials[0][1][0] == N
    assert trials[-1][1][0] == 2 * N


def test_eval_mode_is_pure_ilqr():
    """eval() skips data collection/retraining (reference pddp.py:176):
    the network weights must be bit-identical after fit."""
    ctrl, env = _controller()
    ctrl.eval()
    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    net_before = jax.tree_util.tree_leaves(ctrl.model.net)
    Z, U, state = ctrl.fit(U0,
                           encoding=StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
                           max_trials=5, train_on_start=False,
                           n_iterations=2, resample_model=False)
    # No BNN retraining happened: every model leaf is bit-identical (with
    # resample_model=False the episode noise is untouched too).
    net_after = jax.tree_util.tree_leaves(ctrl.model.net)
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(net_before, net_after))
    assert Z.shape[0] == N + 1


def _linear_leaves(net):
    """Weight/bias leaves only (resample legitimately replaces the dropout
    masks, which live in the same net pytree)."""
    out = []
    for layer in net.layers:
        if hasattr(layer, "weight"):
            out.append(np.asarray(layer.weight))
            out.append(np.asarray(layer.bias))
    return out


def test_eval_mode_resamples_but_does_not_train():
    """With the default resample_model=True eval() still draws fresh
    episode noise (reference pddp.py:158-165) but never touches weights."""
    ctrl, env = _controller()
    ctrl.eval()
    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    w_before = _linear_leaves(ctrl.model.net)
    eps_before = np.asarray(ctrl.model.eps_in)
    ctrl.fit(U0, encoding=StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
             max_trials=5, train_on_start=False, n_iterations=2)
    w_after = _linear_leaves(ctrl.model.net)
    assert all(np.array_equal(a, b) for a, b in zip(w_before, w_after))
    assert not np.allclose(eps_before, np.asarray(ctrl.model.eps_in))


def test_model_is_retrained_and_resampled():
    ctrl, env = _controller()
    net_before = ctrl.model.net
    eps_before = ctrl.model.eps_in
    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    ctrl.fit(U0, encoding=StateEncoding.VARIANCE_ONLY, max_trials=1,
             n_initial_sample_trajectories=1, n_iterations=1)
    # Training replaced network weights; resample replaced episode noise.
    changed_net = any(
        not np.allclose(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(net_before),
            jax.tree_util.tree_leaves(ctrl.model.net)))
    assert changed_net
    assert not np.allclose(eps_before, ctrl.model.eps_in)


def test_concat_datasets_fifo_cap():
    X1 = jnp.arange(6.0).reshape(3, 2)
    U1 = jnp.arange(3.0).reshape(3, 1)
    d1 = (X1, U1, X1)
    d2 = (X1 + 10, U1 + 10, X1 + 10)

    X, U, dX = _concat_datasets(d1, d2, max_dataset_size=4)
    assert X.shape == (4, 2)
    # FIFO: oldest rows dropped.
    np.testing.assert_allclose(X[0], X1[2])
    np.testing.assert_allclose(X[1:], X1 + 10)

    assert _concat_datasets(None, d1) is d1
    assert _concat_datasets(d1, None) is d1


def test_fixed_shape_dataset_reuses_training_executable():
    """With max_dataset_size padding, every trial's training scan sees one
    array shape — the growing dataset must NOT recompile the jitted BNN
    trainer per trial (SURVEY §7 hard parts: fixed-shape FIFO buffer)."""
    from pddp_tpu.models.bnn.model import _train_bnn_jit

    ctrl, env = _controller(seed=3)
    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    before = _train_bnn_jit._cache_size()
    ctrl.fit(U0, encoding=StateEncoding.STANDARD_DEVIATION_ONLY,
             max_trials=3, n_initial_sample_trajectories=2, n_iterations=2,
             max_dataset_size=64,
             u_min=jnp.array([-2.0]), u_max=jnp.array([2.0]))
    # One padded shape -> exactly one new training executable.
    assert _train_bnn_jit._cache_size() == before + 1
