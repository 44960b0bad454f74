"""BNN dynamics-model tests (mirrors reference tests/models/test_bnn.py:
forward shapes across encodings, deterministic stochastic forward via fixed
noise, Jacobian cross-checks :72-80, training smoke :44-80)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import (StateEncoding, decode_mean, encode,
                               infer_encoded_state_size)
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.models.bnn.losses import gaussian_log_likelihood
from pddp_tpu.models.bnn.network import BDropout, CDropout, bayesian_mlp
from pddp_tpu.utils.autodiff import batch_jacobian, jacobian
from pddp_tpu.utils.evaluation import eval_dynamics

ENCODINGS = [
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
]

STATE, ACTION, P, H = 2, 1, 16, 5


def _model(particles=False, dropout=CDropout, **kwargs):
    cls = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,),
        non_angular_indices=(1,), particles=particles,
        dropout_class=dropout)
    return cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=H,
                    dtype=jnp.float64, **kwargs)


def _z(encoding):
    return encode(jnp.array([0.2, -0.1]), V=jnp.array([0.01, 0.02]),
                  encoding=encoding)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_encoded_forward_shapes(encoding):
    model = _model()
    z = _z(encoding)
    u = jnp.array([0.4])
    z_next, state, aux = model.step(z, u, 0, model.init_state(), encoding)
    assert z_next.shape == (infer_encoded_state_size(STATE, encoding),)
    assert bool(jnp.all(jnp.isfinite(z_next)))
    assert aux.shape == (P, STATE)
    assert state.prev_output.shape == (P, STATE)


def test_particles_forward_shapes():
    model = _model(particles=True)
    X = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (P, STATE))
    u = jnp.array([0.4])
    X_next = model.forward_particles(X, u, 0)
    assert X_next.shape == (P, STATE)
    assert bool(jnp.all(jnp.isfinite(X_next)))


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_forward_is_deterministic_with_fixed_noise(encoding):
    """Fixed dropout masks + pre-sampled eps = one sampled function per
    episode (the property PDDP relies on; reference modules.py:320-358)."""
    model = _model()
    z = _z(encoding)
    u = jnp.array([0.4])
    out1, _, _ = model.step(z, u, 0, model.init_state(), encoding)
    out2, _, _ = model.step(z, u, 0, model.init_state(), encoding)
    np.testing.assert_allclose(out1, out2)


def test_resample_changes_the_sampled_function():
    encoding = StateEncoding.VARIANCE_ONLY
    model = _model()
    model2 = model.resample(jax.random.PRNGKey(9))
    z = _z(encoding)
    u = jnp.array([0.4])
    out1, _, _ = model.step(z, u, 0, model.init_state(), encoding)
    out2, _, _ = model2.step(z, u, 0, model2.init_state(), encoding)
    assert not np.allclose(out1, out2)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_apply_matches_step_given_aux(encoding):
    model = _model()
    z = _z(encoding)
    u = jnp.array([0.4])
    z_next, _, aux = model.step(z, u, 0, model.init_state(), encoding)
    np.testing.assert_allclose(model.apply(z, u, 0, aux, encoding), z_next,
                               rtol=1e-10)


@pytest.mark.parametrize("encoding", [StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
                                      StateEncoding.VARIANCE_ONLY])
def test_jacfwd_matches_jacrev_through_bnn(encoding):
    """The reference cross-checks the batched-jacobian trick against
    row-by-row jacobians (test_bnn.py:72-80); here jacfwd vs jacrev."""
    model = _model()
    z = _z(encoding)
    u = jnp.array([0.4])
    _, _, aux = model.step(z, u, 0, model.init_state(), encoding)

    def f(zz):
        return model.apply(zz, u, 0, aux, encoding)

    J_fwd = batch_jacobian(f)(z)
    J_rev = jacobian(f)(z)
    np.testing.assert_allclose(J_fwd, J_rev, rtol=1e-8, atol=1e-10)
    assert bool(jnp.all(jnp.isfinite(J_fwd)))


def test_jacobians_match_finite_differences():
    encoding = StateEncoding.VARIANCE_ONLY
    model = _model()
    z = _z(encoding)
    u = jnp.array([0.4])
    _, _, aux = model.step(z, u, 0, model.init_state(), encoding)
    z_next, F_z, F_u = eval_dynamics(model, z, u, 0, encoding=encoding,
                                     aux=aux)

    def f(zz, uu):
        return model.apply(zz, uu, 0, aux, encoding)

    eps = 1e-6
    for j in range(z.shape[0]):
        dz = jnp.zeros_like(z).at[j].set(eps)
        fd = (f(z + dz, u) - f(z - dz, u)) / (2 * eps)
        np.testing.assert_allclose(F_z[:, j], fd, atol=1e-5, rtol=1e-3)
    du = jnp.zeros_like(u).at[0].set(eps)
    fd = (f(z, u + du) - f(z, u - du)) / (2 * eps)
    np.testing.assert_allclose(F_u[:, 0], fd, atol=1e-5, rtol=1e-3)


@pytest.mark.parametrize("dropout", [CDropout, BDropout, None])
def test_fit_reduces_nll(dropout):
    """Training on synthetic pendulum-ish transitions reduces the NLL
    (reference fit, modules.py:131-198)."""
    model = _model(dropout=dropout)
    key = jax.random.PRNGKey(2)
    kx, ku = jax.random.split(key)
    N = 256
    X = jax.random.normal(kx, (N, STATE), jnp.float64)
    U = jax.random.normal(ku, (N, ACTION), jnp.float64)
    dX = 0.1 * jnp.concatenate(
        [X[:, 1:2], -jnp.sin(X[:, 0:1]) + U], axis=-1)

    def nll(m):
        from pddp_tpu.utils.angular import augment_state
        X_ = augment_state(X, m.angular_indices, m.non_angular_indices)
        X_ = jnp.concatenate([X_, U], axis=-1)
        # Training-mode forward (fresh masks of the batch's shape).
        out = m.net(m._normalize_input(X_), key=jax.random.PRNGKey(0))
        mean, log_std = jnp.split(out, 2, axis=-1)
        mean = mean * m.dX_std + m.dX_mean
        log_std = log_std + jnp.log(m.dX_std)
        return -float(gaussian_log_likelihood(
            dX, mean, jnp.exp(log_std)).mean())

    fitted = model.fit(X, U, dX, key=jax.random.PRNGKey(3), n_iter=300,
                       learning_rate=1e-2)
    assert nll(fitted) < nll(model)


def test_gaussian_log_likelihood_values():
    """Parity with reference losses.py:20-39 (the 2-pi constant is added
    once per sample, not per dimension — a reference quirk kept as-is)."""
    x = jnp.zeros((3,))
    ll = gaussian_log_likelihood(x, jnp.zeros(3), jnp.ones(3))
    np.testing.assert_allclose(float(ll), -0.5 * np.log(2 * np.pi),
                               rtol=1e-6)
    # Squared-error term and log-std term.
    ll2 = gaussian_log_likelihood(x, 2.0 * jnp.ones(3),
                                  np.e * jnp.ones(3))
    expected = (-0.5 * 3 * (2.0 / np.e) ** 2 - 3.0
                - 0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(float(ll2), expected, rtol=1e-6)


def test_bayesian_mlp_training_noise_differs_from_eval():
    net = bayesian_mlp(jax.random.PRNGKey(0), 3, 4, [8], n_particles=P,
                       dtype=jnp.float64)
    x = jnp.ones((P, 3))
    out_eval = net(x)
    out_train = net(x, key=jax.random.PRNGKey(1))
    assert out_eval.shape == (P, 4)
    assert not np.allclose(out_eval, out_train)


def test_cdropout_regularization_trainable():
    net = bayesian_mlp(jax.random.PRNGKey(0), 3, 4, [8, 8], n_particles=P,
                       dtype=jnp.float64)
    reg = net.regularization()
    assert bool(jnp.isfinite(reg))
    g = jax.grad(lambda n: n.regularization())(net)
    # The dropout rate parameter receives gradient signal.
    logit_grads = [d.logit_p for d in g.dropouts if d is not None]
    assert any(bool(jnp.abs(lg) > 0) for lg in logit_grads)


def test_ilqr_on_bnn_dynamics_runs():
    """iLQR over the learned probabilistic model — the inner loop of PDDP
    (reference test_pddp.py exercises this through the controller)."""
    from pddp_tpu.controllers.ilqr import ILQROptions, solve
    from pddp_tpu.examples.pendulum import PendulumCost

    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    model = _model()
    cost = PendulumCost()
    z0 = _z(encoding)
    U0 = 0.1 * jnp.ones((H - 1, ACTION), jnp.float64)
    opts = ILQROptions(n_iterations=2, max_evals=6)
    r = solve(model, cost, z0, U0, opts, encoding=encoding)
    assert bool(jnp.isfinite(r.J_opt))
    assert r.U.shape == U0.shape


def test_fit_reuses_one_executable():
    """Repeat fits on a same-shape dataset must reuse one compiled
    training scan (the jitted entry point is module-level; a per-fit
    jax.jit(closure) would re-trace every call — and PDDP refits the
    model every trial)."""
    from pddp_tpu.models.bnn.model import _train_bnn_jit

    model = _model()
    key = jax.random.PRNGKey(3)
    X = 0.1 * jax.random.normal(key, (32, STATE))
    U = 0.1 * jax.random.normal(key, (32, ACTION))
    dX = 0.01 * jax.random.normal(key, (32, STATE))

    model = model.fit(X, U, dX, key=key, n_iter=3, batch_size=8)
    size0 = _train_bnn_jit._cache_size()
    model.fit(2 * X, U, 0.5 * dX, key=jax.random.PRNGKey(4), n_iter=3,
              batch_size=8)
    assert _train_bnn_jit._cache_size() == size0
