"""Particle-utility tests (reference has no dedicated particles test; the
contract is exercised through test_bnn. These cover particulate_model —
reference particles.py:22-133 — and particles_covar :136-149)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import (StateEncoding, decode_covar, decode_mean,
                               encode, infer_encoded_state_size)
from pddp_tpu.examples.pendulum import PendulumDynamicsModel
from pddp_tpu.utils.evaluation import eval_dynamics
from pddp_tpu.utils.particles import (ParticleDynamicsModel, particles_covar,
                                      particulate_model)

ENCODINGS = [
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
]


def test_particles_covar_matches_numpy():
    x = np.random.RandomState(0).randn(100, 3)
    C = particles_covar(jnp.asarray(x))
    np.testing.assert_allclose(C, np.cov(x.T), rtol=1e-6, atol=1e-8)


def _model(encoding, n_particles=100):
    inner = PendulumDynamicsModel(dt=0.1)
    return particulate_model(inner, jax.random.PRNGKey(0),
                             n_particles=n_particles, horizon=5,
                             dtype=jnp.float64)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_step_shapes_and_finiteness(encoding):
    model = _model(encoding)
    z = encode(jnp.array([0.1, -0.2]), V=jnp.array([0.01, 0.02]),
               encoding=encoding)
    u = jnp.array([0.5])
    z_next, state, aux = model.step(z, u, 0, model.init_state(), encoding)
    assert z_next.shape == (infer_encoded_state_size(2, encoding),)
    assert bool(jnp.all(jnp.isfinite(z_next)))
    assert aux.shape == (100, 2)
    assert state.prev_output.shape == (100, 2)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_apply_matches_step(encoding):
    """apply(z, u, i, aux) must reproduce step's output exactly — the
    contract Jacobians rely on (models/base.py)."""
    model = _model(encoding)
    z = encode(jnp.array([0.1, -0.2]), V=jnp.array([0.01, 0.02]),
               encoding=encoding)
    u = jnp.array([0.5])
    z_next, _, aux = model.step(z, u, 0, model.init_state(), encoding)
    z_apply = model.apply(z, u, 0, aux, encoding)
    np.testing.assert_allclose(z_next, z_apply, rtol=1e-10)


def test_moment_match_recovers_linear_pushforward():
    """For (nearly) linear dynamics, the particle moment match must agree
    with the analytic mean/covariance propagation."""
    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    model = _model(encoding, n_particles=1000)
    mean = jnp.array([0.05, 0.0])
    C = jnp.array([[1e-4, 0.0], [0.0, 1e-4]])
    z = encode(mean, C=C, encoding=encoding)
    u = jnp.array([0.0])
    z_next, _, _ = model.step(z, u, 0, model.init_state(), encoding)

    mean_next = decode_mean(z_next, encoding)
    x_next = model.inner(mean, u, 0, encoding=StateEncoding.IGNORE_UNCERTAINTY)
    np.testing.assert_allclose(mean_next, x_next, atol=2e-3)

    C_next = decode_covar(z_next, encoding)
    # Standardized particles make the sample covar match F C F^T closely.
    import jax as _jax
    F = _jax.jacfwd(lambda x: model.inner(
        x, u, 0, encoding=StateEncoding.IGNORE_UNCERTAINTY))(mean)
    np.testing.assert_allclose(C_next, F @ C @ F.T, rtol=0.2, atol=1e-6)


def test_resample_changes_noise_but_not_structure():
    encoding = StateEncoding.VARIANCE_ONLY
    model = _model(encoding)
    model2 = model.resample(jax.random.PRNGKey(7))
    assert model2.eps.shape == model.eps.shape
    assert not np.allclose(model.eps, model2.eps)
    # standardization: zero mean, unit SAMPLE std per column over particles
    # (ddof=1, matching torch.Tensor.std in reference particles.py:86)
    np.testing.assert_allclose(model2.eps.mean(axis=1), 0.0, atol=1e-8)
    np.testing.assert_allclose(model2.eps.std(axis=1, ddof=1), 1.0, atol=1e-6)


def test_jacobians_through_particles_finite():
    """eval_dynamics must produce finite F_z/F_u including the covariance
    block (what makes PDDP ≠ iLQR-on-the-mean)."""
    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    model = _model(encoding)
    z = encode(jnp.array([0.1, -0.2]), V=jnp.array([0.01, 0.02]),
               encoding=encoding)
    u = jnp.array([0.5])
    _, _, aux = model.step(z, u, 0, model.init_state(), encoding)
    z_next, F_z, F_u = eval_dynamics(model, z, u, 0, encoding=encoding,
                                     aux=aux)
    nz = z.shape[0]
    assert F_z.shape == (nz, nz)
    assert F_u.shape == (nz, 1)
    assert bool(jnp.all(jnp.isfinite(F_z)))
    assert bool(jnp.all(jnp.isfinite(F_u)))
    # Mean block depends on the mean: nontrivial derivative.
    assert float(jnp.abs(F_z[:2, :2]).sum()) > 0.1


# ---------------------------------------------------------------------------
# Noise-inference contract (reference particles.py:89-106: eps is inferred
# from the previous step's outputs so the rollout is one fixed
# differentiable function).
# ---------------------------------------------------------------------------


def test_effective_eps_backsolve_reproduces_prev_output():
    from pddp_tpu.encoding import decode_covar_sqrt, decode_mean
    from pddp_tpu.utils.particles import _ParticleState

    model = _model(None, n_particles=16)
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z = encode(jnp.array([0.1, -0.2], jnp.float64),
               V=jnp.array([0.01, 0.02], jnp.float64), encoding=enc)
    mean = decode_mean(z, enc, 2)
    U_chol = decode_covar_sqrt(z, enc, 2)
    eps_true = jax.random.normal(jax.random.PRNGKey(9), (16, 2), jnp.float64)
    prev = mean + eps_true @ U_chol
    eps, mean_out, U_out = model._effective_eps(
        z, 1, _ParticleState(prev_output=prev), enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps_true),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_out + eps @ U_out),
                               np.asarray(prev), rtol=1e-12)


def test_effective_eps_step_zero_and_singular_fallback():
    from pddp_tpu.utils.particles import _ParticleState

    model = _model(None, n_particles=16)
    enc = StateEncoding.VARIANCE_ONLY
    z = encode(jnp.array([0.1, -0.2], jnp.float64),
               V=jnp.array([0.01, 0.02], jnp.float64), encoding=enc)
    eps, _, _ = model._effective_eps(z, 0, model.init_state(), enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(model.eps[0]))

    z_sing = encode(jnp.array([0.1, -0.2], jnp.float64),
                    V=jnp.zeros(2, jnp.float64), encoding=enc)
    prev = jnp.ones((16, 2), jnp.float64)
    eps, _, _ = model._effective_eps(
        z_sing, 1, _ParticleState(prev_output=prev), enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(model.eps[1]))


def test_apply_gradient_matches_fd_with_frozen_noise():
    model = _model(None, n_particles=16)
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z0 = encode(jnp.array([0.1, -0.2], jnp.float64),
                V=jnp.array([0.01, 0.02], jnp.float64), encoding=enc)
    u = jnp.array([0.3], jnp.float64)
    z1, s1, _ = model.step(z0, u, 0, model.init_state(), enc)
    _, _, aux1 = model.step(z1, u, 1, s1, enc)

    def f(zz):
        return jnp.sum(model.apply(zz, u, 1, aux1, enc) ** 2)

    g_ad = jax.grad(f)(z1)
    h = 1e-6
    g_fd = np.zeros(z1.shape[0])
    for k in range(z1.shape[0]):
        dz = jnp.zeros_like(z1).at[k].set(h)
        g_fd[k] = float((f(z1 + dz) - f(z1 - dz)) / (2 * h))
    np.testing.assert_allclose(np.asarray(g_ad), g_fd, rtol=1e-5, atol=1e-7)
