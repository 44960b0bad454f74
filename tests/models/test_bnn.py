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
from pddp_tpu.models.bnn.network import (BDropout, CDropout, TLNDropout,
                                         bayesian_mlp)
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


@pytest.mark.proof
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


@pytest.mark.parametrize("dropout", [CDropout, BDropout, TLNDropout, None])
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


# ---------------------------------------------------------------------------
# Noise-inference contract (reference modules.py:333-348 — SURVEY §7 names
# this THE hard part: infer_noise_variables back-solves the previous step's
# particles through the covariance sqrt so the whole rollout is one fixed
# differentiable function).
# ---------------------------------------------------------------------------


def test_effective_eps_backsolve_reproduces_prev_output():
    """At i > 0 the inferred eps must satisfy mean + eps @ U == prev_output
    exactly (reference's gesv/trtrs back-solve, modules.py:333-348)."""
    model = _model()
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z = _z(enc)
    from pddp_tpu.encoding import decode_covar_sqrt
    mean = decode_mean(z, enc, STATE)
    U_chol = decode_covar_sqrt(z, enc, STATE)
    # Arbitrary (non-standardized) eps_true: the back-solve must recover it.
    eps_true = jax.random.normal(jax.random.PRNGKey(7), (P, STATE),
                                 jnp.float64)
    prev_output = mean + eps_true @ U_chol
    from pddp_tpu.models.bnn.model import _BNNState
    state = _BNNState(prev_output=prev_output)
    eps, mean_out, U_out = model._effective_eps(z, 1, state, enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps_true),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_out + eps @ U_out),
                               np.asarray(prev_output), rtol=1e-12)


def test_effective_eps_uses_presampled_at_step_zero():
    """At i == 0 there is no previous output: eps must be eps_in[0]."""
    model = _model()
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z = _z(enc)
    state = model.init_state()  # prev_output = zeros
    eps, _, _ = model._effective_eps(z, 0, state, enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(model.eps_in[0]))


def test_effective_eps_falls_back_on_singular_factor():
    """A singular covariance sqrt makes the back-solve non-finite: the
    model must fall back to the pre-sampled noise (reference guards this
    with its try/except; here the branchless isfinite gate)."""
    model = _model()
    enc = StateEncoding.VARIANCE_ONLY
    # Zero variance -> zero triangular factor -> division by zero.
    z = encode(jnp.array([0.2, -0.1]), V=jnp.array([0.0, 0.0]),
               encoding=enc)
    from pddp_tpu.models.bnn.model import _BNNState
    prev = jnp.ones((P, STATE), jnp.float64)
    eps, _, _ = model._effective_eps(z, 1, _BNNState(prev_output=prev), enc)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(model.eps_in[1]))


@pytest.mark.parametrize("infer", [True, False])
def test_rollout_derivatives_treat_inferred_eps_as_constant(infer):
    """F_z through apply() must equal finite differences with the step's
    noise FROZEN (aux constant): the inferred eps carries stop_gradient,
    so the local model differentiates the smooth pushforward only
    (reference detaches the back-solved eps the same way)."""
    model = _model(infer_noise_variables=infer)
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z0 = _z(enc)
    u = jnp.array([0.3])

    # Take a real step to get a physical aux at i=1.
    z1, state1, _ = model.step(z0, u, 0, model.init_state(), enc)
    _, _, aux1 = model.step(z1, u, 1, state1, enc)

    def f(zz):
        return model.apply(zz, u, 1, aux1, enc)

    J_ad = jax.jacfwd(f)(z1)
    h = 1e-6
    J_fd = np.zeros_like(np.asarray(J_ad))
    for k in range(z1.shape[0]):
        dz = jnp.zeros_like(z1).at[k].set(h)
        J_fd[:, k] = np.asarray((f(z1 + dz) - f(z1 - dz)) / (2 * h))
    np.testing.assert_allclose(np.asarray(J_ad), J_fd, rtol=1e-4, atol=1e-6)


def test_two_step_rollout_gradient_matches_fd_with_frozen_noise():
    """End-to-end: the gradient of a 2-step rollout cost through the
    solver's (step for aux, apply for derivatives) contract matches FD
    with the SAME frozen noise sequence."""
    model = _model()
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    u = jnp.array([0.3])

    def rollout_cost(z0, auxes):
        z1 = model.apply(z0, u, 0, auxes[0], enc)
        z2 = model.apply(z1, u, 1, auxes[1], enc)
        return jnp.sum(z2**2)

    z0 = _z(enc)
    # Record the actual noise the stateful rollout uses.
    z1, s1, aux0 = model.step(z0, u, 0, model.init_state(), enc)
    _, _, aux1 = model.step(z1, u, 1, s1, enc)
    auxes = (aux0, aux1)

    g_ad = jax.grad(rollout_cost)(z0, auxes)
    h = 1e-6
    g_fd = np.zeros(z0.shape[0])
    for k in range(z0.shape[0]):
        dz = jnp.zeros_like(z0).at[k].set(h)
        g_fd[k] = float((rollout_cost(z0 + dz, auxes) -
                         rollout_cost(z0 - dz, auxes)) / (2 * h))
    np.testing.assert_allclose(np.asarray(g_ad), g_fd, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# TLNDropout unit contract (reference modules.py:603-741 — unexported there,
# first-class here).
# ---------------------------------------------------------------------------


def test_tln_dropout_masks_positive_and_bounded():
    """Masks are exp(xi) with xi truncated to [a, b]: they live in
    [e^a, e^b] and are strictly positive."""
    key = jax.random.PRNGKey(0)
    d = TLNDropout.create(key, (P, 10), dtype=jnp.float64)
    x = jnp.ones((P, 10), jnp.float64)
    y = d.apply(x)
    masks = np.asarray(y)
    a, b = np.asarray(d.interval)
    assert np.all(masks > 0)
    assert np.all(masks >= np.exp(a) - 1e-12)
    assert np.all(masks <= np.exp(b) + 1e-12)


def test_tln_dropout_eval_masks_fixed_and_resampleable():
    key = jax.random.PRNGKey(1)
    d = TLNDropout.create(key, (P, 10), dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(2), (P, 10), jnp.float64)
    y1 = d.apply(x)
    y2 = d.apply(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    d2 = d.resample(jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(d2.apply(x)), np.asarray(y1))


def test_tln_dropout_regularization_differentiable_in_posterior():
    """The KL penalty depends on (and is differentiable in) the trainable
    posterior parameters, not the layer weights (reference :643-664)."""
    key = jax.random.PRNGKey(4)
    d = TLNDropout.create(key, (P, 10), dtype=jnp.float64)
    W = jnp.ones((10, 10), jnp.float64)

    def reg_of(logit_mu):
        from pddp_tpu.struct import replace
        return replace(d, logit_posterior_mean=logit_mu).regularization(
            W, None)

    g = jax.grad(reg_of)(d.logit_posterior_mean)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
    # Weight-independence.
    r1 = d.regularization(W, None)
    r2 = d.regularization(2.0 * W, None)
    np.testing.assert_allclose(float(r1), float(r2))


def test_fit_does_not_touch_buffer_leaves():
    """The reference's Parameter/buffer split: fit may update Linear
    weights and the trainable dropout posteriors ONLY — noise masks, reg
    scales, temperatures, TLN intervals are buffers and must come out of
    training bit-identical."""
    from pddp_tpu.models.bnn.network import trainable_mask

    for dropout in (CDropout, BDropout, TLNDropout):
        model = _model(dropout=dropout)
        key = jax.random.PRNGKey(2)
        kx, ku = jax.random.split(key)
        X = jax.random.normal(kx, (128, STATE), jnp.float64)
        U = jax.random.normal(ku, (128, ACTION), jnp.float64)
        dX = 0.1 * X
        fitted = model.fit(X, U, dX, key=jax.random.PRNGKey(3), n_iter=50,
                           learning_rate=1e-2)
        mask_leaves = jax.tree_util.tree_leaves(trainable_mask(model.net))
        before = jax.tree_util.tree_leaves(model.net)
        after = jax.tree_util.tree_leaves(fitted.net)
        assert len(before) == len(after) == len(mask_leaves)
        for m, a, b in zip(mask_leaves, after, before):
            if m:
                continue  # trainable — may change
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b))


ALL_ENCODINGS = ENCODINGS + [StateEncoding.FULL_COVARIANCE_MATRIX,
                             StateEncoding.IGNORE_UNCERTAINTY]


@pytest.mark.parametrize("encoding", ALL_ENCODINGS)
@pytest.mark.parametrize("kwargs", [
    {},
    {"use_predicted_std": True},
    {"use_predicted_std": True, "independent_noise": True},
    {"sample_input_distribution": False},
])
def test_structured_jacobians_match_generic_autodiff(encoding, kwargs):
    """BNNDynamicsModel.jacobians (the net-input-bottleneck factorization
    used by eval_dynamics) must agree with plain forward-mode autodiff of
    ``apply`` for every encoding and noise configuration."""
    from pddp_tpu.struct import replace

    model = replace(_model(**kwargs), structured_jacobians=True)
    z = _z(encoding)
    u = jnp.array([0.4])
    _, _, aux = model.step(z, u, 1, model.init_state(), encoding)

    res = model.jacobians(z, u, 1, aux, encoding=encoding)
    assert res is not None
    z_next, F_z, F_u = res

    def f(zz, uu):
        return model.apply(zz, uu, 1, aux, encoding)

    np.testing.assert_allclose(z_next, f(z, u), rtol=1e-12, atol=1e-12)
    F_z_ref = jax.jacfwd(f, argnums=0)(z, u)
    F_u_ref = jax.jacfwd(f, argnums=1)(z, u)
    np.testing.assert_allclose(F_z, F_z_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(F_u, F_u_ref, rtol=1e-9, atol=1e-11)


def test_structured_jacobians_constrained_action():
    """tanh action squashing flows through the structured F_u."""
    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    cls = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,),
        non_angular_indices=(1,), constrain_min=[-1.0], constrain_max=[1.0])
    from pddp_tpu.struct import replace

    model = replace(
        cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=H,
                 dtype=jnp.float64),
        structured_jacobians=True)
    z = _z(encoding)
    u = jnp.array([0.3])
    _, _, aux = model.step(z, u, 0, model.init_state(), encoding)
    z_next, F_z, F_u = model.jacobians(z, u, 0, aux, encoding=encoding)

    def f(uu):
        return model.apply(z, uu, 0, aux, encoding)

    np.testing.assert_allclose(F_u, jax.jacfwd(f)(u), rtol=1e-9, atol=1e-11)


def test_compute_dtype_bf16_rollout_close_to_f32():
    """compute_dtype=bfloat16 runs the eval-mode MLP at reduced precision:
    outputs stay in the input dtype, track the f32 model to bf16 tolerance,
    and training-mode forwards are NOT downcast."""
    from pddp_tpu.struct import replace

    cls32 = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,), non_angular_indices=(1,))
    m32 = replace(cls32.init(jax.random.PRNGKey(0), n_particles=P, horizon=H),
                  structured_jacobians=True)
    cls16 = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,), non_angular_indices=(1,),
        compute_dtype=jnp.bfloat16)
    m16 = replace(cls16.init(jax.random.PRNGKey(0), n_particles=P, horizon=H),
                  structured_jacobians=True)

    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z = _z(encoding).astype(jnp.float32)
    u = jnp.array([0.4], jnp.float32)
    z32, _, _ = m32.step(z, u, 0, m32.init_state(), encoding)
    z16, _, _ = m16.step(z, u, 0, m16.init_state(), encoding)
    assert z16.dtype == z32.dtype  # outputs stay at the input precision
    np.testing.assert_allclose(z16, z32, rtol=0.05, atol=0.02)
    assert float(jnp.max(jnp.abs(z16 - z32))) > 0  # it really downcast

    # Training mode (key given) must run at parameter precision: identical
    # outputs from both models.
    in_features = m32.net.layers[0].W.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(5), (P, in_features),
                          jnp.float32)
    o32 = m32.net(x, key=jax.random.PRNGKey(7))
    o16 = m16.net(x, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(o32), np.asarray(o16))

    # Structured jacobians stay finite and close under the downcast.
    _, _, aux = m16.step(z, u, 0, m16.init_state(), encoding)
    _, F_z16, _ = m16.jacobians(z, u, 0, aux, encoding=encoding)
    _, F_z32, _ = m32.jacobians(z, u, 0, aux, encoding=encoding)
    assert bool(jnp.all(jnp.isfinite(F_z16)))
    np.testing.assert_allclose(F_z16, F_z32, rtol=0.2, atol=0.05)


def test_matmul_dtype_bf16_compute_knob():
    """matmul_dtype=bfloat16 (the MXU *compute* knob, distinct from the
    compute_dtype memory knob): matmul operands are cast down with f32
    accumulation; outputs stay f32, track the full-precision model to
    operand-rounding tolerance, and training-mode forwards are bit-equal."""
    from pddp_tpu.struct import replace

    cls32 = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,), non_angular_indices=(1,))
    m32 = cls32.init(jax.random.PRNGKey(0), n_particles=P, horizon=H)
    clsmm = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,), non_angular_indices=(1,),
        matmul_dtype=jnp.bfloat16)
    mmm = clsmm.init(jax.random.PRNGKey(0), n_particles=P, horizon=H)

    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    z = _z(encoding).astype(jnp.float32)
    u = jnp.array([0.4], jnp.float32)
    z32, _, _ = m32.step(z, u, 0, m32.init_state(), encoding)
    zmm, _, _ = mmm.step(z, u, 0, mmm.init_state(), encoding)
    assert zmm.dtype == z32.dtype
    np.testing.assert_allclose(zmm, z32, rtol=0.05, atol=0.02)
    assert float(jnp.max(jnp.abs(zmm - z32))) > 0  # operands really downcast

    # Training mode must be untouched (full-precision matmuls).
    in_features = m32.net.layers[0].W.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(5), (P, in_features),
                          jnp.float32)
    o32 = m32.net(x, key=jax.random.PRNGKey(7))
    omm = mmm.net(x, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(o32), np.asarray(omm))


def test_structured_jacobians_flag_off_falls_back():
    """The default ("auto", None) resolves to the structured path (a
    measured batch-1 win since round 4 — docs/PERFORMANCE.md §8);
    False forces generic autodiff; the two agree numerically."""
    from pddp_tpu.struct import replace

    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    model = _model()  # default: structured_jacobians=None (auto)
    z = _z(encoding)
    u = jnp.array([0.4])
    _, _, aux = model.step(z, u, 0, model.init_state(), encoding)

    assert model.jacobians(z, u, 0, aux, encoding=encoding) is not None
    off = replace(model, structured_jacobians=False)
    assert off.jacobians(z, u, 0, aux, encoding=encoding) is None
    on = replace(model, structured_jacobians=True)
    z1, Fz1, Fu1 = eval_dynamics(on, z, u, 0, encoding=encoding, aux=aux)
    z2, Fz2, Fu2 = eval_dynamics(off, z, u, 0, encoding=encoding, aux=aux)
    np.testing.assert_allclose(z1, z2, rtol=1e-12)
    np.testing.assert_allclose(Fz1, Fz2, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Fu1, Fu2, rtol=1e-9, atol=1e-11)


def test_save_load_npz_round_trip(tmp_path):
    """save_bnn_npz -> load_bnn_npz into a DIFFERENT-seed model restores
    the exact net leaves + normalization buffers (the persistence contract
    bench.py's trained row relies on)."""
    from pddp_tpu.models.bnn import load_bnn_npz, save_bnn_npz
    from pddp_tpu.struct import replace

    model = _model()
    # X_mean/X_std normalize the AUGMENTED net input (non-angular +
    # sin/cos of angular + action = 4 here); dX buffers are state-sized.
    model = replace(model, X_mean=jnp.array([0.3, -0.1, 0.2, 0.0]),
                    X_std=jnp.array([1.5, 0.7, 0.9, 1.1]),
                    dX_mean=jnp.array([0.05, 0.01]),
                    dX_std=jnp.array([0.2, 0.4]))
    path = str(tmp_path / "m.npz")
    save_bnn_npz(model, path, meta={"note": "round-trip"})

    cls = bnn_dynamics_model_factory(
        STATE, ACTION, [10, 10], angular_indices=(0,),
        non_angular_indices=(1,))
    other = cls.init(jax.random.PRNGKey(99), n_particles=P, horizon=H,
                     dtype=jnp.float64)
    loaded = load_bnn_npz(other, path)
    for a, b in zip(jax.tree_util.tree_leaves(loaded.net),
                    jax.tree_util.tree_leaves(model.net)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(loaded.X_mean, model.X_mean)
    np.testing.assert_array_equal(loaded.dX_std, model.dX_std)
    # Same eval-mode prediction after loading.
    x = jnp.broadcast_to(jnp.array([0.1, 0.2]), (P, STATE))
    u = jnp.array([0.5])
    np.testing.assert_allclose(
        np.asarray(loaded.forward_particles(x, u, 0)),
        np.asarray(model.forward_particles(x, u, 0)), rtol=1e-12)


def test_committed_trained_cartpole_npz_is_accurate():
    """The committed trained-BNN artifact (scripts/make_trained_bnn.py)
    loads into EXACTLY bench.py's factory config and predicts the analytic
    cartpole within a few percent of the signal scale — guards both the
    flatten-order contract and against committing an underfit model."""
    import json
    import os

    from pddp_tpu.examples.cartpole import CartpoleDynamicsModel
    from pddp_tpu.models.bnn import load_bnn_npz

    path = os.path.join(os.path.dirname(__file__), "..", "golden",
                        "trained_bnn_cartpole.npz")
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=26)
    model = load_bnn_npz(model, path)

    meta = json.loads(np.load(path)["meta_json"].tobytes().decode())
    assert meta["val_mean_abs_err"] < 0.1 * meta["val_mean_abs_dx"]

    analytic = CartpoleDynamicsModel(dt=meta["dt"])
    enc = StateEncoding.IGNORE_UNCERTAINTY
    for x, u in [(jnp.array([0.0, 0.0, 0.1, 0.0]), jnp.array([1.0])),
                 (jnp.array([0.5, 1.0, -0.4, 2.0]), jnp.array([-5.0]))]:
        true_dx = analytic.apply(x, u, 0, (), encoding=enc) - x
        pred_dx = model.forward_particles(
            jnp.broadcast_to(x, (100, 4)), u, 0).mean(axis=0) - x
        np.testing.assert_allclose(np.asarray(pred_dx), np.asarray(true_dx),
                                   atol=0.3)
