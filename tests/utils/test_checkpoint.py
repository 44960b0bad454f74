"""Checkpoint/resume tests: pytree persistence (orbax) and controller
warm-start state round-trips (SURVEY §5 checkpoint subsystem)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import iLQRController
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.pendulum import (PendulumCost, PendulumDynamicsModel,
                                        PendulumEnv)
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.utils.checkpoint import (load_state_dict, restore_pytree,
                                       save_pytree, save_state_dict)


def test_bnn_model_roundtrip(tmp_path):
    cls = bnn_dynamics_model_factory(2, 1, [8], angular_indices=(0,),
                                     non_angular_indices=(1,))
    model = cls.init(jax.random.PRNGKey(0), n_particles=8, horizon=4)
    path = str(tmp_path / "model")
    save_pytree(path, model)

    template = cls.init(jax.random.PRNGKey(99), n_particles=8, horizon=4)
    restored = restore_pytree(path, template)

    for a, b in zip(jax.tree_util.tree_leaves(model),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(a, b)

    # Behavior parity after restore.
    enc = StateEncoding.VARIANCE_ONLY
    z = jnp.array([0.1, -0.2, 0.01, 0.02])
    u = jnp.array([0.4])
    z1, _, _ = model.step(z, u, 0, model.init_state(), enc)
    z2, _, _ = restored.step(z, u, 0, restored.init_state(), enc)
    np.testing.assert_allclose(z1, z2)


def test_restore_rejects_structure_mismatch(tmp_path):
    model = PendulumDynamicsModel(dt=0.1)
    path = str(tmp_path / "m")
    save_pytree(path, model)
    with pytest.raises(ValueError):
        restore_pytree(path, {"only": jnp.zeros(3)})


def test_controller_warm_start_roundtrip(tmp_path):
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    env = PendulumEnv(dt=0.1, seed=0)
    ctrl = iLQRController(env, PendulumDynamicsModel(dt=0.1), PendulumCost())
    U0 = 0.1 * jnp.ones((6, 1))
    ctrl.fit(U0, encoding=encoding, n_iterations=3)

    path = str(tmp_path / "state.npz")
    save_state_dict(path, ctrl.state_dict())

    ctrl2 = iLQRController(env, PendulumDynamicsModel(dt=0.1),
                           PendulumCost())
    ctrl2.load_state_dict(load_state_dict(path))

    np.testing.assert_allclose(ctrl2._Z_nominal, ctrl._Z_nominal)
    np.testing.assert_allclose(ctrl2._U_nominal, ctrl._U_nominal)
    np.testing.assert_allclose(ctrl2._K, ctrl._K)
    assert ctrl2._mu == ctrl._mu
    assert ctrl2._delta == ctrl._delta

    # The restored controller can act as a policy immediately.
    z = ctrl._Z_nominal[0] + 0.01
    u1 = ctrl.forward(z, 0, encoding=encoding)
    u2 = ctrl2.forward(z, 0, encoding=encoding)
    np.testing.assert_allclose(u1, u2)
