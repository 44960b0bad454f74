"""Seeded BNN-layer head-to-head parity against the torch reference.

tests/golden/bnn_parity.npz is produced by
scripts/ref_baseline/dump_bnn_parity.py: the REFERENCE
(/root/reference/pddp/models/bnn/modules.py) runs a float64 seeded
episode through its own ``batch_eval_dynamics`` derivative rollout and
dumps its weights, dropout noise buffers, cached ``eps_in``/``eps_out``
noise dicts, and the resulting (Z, F_z, F_u) trajectory.

These tests inject that state into ``BNNDynamicsModel`` — possible
precisely because this framework keeps the same randomness as explicit
pytree leaves — and pin, per step:

  * the encoded next-state distribution (mean + Cholesky covariance),
  * the full dynamics Jacobians F_z, F_u (the reference holds its
    inferred noise constant via .detach(), modules.py:347; this
    framework via the aux contract of ``eval_dynamics``).

Both sides run float64, so the observed divergence is bounded by
reassociation roundoff. Measured (2026-08-20, torch 2.x CPU dump):
max |Δz| = 5.3e-15, max |ΔF_z| = 6.3e-15, max |ΔF_u| = 4.7e-16 across
both cases — machine-epsilon agreement; tolerances sit ~1000x above.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import StateEncoding
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.models.bnn.network import CDropout, Linear
from pddp_tpu.struct import replace
from pddp_tpu.utils.evaluation import eval_dynamics

pytestmark = pytest.mark.proof

DATA = np.load(Path(__file__).resolve().parents[1] / "golden" /
               "bnn_parity.npz")
META = json.loads(DATA["meta_json"].tobytes().decode())
ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY


def _build_injected(case):
    """Our factory model with the reference's weights + noise injected."""
    kwargs = META["cases"][case]["kwargs"]
    horizon = META["cases"][case]["horizon"]
    cls = bnn_dynamics_model_factory(
        META["state_size"], META["action_size"], META["hidden"],
        angular_indices=tuple(META["angular_indices"]),
        non_angular_indices=tuple(META["non_angular_indices"]))
    model = cls.init(jax.random.PRNGKey(0),
                     n_particles=META["n_particles"], horizon=horizon,
                     use_predicted_std=kwargs.get("use_predicted_std",
                                                  False),
                     independent_noise=kwargs.get("independent_noise",
                                                  False),
                     dtype=jnp.float64)

    def arr(key):
        return jnp.asarray(DATA["{}_{}".format(case, key)])

    # torch Linear stores weight as (out, in); ours is (in, out).
    n_hidden = len(META["hidden"])
    names = ["fc_{}".format(i) for i in range(n_hidden)] + ["fc_out"]
    layers = tuple(
        Linear(W=arr("sd.model.{}.weight".format(nm)).T,
               b=arr("sd.model.{}.bias".format(nm)))
        for nm in names)
    dropouts = tuple(
        CDropout(logit_p=arr("drop.drop_{}.logit_p".format(i)),
                 temperature=arr("drop.drop_{}.temperature".format(i)),
                 reg=model.net.dropouts[i].reg,
                 noise=arr("drop.drop_{}.noise".format(i)))
        for i in range(n_hidden))
    net = replace(model.net, layers=layers, dropouts=dropouts)

    updates = dict(
        net=net,
        X_mean=arr("X_mean"), X_std=arr("X_std"),
        dX_mean=arr("dX_mean"), dX_std=arr("dX_std"),
        eps_in=arr("eps_in"))
    if "{}_eps_out".format(case) in DATA:
        updates["eps_out"] = arr("eps_out")
    return replace(model, **updates), horizon


@pytest.mark.parametrize("case", sorted(META["cases"]))
def test_bnn_rollout_and_jacobians_match_reference(case):
    model, horizon = _build_injected(case)
    z0 = jnp.asarray(DATA["{}_z0".format(case)])
    U = jnp.asarray(DATA["{}_U".format(case)])
    Z_ref = DATA["{}_Z".format(case)]
    Fz_ref = DATA["{}_F_z".format(case)]
    Fu_ref = DATA["{}_F_u".format(case)]

    z, state = z0, model.init_state()
    for i in range(horizon):
        z_next, state, aux = model.step(z, U[i], i, state, ENC)
        z_eval, F_z, F_u = eval_dynamics(model, z, U[i], i, encoding=ENC,
                                         aux=aux)
        # step and the aux-replay eval agree on the primal.
        np.testing.assert_allclose(np.asarray(z_eval), np.asarray(z_next),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(z_next), Z_ref[i + 1],
                                   rtol=1e-12, atol=1e-12,
                                   err_msg="{} step {} z".format(case, i))
        np.testing.assert_allclose(np.asarray(F_z), Fz_ref[i],
                                   rtol=1e-12, atol=1e-12,
                                   err_msg="{} step {} F_z".format(case, i))
        np.testing.assert_allclose(np.asarray(F_u), Fu_ref[i],
                                   rtol=1e-12, atol=1e-12,
                                   err_msg="{} step {} F_u".format(case, i))
        z = z_next


def test_injected_eps_is_reference_standardized():
    """The dumped eps_in has unit SAMPLE std (torch unbiased std) — the
    property _standardize(ddof=1) now matches."""
    eps = DATA["default_eps_in"]
    np.testing.assert_allclose(eps.mean(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(eps.std(axis=1, ddof=1), 1.0, atol=1e-12)
