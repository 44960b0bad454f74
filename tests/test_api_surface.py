"""API-surface parity with the reference package.

Every public symbol the reference exports (pddp/*/__init__.py __all__
lists) must be importable from the counterpart pddp_tpu module, so a
reference user can port imports mechanically (pddp -> pddp_tpu). Renamed
internals keep reference-name aliases (BSequential, bayesian_model, the
pddp_tpu.utils.encoding/gaussian_variable module paths).
"""

import importlib

import pytest

SURFACE = [
    # (module, reference __all__) — from /root/reference/pddp/__init__.py
    # and each subpackage __init__.
    ("pddp_tpu", ["controllers", "costs", "envs", "models", "utils",
                  "GaussianVariable", "StateEncoding"]),
    ("pddp_tpu.controllers", ["Controller", "iLQRController",
                              "PDDPController"]),
    ("pddp_tpu.costs", ["AggregateCost", "Cost", "QRCost",
                        "SaturatingQRCost"]),
    ("pddp_tpu.envs", ["Env", "GymEnv"]),
    ("pddp_tpu.models", ["DynamicsModel", "bnn"]),
    ("pddp_tpu.utils", ["angular", "autodiff", "classproperty",
                        "constraint", "encoding", "evaluation",
                        "gaussian_variable", "particles", "trajectory"]),
    ("pddp_tpu.examples", ["SampleProblems", "cartpole", "double_cartpole",
                           "pendulum", "rendezvous"]),
    ("pddp_tpu.models.bnn", ["BDropout", "BSequential", "CDropout",
                             "bayesian_model", "bnn_dynamics_model_factory",
                             "gaussian_log_likelihood"]),
    # Deeper symbols the reference scripts/notebooks use directly.
    ("pddp_tpu.utils.encoding", ["StateEncoding", "encode", "decode_mean",
                                 "decode_covar", "decode_var", "decode_std",
                                 "infer_encoded_state_size",
                                 "infer_state_size"]),
    ("pddp_tpu.utils.angular", ["augment_state", "reduce_state",
                                "augment_encoded_state"]),
    ("pddp_tpu.utils.constraint", ["constrain", "clamp", "boxqp",
                                   "constrain_env", "constrain_model"]),
    ("pddp_tpu.utils.particles", ["particulate_model", "particles_covar"]),
    ("pddp_tpu.utils.trajectory", ["mean_trajectory", "sample_trajectory",
                                   "trajectory_to_training_data"]),
    ("pddp_tpu.utils.evaluation", ["eval_cost", "eval_dynamics",
                                   "batch_eval_cost",
                                   "batch_eval_dynamics"]),
    ("pddp_tpu.utils.autodiff", ["grad", "jacobian", "batch_jacobian"]),
]


@pytest.mark.parametrize("module,names", SURFACE,
                         ids=[m for m, _ in SURFACE])
def test_reference_symbols_importable(module, names):
    m = importlib.import_module(module)
    missing = [n for n in names if not hasattr(m, n)]
    assert not missing, "missing reference API: {}".format(missing)
