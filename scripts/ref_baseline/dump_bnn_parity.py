"""Dump a seeded BNN-layer parity case from the torch reference.

Round-3 verdict item 6 (deep half): the reference's BNN dynamics keeps
its sampled randomness in mutable dicts/buffers —
``eps_in``/``eps_out``/``output`` on the model
(/root/reference/pddp/models/bnn/modules.py:266-385) and dropout noise
buffers inside each CDropout layer (:494-592). This framework stores the
SAME randomness as explicit pytree leaves (``eps_in``/``eps_out`` arrays,
``CDropout.noise``), which finally makes a bit-level head-to-head
possible: dump the reference's noise + weights for one seeded episode,
inject them into ``BNNDynamicsModel``, and the two implementations must
produce the same encoded rollout and dynamics Jacobians.

Protocol (mirrors the reference controller's derivative rollout,
ilqr.py:439-470): torch default dtype float64 so the comparison is
roundoff-crisp; for each step ``batch_eval_dynamics`` (evaluation.py:
240-300) records (z_next, F_z, F_u); the model caches eps_in[i] lazily on
first use and infers noise from the previous step's particle outputs
after i=0 (modules.py:320-358).

Two cases:
  * ``default``  — sample_input_distribution=True, infer_noise_variables
                   =True, use_predicted_std=False (the controller's
                   defaults).
  * ``predstd``  — use_predicted_std=True, independent_noise=True, which
                   additionally exercises the eps_out dict (:242-262).

Usage: python scripts/ref_baseline/dump_bnn_parity.py \
           [--out tests/golden/bnn_parity.npz]
"""

from __future__ import annotations

import argparse
import json
import platform
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE / "gym_stub"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(HERE))

import numpy as np  # noqa: E402
import torch  # noqa: E402

import torch04_compat  # noqa: E402

torch04_compat.install()
torch.set_default_dtype(torch.float64)

from pddp.models.bnn.modules import bnn_dynamics_model_factory  # noqa: E402
from pddp.utils.encoding import StateEncoding  # noqa: E402
from pddp.utils.evaluation import batch_eval_dynamics  # noqa: E402

STATE, ACTION, HIDDEN = 4, 1, [16, 16]
P, H = 8, 5
ANGULAR, NON_ANGULAR = [2], [0, 1, 3]
AUG = len(NON_ANGULAR) + 2 * len(ANGULAR)  # sin/cos augmentation

#: name -> (forward kwargs, horizon). predstd runs 3 steps: the
#: UNTRAINED net's predicted-std injection compounds the belief variance
#: every step and the reference's own encode-cholesky jitter ladder
#: (encoding.py:536-564) gives up at step 4 — 3 steps are enough to pin
#: the eps_out semantics while staying in the reference's stable range.
CASES = {
    "default": ({}, H),
    "predstd": ({"use_predicted_std": True, "independent_noise": True}, 3),
}


def build_model(seed):
    torch.manual_seed(seed)
    cls = bnn_dynamics_model_factory(
        STATE, ACTION, HIDDEN,
        angular_indices=torch.tensor(ANGULAR).long(),
        non_angular_indices=torch.tensor(NON_ANGULAR).long())
    model = cls(n_particles=P)
    model.eval()

    # Non-trivial normalization buffers (fit() would set these from data,
    # modules.py:167-173; fixed values keep the dump self-contained).
    x_mean = 0.1 * torch.arange(AUG + ACTION, dtype=torch.float64) - 0.2
    x_std = 0.5 + 0.25 * torch.arange(AUG + ACTION, dtype=torch.float64)
    dx_mean = 0.01 * torch.arange(STATE, dtype=torch.float64)
    dx_std = 0.8 + 0.1 * torch.arange(STATE, dtype=torch.float64)
    model.X_mean.data = x_mean
    model.X_std.data = x_std
    model.X_std_inv.data = x_std.reciprocal()
    model.dX_mean.data = dx_mean
    model.dX_std.data = dx_std
    model.dX_std_inv.data = dx_std.reciprocal()
    return model


def dump_case(name, kwargs, seed, arrays, horizon=H):
    model = build_model(seed)
    encoding = StateEncoding.UPPER_TRIANGULAR_CHOLESKY

    # One warm particle-shaped forward so every CDropout samples its
    # (P, width) noise buffer + concrete mask (lazy on first use,
    # modules.py:567-575), then dump the sampled state.
    from pddp.utils.encoding import encode
    x0 = torch.tensor([0.1, -0.3, 0.4, 0.2])
    z0 = encode(x0, C=torch.diag(torch.tensor([0.04, 0.09, 0.01, 0.16])),
                encoding=encoding)
    with torch.no_grad():
        model(z0, torch.zeros(ACTION), 0, encoding, **kwargs)
    # Wipe the episode noise the warm call cached; keep dropout noise.
    model.eps_in = {}
    model.eps_out = {}
    model.output = {}

    pre = "{}_".format(name)
    sd = model.state_dict()
    for k, v in sd.items():
        arrays[pre + "sd." + k] = v.detach().numpy()
    # CDropout concrete noise is derived from .noise + logit_p; dump the
    # uniform noise buffers explicitly by layer index for the injector.
    for mod_name, mod in model.model.named_children():
        if hasattr(mod, "logit_p"):
            arrays[pre + "drop." + mod_name + ".noise"] = \
                mod.noise.detach().numpy()
            arrays[pre + "drop." + mod_name + ".logit_p"] = \
                mod.logit_p.detach().numpy()
            arrays[pre + "drop." + mod_name + ".temperature"] = \
                mod.temperature.detach().numpy()

    torch.manual_seed(seed + 1)
    U = 0.5 * torch.randn(horizon, ACTION)

    Z = [z0]
    F_z, F_u = [], []
    z = z0
    for i in range(horizon):
        z_ = z.detach().requires_grad_()
        u_ = U[i].detach().requires_grad_()
        z_next, d_dz, d_du = batch_eval_dynamics(model, z_, u_, i, encoding,
                                                 **kwargs)
        Z.append(z_next.detach())
        F_z.append(d_dz.detach().numpy())
        F_u.append(d_du.detach().numpy())
        z = z_next

    arrays[pre + "z0"] = z0.numpy()
    arrays[pre + "U"] = U.numpy()
    arrays[pre + "Z"] = torch.stack(Z).numpy()
    arrays[pre + "F_z"] = np.stack(F_z)
    arrays[pre + "F_u"] = np.stack(F_u)
    arrays[pre + "eps_in"] = np.stack(
        [model.eps_in[i].detach().numpy() for i in range(horizon)])
    if model.eps_out:
        arrays[pre + "eps_out"] = np.stack(
            [model.eps_out[i].detach().numpy() for i in range(horizon)])
    arrays[pre + "X_mean"] = model.X_mean.numpy()
    arrays[pre + "X_std"] = model.X_std.numpy()
    arrays[pre + "dX_mean"] = model.dX_mean.numpy()
    arrays[pre + "dX_std"] = model.dX_std.numpy()
    print("{}: |Z_final|={:.6f}".format(name, float(Z[-1].norm())),
          file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[2] / "tests" / "golden" /
        "bnn_parity.npz"))
    args = parser.parse_args()

    arrays = {}
    for name, (kwargs, horizon) in CASES.items():
        dump_case(name, kwargs, seed=1234, arrays=arrays, horizon=horizon)

    meta = {
        "state_size": STATE, "action_size": ACTION, "hidden": HIDDEN,
        "n_particles": P, "horizon": H,
        "angular_indices": ANGULAR, "non_angular_indices": NON_ANGULAR,
        "encoding": "UPPER_TRIANGULAR_CHOLESKY",
        "cases": {k: {"kwargs": v[0], "horizon": v[1]}
                  for k, v in CASES.items()},
        "torch": torch.__version__, "host": platform.node(),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "generator": "scripts/ref_baseline/dump_bnn_parity.py",
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(args.out, **arrays)
    print("wrote {} ({} bytes)".format(args.out,
                                       Path(args.out).stat().st_size),
          file=sys.stderr)


if __name__ == "__main__":
    main()
