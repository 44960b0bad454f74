"""Train the benchmark cartpole BNN once and save its parameters.

Round-3 verdict item 3: the batched-PDDP bench row uses an UNTRAINED
random-weight BNN, which makes every lane rejection-dominated by
construction (mean_evals ~ 14.9/15) — an unrepresentative workload for
the MFU/masking story. This script produces the trained counterpart:

 * data: 4096 cartpole transitions (dt=0.1, the reference notebook
   config) from the analytic model — half from exploratory rollouts out
   of the benchmark's start region, half uniform over the swing-up box —
   deterministic under a fixed seed;
 * training: ``fit_bnn`` (the scanned AMSGrad trainer), n_iter=4000,
   batch 128, lr=1e-3 (examples/experiment.py's recipe);
 * output: ``tests/golden/trained_bnn_cartpole.npz`` — the flattened
   net pytree + normalization buffers, loadable by
   ``pddp_tpu.models.bnn.load_bnn_npz`` (used by bench.py's trained row).

The saved arrays are keyed by flatten order of the SAME factory
configuration bench.py constructs (seed 0, [200,200], 100 particles), so
loading is a pure leaf replacement; provenance (seed, shapes, val error)
is stored alongside.

Usage: python scripts/make_trained_bnn.py [--out tests/golden/trained_bnn_cartpole.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleDynamicsModel
from pddp_tpu.models.bnn import (bnn_dynamics_model_factory, fit_bnn,
                                 save_bnn_npz)

DT = 0.1  # reference cartpole notebook config (N=25, dt=0.1)
SEED = 42
N_DATA = 4096
N_ITER = 4000


def _dynamics_fn(model):
    enc = StateEncoding.IGNORE_UNCERTAINTY

    def f(x, u):
        return model.apply(x, u, 0, (), encoding=enc)

    return jax.jit(jax.vmap(f))


def collect_data(key):
    """3/4 uniform over the swing-up operating box, 1/4 short exploratory
    rollouts from the bench start region — both through the analytic
    cartpole. Long random-action rollouts are deliberately avoided: at
    dt=0.1 they blow up (measured |theta_dot| up to 39 rad/s), and the
    heavy tail poisons the normalization statistics and the NLL."""
    model = CartpoleDynamicsModel(dt=DT)
    f = _dynamics_fn(model)
    k_box, k_roll_x0, k_roll_u = jax.random.split(key, 3)

    # Uniform box covering the swing-up phase portrait.
    lo = jnp.array([-2.0, -6.0, -jnp.pi, -8.0])
    hi = jnp.array([2.0, 6.0, jnp.pi, 8.0])
    n_box = 3 * N_DATA // 4
    kx, ku = jax.random.split(k_box)
    X_box = jax.random.uniform(kx, (n_box, 4), minval=lo, maxval=hi)
    U_box = jax.random.uniform(ku, (n_box, 1), minval=-20.0, maxval=20.0)

    # Short exploratory rollouts (bounded: 8 steps of |u| <= 10 from the
    # benchmark's start distribution stay within the box).
    n_ep, n_step = 128, 8
    x = jnp.zeros((n_ep, 4)) + 0.1 * jax.random.normal(k_roll_x0, (n_ep, 4))
    U_roll = jax.random.uniform(k_roll_u, (n_step, n_ep, 1),
                                minval=-10.0, maxval=10.0)
    Xs, Us = [], []
    for i in range(n_step):
        Xs.append(x)
        Us.append(U_roll[i])
        x = f(x, U_roll[i])
    X_roll = jnp.concatenate(Xs)[:N_DATA - n_box]
    U_roll = jnp.concatenate(Us)[:N_DATA - n_box]

    X = jnp.concatenate([X_box, X_roll])
    U = jnp.concatenate([U_box, U_roll])
    dX = f(X, U) - X
    return X, U, dX


def make_bench_model():
    """EXACTLY bench.py's model construction (seed 0, 100 particles)."""
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    return cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=26)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / "tests" / "golden" /
        "trained_bnn_cartpole.npz"))
    args = parser.parse_args()

    key = jax.random.PRNGKey(SEED)
    k_data, k_fit, k_val = jax.random.split(key, 3)
    X, U, dX = collect_data(k_data)
    print(f"data: X{X.shape} U{U.shape} dX{dX.shape}", flush=True)

    model = make_bench_model()
    t0 = time.time()
    model, losses = fit_bnn(model, X, U, dX, k_fit, n_iter=N_ITER,
                            batch_size=128, learning_rate=1e-3,
                            return_losses=True)
    print(f"trained in {time.time() - t0:.1f}s, "
          f"loss {float(losses[0]):.3f} -> {float(losses[-1]):.3f}",
          flush=True)

    # Held-out check: mean-prediction error on fresh transitions.
    Xv, Uv, dXv = collect_data(k_val)
    pred = jax.vmap(lambda x, u: model.forward_particles(
        jnp.broadcast_to(x, (model.n_particles,) + x.shape), u, 0
    ).mean(axis=0) - x)(Xv[:512], Uv[:512])
    err = float(jnp.abs(pred - dXv[:512]).mean())
    scale = float(jnp.abs(dXv[:512]).mean())
    print(f"val mean |pred dX - true dX| = {err:.4f} "
          f"(mean |dX| = {scale:.4f})", flush=True)

    meta = {
        "seed": SEED, "dt": DT, "n_data": N_DATA, "n_iter": N_ITER,
        "learning_rate": 1e-3, "batch_size": 128,
        "loss_first": float(losses[0]), "loss_last": float(losses[-1]),
        "val_mean_abs_err": err, "val_mean_abs_dx": scale,
        "generator": "scripts/make_trained_bnn.py",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    save_bnn_npz(model, args.out, meta)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
