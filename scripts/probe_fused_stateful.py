"""Mosaic compile probes for the stateful fused-rollout kernel.

Round-2 record: the full stateful BNN line-search kernel SIGABRTs the
Mosaic compiler, and one compile attempt wedged the machine's shared
remote-compile helper (CLAUDE.md).  This script binary-searches the
trigger: each stage compiles ONE suspect piece of the BNN step inside a
minimal Pallas kernel at the bench shapes (A=10 candidates, P=100
particles, cartpole n=4, net [6->200->200->8]).

Run each stage in its own subprocess with a timeout, and health-check the
shared helper with a fresh odd-shaped matmul afterwards:

    timeout 300 python scripts/probe_fused_stateful.py <stage>

Stages (least to most complete):
    tria   in-kernel triangular transpose solve (+ where fallback)
           [the OLD pre-redesign form — t1/t3 kills; do NOT run on TPU]
    mm     in-kernel moment matching: covariance + cholesky + triu encode
    mlp    in-kernel vmapped MLP forward (augment + constrain + net)
    step   one full BNNDynamicsModel.step vmapped over candidates
    full2  fused_control_law, stateful BNN, N=2
    full25 fused_control_law at the bench shape (N=25, with_aux)

Each stage verifies the compiled result against interpret mode.

Round-4 results (TPU v5e, 2026-08-21, after the Mosaic-safe dual-form
redesign — docs/PERFORMANCE.md §7b): mm PASS 1.2e-7, mlp PASS 6e-8,
step PASS 3e-8, full2 PASS 4.8e-7, full25 compiles and matches
per-step to ~1e-5 relative (end-horizon divergence is the untrained
net's exploding dynamics amplifying rounding, magnitude 0.1 -> 1.3e5).
The compiled kernel measures SLOWER than the scan line search at this
shape (1.477 vs 1.354 ms — scripts/bench_bnn_fused_ab.py), so it
stays opt-in; see supports_fused_rollout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":  # logic check without the TPU
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.ops.fused_rollout import _pack, _unpack, fused_control_law

ENC = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
N, P, A, NX = 25, 100, 10, 4


def make_model():
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    return cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1)


def run_kernel(body, inputs, out_shape, interpret):
    from pddp_tpu.utils.kernel_mode import pallas_kernel_tracing
    with pallas_kernel_tracing():
        return pl.pallas_call(
            body,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*inputs)


def compare(name, fn):
    t0 = time.time()
    # On CPU (logic check) Mosaic is unavailable: interpret both sides.
    compiled = os.environ.get("PROBE_CPU") != "1"
    got = np.asarray(fn(not compiled))
    print(f"{name}: compiled ok in {time.time() - t0:.1f}s", flush=True)
    want = np.asarray(fn(True))
    err = float(np.max(np.abs(got - want)))
    print(f"{name}: max|compiled - interpret| = {err:.3e}", flush=True)
    assert np.isfinite(got).all()
    return err


def packed_model_kernel(model, stage_body, extra_inputs, out_shape):
    """Builds a pallas_call whose kernel sees the unpacked model."""
    ref_fields = tuple(getattr(model, "pallas_ref_fields", ()))
    arrs, shapes, treedef = _pack(model, ref_fields)
    n_m = len(arrs)

    def kernel(*refs):
        model_k = _unpack(refs[:n_m], shapes, treedef)
        stage_body(model_k, refs[n_m:-1], refs[-1])

    def fn(interpret):
        return run_kernel(kernel, arrs + list(extra_inputs), out_shape,
                          interpret)

    return fn


def stage_tria():
    from pddp_tpu.utils.linalg import tria_solve
    key = jax.random.PRNGKey(1)
    U = jnp.eye(NX) + 0.1 * jax.random.normal(key, (A, NX, NX))
    U = jnp.triu(U)
    deltas = jax.random.normal(key, (A, P, NX))
    eps0 = jax.random.normal(key, (P, NX))

    def body(U_ref, d_ref, e0_ref, out_ref):
        def one(Ui, di):
            eps = tria_solve(Ui, di.T, trans=True).T
            bad = ~jnp.all(jnp.isfinite(eps))
            return jnp.where(bad, e0_ref[...], eps)
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])

    def fn(interpret):
        return run_kernel(body, [U, deltas, eps0],
                          jax.ShapeDtypeStruct((A, P, NX), jnp.float32),
                          interpret)

    return compare("tria", fn)


def stage_mm():
    model = make_model()
    out = jax.random.normal(jax.random.PRNGKey(2), (A, P, NX))
    nz = 14

    def body(model_k, ins, out_ref):
        (o_ref,) = ins
        def one(o):
            return model_k._moment_match(o, ENC, jnp.float32)
        out_ref[...] = jax.vmap(one)(o_ref[...])

    fn = packed_model_kernel(model, body, [out],
                             jax.ShapeDtypeStruct((A, nz), jnp.float32))
    return compare("mm", fn)


def stage_mlp():
    model = make_model()
    X = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (A, P, NX))
    u = 0.1 * jnp.ones((A, 1))

    def body(model_k, ins, out_ref):
        X_ref, u_ref = ins
        def one(Xi, ui):
            return model_k.forward_particles(Xi, ui, 0)
        out_ref[...] = jax.vmap(one)(X_ref[...], u_ref[...])

    fn = packed_model_kernel(model, body, [X, u],
                             jax.ShapeDtypeStruct((A, P, NX), jnp.float32))
    return compare("mlp", fn)


def stage_step():
    model = make_model()
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    Z = jnp.broadcast_to(z0, (A,) + z0.shape)
    u = 0.1 * jnp.ones((A, 1))
    prev = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (A, P, NX))
    nz = z0.shape[0]

    def body(model_k, ins, out_ref):
        Z_ref, u_ref, prev_ref = ins
        from pddp_tpu.models.bnn.model import _BNNState
        def one(zi, ui, pi):
            z_next, st, eps = model_k.step(zi, ui, 1, _BNNState(pi), ENC)
            return z_next
        out_ref[...] = jax.vmap(one)(Z_ref[...], u_ref[...], prev_ref[...])

    fn = packed_model_kernel(model, body, [Z, u, prev],
                             jax.ShapeDtypeStruct((A, nz), jnp.float32))
    return compare("step", fn)


def stage_full(n_steps):
    from pddp_tpu.controllers.ilqr import (default_fit_alphas, local_model,
                                           rollout)
    from pddp_tpu.examples.cartpole import CartpoleCost
    from pddp_tpu.ops.riccati import parallel_backward
    model = make_model()
    cost = CartpoleCost()
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=ENC)
    U = 0.1 * jnp.ones((n_steps, 1))
    alphas = default_fit_alphas(U.dtype)
    t0 = time.time()
    Z, AUX = rollout(model, z0, U, ENC)
    jax.block_until_ready(Z)
    print(f"full{n_steps}: setup rollout {time.time() - t0:.1f}s",
          flush=True)
    derivs = local_model(Z, U, AUX, model, cost, ENC)
    jax.block_until_ready(derivs[0])
    print(f"full{n_steps}: setup local_model {time.time() - t0:.1f}s",
          flush=True)
    k, K, ok = parallel_backward(*derivs, reg=1.0)
    jax.block_until_ready(k)
    print(f"full{n_steps}: setup backward {time.time() - t0:.1f}s",
          flush=True)

    def fn(interpret):
        # Production shape (ilqr.line_search_fn, belief-state branch):
        # cost hoisted to a batched post-pass — the uncertainty cost's
        # angular covariance assembly does not lower in Mosaic (§7b).
        from pddp_tpu.controllers.ilqr import trajectory_cost
        Z_f, U_f, AUX_f = fused_control_law(
            model, Z, U, k, K, alphas, ENC, cost=None, with_aux=True,
            interpret=interpret)
        return trajectory_cost(cost, Z_f, U_f, ENC)

    return compare(f"full{n_steps}", fn)


STAGES = {
    "tria": stage_tria,
    "mm": stage_mm,
    "mlp": stage_mlp,
    "step": stage_step,
    "full2": lambda: stage_full(2),
    "full25": lambda: stage_full(25),
}

if __name__ == "__main__":
    stage = sys.argv[1]
    print("devices:", jax.devices(), flush=True)
    STAGES[stage]()
    print(f"PROBE {stage}: PASS", flush=True)
