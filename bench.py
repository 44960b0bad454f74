"""Benchmark harness: cartpole DDP on TPU.

Measures the BASELINE.json headline metrics:
 * wall-clock per DDP iteration (forward derivatives + Riccati backward +
   batched line search) on cartpole at H=200 — north star < 5 ms;
 * independent solves/sec with 1024 problems vmapped on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...}

vs_baseline is the ratio (target 5 ms) / (measured ms): > 1 means faster
than the BASELINE.md north-star target. The torch reference publishes no
numbers and cannot run in this environment (torch 0.4 APIs), so the target
from BASELINE.md is the baseline.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

import jax
import jax.numpy as jnp

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

# Persistent XLA cache: repeat bench runs load executables from disk
# instead of recompiling (minutes over the TPU tunnel per run), and a
# populated cache keeps the bench runnable even when the remote compile
# service is unavailable.
enable_compilation_cache()

from pddp_tpu.controllers.ilqr import (ILQROptions, default_fit_alphas,
                                       local_model, rollout, solve)
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.ops.backward_kernel import pallas_backward_nu1
from pddp_tpu.ops.fused_rollout import fused_control_law

H = 200
ENCODING = StateEncoding.IGNORE_UNCERTAINTY
BATCH = 1024
TARGET_MS = 5.0


# Per-metric repeat spreads (round-4 verdict item 1a): best-of-3 alone is
# uninterpretable when the tunnel's run-to-run variance (~10-15%) exceeds
# the effect being claimed. _run_metric sets _CURRENT_METRIC; _time and
# the manual timing loops append their per-repeat values here, and main()
# emits them as the ``repeat_spread`` extra — one sorted list (seconds per
# timed call) per _time invocation under that metric.
_CURRENT_METRIC = None
_SPREADS = {}


def _record_spread(times_s):
    if _CURRENT_METRIC is not None:
        _SPREADS.setdefault(_CURRENT_METRIC, []).append(
            [round(t, 6) for t in sorted(times_s)])


def _time(fn, *args, n=100, warmup=5, repeats=3):
    """Best-of-repeats mean (the TPU tunnel adds bursty latency noise)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n)
    _record_spread(times)
    return min(times)


_HUNG = False


def _call_with_timeout(fn, timeout_s):
    """Run fn in a worker thread with a wall-clock bound.

    A wedged remote compile helper (CLAUDE.md) makes compiles block
    FOREVER — no exception, so retry/except can't catch it (observed
    2026-08-19: bench sat 30 min on its first compile with zero output).
    On timeout the worker thread is abandoned (daemon) and the metric is
    treated as failed; main() then exits via os._exit so stuck threads
    can't hang interpreter teardown.
    """
    global _HUNG
    box = {}

    def worker():
        try:
            box["value"] = fn()
        except BaseException as e:  # noqa: BLE001 — reraised below
            box["error"] = e

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        _HUNG = True
        raise TimeoutError(
            f"metric exceeded {timeout_s}s wall clock (hung backend "
            "compile? see CLAUDE.md on the shared compile helper)")
    if "error" in box:
        raise box["error"]
    return box.get("value")


def _run_metric(name, fn, errors, attempts=3, backoff=(10.0, 30.0),
                timeout_s=1500.0):
    """Run one metric in isolation with retry/backoff and a hang bound.

    The TPU sits behind a shared tunnel that occasionally throws transient
    backend errors (observed: FAILED_PRECONDITION fetching an array during
    warmup — BENCH_r02.json died on exactly that, erasing a whole round's
    perf record because every metric ran strictly sequentially with no
    error isolation). Each metric now retries a couple of times with
    backoff and, failing that, is skipped: the JSON line reports whatever
    succeeded plus an ``errors`` extra. Returns None on total failure.
    ``timeout_s`` bounds each attempt's wall clock (cold compiles over the
    tunnel legitimately take ~10 min; a wedged helper blocks forever).
    """
    global _CURRENT_METRIC
    print(f"[bench] start {name}", file=sys.stderr, flush=True)
    t_start = time.perf_counter()
    _CURRENT_METRIC = name
    for attempt in range(attempts):
        try:
            val = _call_with_timeout(fn, timeout_s)
            print(f"[bench] done {name} in "
                  f"{time.perf_counter() - t_start:.0f}s",
                  file=sys.stderr, flush=True)
            return val
        except TimeoutError as e:
            # A hung compile will not un-hang on retry; record and move on
            # so later (possibly cached) metrics still get a chance.
            errors.setdefault(name, []).append(f"attempt {attempt + 1}: "
                                               f"{e}")
            print(f"[bench] {name} timed out; skipping", file=sys.stderr)
            return None
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # JaxRuntimeError subclasses vary
            tb = traceback.format_exc(limit=3)
            msg = f"attempt {attempt + 1}: {type(e).__name__}: {e}"
            errors.setdefault(name, []).append(msg[:500])
            print(f"[bench] {name} failed ({type(e).__name__}); "
                  f"{'retrying' if attempt + 1 < attempts else 'giving up'}",
                  file=sys.stderr)
            print(tb, file=sys.stderr)
            if attempt + 1 < attempts:
                time.sleep(backoff[min(attempt, len(backoff) - 1)])
    return None


def bench_iteration_ms(model, cost):
    """One full DDP iteration at H=200, mirroring the solve-loop body:
    analytic+vmapped local model (no sequential rollout — the accepted
    trajectory is reused from the line search), the Riccati backward as
    ONE Pallas kernel, and the line search + cost accumulation as ONE
    Pallas kernel."""
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U0 = 0.1 * jnp.ones((H, 1))
    alphas = default_fit_alphas(U0.dtype)

    @jax.jit
    def iteration(Z, U):
        derivs = local_model(Z, U, (), model, cost, ENCODING)
        k, K, ok = pallas_backward_nu1(*derivs, reg=0.0)
        Z_b, U_b, J_b = fused_control_law(model, Z, U, k, K, alphas,
                                          ENCODING, cost=cost)
        amin = jnp.argmin(J_b)
        return Z_b[:, amin], U_b[:, amin], J_b[amin]

    Z0, _ = jax.jit(
        lambda z, u: rollout(model, z, u, ENCODING, unroll=8))(z0, U0)
    return _time(iteration, Z0, U0) * 1e3


def bench_batched_solves(model, cost):
    """1024 independent full solves (5 iterations each), vmapped."""
    # Scan paths: Pallas kernels serialize under vmap (see ops docstrings);
    # the scan bodies are already 1024-wide here. cost_in_scan: at B=1024
    # the compute-bound scan fuses the cost add for free, while the
    # post-pass re-reads the whole trajectory from HBM (17.1k vs 14.3k
    # solves/s measured).
    opts = ILQROptions(n_iterations=5, max_evals=15, scan_unroll=4,
                       cost_in_scan=True)
    key = jax.random.PRNGKey(0)
    z0s = 0.05 * jax.random.normal(key, (BATCH, 4))
    U0s = 0.1 * jnp.ones((BATCH, H, 1))

    @jax.jit
    def solve_batch(z0s, U0s):
        def one(z0, U0):
            r = solve(model, cost, z0, U0, opts, encoding=ENCODING)
            return r.J_opt

        return jax.vmap(one)(z0s, U0s)

    sec = _time(solve_batch, z0s, U0s, n=3, warmup=1)
    return BATCH / sec  # solves/sec


def bench_full_solve_ms(model, cost):
    """A complete 50-iteration cartpole solve at H=200 (the jitted
    while_loop solver with the Pallas fast paths) — end-to-end wall."""
    opts = ILQROptions(n_iterations=50, riccati_mode="kernel",
                       fused_rollout=True)
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U0 = 0.1 * jnp.ones((H, 1))

    @jax.jit
    def fit(z0, U0):
        r = solve(model, cost, z0, U0, opts, encoding=ENCODING)
        return r.J_opt, r.iterations, r.evals

    out = _time(fit, z0, U0, n=10)
    return out * 1e3


def bench_mpc_step_ms(model, cost):
    """Warm-started receding-horizon MPC step at H=200 (BASELINE config 5):
    one iLQR step with retry semantics from the current state, starting
    from the previous step's shifted solution (the reference's MPC warm
    start, ilqr.py:359-362). Measured: the warm path still takes ~7
    evals (the reference-faithful mu-from-zero escalation dominates, not
    the start point) — warm-starting here is about benchmarking the
    scenario MPC actually runs, not about fewer evals."""
    from pddp_tpu.controllers.ilqr import default_step_alphas, step_once

    opts = ILQROptions(n_iterations=1, max_evals=12, riccati_mode="kernel",
                       fused_rollout=True,
                       alphas=default_step_alphas(jnp.float32))
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U0 = 0.1 * jnp.ones((H, 1))

    # Converged swing-up solution to warm-start from.
    fit_opts = ILQROptions(n_iterations=50, riccati_mode="kernel",
                           fused_rollout=True)
    U_star = jax.jit(
        lambda z, u: solve(model, cost, z, u, fit_opts,
                           encoding=ENCODING).U)(z0, U0)

    @jax.jit
    def mpc_step(z, U):
        r = step_once(model, cost, z, U, opts, encoding=ENCODING)
        # Shift-left warm start (reference ilqr.py:359-362).
        U_next = jnp.concatenate([r.U[1:], r.U[-1:]], axis=0)
        return r.U[0], U_next

    U_warm = jnp.concatenate([U_star[1:], U_star[-1:]], axis=0)
    z_next = jnp.array([0.01, 0.0, 0.12, 0.0])  # slightly perturbed state
    cold_ms = _time(mpc_step, z_next, U_warm, n=50) * 1e3

    # Fast mode (warm_reg): carry the converged mu instead of the
    # reference's reset-to-zero — the escalation ladder is skipped, so
    # the step does 1-2 evals instead of ~7 (ilqr.forward warm_reg docs).
    mu_warm = jnp.asarray(0.1, jnp.float32)

    @jax.jit
    def mpc_step_warm(z, U):
        from pddp_tpu.controllers.ilqr import step_once as _step_once
        r = _step_once(model, cost, z, U, opts, encoding=ENCODING,
                       mu0=mu_warm)
        U_next = jnp.concatenate([r.U[1:], r.U[-1:]], axis=0)
        return r.U[0], U_next

    warm_ms = _time(mpc_step_warm, z_next, U_warm, n=50) * 1e3
    return cold_ms, warm_ms


def bench_pddp_iteration_ms(cost):
    """One *probabilistic* DDP iteration: BNN dynamics (MC-dropout,
    100 particles, [200,200]) on the Cholesky-encoded belief state at the
    reference's cartpole config H=25 (examples/cartpole.py:17-23). This is
    the PDDP inner-loop workload — derivatives flow through the particle
    moment matching.

    Composition chosen by measurement (scripts/bench_bnn_variants.py,
    docs/PERFORMANCE.md): Pallas fused backward (0.40 ms scan -> ~0.1 ms
    in-kernel at H=25), line-search scan with the candidate costs hoisted
    to a batched post-pass (1.15 -> 0.81 ms)."""
    from pddp_tpu.controllers.ilqr import control_law
    from pddp_tpu.encoding import encode
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory

    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    N = 25
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    # structured_jacobians stays on its "auto" default, which since
    # round 4 resolves to the structured factorization everywhere:
    # measured 1.284 vs 1.371 ms at batch 1 after the Mosaic-safe
    # redesign flipped round-2's result (docs/PERFORMANCE.md §8).
    # chol_jitter=(1e-12, 1e-6): 2-rung moment-match Cholesky ladder —
    # measured 1.108 vs 1.171 ms against the 5-rung reference ladder
    # with bit-identical J (scripts/bench_chol_ladder_ab.py, §7c);
    # selection semantics are unchanged whenever the 1e-12 rung
    # factorizes (always on this workload), and the 1e-6 rescue rung +
    # the diagonal-sqrt final fallback keep the never-NaN contract.
    from pddp_tpu.struct import replace as _struct_replace
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    model = _struct_replace(model, chol_jitter=(1e-12, 1e-6))
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=enc)
    U0 = 0.1 * jnp.ones((N, 1))
    alphas = default_fit_alphas(U0.dtype)

    @jax.jit
    def iteration(Z, U, AUX):
        derivs = local_model(Z, U, AUX, model, cost, enc)
        k, K, ok = pallas_backward_nu1(*derivs, reg=0.0)
        Z_b, U_b, J_b, AUX_b = control_law(model, Z, U, k, K, alphas, enc,
                                           cost=cost, with_aux=True)
        amin = jnp.argmin(J_b)
        AUX_new = jax.tree_util.tree_map(lambda a: a[:, amin], AUX_b)
        return Z_b[:, amin], U_b[:, amin], AUX_new, J_b[amin]

    Z0, AUX0 = jax.jit(
        lambda z, u: rollout(model, z, u, enc, unroll=4))(z0, U0)
    return _time(iteration, Z0, U0, AUX0, n=50) * 1e3


# TPU v5e (v5 lite) MXU peak: 197 TFLOP/s bf16 (public spec; f32
# matmuls run at roughly half that). THE one MFU denominator across
# bench extras / README / docs/PERFORMANCE.md §8 — always quote
# pct_of_bf16_peak, never a re-derived f32 fraction (round-3 verdict
# item 7: two conventions in print read as a moved number).
V5E_PEAK_BF16 = 197e12


def _bnn_mfu_extras(evals, iters, wall_s, extras, prefix):
    """Analytic-MLP MFU account for the batched BNN config.

    Counts MLP forward-equivalent passes per solve through the
    [6->200->200->8] net (mean+log_std heads), P=100 particles x N=25
    steps each, 2*m*k FLOPs per (m,k) matvec row:

      * 1 initial rollout,
      * per accepted iteration: local_model's primal + F=6 structured-
        jacobian tangent sweeps (each JVP through a linear layer costs
        one matmul of the tangent — forward-equivalent), F being the
        net-input bottleneck (augmented state 5 + action 1),
      * per backward/line-search eval: A=10 alpha-candidate rollouts.

    Still a LOWER bound on real FLOPs (moment matching, the g/h jacobian
    factor compositions, Riccati, boxqp, encode/decode excluded — all
    tiny-matrix VPU work), but tight on the MXU-shaped matmuls; XLA's
    own cost_analysis() is unusable here because it counts each
    while-loop BODY once, not per trip (~15x undercount at max_evals=15).
    """
    import numpy as np

    A, P, N, F = 10, 100, 25, 6
    per_row = 2 * (6 * 200 + 200 * 200 + 200 * 8)
    evals = np.asarray(evals)
    iters = np.asarray(iters)
    passes = 1 + iters * (1 + F) + evals * A
    flops = float(passes.sum()) * P * N * per_row
    achieved = flops / wall_s
    extras[f"{prefix}_mean_evals"] = round(float(evals.mean()), 2)
    extras[f"{prefix}_mean_iterations"] = round(float(iters.mean()), 2)
    extras[f"{prefix}_analytic_mlp_tflops"] = round(achieved / 1e12, 2)
    extras[f"{prefix}_pct_of_bf16_peak"] = round(
        100 * achieved / V5E_PEAK_BF16, 2)


def bench_batched_pddp_solves(cost, compute_dtype=None, matmul_dtype=None,
                              trained=False, mfu_extras=None):
    """1024 independent FULL PDDP solves (BNN dynamics, 100 MC-dropout
    particles, [200,200] MLP, Cholesky-encoded belief, H=25, 5 iterations)
    on one chip — the BASELINE.json north-star config ("1024 independent
    PDDP solves batched on a single TPU chip"). Fully vmapped this
    materializes ~20 GB of jacfwd activations, so it runs through
    parallel.batched_solve with chunk=256 (4 dispatches of one compiled
    program).

    ``trained=True`` loads the committed trained-on-cartpole parameters
    (scripts/make_trained_bnn.py; round-3 verdict item 3) — the
    untrained random-weight default is rejection-dominated by
    construction (every lane burns max_evals), the trained row shows the
    accept statistics of a converging workload."""
    import numpy as np

    from pddp_tpu.controllers.ilqr import ILQROptions
    from pddp_tpu.encoding import encode
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory, load_bnn_npz
    from pddp_tpu.parallel import batched_solve

    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    N, B, CH = 25, 1024, 256
    cls = bnn_dynamics_model_factory(4, 1, [200, 200], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3),
                                     compute_dtype=compute_dtype,
                                     matmul_dtype=matmul_dtype)
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=N + 1)
    if trained:
        model = load_bnn_npz(model, os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "golden", "trained_bnn_cartpole.npz"))
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=enc)
    z0s = z0 + 0.01 * jax.random.normal(jax.random.PRNGKey(7),
                                        (B,) + z0.shape)
    U0s = 0.1 * jnp.ones((B, N, 1))
    opts = ILQROptions(n_iterations=5, max_evals=15)

    def run():
        r = batched_solve(model, cost, z0s, U0s, opts, encoding=enc,
                          chunk=CH)
        # Host transfer forces completion of every chunk.
        return (np.asarray(r.J_opt), np.asarray(r.evals),
                np.asarray(r.iterations))

    _, evals, iters = run()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    _record_spread(times)
    best = min(times)
    if mfu_extras is not None:
        _bnn_mfu_extras(evals, iters, best, *mfu_extras)
    return B / best


def main():
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()

    errors = {}
    extras = {}

    def record(key, fn, digits=3):
        val = _run_metric(key, fn, errors)
        if val is not None:
            extras[key] = round(val, digits)
        return val

    # Headline metric first (and with one extra attempt): the round's
    # official record hinges on it.
    iter_ms = _run_metric("ddp_iteration_ms_cartpole_h200",
                          lambda: bench_iteration_ms(model, cost),
                          errors, attempts=4)

    record("full_solve_ms_50iter_h200",
           lambda: bench_full_solve_ms(model, cost), digits=2)

    mpc = _run_metric("mpc_step_ms_h200",
                      lambda: bench_mpc_step_ms(model, cost), errors)
    if mpc is not None:
        extras["mpc_step_ms_h200"] = round(mpc[0], 3)
        extras["mpc_step_warm_reg_ms_h200"] = round(mpc[1], 3)

    pddp_ms = record("pddp_bnn_iteration_ms_h25_p100",
                     lambda: bench_pddp_iteration_ms(cost))
    record("batched_solves_per_sec_b1024_h200_5iter",
           lambda: bench_batched_solves(model, cost), digits=1)
    record("pddp_bnn_solves_per_sec_b1024_h25_p100_5iter",
           lambda: bench_batched_pddp_solves(
               cost, mfu_extras=(extras, "pddp_bnn_b1024")), digits=1)
    # Trained-model counterpart (round-3 verdict item 3): same B=1024
    # config with the committed cartpole-trained parameters — the
    # converging workload's accept statistics, vs the untrained row's
    # rejection-dominated-by-construction mix. Skipped gracefully if the
    # npz is absent.
    if os.path.exists(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "golden", "trained_bnn_cartpole.npz")):
        record("pddp_bnn_solves_per_sec_b1024_trained",
               lambda: bench_batched_pddp_solves(
                   cost, trained=True,
                   mfu_extras=(extras, "pddp_bnn_b1024_trained")),
               digits=1)
    # Reduced-precision MLP (models/bnn/network.py compute_dtype): a
    # memory knob — halves eval-mode activation HBM traffic at ~0.8% cost
    # deviation; throughput is parity-within-noise with f32 (A/B runs
    # flip ordering at the ~5-10% level, docs/PERFORMANCE.md §8).
    record("pddp_bnn_solves_per_sec_b1024_bf16_mlp",
           lambda: bench_batched_pddp_solves(cost,
                                             compute_dtype=jnp.bfloat16),
           digits=1)
    # MXU-compute bf16 (matmul_dtype, round-3 verdict item 4): bf16
    # matmul OPERANDS with f32 accumulation — doubles the MXU rate
    # without touching activation precision (a compute knob, distinct
    # from the compute_dtype memory knob above).
    record("pddp_bnn_solves_per_sec_b1024_bf16_matmul",
           lambda: bench_batched_pddp_solves(cost,
                                             matmul_dtype=jnp.bfloat16),
           digits=1)

    # Self-measured torch-reference wall-clock on this host, if recorded
    # (scripts/ref_baseline/measure_reference.py --out REF_MEASURED.json;
    # BASELINE.md prescribes self-measuring since upstream publishes no
    # numbers). Reported as extra speedup context; vs_baseline stays
    # pinned to the BASELINE.json 5 ms north-star target.
    try:
        ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "REF_MEASURED.json")
        with open(ref_path) as f:
            ref_records = json.load(f)
        ref = {r["metric"]: r["value"] for r in ref_records
               if not r.get("quick")}
        ddp_ref = ref.get("ref_ddp_iteration_ms_cartpole_h200")
        bnn_ref = ref.get("ref_pddp_bnn_iteration_ms_h25_p100")
        if ddp_ref and iter_ms:
            extras["speedup_vs_reference_ddp_iteration"] = round(
                ddp_ref / iter_ms, 1)
        if bnn_ref and pddp_ms:
            extras["speedup_vs_reference_bnn_iteration"] = round(
                bnn_ref / pddp_ms, 1)
        prov = {k: ref_records[0].get(k) for k in ("host", "cpu", "timestamp")
                if ref_records and ref_records[0].get(k)}
        if prov:
            extras["reference_measured_on"] = prov
    except Exception:
        pass  # optional context only — never fail the bench on it

    if _SPREADS:
        # Sorted per-repeat values (seconds per timed call), one list per
        # _time invocation under that metric — the spread that makes the
        # best-of-3 headline interpretable against the tunnel's variance.
        extras["repeat_spread_s"] = _SPREADS

    # Round-over-round deltas vs the newest committed BENCH_r*.json
    # (round-4 verdict item 1a): a sub-15% change with no prior-round
    # anchor is unreadable; this puts the comparison in the record itself.
    try:
        import glob
        prior = sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
        if prior:
            with open(prior[-1]) as f:
                prev = json.load(f)
            parsed = prev.get("parsed") or {}
            prev_vals = dict(parsed.get("extras") or {})
            if parsed.get("metric") and parsed.get("value") is not None:
                prev_vals[parsed["metric"]] = parsed["value"]
            cur_vals = dict(extras)
            if iter_ms is not None:
                cur_vals["ddp_iteration_ms_cartpole_h200"] = iter_ms
            deltas = {}
            for k, v in cur_vals.items():
                p = prev_vals.get(k)
                if (isinstance(v, (int, float)) and
                        isinstance(p, (int, float)) and p):
                    deltas[k] = round(100.0 * (v - p) / p, 1)
            if deltas:
                extras["vs_prev_round_pct"] = {
                    "file": os.path.basename(prior[-1]), "deltas": deltas}
    except Exception:
        pass  # context only — never fail the bench on it

    extras["device"] = _run_metric("device", lambda: str(jax.devices()[0]),
                                   errors, attempts=1) or "unknown"
    if errors:
        extras["errors"] = errors

    print(json.dumps({
        "metric": "ddp_iteration_ms_cartpole_h200",
        "value": round(iter_ms, 4) if iter_ms is not None else None,
        "unit": "ms",
        "vs_baseline": (round(TARGET_MS / iter_ms, 3)
                        if iter_ms else None),
        "extras": extras,
    }))
    sys.stdout.flush()
    # Partial success is a success: the record exists. Only a dead
    # headline metric (after 4 attempts) fails the run.
    code = 0 if iter_ms is not None else 1
    if _HUNG:
        # Abandoned daemon threads are still blocked inside the backend;
        # normal teardown would join/hang on them.
        os._exit(code)
    sys.exit(code)


if __name__ == "__main__":
    main()
