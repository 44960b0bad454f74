"""Round-4 Mosaic probes, part 3: find a compiling full-array-reduction
blend for the _effective_eps fallback.

Known kills (probe_micro.py, probe_micro2.py, TPU v5e 2026-08-21):
    - 0-D reduction ``jnp.all(f)`` (t6):      layout.h Check arr.size>=2
    - multi-axis keepdims min (t6b):          same SIGABRT
    - reshape (A,P,NX)->(A,P*NX) (t6c):      tpu.reshape unsupported
These stages keep every value 2-D+ and reduce one axis at a time, or
replace the reduction with a ones-matmul (MXU-native).

    r1   single-axis minor reduction, keepdims: (P,NX) -> (P,1)
    r2   staged reduction to (1,1)
    r3   broadcast-multiply (P,NX) * (1,1)
    t6d  full blend, staged-min weight, vmapped over A
    t6e  full blend, ones-matmul weight (sum of non-finite > 0), vmapped
    t7c  tria_solve_right + winning blend (set BLEND=d|e), vmapped

Run:  timeout 600 python scripts/probe_micro3.py [stage ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pddp_tpu.utils.linalg import tria_solve_right

N, P, A, NX = 25, 100, 10, 4

key = jax.random.PRNGKey(1)
UA = jnp.triu(jnp.eye(NX) + 0.1 * jax.random.normal(key, (A, NX, NX)))
DA = jax.random.normal(key, (A, P, NX))
E0 = jax.random.normal(key, (P, NX))
DA_BAD = DA.at[3, 7, 2].set(jnp.nan)


def run(body, inputs, out_shape, interpret):
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)


def compare(name, fn, check_finite=True):
    t0 = time.time()
    compiled = os.environ.get("PROBE_CPU") != "1"
    got = np.asarray(fn(not compiled))
    print(f"{name}: compiled ok in {time.time() - t0:.1f}s", flush=True)
    want = np.asarray(fn(True))
    err = float(np.max(np.abs(got - want)))
    print(f"{name}: max|compiled - interpret| = {err:.3e}", flush=True)
    if check_finite:
        assert np.isfinite(got).all()


def r1(d):
    def body(d_ref, out_ref):
        x = d_ref[...][0]  # (P, NX)
        out_ref[...] = jnp.min(x, axis=1, keepdims=True)
    compare("r1", lambda i: run(body, [d],
            jax.ShapeDtypeStruct((P, 1), jnp.float32, ), i),
            check_finite=False)


def r2(d):
    def body(d_ref, out_ref):
        x = d_ref[...][0]  # (P, NX)
        m = jnp.min(x, axis=1, keepdims=True)       # (P, 1)
        out_ref[...] = jnp.min(m, axis=0, keepdims=True)  # (1, 1)
    compare("r2", lambda i: run(body, [d],
            jax.ShapeDtypeStruct((1, 1), jnp.float32), i),
            check_finite=False)


def r3(d):
    def body(d_ref, out_ref):
        x = d_ref[...][0]  # (P, NX)
        w = jnp.min(jnp.min(x, axis=1, keepdims=True), axis=0,
                    keepdims=True)  # (1, 1)
        out_ref[...] = x * w
    compare("r3", lambda i: run(body, [d],
            jax.ShapeDtypeStruct((P, NX), jnp.float32), i),
            check_finite=False)


def _blend_staged_min(x, e0):
    """(P, NX) fallback blend; staged single-axis keepdims reductions."""
    finite = jnp.isfinite(x)
    x_safe = jnp.where(finite, x, jnp.zeros_like(x))
    f = finite.astype(x.dtype)
    allf = jnp.min(jnp.min(f, axis=1, keepdims=True), axis=0,
                   keepdims=True)  # (1, 1): 1.0 iff everything finite
    w = 1.0 - allf
    return e0 * w + x_safe * (1.0 - w)


def _blend_ones_mm(x, e0):
    """(P, NX) fallback blend; non-finite count via ones-matmuls (MXU)."""
    finite = jnp.isfinite(x)
    x_safe = jnp.where(finite, x, jnp.zeros_like(x))
    nbad = (x.dtype.type(1.0) - finite.astype(x.dtype))
    ones_l = jnp.ones((1, x.shape[0]), x.dtype)
    ones_r = jnp.ones((x.shape[1], 1), x.dtype)
    s = ones_l @ nbad @ ones_r                      # (1, 1) count
    w = (s > 0).astype(x.dtype)
    return e0 * w + x_safe * (1.0 - w)


def t6d(d):
    def body(d_ref, e0_ref, out_ref):
        out_ref[...] = jax.vmap(_blend_staged_min, in_axes=(0, None))(
            d_ref[...], e0_ref[...])
    compare("t6d", lambda i: run(body, [d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t6e(d):
    def body(d_ref, e0_ref, out_ref):
        out_ref[...] = jax.vmap(_blend_ones_mm, in_axes=(0, None))(
            d_ref[...], e0_ref[...])
    compare("t6e", lambda i: run(body, [d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t7c(d):
    blend = {"d": _blend_staged_min,
             "e": _blend_ones_mm}[os.environ.get("BLEND", "d")]

    def body(U_ref, d_ref, e0_ref, out_ref):
        def one(Ui, di):
            eps_inf = tria_solve_right(Ui, di)
            return blend(eps_inf, e0_ref[...])
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])
    compare("t7c", lambda i: run(body, [UA, d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


STAGES = {"r1": r1, "r2": r2, "r3": r3, "t6d": t6d, "t6e": t6e,
          "t7c": t7c}

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        for tag, d in (("clean", DA), ("bad", DA_BAD)):
            try:
                STAGES[name](d)
                print(f"PROBE {name}[{tag}]: PASS", flush=True)
            except Exception as e:
                msg = ""
                for line in str(e).splitlines():
                    if ("Check failed" in line or "MLIR operation" in line
                            or "exit" in line):
                        msg = line.strip()[:160]
                        break
                print(f"PROBE {name}[{tag}]: FAIL {msg}", flush=True)
            if tag == "clean" and name.startswith("r"):
                break  # value stages don't need the bad-input rerun
