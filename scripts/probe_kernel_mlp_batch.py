"""Timing probe: how should the fused kernel batch the candidate MLP?

The stateful fused rollout vmaps model.step over A=10 line-search
candidates, so the per-step MLP matmuls trace as (A, P, F) @ (F, H)
batched dot_generals. If Mosaic serializes the A batch into A tiny
matmuls, flattening candidates x particles into one (A*P, F) @ (F, H)
matmul per layer should win. Stages (all timed compiled, n=200 calls,
best-of-3):

    vb   vmapped-style batched: (A, P, F) @ (F, H) dot_generals
    fl   flattened: reshape (A, P, F) -> (A*P, F) (leading-dim merge
         only — minor-dim merges are the Mosaic kill, leading are not),
         one matmul chain, reshape back

Both run the bench MLP shape [6 -> 200 -> 200 -> 8] x 25 sequential
steps inside one kernel (the fused rollout's per-step structure).

Run:  timeout 1200 python scripts/probe_kernel_mlp_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pddp_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, P, A = 25, 100, 10
F, H1, H2, O = 6, 200, 200, 8

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
W1 = 0.05 * jax.random.normal(ks[0], (F, H1))
W2 = 0.05 * jax.random.normal(ks[1], (H1, H2))
W3 = 0.05 * jax.random.normal(ks[2], (H2, O))
X0 = 0.1 * jax.random.normal(ks[3], (A, P, F))


def net_vb(x):  # (A, P, F) batched dots
    h = jnp.maximum(x @ W1, 0.0)
    h = jnp.maximum(h @ W2, 0.0)
    return h @ W3


def net_fl(x):  # flatten leading dims, one matmul chain
    xf = x.reshape(A * P, F)
    h = jnp.maximum(xf @ W1, 0.0)
    h = jnp.maximum(h @ W2, 0.0)
    return (h @ W3).reshape(A, P, O)


def make_kernel(net):
    def body(x_ref, w1_ref, w2_ref, w3_ref, out_ref):
        def loop(i, x):
            o = net_w(x, w1_ref[...], w2_ref[...], w3_ref[...])
            # feed a (A,P,F)-shaped function of the output back in so the
            # loop is genuinely sequential (like the rollout carry)
            return x + 0.01 * o[..., :1] * jnp.ones((1, 1, F), x.dtype)

        if net == "vb":
            def net_w(x, w1, w2, w3):
                h = jnp.maximum(x @ w1, 0.0)
                h = jnp.maximum(h @ w2, 0.0)
                return h @ w3
        else:
            def net_w(x, w1, w2, w3):
                xf = x.reshape(A * P, F)
                h = jnp.maximum(xf @ w1, 0.0)
                h = jnp.maximum(h @ w2, 0.0)
                return (h @ w3).reshape(A, P, O)

        out_ref[...] = lax.fori_loop(0, N, loop, x_ref[...])
    return body


def run(name):
    body = make_kernel(name)
    fn = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((A, P, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    jfn = jax.jit(lambda x, a, b, c: fn(x, a, b, c))
    t0 = time.time()
    out = jfn(X0, W1, W2, W3)
    jax.block_until_ready(out)
    print(f"{name}: compiled in {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(200):
            out = jfn(X0, W1, W2, W3)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 200)
    print(f"{name}: {best * 1e3:.3f} ms / 25-step loop", flush=True)
    return np.asarray(out)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    outs = {}
    for name in (sys.argv[1:] or ["vb", "fl"]):
        try:
            outs[name] = run(name)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)
            print(f"{name}: FAIL {msg}", flush=True)
    if len(outs) == 2:
        d = float(np.max(np.abs(outs["vb"] - outs["fl"])))
        print(f"max|vb - fl| = {d:.3e}", flush=True)
    os._exit(0)
