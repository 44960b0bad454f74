"""Pallas-kernel tracing mode.

A few framework primitives need two lowerings: the general XLA form
(fast, fusion-friendly, used everywhere outside kernels) and a
Mosaic-safe form for code traced *inside* a Pallas TPU kernel, where the
current compiler rejects or mis-lays-out certain constructs.  The probe
campaign (scripts/probe_micro*.py, docs/PERFORMANCE.md §7) pinned the
in-kernel rules:

 * never reduce to rank < 2, and one axis at a time with ``keepdims``
   (multi-axis / 0-D reductions abort InferVectorLayout);
 * never concatenate/stack *slices*: a slice keeps its source sublane/
   lane offset in its vector layout, and ``tpu.concatenate`` requires
   uniform input layouts (relayout via an identity matmul HANGS the
   compiler; masked-sum rebuilds compile and are exact);
 * select with arithmetic blends, not broadcast ``jnp.where``;
 * tiny selection contractions must stay on the VPU (elementwise
   multiply + single-axis sum): f32 MXU dot_generals round operands to
   bf16 (~4e-3 error on O(1) values).

``pallas_kernel_tracing()`` marks the dynamic extent in which a kernel
body is being traced (Pallas traces the body synchronously inside
``pallas_call``), and dual-form primitives check ``in_pallas_kernel()``
to pick their lowering.  The two forms are bit-identical in exact
arithmetic paths (selection sums add exactly one nonzero term), so
interpret-mode equivalence tests cover both.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager

__all__ = ["pallas_kernel_tracing", "in_pallas_kernel"]

_IN_KERNEL = contextvars.ContextVar("pddp_tpu_in_pallas_kernel",
                                    default=False)


@contextmanager
def pallas_kernel_tracing():
    """Marks Pallas kernel-body tracing; nests and restores on exit."""
    token = _IN_KERNEL.set(True)
    try:
        yield
    finally:
        _IN_KERNEL.reset(token)


def in_pallas_kernel() -> bool:
    """True while tracing code destined for a Mosaic (Pallas TPU) kernel."""
    return _IN_KERNEL.get()
