"""Constraint utilities: tanh squashing, clamping, and a box-QP solver.

Re-implements /root/reference/pddp/utils/constraint.py. The projected-Newton
box-QP (reference :150-266, itself a port of Yuval Tassa's MATLAB solver) is
rebuilt branchlessly for jit/vmap: exception-driven Cholesky failures become
NaN detection + status codes, the active-set factorization uses a masked
matrix (clamped rows/cols replaced by identity) so shapes stay static, and
both the main loop and the Armijo backtracking run as ``lax.while_loop``s.
The whole solver vmaps cleanly over batches of QPs — which is how the
constrained Riccati backward pass consumes it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .linalg import mm, tria_solve

__all__ = [
    "BOXQP_RESULTS",
    "constrain",
    "constrain_env",
    "constrain_model",
    "clamp",
    "boxqp",
    "masked_cholesky",
    "chol_solve",
]

BOXQP_RESULTS = {
    -1: "Hessian is not positive definite",
    0: "No descent direction found",
    1: "Maximum main iterations exceeded",
    2: "Maximum line-search iterations exceeded",
    3: "No bounds, returning Newton point",
    4: "Improvement smaller than tolerance",
    5: "Gradient norm smaller than tolerance",
    6: "All dimensions are clamped",
}


def constrain(u, min_bounds, max_bounds):
    """Squashes an action into [min, max] through tanh (reference :35-48)."""
    diff = (max_bounds - min_bounds) / 2.0
    mean = (max_bounds + min_bounds) / 2.0
    return diff * jnp.tanh(u) + mean


def constrain_env(min_bounds, max_bounds):
    """Class decorator constraining an env's action space (reference
    :51-80): actions are squashed through tanh before being applied.
    Subclasses instead of monkey-patching (immutability over mutation)."""
    min_b = jnp.asarray(min_bounds)
    max_b = jnp.asarray(max_bounds)

    def decorator(cls):
        class Constrained(cls):
            def apply(self, u):
                return super().apply(constrain(u, min_b, max_b))

        Constrained.__name__ = "Constrained" + cls.__name__
        Constrained.__qualname__ = Constrained.__name__
        return Constrained

    return decorator


def constrain_model(min_bounds, max_bounds):
    """Class decorator constraining a model's action space (ref :83-143).

    The decorated model squashes `u` through tanh before its dynamics and
    gains a `constrain(u)` method. Works on the pure-function DynamicsModel
    classes of this framework.
    """
    min_b = jnp.asarray(min_bounds)
    max_b = jnp.asarray(max_bounds)

    def decorator(cls):
        class Constrained(cls):
            def apply(self, z, u, i, aux, encoding):
                u = constrain(u, min_b, max_b)
                return super().apply(z, u, i, aux, encoding)

            def constrain(self, u):
                return constrain(u, min_b, max_b)

        Constrained.__name__ = "Constrained" + cls.__name__
        Constrained.__qualname__ = Constrained.__name__
        return Constrained

    return decorator


def clamp(u, min_bounds, max_bounds):
    """Element-wise clamp (reference :146-147)."""
    return jnp.minimum(jnp.maximum(u, min_bounds), max_bounds)


def masked_cholesky(Q, free):
    """Upper Cholesky factor of Q restricted to the free subspace.

    Clamped rows/columns are replaced by identity so the factor has static
    shape; solves against it leave clamped entries untouched. Returns
    (U, ok) where ok is False if the free block is not positive definite.
    """
    from .linalg import SMALL_N, small_cholesky

    free_f = free.astype(Q.dtype)
    outer = free_f[..., :, None] * free_f[..., None, :]
    n = Q.shape[-1]
    eye = jnp.eye(n, dtype=Q.dtype)
    Qm = Q * outer + eye * (1.0 - free_f[..., :, None])
    if n <= SMALL_N:
        U = small_cholesky(Qm)
    else:
        U = jnp.swapaxes(jnp.linalg.cholesky(Qm), -1, -2)
    ok = jnp.all(jnp.isfinite(U), axis=(-2, -1))
    return U, ok


def chol_solve(U, b):
    """Solves (U^T U) x = b given the upper factor U (torch potrs parity)."""
    return tria_solve(U, tria_solve(U, b, trans=True))


class BoxQPResult(NamedTuple):
    x: jax.Array          # solution
    result: jax.Array     # int32 status code (see BOXQP_RESULTS)
    U_free: jax.Array     # masked upper Cholesky factor of the free block
    free: jax.Array       # bool mask of free dimensions


@partial(jax.jit, static_argnames=("max_iter", "min_grad", "tol", "step_dec",
                                   "min_step", "armijo"))
def boxqp(x0, Q, c, lower, upper, max_iter=100, min_grad=1e-8, tol=1e-8,
          step_dec=0.6, min_step=1e-22, armijo=0.1) -> BoxQPResult:
    """Projected-Newton box-QP: min 0.5 x'Qx + c'x  s.t. lower <= x <= upper.

    Behavioral parity with reference :150-266 (including its quirks: the
    status stays 0 if the iteration budget runs out, and a non-descent
    direction proceeds into the line search as in the reference's quiet
    mode). Fully branchless; vmappable over leading batch dims of all args.
    """
    # Promote everything to one dtype up front: the while_loop carry must
    # be dtype-stable, and mixed-precision inputs (e.g. an f32 x0 against
    # an f64 Q under jax_enable_x64) would otherwise promote x inside the
    # body but not in the init — a carry-type error at trace time.
    dtype = jnp.result_type(x0, Q, c, lower, upper)
    x0, Q, c, lower, upper = (jnp.asarray(a, dtype)
                              for a in (x0, Q, c, lower, upper))
    D = Q.shape[-1]

    x = clamp(x0, lower, upper)
    x = jnp.where(jnp.isinf(x), jnp.zeros_like(x), x)

    def quad(xv):
        return 0.5 * jnp.dot(xv, mm(Q, xv)) + jnp.dot(xv, c)

    f0 = quad(x)

    # carry: x, f, old_f, clamped, free, U, result, i
    init = (x, f0, jnp.zeros((), dtype), jnp.zeros(D, bool),
            jnp.ones(D, bool), jnp.eye(D, dtype=dtype),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    def cond(carry):
        _, _, _, _, _, _, result, i = carry
        return (result == 0) & (i < max_iter)

    def body(carry):
        x, f, old_f, clamped_old, free_old, U_old, _, i = carry

        # Convergence on small improvement (checked before anything else).
        conv = (i > 0) & ((old_f - f) < tol * jnp.abs(old_f))

        g = mm(Q, x) + c
        clamped = ((x == lower) & (g > 0)) | ((x == upper) & (g < 0))
        free = ~clamped
        all_clamped = jnp.all(clamped)

        factorize = (i == 0) | jnp.any(clamped_old != clamped)
        U_new, chol_ok = masked_cholesky(Q, free)
        U = jnp.where(factorize, U_new, U_old)
        chol_failed = factorize & ~chol_ok

        gnorm = jnp.linalg.norm(g * free.astype(dtype))
        small_grad = gnorm < min_grad

        g_clamped = mm(Q, x * clamped.astype(dtype)) + c
        free_f = free.astype(dtype)
        search = (-chol_solve(U, g_clamped * free_f) - x) * free_f
        sdotg = jnp.sum(search * g)

        # Armijo backtracking line search (reference :247-259).
        def ls_cond(ls):
            step, _, fc, ls_res = ls
            ratio = (fc - f) / (step * sdotg)
            return (ratio < armijo) & (ls_res == 0)

        def ls_body(ls):
            step, _, _, _ = ls
            step = step * step_dec
            xc = clamp(x + step * search, lower, upper)
            fc = quad(xc)
            ls_res = jnp.where(step < min_step, jnp.int32(2), jnp.int32(0))
            return step, xc, fc, ls_res

        xc0 = clamp(x + search, lower, upper)
        _, xc, fc, ls_res = lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(1.0, dtype), xc0, quad(xc0),
                               jnp.zeros((), jnp.int32)))

        result = jnp.where(
            conv, jnp.int32(4),
            jnp.where(
                all_clamped, jnp.int32(6),
                jnp.where(chol_failed, jnp.int32(-1),
                          jnp.where(small_grad, jnp.int32(5), ls_res))))

        early = conv | all_clamped | chol_failed | small_grad
        x_next = jnp.where(early, x, xc)
        f_next = jnp.where(early, f, fc)
        old_f_next = jnp.where(conv, old_f, f)
        # On the small-improvement break the previous iteration's active set
        # and factor are returned (reference :191-193 breaks before
        # recomputing them).
        free_out = jnp.where(conv, free_old, free)
        U_out = jnp.where(conv, U_old, U)

        return (x_next, f_next, old_f_next, clamped, free_out, U_out, result,
                i + 1)

    x, _, _, _, free, U, result, _ = lax.while_loop(cond, body, init)
    return BoxQPResult(x=x, result=result, U_free=U, free=free)
