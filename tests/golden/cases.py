"""Golden-solve case definitions, shared by the regression test
(tests/controllers/test_golden.py) and the regenerator
(tests/golden/regenerate.py) so the two can never drift apart.

Each case: (model, cost, x0, N, n_iterations, encoding, nu, opts_extra)
where opts_extra holds extra ILQROptions fields (u_min/u_max pins the
constrained boxqp backward — reference ilqr.py:600-617,644-662;
v_zz_reg pins the V_zz-regularized recursion — reference :584-625).
"""

from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.double_cartpole import (DoubleCartpoleCost,
                                               DoubleCartpoleDynamicsModel)
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel)

IGN = StateEncoding.IGNORE_UNCERTAINTY
CHOL = StateEncoding.UPPER_TRIANGULAR_CHOLESKY


def build_cases():
    """Constructed lazily so importing this module stays side-effect free
    until JAX is configured (x64, platform)."""
    return {
        "pendulum": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                     [0.0, 0.0], 50, 50, IGN, 1, {}),
        "cartpole": (CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
                     [0.0, 0.0, 0.1, 0.0], 60, 40, IGN, 1, {}),
        "double_cartpole": (DoubleCartpoleDynamicsModel(dt=0.05),
                            DoubleCartpoleCost(),
                            [0.0, 0.0, 0.05, 0.0, -0.05, 0.0], 40, 25,
                            IGN, 1, {}),
        "rendezvous": (RendezvousDynamicsModel(dt=0.1), RendezvousCost(),
                       [-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0],
                       40, 25, IGN, 4, {}),
        # Belief-space solve: derivatives flow through mean AND covariance.
        "pendulum_chol": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                          [0.0, 0.0], 30, 25, CHOL, 1, {}),
        # Constrained solve: the active-set boxqp recursion in the
        # backward pass (tight bounds so the constraint actually binds).
        "cartpole_boxqp": (CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
                           [0.0, 0.0, 0.1, 0.0], 60, 40, IGN, 1,
                           # The unconstrained optimum peaks at |u|=1.09;
                           # 0.75 forces the constraint to bind so the
                           # active-set recursion is actually pinned.
                           {"u_min": [-0.75], "u_max": [0.75]}),
        # V_zz-regularized recursion (reference's alternate mode).
        "pendulum_vzz": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                         [0.0, 0.0], 50, 50, IGN, 1, {"v_zz_reg": True}),
        # Both at once: constrained + V_zz regularization.
        "pendulum_boxqp_vzz": (PendulumDynamicsModel(dt=0.1),
                               PendulumCost(), [0.0, 0.0], 50, 50, IGN, 1,
                               {"u_min": [-2.0], "u_max": [2.0],
                                "v_zz_reg": True}),
    }


def make_solve_args(name, cases=None):
    """(model, cost, z0, U0, opts, encoding) for a named case."""
    import jax
    import jax.numpy as jnp

    from pddp_tpu.controllers.ilqr import ILQROptions
    from pddp_tpu.encoding import encode

    model, cost, x0, N, iters, enc, nu, extra = (cases or build_cases())[name]
    x0 = jnp.asarray(x0, jnp.float64)
    if enc == IGN:
        z0 = x0
    else:
        z0 = encode(x0, C=1e-2 * jnp.eye(x0.shape[0], dtype=jnp.float64),
                    encoding=enc)
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42),
                                 (N, nu)).astype(jnp.float64)
    kw = dict(extra)
    for bound in ("u_min", "u_max"):
        if bound in kw:
            kw[bound] = jnp.asarray(kw[bound], jnp.float64)
    opts = ILQROptions(n_iterations=iters, **kw)
    return model, cost, z0, U0, opts, enc
