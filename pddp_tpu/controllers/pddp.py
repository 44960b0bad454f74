"""PDDP controller: episodic learning + trajectory optimization.

Re-implements /root/reference/pddp/controllers/pddp.py:32-267 — the full
probabilistic DDP algorithm: collect rollouts from the environment, train
the BNN dynamics model, optimize the trajectory with iLQR on the learned
(probabilistic) model, execute MPC to gather fresh data, repeat.

Host/device split (SURVEY §7 "hard parts"): the episodic loop is host-side
Python (it is tiny — a handful of trials), but every step inside it is a
jitted device program: open-loop data collection is one ``lax.scan`` over
the pure simulator, BNN training is one scanned optimizer run, the inner
iLQR fit is the jitted while_loop, and each MPC step is one warm-started
jitted solve. Models are immutable pytrees, so "training the model"
replaces ``self.model`` — same structure, no recompilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..encoding import StateEncoding, decode_mean
from ..envs.base import SimEnv
from .ilqr import iLQRController, iLQRState, trajectory_cost

__all__ = ["PDDPController"]


class PDDPController(iLQRController):
    """PDDP controller (reference :32-59)."""

    def __init__(self, env, model, cost, model_opts=None, cost_opts=None,
                 training_opts=None, seed=0, **kwargs):
        super().__init__(env, model, cost, model_opts=model_opts,
                         cost_opts=cost_opts)
        self._training_opts = training_opts or {}
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def fit(self, U, encoding: StateEncoding = StateEncoding.DEFAULT,
            quiet=False, on_trial=None, max_trials=None,
            n_initial_sample_trajectories=2, sampling_noise=1.0,
            train_on_start=True, max_dataset_size=1000, resample_model=True,
            u_min=None, u_max=None, **kwargs):
        """Determines the optimal path to minimize the cost
        (reference fit, :61-206).

        Returns:
            Tuple (Z, U, state).
        """
        U = jnp.asarray(U)
        N = U.shape[0]
        total_trials = 0
        state = iLQRState.UNDEFINED
        Z = None

        dataset = None
        if train_on_start:
            # Initial exploration rollouts (reference :122-150): the first
            # uses the given U, the rest uniform noise in the action bounds.
            for i in range(n_initial_sample_trajectories):
                self.env.reset()
                if i == 0:
                    Ui = U
                else:
                    Ui = sampling_noise * jax.random.uniform(
                        self._next_key(), U.shape, U.dtype)
                    if u_min is not None and u_max is not None:
                        Ui = (jnp.asarray(u_max) - jnp.asarray(u_min)
                              ) * Ui + jnp.asarray(u_min)

                new_data, Ji = self._apply_controller(
                    Ui, N, encoding, mpc=False, u_min=u_min, u_max=u_max)
                dataset = _concat_datasets(dataset, new_data,
                                           max_dataset_size)
                if callable(on_trial):
                    on_trial(total_trials, new_data[0], new_data[1])
                total_trials += 1

            self.model = self._fit_model(dataset, max_dataset_size, quiet)

        while True:
            # Fresh episode (reference :156-165).
            self.env.reset()
            if resample_model and hasattr(self.model, "resample"):
                self.model = self.model.resample(self._next_key())

            # Open-loop trajectory optimization on the learned model.
            Z, U, state = super().fit(U, encoding=encoding, quiet=quiet,
                                      u_min=u_min, u_max=u_max, **kwargs)

            if not self.training:
                break

            # MPC execution for data collection (reference :179-192).
            H = 2 * N
            new_data, J = self._apply_controller(
                self, H, encoding, mpc=True, u_min=u_min, u_max=u_max,
                **kwargs)
            if callable(on_trial):
                on_trial(total_trials, new_data[0], new_data[1])

            dataset = _concat_datasets(dataset, new_data, max_dataset_size)
            self.model = self._fit_model(dataset, max_dataset_size, quiet)

            total_trials += 1
            if max_trials is not None and total_trials >= max_trials:
                break

        return Z, U, state

    def _fit_model(self, dataset, max_dataset_size, quiet):
        """Trains the model on the (growing) dataset.

        The dataset is padded to ``max_dataset_size`` rows with its valid
        length passed as ``n_valid`` (consumed by fit_bnn) so that every
        trial's training scan sees ONE array shape — the growing dataset
        would otherwise recompile the jitted trainer each trial (SURVEY
        §7 hard parts: keep the FIFO buffer fixed-shape). Models whose
        fit() does not accept n_valid get the unpadded arrays."""
        X, U, dX = dataset
        kwargs = dict(key=self._next_key(), quiet=quiet,
                      **self._training_opts)
        # Models opt into the padding protocol with a class attribute
        # (ParticlesBNNDynamicsModel.supports_n_valid = True); third-party
        # models without it fall back to a signature inspection for an
        # EXPLICIT n_valid parameter — a bare **kwargs is no evidence the
        # model understands padding, and silently training a custom model
        # on zero rows would corrupt it.
        accepts_n_valid = getattr(self.model, "supports_n_valid", None)
        if accepts_n_valid is None:
            import inspect
            try:
                params = inspect.signature(self.model.fit).parameters
                accepts_n_valid = "n_valid" in params
            except (TypeError, ValueError):
                accepts_n_valid = False
        n = X.shape[0]
        if (not accepts_n_valid or max_dataset_size is None
                or n >= max_dataset_size):
            return self.model.fit(X, U, dX, **kwargs)
        pad = max_dataset_size - n
        padded = tuple(
            jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            for a in (X, U, dX))
        return self.model.fit(*padded, n_valid=n, **kwargs)

    # -- data collection -----------------------------------------------------

    def _apply_controller(self, controller, H, encoding, mpc=False,
                          u_min=None, u_max=None, **kwargs):
        """Env-in-the-loop rollout collecting training data
        (reference :209-245).

        ``controller`` is either an action array (open loop) or a
        controller (closed loop / MPC). Open-loop collection on a pure
        SimEnv runs as a single jitted scan; MPC collection iterates
        host-side, each step one jitted warm-started solve.
        """
        env = self.env
        is_open_loop = isinstance(controller, jnp.ndarray)

        if is_open_loop and isinstance(env, SimEnv):
            U_arr = controller[:H]
            x0 = env._x

            def body(x, u):
                z = _encode_obs(x, encoding)
                x_next = env.step_fn(x, u)
                return x_next, (z, x)

            x_last, (Z_run, X_run) = jax.lax.scan(body, x0, U_arr)
            Z = jnp.concatenate(
                [Z_run, _encode_obs(x_last, encoding)[None]], axis=0)
            U_out = U_arr
            env._x = x_last
        else:
            Z_list = []
            U_list = []
            for i in range(H):
                z = env.get_state().encode(encoding)
                Z_list.append(z)
                if is_open_loop:
                    u = controller[i]
                else:
                    u = controller(z, i, encoding, mpc=mpc, u_min=u_min,
                                   u_max=u_max, **kwargs)
                U_list.append(u)
                env.apply(u)
            Z_list.append(env.get_state().encode(encoding))
            Z = jnp.stack(Z_list)
            U_out = jnp.stack(U_list)

        J = trajectory_cost(self.cost, Z, U_out, encoding, self._cost_opts)
        X = decode_mean(Z, encoding=encoding)
        dX = X[1:] - X[:-1]
        X = X[:-1]
        return (X, U_out, dX), J


def _encode_obs(x, encoding, var=1e-2):
    """Observation -> encoded state with the fixed observation-noise prior
    (reference envs/base.py:56-66, gym_env.py:75-85)."""
    from ..gaussian_variable import GaussianVariable
    return GaussianVariable(x, _var=var * jnp.ones_like(x)).encode(encoding)


def _concat_datasets(first, second, max_dataset_size=None):
    """FIFO-capped dataset concat (reference :248-267)."""
    if first is None:
        return second
    if second is None:
        return first
    X, U, dX = first
    X_, U_, dX_ = second
    X = jnp.concatenate([X, X_])
    U = jnp.concatenate([U, U_])
    dX = jnp.concatenate([dX, dX_])
    if max_dataset_size is not None:
        X = X[-max_dataset_size:]
        U = U[-max_dataset_size:]
        dX = dX[-max_dataset_size:]
    return X, U, dX
