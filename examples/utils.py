"""Shared helpers for the example scripts.

Parity: /root/reference/examples/utils.py (rollout at :25-30, plot_pause)
plus the sigma-band path plotting shared by the reference's per-problem
scripts (e.g. /root/reference/examples/cartpole.py:38-96). Headless-safe:
uses the Agg backend and saves figures instead of live-updating windows
when no display is available.
"""

from __future__ import annotations

import os

import jax

# The axon TPU tunnel overrides JAX_PLATFORMS from the environment; this
# knob lets every example run on (virtual-device) CPU:
#   PDDP_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#       python examples/<script>.py
if os.environ.get("PDDP_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402

from pddp_tpu.encoding import StateEncoding, decode_mean, decode_std
from pddp_tpu.utils.compilation_cache import enable_compilation_cache

# Example scripts compile large solver programs (minutes on the TPU
# tunnel); the persistent cache makes every run after the first fast.
enable_compilation_cache()


def rollout(model, z0, U, encoding: StateEncoding):
    """Open-loop replay of U through the model (reference utils.py:25-30)."""
    def body(z, u):
        z_next = model(z, u, 0, encoding=encoding)
        return z_next, z_next

    _, Z_next = jax.lax.scan(body, z0, U)
    return jnp.concatenate([z0[None], Z_next], axis=0)


def plot_pause(interval):
    """Non-blocking pause that keeps interactive windows responsive."""
    backend = plt.rcParams["backend"]
    if backend in matplotlib.rcsetup.interactive_bk:
        fig_manager = matplotlib._pylab_helpers.Gcf.get_active()
        if fig_manager is not None:
            fig_manager.canvas.start_event_loop(interval)


def plot_path(Z, encoding=StateEncoding.DEFAULT, indices=None, labels=None,
              reality=None, std_scale=1.0, legend=True, horizon=None):
    """State path with 1/2/3-sigma uncertainty bands
    (reference cartpole.py:38-96)."""
    mean_ = decode_mean(Z, encoding)
    std_ = decode_std(Z, encoding)
    if reality is not None:
        real_mean = decode_mean(reality, encoding)

    if indices is None:
        indices = list(range(mean_.shape[-1]))
    if labels is None:
        labels = ["State {}".format(i) for i in indices]

    colors = ["C{}".format(i % 10) for i in range(mean_.shape[-1])]
    t = jnp.arange(Z.shape[0])

    for label, index in zip(labels, indices):
        mean = mean_[:, index]
        std = std_[:, index]
        if reality is not None:
            plt.plot(t, real_mean[:, index], color=colors[index],
                     linestyle="dashed")
        plt.plot(t, mean, label=label, color=colors[index])
        for i in range(1, 4):
            j = std_scale * i
            plt.gca().fill_between(t, mean - j * std, mean + j * std,
                                   color=colors[index], alpha=1.0 / (i + 1))

    if legend:
        plt.legend(bbox_to_anchor=(0.0, 1.0, 1.0, 0.7), loc="upper left",
                   ncol=len(indices), mode="expand", borderaxespad=0.0)
    if horizon is not None:
        plt.xlim(0, horizon)
    plt.axhline(0, linestyle="--", color="#333333", linewidth=0.25)


def finish_figure(path, show):
    """Either shows the interactive window or saves to a file (headless)."""
    plt.tight_layout()
    if show and os.environ.get("DISPLAY"):
        plt.draw()
        plot_pause(0.001)
    else:
        plt.savefig(path, dpi=120)
        print("saved", path)
