"""Visualization: HJI value-function slices + closed-loop run plots.

The analog of the reference's rviz marker pipeline (`src/rviz.jl:1-72`) and
the standalone PigeonViz node (`src/PigeonViz.jl`): a value-colored
(dE, dN) slice of the 7-D value function at the current relative state with
its zero-level-set contour, plus trajectory/tracking-error views of
simulation logs.  Renders to matplotlib figures / PNG files instead of ROS
markers; the slice-sampling helpers are pure JAX and host-agnostic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import trajectory as trj


def hji_slice(cache: hji_mod.HJICache, rel_state, n_e: int = 41,
              n_n: int = 41, extent=None):
    """Sample V over the (dE, dN) plane with the remaining 5 relative-state
    coordinates held at `rel_state` (the reference's
    `update_HJI_values_marker!` slice, src/rviz.jl:23-44).

    Returns (dE_axis, dN_axis, V_grid).
    """
    if extent is None:
        kE, kN = np.asarray(cache.knots[0]), np.asarray(cache.knots[1])
        extent = (kE[0], kE[-1], kN[0], kN[-1])
    dE = jnp.linspace(extent[0], extent[1], n_e)
    dN = jnp.linspace(extent[2], extent[3], n_n)
    rel = jnp.asarray(rel_state)

    def at(e, n):
        x = rel.at[0].set(e).at[1].set(n)
        V, _ = hji_mod.interpolate(cache, x)
        return V

    V = jax.vmap(lambda e: jax.vmap(lambda n: at(e, n))(dN))(dE)
    return np.asarray(dE), np.asarray(dN), np.asarray(V)


def plot_hji_slice(cache: hji_mod.HJICache, rel_state, ax=None,
                   eps: float = 0.05, **slice_kw):
    """Value-colored slice + zero/eps level contours (the rviz
    values+contour marker pair, src/rviz.jl:23-69)."""
    import matplotlib.pyplot as plt

    dE, dN, V = hji_slice(cache, rel_state, **slice_kw)
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 5))
    finite = np.where(np.isfinite(V), V, np.nan)
    pc = ax.pcolormesh(dE, dN, finite.T, shading="auto", cmap="RdYlGn")
    try:
        ax.contour(dE, dN, finite.T, levels=[0.0], colors="k",
                   linewidths=2)
        ax.contour(dE, dN, finite.T, levels=[eps], colors="b",
                   linewidths=1, linestyles="--")
    except Exception:
        pass   # degenerate slices have no crossing
    ax.plot([rel_state[0]], [rel_state[1]], "k*", markersize=12)
    ax.set_xlabel("dE (longitudinal, m)")
    ax.set_ylabel("dN (lateral, m)")
    ax.set_title("HJI value slice")
    plt.colorbar(pc, ax=ax, label="V")
    return ax


def plot_run(log, tube: Optional[trj.TrajectoryTube] = None, dt: float = 0.01,
             path: Optional[str] = None):
    """Closed-loop run summary: path overlay, lateral error, speed,
    commands, solver health."""
    import matplotlib.pyplot as plt

    q = np.asarray(log.q)
    u = np.asarray(log.u)
    t = dt * np.arange(q.shape[0])
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    ax = axes[0, 0]
    if tube is not None:
        n = int(tube.n_valid)
        ax.plot(np.asarray(tube.E)[:n], np.asarray(tube.N)[:n], "k--",
                lw=1, label="nominal")
    ax.plot(q[:, 0], q[:, 1], "b-", lw=1.5, label="vehicle")
    ax.set_aspect("equal"); ax.legend(); ax.set_title("path (E, N)")

    axes[0, 1].plot(t, np.asarray(log.diag.e))
    axes[0, 1].set_title("lateral error e (m)"); axes[0, 1].grid(True)

    axes[0, 2].plot(t, q[:, 3])
    axes[0, 2].set_title("speed Ux (m/s)"); axes[0, 2].grid(True)

    axes[1, 0].plot(t, u[:, 0])
    axes[1, 0].set_title("steering delta (rad)"); axes[1, 0].grid(True)

    axes[1, 1].plot(t, u[:, 1] + u[:, 2])
    axes[1, 1].set_title("longitudinal force Fx (N)"); axes[1, 1].grid(True)

    axes[1, 2].plot(t, np.asarray(log.diag.iterations), label="ADMM iters")
    ax2 = axes[1, 2].twinx()
    ax2.plot(t, np.asarray(log.diag.converged), "g.", markersize=2,
             label="converged")
    axes[1, 2].set_title("solver health"); axes[1, 2].grid(True)

    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
    return fig
