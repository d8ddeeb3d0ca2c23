"""On-device HJI value-function solver (level-set method).

The reference's 7-D value function is computed OFFLINE by an external HJ
solver and downloaded as `BicycleCAvoid.jld2` (`deps/build.jl:1-4`,
SURVEY.md §2 "HJI value-function asset").  This module *regenerates* it by
solving the avoid-set Hamilton-Jacobi variational inequality directly on
the TPU:

    V_{k+1}(x) = min( l(x),  V_k(x) + dt * min(0, H_LF(x, DV_k)) )
    H(x, p)    = max_u min_d  p . f_rel(x, u, d)

(the min(0, .) is the variational-inequality freeze: V only decreases, and
stops once the ego can hold the Hamiltonian nonnegative)

with f_rel the 7-D relative bicycle/simple-car dynamics
(`hji.relative_dynamics`), the analytic optimizers `hji.optimal_control` /
`hji.optimal_disturbance` supplying u* and d*, and a local Lax-Friedrichs
numerical Hamiltonian for stability.  l(x) is the distance between the
cars minus a collision margin, so V < 0 marks states from which the human
can force a collision — matching the reference's `V <= eps` activation
semantics (`src/HJI_computation.jl:160-170`).

Everything is elementwise + axis shifts over the 7-D grid: pure VPU work
that runs a full sweep over ~1M grid points in milliseconds on TPU,
bringing the reference's multi-hour offline precompute on-device.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as hji_mod
from pigeon_tpu.config import VehicleParams

DEFAULT_BOUNDS = (
    (-20.0, 20.0),    # dE (longitudinal offset, ego frame)
    (-12.0, 12.0),    # dN (lateral offset)
    (-np.pi, np.pi),  # dpsi
    (1.0, 18.0),      # Ux
    (-3.0, 3.0),      # Uy
    (0.5, 18.0),      # V human
    (-1.5, 1.5),      # r
)
DEFAULT_SHAPE = (15, 11, 9, 7, 5, 7, 5)


def _axis_diffs(V, h, axis):
    """One-sided forward/backward differences with edge replication."""
    Vp = jnp.concatenate([jnp.take(V, jnp.arange(1, V.shape[axis]), axis),
                          jnp.take(V, jnp.asarray([V.shape[axis] - 1]),
                                   axis)], axis)
    Vm = jnp.concatenate([jnp.take(V, jnp.asarray([0]), axis),
                          jnp.take(V, jnp.arange(0, V.shape[axis] - 1),
                                   axis)], axis)
    Dp = (Vp - V) / h
    Dm = (V - Vm) / h
    return Dp, Dm


def collision_distance(x7, margin: float):
    """l(x): separation distance minus margin (the target function)."""
    return jnp.hypot(x7[..., 0], x7[..., 1]) - margin


def solve_hji(veh: VehicleParams,
              bounds: Sequence = DEFAULT_BOUNDS,
              shape: Sequence[int] = DEFAULT_SHAPE,
              margin: float = 3.0,
              n_sweeps: int = 400,
              cfl: float = 0.5,
              fx_samples: int = 15,
              dtype=jnp.float32) -> "tuple[hji_mod.HJICache, np.ndarray]":
    """Solve the avoid HJI-VI on a 7-D grid.

    Returns (cache, deltas): the `HJICache` plus the per-sweep sup-norm
    update magnitudes (convergence trace, shape (n_sweeps,))."""
    knots = [np.linspace(lo, hi, k) for (lo, hi), k in zip(bounds, shape)]
    hs = [float(k[1] - k[0]) for k in knots]
    grids = np.meshgrid(*knots, indexing="ij")
    X = jnp.asarray(np.stack(grids, axis=-1), dtype)   # (..., 7)
    l = collision_distance(X, margin).astype(dtype)

    hs_j = jnp.asarray(hs, dtype)

    def sweep(V, _):
        # gradients: central for the Hamiltonian, one-sided for dissipation
        Dps, Dms = [], []
        for ax in range(7):
            Dp, Dm = _axis_diffs(V, hs_j[ax], ax)
            Dps.append(Dp)
            Dms.append(Dm)
        gradV = jnp.stack([(Dp + Dm) * 0.5 for Dp, Dm in zip(Dps, Dms)],
                          axis=-1)

        uR = hji_mod.optimal_control(veh, X, gradV, "max",
                                     n_samples=fx_samples)
        uH = hji_mod.optimal_disturbance(veh, X, gradV, "min")
        f = hji_mod.relative_dynamics(veh, X, uR, uH)    # (..., 7)

        H = jnp.sum(gradV * f, axis=-1)
        # global (per-axis) Lax-Friedrichs dissipation: more dissipative
        # than local alphas but immune to boundary-gradient feedback
        alpha = jnp.abs(f)
        alpha_g = jnp.max(alpha.reshape(-1, 7), axis=0)      # (7,)
        diss = sum(alpha_g[ax] * (Dps[ax] - Dms[ax]) * 0.5
                   for ax in range(7))
        H_lf = H - diss

        # CFL-limited global step
        dt = cfl / jnp.maximum(jnp.sum(alpha_g / hs_j), 1e-6)

        V_new = jnp.minimum(l, V + dt * jnp.minimum(0.0, H_lf))
        # mathematical floor: V = min-over-time of l >= min(l) = -margin
        V_new = jnp.maximum(V_new, -margin)
        delta = jnp.max(jnp.abs(V_new - V))
        return V_new, delta

    @jax.jit
    def run(V0):
        V, deltas = jax.lax.scan(sweep, V0, None, length=n_sweeps)
        return V, deltas

    V, deltas = run(l)

    # gradient field for the cache (central differences of the solution)
    gradV = jnp.stack(
        [sum(_axis_diffs(V, hs_j[ax], ax)) * 0.5 for ax in range(7)],
        axis=-1)

    cache = hji_mod.make_cache(knots, np.asarray(V), np.asarray(gradV))
    return cache, np.asarray(deltas)


def save_cache(path: str, cache: hji_mod.HJICache):
    """Persist as npz (the orbax/npz analog of the reference's JLD2
    save, src/HJI_computation.jl:59-64)."""
    np.savez_compressed(
        path,
        V=np.asarray(cache.V).reshape(cache.dims),
        gradV=np.asarray(cache.gradV).reshape(cache.dims + (7,)),
        **{f"knots_{i}": np.asarray(k)
           for i, k in enumerate(cache.knots)})


def load_cache(path: str) -> hji_mod.HJICache:
    d = np.load(path)
    knots = [d[f"knots_{i}"] for i in range(7)]
    return hji_mod.make_cache(knots, d["V"], d["gradV"])
