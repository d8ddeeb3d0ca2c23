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

Everything is elementwise + axis shifts over the 7-D grid: pure VPU work.
Measured on one v5e chip (scripts/hji_production.py, HJI_PROD.json): the
1.8M-point prototype grid runs ~112 ms/sweep (600 sweeps ~67 s); the
9.65M-point production DEFAULT_SHAPE ~1.66 s/sweep (600 sweeps ~17 min)
— on-device for the solve the reference obtains from a multi-hour
offline precompute (`deps/build.jl:1-4`).  Odd tiny trailing axes
vectorize poorly on the (8, 128) vector registers; the measured rate
reflects that.
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
# Production default (raised round 3; ~1.3x per axis / 5.3x the points of
# the original prototyping grid): 9.65M points, solved + timed on a v5e
# chip by scripts/hji_production.py — see HJI_PROD.json.  Larger grids hit
# single-chip limits in this environment: a 2x-per-axis 54M grid exceeds
# HBM at compile time (XLA planned 39.8 G), and a 13.75M grid crashed the
# TPU worker at runtime (reproducibly); shard the grid's leading axis
# over a mesh for larger grids.  Tests pass explicit small shapes.
DEFAULT_SHAPE = (17, 13, 11, 9, 7, 9, 7)
PROTO_SHAPE = (15, 11, 9, 7, 5, 7, 5)


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


def solve_hji_vi(l, hs, flow_fn, n_sweeps: int, cfl: float = 0.5,
                 floor=None, sweep_chunk: int = 0, lf: str = "local",
                 horizon=None):
    """Generic N-D avoid-set HJI-VI level-set solver (dimension-agnostic
    core; the 7-D vehicle problem and the validation games share it).

        V_{k+1} = min( l, V_k + dt * min(0, H_LF) )

    l        : (k1, ..., kN) target function on the grid.
    hs       : length-N grid spacings.
    flow_fn  : (X?, gradV) -> f, the optimal-play dynamics; it receives
               ONLY the value gradient stack (..., N) and must return the
               flow field (..., N) under u* (maximizing p.f) and d*
               (minimizing).  Any state dependence is closed over.
    floor    : mathematical lower bound of V (defaults to min(l)).
    sweep_chunk: 0 runs all sweeps in ONE device program; k > 0 runs
               ceil(n_sweeps/k) chunked launches carrying V on device —
               REQUIRED for production grids in this environment, where a
               single multi-minute device execution crashes the remote
               TPU worker (watchdog); also yields incremental progress.
    lf       : "local" (default) uses pointwise |f| dissipation
               coefficients (LLF) — far less numerical diffusion than
               "global" (per-axis grid-max |f|), which on coarse 7-D
               grids floods the whole domain with the negative target
               region (measured: the converged global-LF proto cache
               collapsed to V in [-3.0, -2.5] EVERYWHERE).  The CFL time
               step stays global either way (stability).
    horizon  : optional pseudo-time horizon T (seconds).  The avoid game
               between equal-agility vehicles is pursuer-won at infinite
               horizon (V -> floor as sweeps -> inf), so the USEFUL
               artifact is the finite-horizon value "collision forceable
               within T"; updates freeze once cumulative pseudo-time
               reaches T.

    Returns (V, deltas, times): the converged value grid, per-sweep
    sup-norm updates, and the cumulative pseudo-time after each sweep
    (so finite-horizon analytic solutions can be compared sweep-by-sweep).
    """
    ndim = l.ndim
    hs_j = jnp.asarray(hs, l.dtype)
    lo = jnp.min(l) if floor is None else jnp.asarray(floor, l.dtype)

    def sweep(carry, _):
        V, t = carry
        # two passes over axes: gradV first, dissipation after f is known
        # — keeping only one (Dp, Dm) pair live at a time caps the peak
        # footprint at ~4 grid-sized arrays instead of 2*ndim (the
        # production 7-D grid is ~50M points; 14 live copies would not
        # fit HBM).  The shifts are recomputed in pass 2 (cheap VPU work).
        gradV = jnp.stack(
            [sum(_axis_diffs(V, hs_j[ax], ax)) * 0.5
             for ax in range(ndim)], axis=-1)
        f = flow_fn(gradV)                                # (..., N)
        H = jnp.sum(gradV * f, axis=-1)
        # Lax-Friedrichs dissipation (pointwise-local by default; global
        # per-axis with lf="global").  In this module's
        # sign convention the PDE is V_t = min(0, H(x, DV)), i.e. the
        # standard-form Hamiltonian is G = -min(0, H); the monotone LF
        # update V += dt*(-G(p_central) + sum_i alpha_i (D+_i - D-_i)/2)
        # therefore ADDS the (D+ - D-) term — it acts like a diffusion
        # (damps odd-even modes; at a local max D+ - D- < 0 pulls V down).
        # The truncation min(0, .) wraps ONLY the analytic Hamiltonian:
        # truncating after adding dissipation converts grid noise into a
        # systematic one-sided decrease (maxima freeze, minima sink) and
        # amplifies a sawtooth — validated against the analytic isotropic
        # pursuit game in tests/test_hji_validation.py.
        alpha_g = jnp.max(jnp.abs(f).reshape(-1, ndim), axis=0)   # (N,)

        def diss_ax(ax):
            Dp, Dm = _axis_diffs(V, hs_j[ax], ax)
            a = jnp.abs(f[..., ax]) if lf == "local" else alpha_g[ax]
            return a * (Dp - Dm) * 0.5
        diss = sum(diss_ax(ax) for ax in range(ndim))
        dt = cfl / jnp.maximum(jnp.sum(alpha_g / hs_j), 1e-6)
        V_new = jnp.minimum(l, V + dt * (jnp.minimum(0.0, H) + diss))
        V_new = jnp.maximum(V_new, lo)
        if horizon is not None:
            # freeze past the pseudo-time horizon (static shapes; extra
            # sweeps become no-ops)
            V_new = jnp.where(t < horizon, V_new, V)
        delta = jnp.max(jnp.abs(V_new - V))
        return (V_new, t + dt), (delta, t + dt)

    if sweep_chunk <= 0 or sweep_chunk >= n_sweeps:
        @jax.jit
        def run(V0):
            (V, _), (deltas, times) = jax.lax.scan(
                sweep, (V0, jnp.asarray(0.0, l.dtype)), None,
                length=n_sweeps)
            return V, deltas, times

        return run(l)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_chunk(V0, t0, k):
        (V, t), (deltas, times) = jax.lax.scan(
            sweep, (V0, t0), None, length=k)
        return V, t, deltas, times

    V = l
    t = jnp.asarray(0.0, l.dtype)
    d_all, t_all = [], []
    left = n_sweeps
    while left > 0:
        k = min(sweep_chunk, left)
        V, t, deltas, times = run_chunk(V, t, k)
        jax.block_until_ready(V)
        d_all.append(deltas)
        t_all.append(times)
        left -= k
    return V, jnp.concatenate(d_all), jnp.concatenate(t_all)


def solve_hji(veh: VehicleParams,
              bounds: Sequence = DEFAULT_BOUNDS,
              shape: Sequence[int] = DEFAULT_SHAPE,
              margin: float = 3.0,
              n_sweeps: int = 400,
              cfl: float = 0.5,
              fx_samples: int = 15,
              sweep_chunk: int = 0,
              lf: str = "local",
              horizon_s: "float | None" = None,
              dtype=jnp.float32
              ) -> "tuple[hji_mod.HJICache, np.ndarray, np.ndarray]":
    """Solve the avoid HJI-VI on a 7-D grid.

    Returns (cache, deltas, times): the `HJICache` plus the per-sweep
    sup-norm update magnitudes and cumulative pseudo-times (convergence
    trace, shape (n_sweeps,))."""
    knots = [np.linspace(lo, hi, k) for (lo, hi), k in zip(bounds, shape)]
    hs = [float(k[1] - k[0]) for k in knots]
    knots_j = [jnp.asarray(k, dtype) for k in knots]

    def make_X():
        # build the coordinate stack INSIDE the traced computation from
        # the tiny 1-D knot vectors: embedding a multi-GB meshgrid as an
        # HLO constant would blow compile-time memory at production grids
        grids = jnp.meshgrid(*knots_j, indexing="ij")
        return jnp.stack(grids, axis=-1)                   # (..., 7)

    l = jax.jit(lambda: collision_distance(make_X(), margin)
                .astype(dtype))()

    def flow(gradV):
        X = make_X()
        uR = hji_mod.optimal_control(veh, X, gradV, "max",
                                     n_samples=fx_samples)
        uH = hji_mod.optimal_disturbance(veh, X, gradV, "min")
        return hji_mod.relative_dynamics(veh, X, uR, uH)     # (..., 7)

    # mathematical floor: V = min-over-time of l >= min(l) = -margin
    V, deltas, times = solve_hji_vi(l, hs, flow, n_sweeps, cfl,
                                    floor=-margin,
                                    sweep_chunk=sweep_chunk, lf=lf,
                                    horizon=horizon_s)

    # gradient field for the cache (central differences of the solution)
    hs_j = jnp.asarray(hs, dtype)
    gradV = jnp.stack(
        [sum(_axis_diffs(V, hs_j[ax], ax)) * 0.5 for ax in range(7)],
        axis=-1)

    cache = hji_mod.make_cache(knots, np.asarray(V), np.asarray(gradV))
    return cache, np.asarray(deltas), np.asarray(times)


def save_cache(path: str, cache: hji_mod.HJICache,
               include_grad: bool = True):
    """Persist as npz (the orbax/npz analog of the reference's JLD2
    save, src/HJI_computation.jl:59-64).

    include_grad=False stores V + knots only (1/8 the bytes — the
    committed CI asset); `load_cache` recomputes gradV by the same
    central differences `solve_hji` used to build it."""
    arrs = {"V": np.asarray(cache.V).reshape(cache.dims)}
    if include_grad:
        arrs["gradV"] = np.asarray(cache.gradV).reshape(
            cache.dims + (7,))
    np.savez_compressed(
        path, **arrs,
        **{f"knots_{i}": np.asarray(k)
           for i, k in enumerate(cache.knots)})


def grad_from_V(V, knots):
    """Central-difference gradient field (how solve_hji builds the
    cache's gradV from the converged value grid)."""
    hs_j = jnp.asarray([k[1] - k[0] for k in knots], jnp.float32)
    Vj = jnp.asarray(V, jnp.float32)
    return np.asarray(jnp.stack(
        [sum(_axis_diffs(Vj, hs_j[ax], ax)) * 0.5 for ax in range(7)],
        axis=-1))


def load_cache(path: str) -> hji_mod.HJICache:
    d = np.load(path)
    knots = [d[f"knots_{i}"] for i in range(7)]
    gradV = (d["gradV"] if "gradV" in d.files
             else grad_from_V(d["V"], knots))
    return hji_mod.make_cache(knots, d["V"], gradV)
