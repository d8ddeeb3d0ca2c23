"""HJI reachability safety filter.

Functional reimplementation of the reference's `src/HJI_computation.jl`:
7-D relative state between the ego bicycle and a "human" simple car, a
precomputed value function V and gradient on a 7-D grid with multilinear
interpolation (+inf outside the grid), relative dynamics, analytic optimal
disturbance, sampled optimal ego control, and the least-restrictive
half-plane constraint injected into the coupled QP.

The grid lives in device memory as flat arrays; the 128-corner gather of
the 7-D multilinear interpolation is vectorized over corners (and batches
trivially under vmap) — the TPU analog of Interpolations.jl's
GriddedInterpolation (`src/HJI_computation.jl:26-29`).

The reference downloads its value function (`BicycleCAvoid.jld2`,
`deps/build.jl:1-4`) computed by an offline HJ solver; this build has no
network access, so `synthetic_cache` generates an analytic stand-in
(time-to-collision-style) for exercising the full filter machinery, and
`inactive_cache` gives the always-safe placeholder analog
(`placeholder_HJICache`, `src/HJI_computation.jl:32-37`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import dynamics as dyn
from pigeon_tpu.config import VehicleParams
from pigeon_tpu.math_utils import adiff

# Relative state components (reference HJIRelativeState,
# src/HJI_computation.jl:10-18): (dE, dN, dpsi, Ux, Uy, V, r) where dE/dN
# are the human's position in the ego body frame (longitudinal, lateral).


class HJICache(NamedTuple):
    knots: tuple          # 7 arrays of grid knots
    V: jnp.ndarray        # flat (prod(dims),)
    # COMPONENT-MAJOR (7, prod(dims)): on TPU an array whose minor
    # dimension is 7 is tile-padded 7 -> 128 (~18x memory; the 242M-point
    # production cache would need 124 GB), while (7, P) pads to
    # (8, P) — ~1.14x.  None = V-only cache (gradient not materialized;
    # interpolate() then returns zero gradients, like the reference's
    # placeholder cache).
    gradV: "jnp.ndarray | None"
    dims: tuple           # static grid shape
    strides: tuple        # static row-major strides


def make_cache(knots, V_grid, gradV_grid=None) -> HJICache:
    dims = tuple(int(k.shape[0]) for k in knots)
    strides = tuple(int(np.prod(dims[i + 1:], dtype=np.int64))
                    for i in range(7))
    if gradV_grid is None:
        g = None
    else:
        # transpose to component-major IN NUMPY: doing it on device would
        # materialize the padded (P, 7) source first
        g = jnp.asarray(np.ascontiguousarray(
            np.asarray(gradV_grid, np.float32).reshape(-1, 7).T))
    # flatten in NUMPY before upload: a 7-D grid with small minor dims
    # tile-pads up to ~14x on TPU (the 242M production V copied as 13.5
    # GB and OOM'd); 1-D arrays pad only to the next 128 lanes
    return HJICache(
        knots=tuple(jnp.asarray(k, jnp.float32) for k in knots),
        V=jnp.asarray(np.asarray(V_grid, np.float32).reshape(-1)),
        gradV=g, dims=dims, strides=strides)


def inactive_cache(value: float = 1e9) -> HJICache:
    """Constant-V cache that never activates the filter — the analog of the
    reference's all-zeros placeholder for the no-asset configuration
    (`placeholder_HJICache`, src/HJI_computation.jl:32-37), but with V large
    so `V <= eps` is never true."""
    knots = [np.array([-1e3, 1e3], np.float32) for _ in range(7)]
    V = np.full((2,) * 7, value, np.float32)
    g = np.zeros((2,) * 7 + (7,), np.float32)
    return make_cache(knots, V, g)


_CORNERS = np.array([[(c >> i) & 1 for i in range(6, -1, -1)]
                     for c in range(128)], np.int32)   # (128, 7)


def interpolate(cache: HJICache, x):
    """Multilinear interpolation of (V, gradV) at x (7,); +inf / zeros
    outside the grid (reference Base.getindex, src/HJI_computation.jl:66-72).
    """
    x = jnp.asarray(x, jnp.float32)
    idx = []
    frac = []
    inside = jnp.asarray(True)
    for i in range(7):
        k = cache.knots[i]
        j = jnp.clip(jnp.searchsorted(k, x[i], side="left") - 1,
                     0, cache.dims[i] - 2)
        idx.append(j)
        frac.append((x[i] - k[j]) / (k[j + 1] - k[j]))
        inside = inside & (x[i] >= k[0]) & (x[i] <= k[-1])
    idx = jnp.stack(idx)                    # (7,)
    frac = jnp.stack(frac)                  # (7,)
    corners = jnp.asarray(_CORNERS)         # (128, 7)
    strides = jnp.asarray(cache.strides)    # (7,)
    flat = jnp.sum((idx[None, :] + corners) * strides[None, :], axis=1)
    w = jnp.prod(jnp.where(corners == 1, frac[None, :], 1.0 - frac[None, :]),
                 axis=1)                    # (128,)
    V = jnp.sum(w * cache.V[flat])
    if cache.gradV is None:
        g = jnp.zeros(7, jnp.float32)
    else:
        g = jnp.sum(w[None, :] * cache.gradV[:, flat], axis=1)
    V = jnp.where(inside, V, jnp.inf)
    g = jnp.where(inside, g, jnp.zeros_like(g))
    return V, g


def relative_state(ego_q6, them):
    """Ego bicycle state + simple-car state -> 7-D relative state
    (reference HJIRelativeState constructor, src/HJI_computation.jl:20-24).

    With heading measured from N, the ego body axes in world coords are
    longitudinal (-sin psi, cos psi), lateral (-cos psi, -sin psi); the
    reference's (sincos swap) rotation computes exactly these projections.
    """
    dE = them[..., 0] - ego_q6[..., 0]
    dN = them[..., 1] - ego_q6[..., 1]
    psi = ego_q6[..., 2]
    s, c = jnp.sin(psi), jnp.cos(psi)
    lon = -s * dE + c * dN
    lat = -c * dE - s * dN
    return jnp.stack([
        lon, lat, adiff(them[..., 2], psi),
        ego_q6[..., 3], ego_q6[..., 4], them[..., 3], ego_q6[..., 5],
    ], axis=-1)


def relative_dynamics(veh: VehicleParams, x7, uR, uH):
    """Relative-state ODE (reference relative_dynamics,
    src/HJI_computation.jl:74-88).  uR = (delta, Fx) ego, uH = (omega, a)."""
    dE, dN, dpsi, Ux, Uy, V, r = (x7[..., i] for i in range(7))
    q6 = jnp.stack([dE, dN, dpsi, Ux, Uy, r], axis=-1)
    bd = dyn.vehicle_ode(veh, "bicycle", q6, uR,
                         jnp.zeros(x7.shape[:-1] + (4,), x7.dtype))
    s, c = jnp.sin(dpsi), jnp.cos(dpsi)
    omega, a = uH[..., 0], uH[..., 1]
    return jnp.stack([
        V * c - Ux + dN * r,
        V * s - Uy - dE * r,
        omega - r,
        bd[..., 3], bd[..., 4],
        a,
        bd[..., 5],
    ], axis=-1)


def optimal_disturbance(veh: VehicleParams, x7, gradV, d_mode: str = "min"):
    """Analytic worst/best-case human control (omega, a) (reference
    optimal_disturbance, src/HJI_computation.jl:90-131), with the branch
    tree converted to nested `where`s."""
    sgn = 1.0 if d_mode == "max" else -1.0
    # guard: the analytic formulas divide by the human speed; the reference
    # never queries V ~ 0 (its grid's V axis is strictly positive) but the
    # on-device PDE solver sweeps the whole grid.
    V = jnp.maximum(x7[..., 5], 0.1)
    kappa_max = veh.kappa_max
    Ax_max = veh.Fx_max / veh.m
    Pmx_max = veh.Px_max / veh.m
    maxA = 0.9 * veh.mu * veh.G

    lam_w = gradV[..., 2]
    lam_Ax = gradV[..., 5]
    lam_Ay = lam_w / V
    lam_norm = jnp.hypot(lam_Ax, lam_Ay)
    safe_norm = jnp.maximum(lam_norm, 1e-12)

    desAx = sgn * lam_Ax * maxA / safe_norm
    desAy = sgn * lam_Ay * maxA / safe_norm
    maxAx = jnp.minimum(Ax_max, Pmx_max / V)
    maxAy = kappa_max * V * V

    # Branch 1: desired Ax exceeds the drive limit
    maxAy_1 = jnp.where(jnp.abs(desAy) < maxAy,
                        jnp.minimum(maxAy, jnp.sqrt(jnp.maximum(
                            maxA * maxA - maxAx * maxAx, 0.0))),
                        maxAy)
    out1 = jnp.stack([jnp.copysign(maxAy_1, desAy) / V, maxAx], axis=-1)
    # Branch 2: |desAy| exceeds the curvature limit
    maxAx_2a = jnp.minimum(jnp.sqrt(jnp.maximum(
        maxA * maxA - maxAy * maxAy, 0.0)), maxAx)
    out2 = jnp.stack([
        jnp.copysign(maxAy, desAy) / V,
        jnp.where(desAx > 0, maxAx_2a,
                  -jnp.sqrt(jnp.maximum(maxA * maxA - maxAy * maxAy, 0.0))),
    ], axis=-1)
    # Branch 3: interior
    out3 = jnp.stack([desAy / V, maxAx], axis=-1)

    out = jnp.where((desAx > maxAx)[..., None], out1,
                    jnp.where((jnp.abs(desAy) > maxAy)[..., None], out2,
                              out3))
    zero = jnp.zeros_like(out)
    return jnp.where((lam_norm < 1e-3)[..., None], zero, out)


def optimal_control(veh: VehicleParams, x7, gradV, u_mode: str = "max",
                    n_samples: int = 50):
    """Bang-bang steering + Fx line search maximizing the Hamiltonian
    (reference optimal_control, src/HJI_computation.jl:133-158)."""
    sgn = 1.0 if u_mode == "max" else -1.0
    A = gradV[..., 3] / veh.m
    B = gradV[..., 4] / veh.m + veh.a * gradV[..., 6] / veh.Izz
    C = gradV[..., 4] / veh.m - veh.b * gradV[..., 6] / veh.Izz
    delta_opt = jnp.where(B >= 0, sgn * veh.delta_max, -sgn * veh.delta_max)

    fracs = jnp.arange(n_samples, dtype=x7.dtype) / (n_samples - 1)
    Fx_grid = fracs * veh.Fx_max + (1.0 - fracs) * veh.Fx_min   # (K,)

    Ux, Uy, r = x7[..., 3], x7[..., 4], x7[..., 6]

    def ham(Fx):
        Fxf, Fxr = dyn.longitudinal_split(veh, Fx)
        d_b, Ff_b, Fr_b = jnp.broadcast_arrays(delta_opt, Fxf, Fxr)
        u3 = jnp.stack([d_b, Ff_b, Fr_b], axis=-1)
        Fyf, Fyr = dyn.lateral_tire_forces(veh, Ux, Uy, r, u3)
        return A * Fx + B * Fyf + C * Fyr

    # Running max over the Fx samples instead of a vmapped (K, grid)
    # stack: the HJI-VI solver evaluates this over multi-GB grids, where
    # K materialized copies of the grid would exceed HBM.  First-max tie
    # semantics match argmax.
    def body(k, carry):
        best_val, best_Fx = carry
        Fx = Fx_grid[k]
        v = sgn * ham(Fx)
        better = v > best_val
        return (jnp.where(better, v, best_val),
                jnp.where(better, Fx, best_Fx))

    v0 = sgn * ham(Fx_grid[0])
    best_val, Fx_opt = jax.lax.fori_loop(
        1, n_samples, body, (v0, jnp.broadcast_to(Fx_grid[0], v0.shape)))
    return jnp.stack([delta_opt, Fx_opt], axis=-1)


def reachability_constraint(veh: VehicleParams, cache: HJICache, x7,
                            eps: float, u_lin=None):
    """Least-restrictive half-plane M.u + b >= 0 on the ego control,
    linearized at u_lin; inactive (M=0, b=1) when V(x) > eps (reference
    compute_reachability_constraint, src/HJI_computation.jl:160-170)."""
    V, gradV = interpolate(cache, x7)
    gradV = gradV.astype(x7.dtype)
    if u_lin is None:
        u_lin = optimal_control(veh, x7, gradV)
    uH = optimal_disturbance(veh, x7, gradV)

    def ham(uR):
        return jnp.dot(gradV, relative_dynamics(veh, x7, uR, uH))

    M_act = jax.grad(ham)(u_lin)
    b_act = ham(u_lin) - jnp.dot(M_act, u_lin)

    active = V <= eps
    M = jnp.where(active, M_act, jnp.zeros_like(M_act))
    b = jnp.where(active, b_act, jnp.ones_like(b_act))
    return M, b, V, gradV


# ---------------------------------------------------------------------------
# Synthetic value function (no-network stand-in for BicycleCAvoid.jld2)
# ---------------------------------------------------------------------------

def _analytic_value(x7, margin: float = 3.0, horizon: float = 1.0):
    """Smooth collision-proximity surrogate: minimum predicted separation
    (constant-velocity extrapolation over `horizon`) minus a margin."""
    dE, dN, dpsi, Ux, Uy, V, r = (x7[i] for i in range(7))
    # relative velocity of the human in ego body frame
    rvx = V * jnp.cos(dpsi) - Ux
    rvy = V * jnp.sin(dpsi) - Uy
    taus = jnp.linspace(0.0, horizon, 8)
    d2 = (dE + rvx * taus) ** 2 + (dN + rvy * taus) ** 2
    # soft-min for differentiability
    dmin = -jax.nn.logsumexp(-jnp.sqrt(d2 + 1e-6) * 2.0) / 2.0
    return dmin - margin


def synthetic_cache(n_per_dim: int = 5) -> HJICache:
    """Build a coarse 7-D grid of the analytic surrogate value + gradient.

    Stands in for the reference's downloaded HJI solution so the filter
    path (interpolation, optimal control/disturbance, QP rows, override)
    can run end-to-end; replace with a PDE-solved cache when available.
    """
    knots = [
        np.linspace(-20.0, 20.0, n_per_dim),   # dE
        np.linspace(-20.0, 20.0, n_per_dim),   # dN
        np.linspace(-np.pi, np.pi, n_per_dim),  # dpsi
        np.linspace(1.0, 20.0, n_per_dim),     # Ux
        np.linspace(-3.0, 3.0, n_per_dim),     # Uy
        np.linspace(0.0, 20.0, n_per_dim),     # V
        np.linspace(-1.5, 1.5, n_per_dim),     # r
    ]
    grids = np.meshgrid(*knots, indexing="ij")
    pts = jnp.asarray(np.stack([g.ravel() for g in grids], axis=-1))
    vf = jax.vmap(_analytic_value)
    gf = jax.vmap(jax.grad(_analytic_value))
    V = np.asarray(vf(pts)).reshape([n_per_dim] * 7)
    G = np.asarray(gf(pts)).reshape([n_per_dim] * 7 + [7])
    return make_cache(knots, V, G)
