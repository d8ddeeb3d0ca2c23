"""Coupled lateral+longitudinal tracking QP assembly.

Functional reimplementation of the reference's coupled MPC formulation
(`src/coupled_lat_long.jl:197-313` construct + `:315-368` update): a
6-state LTV tracking QP with (delta, Fx) decision controls normalized to
~[-1,1], ZOH dynamics over the short horizon, FOH over the long horizon,
HJI half-plane rows on the first N_short controls with slack, speed/force/
power bounds, stability-envelope soft constraints, and slew-rate bounds.

Variable layout (flat, 0-based stage t; N knots, T = N-1 stages):
    q[t, 0:6]   tracking state (ds, Ux, Uy, r, dpsi, e), t in [0, N)
    u[t, 0:2]   normalized controls (delta, Fx)/u_norm,   t in [0, N)
    sig[t, 0:2] envelope slacks (beta rows, r rows),       t in [0, T)
    sHJI[t]     HJI slack,                                 t in [0, S)
    dd[t]       delta slew,                                t in [0, T)
    dF[t]       Fx slew,                                   t in [0, T)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu.config import CoupledControlParams, HorizonParams, VehicleParams
from pigeon_tpu.qp.structure import INF, QPLayout
from pigeon_tpu.solver.admm import QPData


def u_normalization(veh: VehicleParams):
    """(delta, Fx) normalization to ~[-1, 1]
    (reference `src/coupled_lat_long.jl:199`)."""
    return np.array([veh.delta_max, max(-veh.Fx_min, veh.Fx_max)])


class CoupledLayout:
    """Static sparsity plan for one horizon shape; build once, reuse."""

    def __init__(self, hz: HorizonParams, use_walls: bool = False):
        S, Lg = hz.N_short, hz.N_long
        N, T = hz.N, hz.N_short + hz.N_long
        self.hz = hz
        self.use_walls = use_walls
        lay = QPLayout()
        eq_rows = []               # statically-known equality rows (l == u):
        #                            the solver's mixed-precision Pallas mode
        #                            keeps these rows' matvec tiles at fp32
        #                            (their rho_eq scaling amplifies bf16x3
        #                            noise into divergence; see
        #                            solver/pallas_admm.py)
        self.q = lay.add_vars((N, 6))
        self.u = lay.add_vars((N, 2))
        self.sig = lay.add_vars((T, 2))
        self.sHJI = lay.add_vars((S,))
        self.dd = lay.add_vars((T,))
        self.dF = lay.add_vars((T,))

        # Constraint rows, in allocation order.  Each `entry` call registers
        # nonzero positions whose values `assemble` supplies in the SAME
        # order below.  EQUALITY rows are allocated FIRST so the solver's
        # mixed-precision Pallas mode gets its eq/ineq row split with no
        # runtime permutation (eq_rows == arange(m_eq)).
        r = lay.add_rows(T)                         # diff(delta) == dd
        eq_rows.append(r)
        lay.entry(r, self.u[1:, 0]); lay.entry(r, self.u[:-1, 0])
        lay.entry(r, self.dd)
        r = lay.add_rows(T)                         # diff(Fx) == dF
        eq_rows.append(r)
        lay.entry(r, self.u[1:, 1]); lay.entry(r, self.u[:-1, 1])
        lay.entry(r, self.dF)
        r = lay.add_rows(6)                         # q[0] == q_curr
        eq_rows.append(r)
        lay.entry(r, self.q[0])
        r = lay.add_rows(2)                         # u[0] == u_curr
        eq_rows.append(r)
        lay.entry(r, self.u[0])
        r = lay.add_rows(6 * S).reshape(S, 6)       # ZOH dynamics
        eq_rows.append(r.ravel())
        lay.entry(r[:, :, None], self.q[:S][:, None, :])        # A_t
        lay.entry(r[:, :, None], self.u[:S][:, None, :])        # B_t
        lay.entry(r, self.q[1:S + 1])                           # -I q_{t+1}
        r = lay.add_rows(6 * Lg).reshape(Lg, 6)     # FOH dynamics
        eq_rows.append(r.ravel())
        lay.entry(r[:, :, None], self.q[S:S + Lg][:, None, :])  # A_t
        lay.entry(r[:, :, None], self.u[S:S + Lg][:, None, :])  # B0_t
        lay.entry(r[:, :, None], self.u[S + 1:][:, None, :])    # Bf_t
        lay.entry(r, self.q[S + 1:])                            # -I
        # ---- inequality rows ------------------------------------------
        r = lay.add_rows(2 * T)                     # sig >= 0
        lay.entry(r, self.sig.ravel())
        r = lay.add_rows(S)                         # sHJI >= 0
        lay.entry(r, self.sHJI)
        r = lay.add_rows(N)                         # V_min <= Ux <= V_max
        lay.entry(r, self.q[:, 1])
        r = lay.add_rows(N)                         # Fx bounds (merged rows)
        lay.entry(r, self.u[:, 1])
        r = lay.add_rows(S)                         # HJI half-planes
        lay.entry(r[:, None], self.u[:S])                       # M row
        lay.entry(r, self.sHJI)                                 # + slack
        r = lay.add_rows(T)                         # delta bounds on t+1
        lay.entry(r, self.u[1:, 0])
        r = lay.add_rows(4 * T).reshape(T, 4)       # envelope H [Uy,r]-sig
        lay.entry(r[:, :, None], self.q[1:, 2:4][:, None, :])   # H_t
        lay.entry(r, self.sig[:, [0, 0, 1, 1]])                 # -slacks
        r = lay.add_rows(T)                         # ddelta rate bounds
        lay.entry(r, self.dd)
        if use_walls:
            # wall/edge soft bounds on the lateral error e (the reference
            # both_walls configuration; edges from the trajectory tube)
            self.sw = lay.add_vars((T,))
            r = lay.add_rows(T)                     # sw >= 0
            lay.entry(r, self.sw)
            r = lay.add_rows(T)                     # e - sw <= edgeL - marg
            lay.entry(r, self.q[1:, 5]); lay.entry(r, self.sw)
            r = lay.add_rows(T)                     # e + sw >= edgeR + marg
            lay.entry(r, self.q[1:, 5]); lay.entry(r, self.sw)
        lay.finalize()
        self.lay = lay
        self.n, self.m = lay.n, lay.m
        self.eq_rows = np.concatenate(eq_rows)
        assert np.array_equal(self.eq_rows, np.arange(self.eq_rows.size))


@functools.lru_cache(maxsize=None)
def get_layout(hz: HorizonParams, use_walls: bool = False) -> CoupledLayout:
    return CoupledLayout(hz, use_walls)


class CoupledStageData(NamedTuple):
    """Traced per-step inputs to assembly (the analog of the reference's
    Parameter rewrite in `update_QP!`, `src/coupled_lat_long.jl:315-368`)."""

    dt: jnp.ndarray        # (T,)
    qs: jnp.ndarray        # (N, 6) linearization states
    us: jnp.ndarray        # (N, 2) linearization controls (physical units)
    ps: jnp.ndarray        # (N, 4) trajectory params (V, kappa, 0, 0)
    hji_M: jnp.ndarray     # (2,) constraint row on physical u
    hji_b: jnp.ndarray     # () offset
    edges: jnp.ndarray = None   # (N, 2) [edge_L, edge_R] at node arclengths
    #                             (required when walls are enabled)


def build_qp(veh: VehicleParams, ctl: CoupledControlParams,
             hz: HorizonParams, data: CoupledStageData,
             lin_method: str = "expm", lin_substeps: int = 1) -> QPData:
    """Linearize along the horizon and assemble the canonical QP.

    lin_method "expm" (default) continuously linearizes then *exactly*
    discretizes (unconditionally stable — the reference's jacfwd-through-
    one-RK4-step approach amplifies the stiff lateral tire modes over
    dt_long=0.2: |lambda| ~ 250/Ux 1/s puts lambda*dt far outside RK4's
    stability region, which destabilizes the long-horizon LTV model).
    "rk4" mirrors the reference integrator path (`linearize(...,
    StepControl/RampControl)` ForwardDiff-ing through the RK4 propagate,
    src/coupled_lat_long.jl:253,262) with `lin_substeps` RK4 steps per
    stage (1 = the reference-faithful single step).
    """
    S, Lg, N = hz.N_short, hz.N_long, hz.N
    T = S + Lg
    L = get_layout(hz, ctl.use_walls)
    dt, qs, us, ps = data.dt, data.qs, data.us, data.ps
    dtype = qs.dtype
    unorm = jnp.asarray(u_normalization(veh), dtype)

    def f(q, ur):
        return dyn.vehicle_ode(veh, "tracking", q, ur[:2], ur[2:])

    ur = jnp.concatenate([us, ps], axis=-1)        # (N, 6)

    if lin_method == "expm_split":
        # per-hold-order chains at reference-grade precision (slow path,
        # kept for bisection/validation against the fused chain)
        Az, Bz, cz = jax.vmap(
            lambda q, u, h: dz.linearize_affine_zoh(f, q, u, h, 2))(
            qs[:S], ur[:S], dt[:S])
        Af, B0f, Bff, cf = jax.vmap(
            lambda q, u0, uf, h: dz.linearize_affine_foh(f, q, u0, uf, h,
                                                         2))(
            qs[S:T], ur[S:T], ur[S + 1:N], dt[S:T])
    elif lin_method == "expm":
        # ZOH (short horizon, reference :336) + FOH (long horizon, :348)
        # as ONE fused 19x19 expm chain over all T stages with tuned
        # squarings/order (4, 6): 9 batched matmuls at 3-pass precision —
        # measured vs scipy fp64 expm on live fleet stage matrices
        # (||M dt|| ~ 1.2 short / ~23 long): sq=4 err 4.5e-7, sq=7 err
        # 2.5e-6 (MORE squarings accumulate MORE fp32 rounding), sq<=2
        # under-scales the long stages
        # vs the split chains' 30 at 6-pass — the QP-assembly hot-path
        # fix (57 -> ~15 ms at B=2048; error ~1e-5 relative at the
        # worst-case ||J*dt|| ~ 38 of the V_min=1 tire modes, far inside
        # the solver's 1e-3 tolerance).
        A_all, B0_all, Bf_all, c_all = dz.linearize_horizon_fused(
            f, qs, ur, dt, S, 2, squarings=4, order=6, precision="high")
        Az, Bz, cz = A_all[:S], B0_all[:S], c_all[:S]
        Af, B0f, Bff, cf = A_all[S:], B0_all[S:], Bf_all[S:], c_all[S:]
    else:
        Az, Bz, cz = jax.vmap(
            lambda q, u, h: dz.linearize_zoh(f, q, u, h, 2,
                                             substeps=lin_substeps))(
            qs[:S], ur[:S], dt[:S])
        Af, B0f, Bff, cf = jax.vmap(
            lambda q, u0, uf, h: dz.linearize_foh(f, q, u0, uf, h, 2,
                                                  substeps=lin_substeps))(
            qs[S:T], ur[S:T], ur[S + 1:N], dt[S:T])

    # per-stage envelope + bounds at the t+1 nodes (reference :356-366)
    Ux_t = qs[1:, 1]                               # (T,)
    Fxf_t, Fxr_t = dyn.longitudinal_split(veh, us[1:, 1])
    lim = dyn.stable_limits(veh, Ux_t, Fxf_t, Fxr_t)
    d_min = jnp.maximum(lim.delta_min, -veh.delta_max) / unorm[0]
    d_max = jnp.minimum(lim.delta_max, veh.delta_max) / unorm[0]
    Fx_hi = jnp.minimum(veh.Px_max / Ux_t, veh.Fx_max) / unorm[1]
    dd_lim = ctl.delta_dot_max * dt / unorm[0]

    q_curr = qs[0]
    u_curr = us[0] / unorm

    ones = functools.partial(jnp.ones, dtype=dtype)
    neg1 = lambda shape: -ones(shape)
    values = [
        ones(T), neg1(T), neg1(T),                   # delta diff
        ones(T), neg1(T), neg1(T),                   # Fx diff
        ones(6),                                     # q pin
        ones(2),                                     # u pin
        Az, Bz * unorm[None, None, :], neg1((S, 6)),  # ZOH
        Af, B0f * unorm[None, None, :], Bff * unorm[None, None, :],
        neg1((Lg, 6)),                               # FOH
        ones(2 * T),                                 # sig >= 0
        ones(S),                                     # sHJI >= 0
        ones(N),                                     # Ux bounds
        ones(N),                                     # Fx bounds
        jnp.broadcast_to(data.hji_M * unorm, (S, 2)), ones(S),   # HJI
        ones(T),                                     # delta bounds
        jnp.broadcast_to(lim.H_veh, (T, 4, 2)), neg1((T, 4)),    # envelope
        ones(T),                                     # dd bounds
    ]
    if ctl.use_walls:
        values += [ones(T),                          # sw >= 0
                   ones(T), neg1(T),                 # e - sw
                   ones(T), ones(T)]                 # e + sw
    A = L.lay.assemble_A(values)

    big = jnp.asarray(INF, dtype)
    lo = jnp.concatenate([
        jnp.zeros(T, dtype), jnp.zeros(T, dtype),    # diffs
        q_curr, u_curr,
        -cz.reshape(-1),                             # ZOH equalities
        -cf.reshape(-1),                             # FOH equalities
        jnp.zeros(2 * T, dtype),                     # sig
        jnp.zeros(S, dtype),                         # sHJI
        jnp.full(N, ctl.V_min, dtype),               # Ux
        jnp.full(N, veh.Fx_min / float(u_normalization(veh)[1]), dtype),
        jnp.full(S, -data.hji_b, dtype),             # HJI
        d_min,                                       # delta bounds
        jnp.full(4 * T, -INF, dtype),                # envelope
        -dd_lim,                                     # dd bounds
    ] + ([jnp.zeros(T, dtype),                       # sw >= 0
          jnp.full(T, -INF, dtype),                  # e - sw upper only
          data.edges[1:, 1] + ctl.wall_margin,       # e + sw >= edgeR + m
          ] if ctl.use_walls else []))
    hi = jnp.concatenate([
        jnp.zeros(T, dtype), jnp.zeros(T, dtype),
        q_curr, u_curr,
        -cz.reshape(-1),
        -cf.reshape(-1),
        jnp.full(2 * T, big), jnp.full(S, big),
        jnp.full(N, ctl.V_max, dtype),
        jnp.concatenate([jnp.full(1, big), Fx_hi]),  # Fx: t=0 unbounded above
        jnp.full(S, big),
        d_max,
        (lim.G_veh).reshape(-1),                     # envelope upper
        dd_lim,
    ] + ([jnp.full(T, big),
          data.edges[1:, 0] - ctl.wall_margin,       # e - sw <= edgeL - m
          jnp.full(T, big),
          ] if ctl.use_walls else []))

    # Objective.  Parametron's x'Qx convention -> our 1/2 x'Px needs P=2Q.
    P = jnp.zeros(L.n, dtype)
    P = P.at[L.q[1:, 0]].set(2.0 * ctl.Q_ds * dt)
    P = P.at[L.q[1:, 4]].set(2.0 * ctl.Q_dpsi * dt)
    P = P.at[L.q[1:, 5]].set(2.0 * ctl.Q_e * dt)
    P = P.at[L.u[1:, 0]].set(2.0 * ctl.R_delta * dt)
    P = P.at[L.u[1:, 1]].set(2.0 * ctl.R_Fx * dt)
    P = P.at[L.dd].set(2.0 * ctl.R_ddelta / dt)
    P = P.at[L.dF].set(2.0 * ctl.R_dFx / dt)
    qlin = jnp.zeros(L.n, dtype)
    qlin = qlin.at[L.sig[:, 0]].set(ctl.W_beta * dt)
    qlin = qlin.at[L.sig[:, 1]].set(ctl.W_r * dt)
    w_hji = jnp.where(jnp.arange(S) < ctl.N_HJI, ctl.W_HJI, 0.0).astype(dtype)
    qlin = qlin.at[L.sHJI].set(w_hji)
    if ctl.use_walls:
        qlin = qlin.at[L.sw].set(ctl.W_wall * dt)

    return QPData(P_diag=P, q=qlin, A=A, l=lo, u=hi)


def extract_control(veh: VehicleParams, hz: HorizonParams, x: jnp.ndarray,
                    use_walls: bool = False):
    """Next physical control (delta, Fx) = normalized u[:,2] rescaled
    (reference `get_next_control`, `src/coupled_lat_long.jl:370-374`)."""
    L = get_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    return x[L.u[1]] * unorm


def extract_trajectory(hz: HorizonParams, x: jnp.ndarray, veh: VehicleParams,
                       use_walls: bool = False):
    """Full (q, u) solution matrices for warm-start resampling
    (reference `update_interpolations!`, `src/coupled_lat_long.jl:189-195`)."""
    L = get_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    return x[L.q], x[L.u] * unorm
