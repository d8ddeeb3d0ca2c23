"""Decoupled (lateral-only) tracking QP assembly.

Functional reimplementation of the reference's `vanilla_mpc` lateral
formulation (`src/decoupled_lat_long.jl:106-273`): 4-state LTV dynamics
with steering the single decision control (longitudinal force handled by a
feedforward accel law during node seeding), envelope soft constraints,
steering and slew bounds.  Dynamics matrices come from the reference's
double linearization — continuous Jacobian then *exact* ZOH/FOH
discretization (`src/decoupled_lat_long.jl:172-189`).

Variable layout (N knots, T = N-1 stages):
    q[t, 0:4]   lateral state (Uy, r, dpsi, e), t in [0, N)
    d[t]        steering angle (rad),            t in [0, N)
    sig[t, 0:2] envelope slacks,                 t in [0, T)
    dd[t]       steering slew,                   t in [0, T)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu.config import (DecoupledControlParams, HorizonParams,
                               VehicleParams)
from pigeon_tpu.qp.structure import INF, QPLayout
from pigeon_tpu.solver.admm import QPData


class DecoupledLayout:
    def __init__(self, hz: HorizonParams):
        S, Lg = hz.N_short, hz.N_long
        N, T = hz.N, S + Lg
        self.hz = hz
        lay = QPLayout()
        self.q = lay.add_vars((N, 4))
        self.d = lay.add_vars((N,))
        self.sig = lay.add_vars((T, 2))
        self.dd = lay.add_vars((T,))

        r = lay.add_rows(2 * T)                     # sig >= 0
        lay.entry(r, self.sig.ravel())
        r = lay.add_rows(T)                         # diff(delta) == dd
        lay.entry(r, self.d[1:]); lay.entry(r, self.d[:-1])
        lay.entry(r, self.dd)
        r = lay.add_rows(4)                         # q[0] == q_curr
        lay.entry(r, self.q[0])
        r = lay.add_rows(1)                         # d[0] == delta_curr
        lay.entry(r, self.d[:1])
        r = lay.add_rows(4 * S).reshape(S, 4)       # ZOH dynamics
        lay.entry(r[:, :, None], self.q[:S][:, None, :])       # A_t
        lay.entry(r, np.broadcast_to(self.d[:S, None], (S, 4)))  # B_t col
        lay.entry(r, self.q[1:S + 1])                          # -I
        r = lay.add_rows(4 * Lg).reshape(Lg, 4)     # FOH dynamics
        lay.entry(r[:, :, None], self.q[S:S + Lg][:, None, :])
        lay.entry(r, np.broadcast_to(self.d[S:S + Lg, None], (Lg, 4)))
        lay.entry(r, np.broadcast_to(self.d[S + 1:N, None], (Lg, 4)))
        lay.entry(r, self.q[S + 1:])
        r = lay.add_rows(T)                         # delta bounds on t+1
        lay.entry(r, self.d[1:])
        r = lay.add_rows(4 * T).reshape(T, 4)       # envelope on (Uy, r)
        lay.entry(r[:, :, None], self.q[1:, 0:2][:, None, :])
        lay.entry(r, self.sig[:, [0, 0, 1, 1]])
        r = lay.add_rows(T)                         # slew bounds
        lay.entry(r, self.dd)
        lay.finalize()
        self.lay = lay
        self.n, self.m = lay.n, lay.m


@functools.lru_cache(maxsize=None)
def get_layout(hz: HorizonParams) -> DecoupledLayout:
    return DecoupledLayout(hz)


class DecoupledStageData(NamedTuple):
    dt: jnp.ndarray        # (T,)
    qs: jnp.ndarray        # (N, 4) lateral states at nodes
    us: jnp.ndarray        # (N, 2) (delta, Fx) at nodes (physical)
    ps: jnp.ndarray        # (N, 4) (Ux, kappa, 0, 0)


def build_qp(veh: VehicleParams, ctl: DecoupledControlParams,
             hz: HorizonParams, data: DecoupledStageData) -> QPData:
    S, Lg, N = hz.N_short, hz.N_long, hz.N
    T = S + Lg
    L = get_layout(hz)
    dt, qs, us, ps = data.dt, data.qs, data.us, data.ps
    dtype = qs.dtype

    def f(q, ur):
        return dyn.vehicle_ode(veh, "lateral", q, ur[:2], ur[2:])

    ur = jnp.concatenate([us, ps], axis=-1)        # (N, 6)

    Az, Bz, cz = jax.vmap(
        lambda q, u, h: dz.linearize_affine_zoh(f, q, u, h, 1))(
        qs[:S], ur[:S], dt[:S])
    Af, B0f, Bff, cf = jax.vmap(
        lambda q, u0, uf, h: dz.linearize_affine_foh(f, q, u0, uf, h, 1))(
        qs[S:T], ur[S:T], ur[S + 1:N], dt[S:T])

    # envelope + bounds at t+1 nodes (reference :192-211)
    Ux_t = ps[1:, 0]
    Fxf_t, Fxr_t = dyn.longitudinal_split(veh, us[1:, 1])
    lim = dyn.stable_limits(veh, Ux_t, Fxf_t, Fxr_t)
    d_min = jnp.maximum(lim.delta_min, -veh.delta_max)
    d_max = jnp.minimum(lim.delta_max, veh.delta_max)
    dd_lim = ctl.delta_dot_max * dt

    ones = functools.partial(jnp.ones, dtype=dtype)
    neg1 = lambda shape: -ones(shape)
    values = [
        ones(2 * T),
        ones(T), neg1(T), neg1(T),
        ones(4), ones(1),
        Az, Bz[:, :, 0], neg1((S, 4)),
        Af, B0f[:, :, 0], Bff[:, :, 0], neg1((Lg, 4)),
        ones(T),
        jnp.broadcast_to(lim.H_veh, (T, 4, 2)), neg1((T, 4)),
        ones(T),
    ]
    A = L.lay.assemble_A(values)

    big = jnp.asarray(INF, dtype)
    lo = jnp.concatenate([
        jnp.zeros(2 * T, dtype),
        jnp.zeros(T, dtype),
        qs[0], us[0, :1],
        -cz.reshape(-1), -cf.reshape(-1),
        d_min,
        jnp.full(4 * T, -INF, dtype),
        -dd_lim,
    ])
    hi = jnp.concatenate([
        jnp.full(2 * T, big),
        jnp.zeros(T, dtype),
        qs[0], us[0, :1],
        -cz.reshape(-1), -cf.reshape(-1),
        d_max,
        lim.G_veh.reshape(-1),
        dd_lim,
    ])

    P = jnp.zeros(L.n, dtype)
    P = P.at[L.q[1:, 2]].set(2.0 * ctl.Q_dpsi * dt)
    P = P.at[L.q[1:, 3]].set(2.0 * ctl.Q_e * dt)
    P = P.at[L.d[1:]].set(2.0 * ctl.R_delta * dt)
    P = P.at[L.dd].set(2.0 * ctl.R_ddelta / dt)
    qlin = jnp.zeros(L.n, dtype)
    qlin = qlin.at[L.sig[:, 0]].set(ctl.W_beta * dt)
    qlin = qlin.at[L.sig[:, 1]].set(ctl.W_r * dt)

    return QPData(P_diag=P, q=qlin, A=A, l=lo, u=hi)


def extract_control(hz: HorizonParams, x: jnp.ndarray, us: jnp.ndarray):
    """(delta, Fx): steering from the QP's second knot, Fx feedforward from
    the node seeding (reference `get_next_control`,
    `src/decoupled_lat_long.jl:275-278`)."""
    L = get_layout(hz)
    return jnp.stack([x[L.d[1]], us[1, 1]])


# ---------------------------------------------------------------------------
# SOFT condensed decoupled formulation (the TPU-native form of the
# reference's DEFAULT controller, X1DMPC `src/Pigeon.jl:34`)
# ---------------------------------------------------------------------------

class SoftDecoupledLayout:
    """Static plan for the SOFT condensed decoupled (lateral) QP.

    Same elimination strategy as the coupled `SoftCondensedLayout`
    (`qp/condensed.py`), applied to the lateral-only formulation
    (`src/decoupled_lat_long.jl:106-273`):

      - the 4 lateral states are eliminated through the LTV dynamics
        (rollout map G/g over the free steering knots);
      - the q[0]/d[0] pins are substituted out (parameters, not
        decisions);
      - envelope slacks sig + their >=0 rows become per-row exact L1
        penalties in the ADMM z-update (the reference's slack sharing
        pairs +-half-planes whose violations are mutually exclusive, so
        per-row penalties are exact — see SoftCondensedLayout docstring);
      - the dd slew variables + diff equality rows fold into the dense
        Hessian (tridiagonal R_ddelta coupling) and two-entry rate rows.

    Result for the default decoupled config (N=31): n = N-1 = 30
    steering variables, m = 6T = 180 rows (T = 30), ZERO equality rows —
    the whole per-instance problem fits one 128-lane tile of the
    lane-batched VPU solver (`solver/lane_admm.py`), vs n=245/m=395 for
    the sparse form.  Mathematically equivalent: eliminated rows were
    equalities, penalties are exact.

    Row order: delta (T, hard) | envelope (4T, soft) | rate (T, hard).
    """

    def __init__(self, hz: HorizonParams):
        N, T = hz.N, hz.N_short + hz.N_long
        self.hz = hz
        self.n = N - 1            # steering at knots 1..N-1
        self.u = np.arange(N - 1)  # var index of delta at knot t+1
        r0 = 0
        self.r_delta = np.arange(r0, r0 + T); r0 += T
        self.r_env = np.arange(r0, r0 + 4 * T).reshape(T, 4); r0 += 4 * T
        self.r_rate = np.arange(r0, r0 + T); r0 += T
        self.m = r0
        self.eq_rows = np.zeros((0,), np.int64)

        # static scatter indices for the identity/rate row families
        rows = [self.r_delta, self.r_rate[0:1],
                np.repeat(self.r_rate[1:], 2)]
        cols = [self.u[:T], self.u[0:1],
                np.stack([self.u[1:T], self.u[0:T - 1]], axis=-1).ravel()]
        self._sp_rows = np.concatenate(rows)
        self._sp_cols = np.concatenate(cols)
        self._sp_vals = np.concatenate([
            np.ones(T), np.ones(1),
            np.tile(np.asarray([1.0, -1.0]), T - 1)])


@functools.lru_cache(maxsize=None)
def get_soft_layout(hz: HorizonParams) -> SoftDecoupledLayout:
    return SoftDecoupledLayout(hz)


def build_qp_soft(veh: VehicleParams, ctl: DecoupledControlParams,
                  hz: HorizonParams, data: DecoupledStageData):
    """Assemble the soft condensed decoupled QP (same double-linearization
    semantics as `build_qp`; reference `src/decoupled_lat_long.jl:134-226`).

    Returns a `qp/condensed.py SoftQP` (shape-generic: G is (T, 4, n)
    here)."""
    from pigeon_tpu.qp.condensed import SoftQP, rollout_affine

    S, Lg, N = hz.N_short, hz.N_long, hz.N
    T = S + Lg
    L = get_soft_layout(hz)
    dt, qs, us, ps = data.dt, data.qs, data.us, data.ps
    dtype = qs.dtype
    n = L.n

    def f(q, ur):
        return dyn.vehicle_ode(veh, "lateral", q, ur[:2], ur[2:])

    ur = jnp.concatenate([us, ps], axis=-1)        # (N, 6)
    A_all, B0_all, Bf_all, c_all = dz.linearize_horizon_fused(
        f, qs, ur, dt, S, 1, squarings=4, order=6, precision="high")

    d_curr = us[0, 0]
    q_curr = qs[0]

    # ---- rollout over the FREE steering knots, pins into the offset ----
    # q_{t+1} = G[t] d_free + g[t]; d_free = delta at knots 1..N-1.
    E = jnp.zeros((T, 4, n + 1), dtype)
    E = E.at[0, :, 0:1].add(Bf_all[0])     # stage 0: Bf hits knot 1
    tt = jnp.arange(1, T)
    E = E.at[tt[:, None], jnp.arange(4)[None, :], (tt - 1)[:, None]
             ].add(B0_all[1:T, :, 0])
    E = E.at[tt[:, None], jnp.arange(4)[None, :], tt[:, None]
             ].add(Bf_all[1:T, :, 0])
    e0 = A_all[0] @ q_curr + c_all[0] + B0_all[0, :, 0] * d_curr
    E = E.at[:, :, n].add(jnp.concatenate([e0[None], c_all[1:T]]))
    M_cum = rollout_affine(A_all, E)
    G = M_cum[:, :, :n]                    # (T, 4, n)
    g = M_cum[:, :, n]                     # (T, 4)

    # envelope + bounds at the t+1 nodes (reference :192-211)
    Ux_t = ps[1:, 0]
    Fxf_t, Fxr_t = dyn.longitudinal_split(veh, us[1:, 1])
    lim = dyn.stable_limits(veh, Ux_t, Fxf_t, Fxr_t)
    d_min = jnp.maximum(lim.delta_min, -veh.delta_max)
    d_max = jnp.minimum(lim.delta_max, veh.delta_max)
    dd_lim = ctl.delta_dot_max * dt

    H_veh = jnp.broadcast_to(lim.H_veh, (T, 4, 2)).astype(dtype)
    Henv = jnp.einsum("tij,tjk->tik", H_veh, G[:, 0:2, :])   # (T, 4, n)
    Henv_off = jnp.einsum("tij,tj->ti", H_veh, g[:, 0:2])    # (T, 4)

    A = jnp.zeros((L.m, n), dtype)
    A = A.at[jnp.asarray(L.r_env).ravel()].set(Henv.reshape(4 * T, n))
    A = A.at[jnp.asarray(L._sp_rows), jnp.asarray(L._sp_cols)].add(
        jnp.asarray(L._sp_vals, dtype))

    big = jnp.asarray(INF, dtype)
    lo = jnp.concatenate([
        d_min,
        jnp.full(4 * T, -INF, dtype),
        jnp.concatenate([d_curr[None] - dd_lim[0:1], -dd_lim[1:]]),
    ])
    hi = jnp.concatenate([
        d_max,
        lim.G_veh.reshape(-1) - Henv_off.reshape(-1),
        jnp.concatenate([d_curr[None] + dd_lim[0:1], dd_lim[1:]]),
    ])

    # soft-row weights (reference slack linear costs W_beta, W_r on sig)
    w_env = jnp.stack([ctl.W_beta * dt, ctl.W_beta * dt,
                       ctl.W_r * dt, ctl.W_r * dt], axis=-1)  # (T, 4)
    # first slew row soft (exact penalty): its anchor d_curr is external
    # and can sit outside the envelope delta bound, making the two hard
    # rows disjoint — see qp/condensed.py build_qp_soft
    w_rate = jnp.concatenate([jnp.full(1, 1e3, dt.dtype),
                              jnp.full(T - 1, big)])
    w = jnp.concatenate([jnp.full(T, big), w_env.reshape(-1), w_rate])

    # ---- objective ------------------------------------------------------
    # state tracking (Q_dpsi, Q_e on rows 2:4) through the rollout
    Wst = 2.0 * dt[:, None] * jnp.stack(
        [jnp.full_like(dt, ctl.Q_dpsi), jnp.full_like(dt, ctl.Q_e)],
        axis=-1)                                            # (T, 2)
    Gsel = G[:, 2:4, :]
    gsel = g[:, 2:4]
    P = jnp.einsum("tkn,tk,tkm->nm", Gsel, Wst, Gsel)
    qlin = jnp.einsum("tkn,tk,tk->n", Gsel, Wst, gsel)
    P = P + jnp.diag(jnp.concatenate(
        [2.0 * ctl.R_delta * dt, jnp.zeros(n - T, dtype)]))

    # slew quadratic (dd eliminated): sum_t (R_ddelta/dt_t)(d_{t+1}-d_t)^2
    if ctl.R_ddelta != 0.0:
        cw = 2.0 * ctl.R_ddelta / dt                        # (T,)
        vidx = jnp.asarray(L.u[:T])
        P = P.at[vidx[0], vidx[0]].add(cw[0])
        qlin = qlin.at[vidx[0]].add(-cw[0] * d_curr)
        a, b_ = vidx[1:], vidx[:-1]
        P = P.at[a, a].add(cw[1:])
        P = P.at[b_, b_].add(cw[1:])
        P = P.at[a, b_].add(-cw[1:])
        P = P.at[b_, a].add(-cw[1:])

    return SoftQP(P=P, q=qlin, A=A, l=lo, u=hi, w=w, G=G, g=g)


def extract_control_soft(hz: HorizonParams, x: jnp.ndarray,
                         us: jnp.ndarray):
    """(delta, Fx): steering from the first free knot, Fx feedforward
    (reference `get_next_control`, `src/decoupled_lat_long.jl:275-278`)."""
    return jnp.stack([x[0], us[1, 1]])


def extract_trajectory_soft(hz: HorizonParams, x: jnp.ndarray, G, g,
                            q_curr, us):
    """Full (q, u) solution; states recovered through the rollout map,
    knot 0 is the pinned current state/steering."""
    q_tail = jnp.einsum("tij,j->ti", G, x) + g             # (T, 4)
    q_sol = jnp.concatenate([q_curr[None], q_tail])        # (N, 4)
    d_sol = jnp.concatenate([us[0:1, 0], x])               # (N,)
    u_sol = jnp.stack([d_sol, us[:, 1]], axis=-1)          # (N, 2)
    return q_sol, u_sol
