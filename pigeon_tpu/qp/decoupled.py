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
