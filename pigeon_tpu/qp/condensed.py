"""Condensed coupled tracking QP: states eliminated through the dynamics.

The sparse formulation (`qp/coupled.py`) keeps all N states as decision
variables tied by 90 stiff dynamics equality rows — the right shape for
sparse factorization on CPUs, the wrong one for a TPU where per-instance
problems are tiny and every extra 128-wide tile of the iteration matvecs
costs MXU passes.  Standard MPC condensing substitutes

    q_t = G_t [q0; u] + g_t,   t = 1..T

(the LTV rollout of the ZOH/FOH affine models), which shrinks the QP from
n=193, m=290 (pads 256/384) to n=103, m=200 (pads 128/256) and removes
the rho_eq-stiff dynamics rows entirely:

    variables  q0 (6, pinned) | u (N,2) | sig (T,2) | sHJI (S) | dd (T) | dF (T)
    equalities diff(delta)-dd, diff(Fx)-dF, q0 pin, u0 pin   (38 rows, FIRST)
    inequalities sig>=0, sHJI>=0, Ux bounds (dense rows over [q0;u] for
    t>=1), Fx bounds, HJI half-planes, delta bounds, envelope (dense rows),
    ddelta rate bounds, optional walls (dense rows)

The state tracking cost Sum_t dt (Q_ds ds^2 + Q_dpsi dpsi^2 + Q_e e^2)
becomes a DENSE quadratic block over [q0; u] (P = Gsel' W Gsel), so the
solver's dense-P path is used (`solver/admm.py`): K = P + sigma I +
A' rho A is dense and factorized by Newton-Schulz — at n_pad=128 the
whole K^-1 is ONE MXU tile.

The condensed QP is mathematically EQUIVALENT to the sparse one (the
eliminated rows were equalities), so control-sequence parity with the
reference carries over unchanged.  Mirrors the same reference semantics
(`src/coupled_lat_long.jl:197-313,315-368`).
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
from pigeon_tpu.qp.coupled import CoupledStageData, u_normalization
from pigeon_tpu.qp.structure import INF, QPLayout
from pigeon_tpu.solver.admm import QPData


class CondensedLayout:
    """Static plan: variable indices, row allocation (equalities first),
    and the [q0; u] column map for the dense condensed rows."""

    def __init__(self, hz: HorizonParams, use_walls: bool = False):
        S, Lg = hz.N_short, hz.N_long
        N, T = hz.N, hz.N_short + hz.N_long
        self.hz = hz
        self.use_walls = use_walls
        lay = QPLayout()
        eq_rows = []
        self.q0 = lay.add_vars((6,))
        self.u = lay.add_vars((N, 2))
        self.sig = lay.add_vars((T, 2))
        self.sHJI = lay.add_vars((S,))
        self.dd = lay.add_vars((T,))
        self.dF = lay.add_vars((T,))
        # [q0; u] column order for the dense rollout rows (contiguous by
        # construction: q0 then u)
        self.gcols = np.concatenate([self.q0, self.u.ravel()])
        nG = self.gcols.size                       # 6 + 2N = 38

        # ---- equality rows (first; no runtime permutation) -----------
        r = lay.add_rows(T)                        # diff(delta) == dd
        eq_rows.append(r)
        lay.entry(r, self.u[1:, 0]); lay.entry(r, self.u[:-1, 0])
        lay.entry(r, self.dd)
        r = lay.add_rows(T)                        # diff(Fx) == dF
        eq_rows.append(r)
        lay.entry(r, self.u[1:, 1]); lay.entry(r, self.u[:-1, 1])
        lay.entry(r, self.dF)
        r = lay.add_rows(6)                        # q0 == q_curr
        eq_rows.append(r)
        lay.entry(r, self.q0)
        r = lay.add_rows(2)                        # u0 == u_curr
        eq_rows.append(r)
        lay.entry(r, self.u[0])
        # ---- inequality rows -----------------------------------------
        r = lay.add_rows(2 * T)                    # sig >= 0
        lay.entry(r, self.sig.ravel())
        r = lay.add_rows(S)                        # sHJI >= 0
        lay.entry(r, self.sHJI)
        r = lay.add_rows(1)                        # Ux bound t=0 (on q0)
        lay.entry(r, self.q0[1])
        r = lay.add_rows(T).reshape(T, 1)          # Ux bounds t>=1: dense
        lay.entry(np.broadcast_to(r, (T, nG)), self.gcols[None, :])
        r = lay.add_rows(N)                        # Fx bounds
        lay.entry(r, self.u[:, 1])
        r = lay.add_rows(S)                        # HJI half-planes
        lay.entry(r[:, None], self.u[:S])
        lay.entry(r, self.sHJI)
        r = lay.add_rows(T)                        # delta bounds t>=1
        lay.entry(r, self.u[1:, 0])
        r = lay.add_rows(4 * T).reshape(T, 4)      # envelope: dense rows
        lay.entry(np.broadcast_to(r[:, :, None], (T, 4, nG)),
                  self.gcols[None, None, :])
        lay.entry(r, self.sig[:, [0, 0, 1, 1]])    # -slacks
        r = lay.add_rows(T)                        # ddelta rate bounds
        lay.entry(r, self.dd)
        if use_walls:
            self.sw = lay.add_vars((T,))
            r = lay.add_rows(T)                    # sw >= 0
            lay.entry(r, self.sw)
            r = lay.add_rows(T).reshape(T, 1)      # e - sw <= edgeL - m
            lay.entry(np.broadcast_to(r, (T, nG)), self.gcols[None, :])
            lay.entry(r[:, 0], self.sw)
            r = lay.add_rows(T).reshape(T, 1)      # e + sw >= edgeR + m
            lay.entry(np.broadcast_to(r, (T, nG)), self.gcols[None, :])
            lay.entry(r[:, 0], self.sw)
        lay.finalize()
        self.lay = lay
        self.n, self.m = lay.n, lay.m
        self.eq_rows = np.concatenate(eq_rows)
        assert np.array_equal(self.eq_rows, np.arange(self.eq_rows.size))


@functools.lru_cache(maxsize=None)
def get_layout(hz: HorizonParams, use_walls: bool = False
               ) -> CondensedLayout:
    return CondensedLayout(hz, use_walls)


class CondensedQP(NamedTuple):
    """Dense-P QP + the rollout map for state recovery."""

    P: jnp.ndarray         # (n, n) dense Hessian (1/2 x'Px convention)
    q: jnp.ndarray         # (n,)
    A: jnp.ndarray         # (m, n)
    l: jnp.ndarray         # (m,)
    u: jnp.ndarray         # (m,)
    G: jnp.ndarray         # (T, 6, 6+2N) state rollout map over [q0; u]
    g: jnp.ndarray         # (T, 6) rollout offsets


def build_qp(veh: VehicleParams, ctl: CoupledControlParams,
             hz: HorizonParams, data: CoupledStageData,
             lin_method: str = "expm", lin_substeps: int = 1
             ) -> CondensedQP:
    """Linearize along the horizon, roll the LTV models into the dense
    [q0; u] map, and assemble the condensed QP.  Same linearization
    semantics as `qp/coupled.build_qp` (reference
    `src/coupled_lat_long.jl:315-368`)."""
    S, Lg, N = hz.N_short, hz.N_long, hz.N
    T = S + Lg
    L = get_layout(hz, ctl.use_walls)
    dt, qs, us, ps = data.dt, data.qs, data.us, data.ps
    dtype = qs.dtype
    unorm = jnp.asarray(u_normalization(veh), dtype)
    nG = 6 + 2 * N

    def f(q, ur):
        return dyn.vehicle_ode(veh, "tracking", q, ur[:2], ur[2:])

    ur = jnp.concatenate([us, ps], axis=-1)

    if lin_method == "expm":
        A_all, B0_all, Bf_all, c_all = dz.linearize_horizon_fused(
            f, qs, ur, dt, S, 2, squarings=4, order=6, precision="high")
    else:
        Az, Bz, cz = jax.vmap(
            lambda q, u, h: dz.linearize_zoh(f, q, u, h, 2,
                                             substeps=lin_substeps))(
            qs[:S], ur[:S], dt[:S])
        Af, B0f, Bff, cf = jax.vmap(
            lambda q, u0, uf, h: dz.linearize_foh(f, q, u0, uf, h, 2,
                                                  substeps=lin_substeps))(
            qs[S:T], ur[S:T], ur[S + 1:N], dt[S:T])
        A_all = jnp.concatenate([Az, Af])
        B0_all = jnp.concatenate([Bz, B0f])
        Bf_all = jnp.concatenate([jnp.zeros((S, 6, 2), dtype), Bff])
        c_all = jnp.concatenate([cz, cf])

    B0n = B0_all * unorm[None, None, :]
    Bfn = Bf_all * unorm[None, None, :]

    # ---- rollout map: q_{t+1} = G[t] [q0; u] + g[t] -------------------
    Gp = jnp.concatenate(
        [jnp.eye(6, dtype=dtype), jnp.zeros((6, 2 * N), dtype)], axis=1)
    gp = jnp.zeros(6, dtype)
    G_list, g_list = [], []
    for t in range(T):                           # static unroll
        Gn = A_all[t] @ Gp
        c0 = 6 + 2 * t
        Gn = Gn.at[:, c0:c0 + 2].add(B0n[t])
        Gn = Gn.at[:, c0 + 2:c0 + 4].add(Bfn[t])
        gn = A_all[t] @ gp + c_all[t]
        G_list.append(Gn)
        g_list.append(gn)
        Gp, gp = Gn, gn
    G = jnp.stack(G_list)                        # (T, 6, nG)
    g = jnp.stack(g_list)                        # (T, 6)

    # per-stage envelope + bounds at the t+1 NODE states (reference
    # :356-366 evaluates these at the linearization nodes)
    Ux_t = qs[1:, 1]
    Fxf_t, Fxr_t = dyn.longitudinal_split(veh, us[1:, 1])
    lim = dyn.stable_limits(veh, Ux_t, Fxf_t, Fxr_t)
    d_min = jnp.maximum(lim.delta_min, -veh.delta_max) / unorm[0]
    d_max = jnp.minimum(lim.delta_max, veh.delta_max) / unorm[0]
    Fx_hi = jnp.minimum(veh.Px_max / Ux_t, veh.Fx_max) / unorm[1]
    dd_lim = ctl.delta_dot_max * dt / unorm[0]

    q_curr = qs[0]
    u_curr = us[0] / unorm

    H_veh = jnp.broadcast_to(lim.H_veh, (T, 4, 2)).astype(dtype)
    Henv = jnp.einsum("tij,tjk->tik", H_veh, G[:, 2:4, :])   # (T, 4, nG)
    Henv_off = jnp.einsum("tij,tj->ti", H_veh, g[:, 2:4])    # (T, 4)

    ones = functools.partial(jnp.ones, dtype=dtype)
    neg1 = lambda shape: -ones(shape)
    values = [
        ones(T), neg1(T), neg1(T),               # delta diff
        ones(T), neg1(T), neg1(T),               # Fx diff
        ones(6),                                 # q0 pin
        ones(2),                                 # u0 pin
        ones(2 * T),                             # sig >= 0
        ones(S),                                 # sHJI >= 0
        ones(1),                                 # Ux t=0
        G[:, 1, :],                              # Ux t>=1 (dense)
        ones(N),                                 # Fx bounds
        jnp.broadcast_to(data.hji_M * unorm, (S, 2)), ones(S),   # HJI
        ones(T),                                 # delta bounds
        Henv, neg1((T, 4)),                      # envelope (dense)
        ones(T),                                 # dd bounds
    ]
    if ctl.use_walls:
        values += [ones(T),                      # sw >= 0
                   G[:, 5, :], neg1(T),          # e - sw
                   G[:, 5, :], ones(T)]          # e + sw
    A = L.lay.assemble_A(values)

    big = jnp.asarray(INF, dtype)
    Fx_lo = jnp.full(N, veh.Fx_min / float(u_normalization(veh)[1]),
                     dtype)
    lo = jnp.concatenate([
        jnp.zeros(T, dtype), jnp.zeros(T, dtype),  # diffs
        q_curr, u_curr,                            # pins
        jnp.zeros(2 * T, dtype),                   # sig
        jnp.zeros(S, dtype),                       # sHJI
        jnp.full(1, ctl.V_min, dtype),             # Ux t=0
        ctl.V_min - g[:, 1],                       # Ux t>=1
        Fx_lo,
        jnp.full(S, -data.hji_b, dtype),           # HJI
        d_min,
        jnp.full(4 * T, -INF, dtype),              # envelope
        -dd_lim,
    ] + ([jnp.zeros(T, dtype),
          jnp.full(T, -INF, dtype),
          data.edges[1:, 1] + ctl.wall_margin - g[:, 5],
          ] if ctl.use_walls else []))
    hi = jnp.concatenate([
        jnp.zeros(T, dtype), jnp.zeros(T, dtype),
        q_curr, u_curr,
        jnp.full(2 * T, big), jnp.full(S, big),
        jnp.full(1, ctl.V_max, dtype),
        ctl.V_max - g[:, 1],
        jnp.concatenate([jnp.full(1, big), Fx_hi]),
        jnp.full(S, big),
        d_max,
        (lim.G_veh - Henv_off).reshape(-1),        # envelope upper
        dd_lim,
    ] + ([jnp.full(T, big),
          data.edges[1:, 0] - ctl.wall_margin - g[:, 5],
          jnp.full(T, big),
          ] if ctl.use_walls else []))

    # ---- objective ----------------------------------------------------
    # state tracking cost folded through the rollout: dense block over
    # [q0; u] (Parametron x'Qx convention -> 1/2 x'Px needs P = 2Q)
    Wst = 2.0 * dt[:, None] * jnp.stack(
        [jnp.full_like(dt, ctl.Q_ds), jnp.full_like(dt, ctl.Q_dpsi),
         jnp.full_like(dt, ctl.Q_e)], axis=-1)     # (T, 3)
    Gsel = G[:, jnp.array([0, 4, 5]), :]           # (T, 3, nG)
    gsel = g[:, jnp.array([0, 4, 5])]              # (T, 3)
    Pblock = jnp.einsum("tkn,tk,tkm->nm", Gsel, Wst, Gsel)
    qblock = jnp.einsum("tkn,tk,tk->n", Gsel, Wst, gsel)

    gc = jnp.asarray(L.gcols)
    P = jnp.zeros((L.n, L.n), dtype)
    P = P.at[gc[:, None], gc[None, :]].add(Pblock)
    diag = jnp.zeros(L.n, dtype)
    diag = diag.at[L.u[1:, 0]].set(2.0 * ctl.R_delta * dt)
    diag = diag.at[L.u[1:, 1]].set(2.0 * ctl.R_Fx * dt)
    diag = diag.at[L.dd].set(2.0 * ctl.R_ddelta / dt)
    diag = diag.at[L.dF].set(2.0 * ctl.R_dFx / dt)
    P = P + jnp.diag(diag)
    qlin = jnp.zeros(L.n, dtype)
    qlin = qlin.at[gc].add(qblock)
    qlin = qlin.at[L.sig[:, 0]].add(ctl.W_beta * dt)
    qlin = qlin.at[L.sig[:, 1]].add(ctl.W_r * dt)
    w_hji = jnp.where(jnp.arange(S) < ctl.N_HJI, ctl.W_HJI,
                      0.0).astype(dtype)
    qlin = qlin.at[L.sHJI].add(w_hji)
    if ctl.use_walls:
        qlin = qlin.at[L.sw].add(ctl.W_wall * dt)

    return CondensedQP(P=P, q=qlin, A=A, l=lo, u=hi, G=G, g=g)


def extract_control(veh: VehicleParams, hz: HorizonParams, x: jnp.ndarray,
                    use_walls: bool = False):
    """Next physical control (reference `get_next_control`)."""
    L = get_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    return x[L.u[1]] * unorm


# ===========================================================================
# Soft condensed formulation: aux-free, equality-free, one MXU/lane tile
# ===========================================================================

class SoftCondensedLayout:
    """Static plan for the SOFT condensed QP.

    Beyond the state elimination of `CondensedLayout`, this formulation
    eliminates EVERY auxiliary variable and EVERY equality row:

      - q0 and u0 pins: substituted (they are parameters, not decisions) —
        their columns fold into the row offsets / objective linear term.
      - slack variables (sig, sHJI, sw) + their >=0 rows: replaced by
        per-row exact L1 penalties handled inside the ADMM z-update as a
        shrinkage prox (slack s>=0 with linear cost W*s on row h <= g + s
        is exactly the penalty W*max(0, h-g); the envelope/wall slack
        sharing pairs +-half-planes whose violations are mutually
        exclusive, so per-row penalties are still exact).
      - dd/dF slew variables + diff equality rows: the slew quadratics
        R_ddelta/R_dFx go directly into the dense P (tridiagonal coupling
        in a dense Hessian costs nothing); the delta rate BOUNDS become
        two-entry inequality rows over consecutive u's.

    Result for the live coupled config (N=16): n = 2(N-1) = 30 variables,
    m = 124 rows (139 with walls), ZERO equality rows -> no rho_eq
    stiffness, no mixed-precision row split, and the whole per-instance
    problem fits one 128-lane tile of the lane-batched VPU solver
    (`solver/lane_admm.py`).  Mathematically equivalent to the sparse QP
    (reference `src/coupled_lat_long.jl:197-313`): eliminated rows were
    equalities, penalties are exact.

    Row order: ux (T, hard dense) | fx (N-1, hard) | hji (S-1, soft) |
    delta (T, hard) | envelope (4T, soft) | rate (T, hard) |
    [walls (T, soft two-sided)].
    """

    def __init__(self, hz: HorizonParams, use_walls: bool = False):
        S, Lg = hz.N_short, hz.N_long
        N, T = hz.N, hz.N_short + hz.N_long
        self.hz = hz
        self.use_walls = use_walls
        self.n = 2 * (N - 1)
        # variable index of normalized (delta, Fx) at knot t (1-based knots)
        self.u = np.arange(2 * (N - 1)).reshape(N - 1, 2)  # u[t-1] = knot t
        r0 = 0
        self.r_ux = np.arange(r0, r0 + T); r0 += T
        self.r_fx = np.arange(r0, r0 + (N - 1)); r0 += N - 1
        self.r_hji = np.arange(r0, r0 + (S - 1)); r0 += S - 1
        self.r_delta = np.arange(r0, r0 + T); r0 += T
        self.r_env = np.arange(r0, r0 + 4 * T).reshape(T, 4); r0 += 4 * T
        self.r_rate = np.arange(r0, r0 + T); r0 += T
        if use_walls:
            self.r_wall = np.arange(r0, r0 + T); r0 += T
        self.m = r0
        self.eq_rows = np.zeros((0,), np.int64)

        # static scatter indices for the sparse row families
        rows, cols = [], []
        # fx: u[t,1], knots t=1..N-1
        rows.append(self.r_fx); cols.append(self.u[:, 1])
        # hji: u[t] knots t=1..S-1 (2 entries per row)
        rows.append(np.repeat(self.r_hji, 2))
        cols.append(self.u[:S - 1].ravel())
        # delta bounds: u[t,0], knots t=1..T
        rows.append(self.r_delta); cols.append(self.u[:T, 0])
        # rate rows: stage t=0 -> u1 only; stages t>=1 -> u_{t+1} - u_t
        rows.append(self.r_rate[0:1]); cols.append(self.u[0:1, 0])
        rows.append(np.repeat(self.r_rate[1:], 2))
        cols.append(np.stack([self.u[1:T, 0], self.u[0:T - 1, 0]],
                             axis=-1).ravel())
        self._sp_rows = np.concatenate(rows)
        self._sp_cols = np.concatenate(cols)


@functools.lru_cache(maxsize=None)
def get_soft_layout(hz: HorizonParams, use_walls: bool = False
                    ) -> SoftCondensedLayout:
    return SoftCondensedLayout(hz, use_walls)


class SoftQP(NamedTuple):
    """Equality-free QP with per-row exact-penalty weights.

    w (m,): +inf marks a hard row (box projection); finite W makes the row
    an L1 exact penalty W*dist(Ax, [l,u]) handled by the solver's shrink
    prox.  G/g: rollout map over the FULL [q0; u] column space (q0, u0
    already substituted into g) for state recovery."""

    P: jnp.ndarray         # (n, n) dense Hessian (1/2 x'Px convention)
    q: jnp.ndarray         # (n,)
    A: jnp.ndarray         # (m, n)
    l: jnp.ndarray         # (m,)
    u: jnp.ndarray         # (m,)
    w: jnp.ndarray         # (m,) soft-row penalty weights (inf = hard)
    G: jnp.ndarray         # (T, 6, n) rollout map over free u
    g: jnp.ndarray         # (T, 6) offsets (pins folded in)


# Horizon length above which the rollout switches from the sequential
# static unroll to the log-N associative scan.  MEASURED on a v5e chip at
# B=8192 (BENCH r3->r4): at T=15 the unroll runs the fleet step at 77 ms
# vs 165 ms for associative_scan — XLA lowers the scan's combine rounds
# into gather/concat traffic over the (B, T, 6, n) operands that dwarfs
# the 6x6 matmul work at tiny T.  The scan's ceil(log2 T)-depth critical
# path only pays off once T is large enough that T sequential batched
# matmul dispatches dominate (SURVEY §5 long-context obligation: horizons
# far beyond the reference's N<=31).
ROLLOUT_SCAN_MIN_T = 64


def rollout_affine_scan(A_all, E):
    """Cumulative affine recursion M_t = A_t M_{t-1} + E_t via
    jax.lax.associative_scan: ceil(log2 T) rounds of batched 6x6 matmuls
    (combine: (A2,M2) o (A1,M1) = (A2 A1, A2 M1 + M2)) — the log-N
    horizon factorization for long-horizon configs."""
    def combine(x, y):
        Ax, Mx = x
        Ay, My = y
        return Ay @ Ax, Ay @ Mx + My

    _, M_cum = jax.lax.associative_scan(combine, (A_all, E), axis=0)
    return M_cum


def rollout_affine_unroll(A_all, E):
    """Same recursion as a static sequential unroll — the fast form for
    the reference-scale horizons (T <= 31), where per-stage batched
    (6,6)@(6,n+1) matmuls fuse cleanly."""
    T = E.shape[0]
    M = E[0]
    out = [M]
    for t in range(1, T):
        M = A_all[t] @ M + E[t]
        out.append(M)
    return jnp.stack(out)


def _rollout_affine_impl(A_all, E):
    if E.shape[0] >= ROLLOUT_SCAN_MIN_T:
        return rollout_affine_scan(A_all, E)
    return rollout_affine_unroll(A_all, E)


def _rollout_lane_kernel(T: int, d: int, a_ref, e_ref, out_ref):
    """Lane-batched affine rollout: instances on the 128-lane axis.

    The recursion M_t = A_t M_{t-1} + E_t is columnwise independent in
    M's trailing width, so the grid blocks over (width, lanes) and each
    cell runs the WHOLE T-step recursion in VMEM: T*d broadcast
    multiply-accumulate VPU ops over (d, w_blk, L) blocks.  As a vmapped
    unroll, the same recursion is T dependent batched (d,d)@(d,w)
    matmuls whose tiny minor dims tile-pad to (8,128) — measured 60 ms
    of the decoupled fleet step at B=8192/T=30 on v5e vs ~4 ms here
    (see scripts/exp_assemble_phases.py)."""
    A = a_ref[:]                                   # (T, d, d, L)
    Ef = e_ref[:]                                  # (T, d, wb, L)
    M = Ef[0]
    outs = [M]
    for t in range(1, T):
        At = A[t]
        acc = At[:, 0:1, :] * M[0:1]
        for c in range(1, d):
            acc = acc + At[:, c:c + 1, :] * M[c:c + 1]
        M = acc + Ef[t]
        outs.append(M)
    out_ref[:] = jnp.stack(outs)


def _rollout_lane_batched(A_b, E_b, lanes: int = 128, w_blk: int = 8,
                          interpret: bool = False):
    """(B, T, d, d), (B, T, d, w) -> (B, T, d, w) cumulative rollout with
    the batch mapped onto lanes (same chunking discipline as
    discretize._expm_lane_batched)."""
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    B, T, d, w = A_b.shape[0], A_b.shape[1], A_b.shape[2], E_b.shape[-1]
    chunk = -(-max(lanes, min(1024, B)) // lanes) * lanes
    B_pad = -(-B // chunk) * chunk
    w_pad = -(-w // w_blk) * w_blk
    At = jnp.moveaxis(A_b, 0, -1)                  # (T, d, d, B)
    Et = jnp.moveaxis(E_b, 0, -1)                  # (T, d, w, B)
    if w_pad != w:
        Et = jnp.concatenate(
            [Et, jnp.zeros((T, d, w_pad - w, B), Et.dtype)], axis=2)
    if B_pad != B:
        At = jnp.concatenate(
            [At, jnp.zeros((T, d, d, B_pad - B), At.dtype)], axis=-1)
        Et = jnp.concatenate(
            [Et, jnp.zeros((T, d, w_pad, B_pad - B), Et.dtype)],
            axis=-1)
    a_spec = pl.BlockSpec((T, d, d, lanes), lambda wb, i: (0, 0, 0, i),
                          **vmem_kw)
    e_spec = pl.BlockSpec((T, d, w_blk, lanes),
                          lambda wb, i: (0, 0, wb, i), **vmem_kw)

    def run_chunk(args):
        Ac, Ec = args
        return pl.pallas_call(
            _ft.partial(_rollout_lane_kernel, T, d),
            grid=(w_pad // w_blk, chunk // lanes),
            in_specs=[a_spec, e_spec], out_specs=e_spec,
            out_shape=jax.ShapeDtypeStruct((T, d, w_pad, chunk),
                                           Et.dtype),
            interpret=interpret,
        )(Ac, Ec)

    n_chunks = B_pad // chunk
    if n_chunks == 1:
        out = run_chunk((At, Et))
    else:
        Acs = jnp.stack([At[..., i * chunk:(i + 1) * chunk]
                         for i in range(n_chunks)])
        Ecs = jnp.stack([Et[..., i * chunk:(i + 1) * chunk]
                         for i in range(n_chunks)])
        out_c = jax.lax.map(run_chunk, (Acs, Ecs))
        out = jnp.concatenate(list(out_c), axis=-1)
    return jnp.moveaxis(out[:, :, :w, :B], -1, 0)  # (B, T, d, w)


@jax.custom_batching.custom_vmap
def rollout_affine(A_all, E):
    return _rollout_affine_impl(A_all, E)


@rollout_affine.def_vmap
def _rollout_affine_vmap(axis_size, in_batched, A_b, E_b):
    # batched callers (the vmapped MPC pre-solve) route to the
    # lane-batched kernel on TPU; everything else (CPU tests, nested
    # vmaps, long-horizon scan configs) keeps the reference lowering
    if (all(in_batched) and A_b.ndim == 4
            and E_b.shape[1] < ROLLOUT_SCAN_MIN_T and A_b.shape[0] > 1
            and jax.devices()[0].platform == "tpu"):
        return _rollout_lane_batched(A_b, E_b), True
    in_axes = tuple(0 if b else None for b in in_batched)
    return jax.vmap(_rollout_affine_impl, in_axes=in_axes)(A_b, E_b), True


def build_qp_soft(veh: VehicleParams, ctl: CoupledControlParams,
                  hz: HorizonParams, data: CoupledStageData,
                  lin_method: str = "expm", lin_substeps: int = 1
                  ) -> SoftQP:
    """Assemble the soft condensed QP (same linearization semantics as
    `build_qp`; reference `src/coupled_lat_long.jl:315-368`)."""
    S, Lg, N = hz.N_short, hz.N_long, hz.N
    T = S + Lg
    L = get_soft_layout(hz, ctl.use_walls)
    dt, qs, us, ps = data.dt, data.qs, data.us, data.ps
    dtype = qs.dtype
    unorm = jnp.asarray(u_normalization(veh), dtype)
    n = L.n

    def f(q, ur):
        return dyn.vehicle_ode(veh, "tracking", q, ur[:2], ur[2:])

    ur = jnp.concatenate([us, ps], axis=-1)

    if lin_method == "expm":
        A_all, B0_all, Bf_all, c_all = dz.linearize_horizon_fused(
            f, qs, ur, dt, S, 2, squarings=4, order=6, precision="high")
    else:
        Az, Bz, cz = jax.vmap(
            lambda q, u, h: dz.linearize_zoh(f, q, u, h, 2,
                                             substeps=lin_substeps))(
            qs[:S], ur[:S], dt[:S])
        Af, B0f, Bff, cf = jax.vmap(
            lambda q, u0, uf, h: dz.linearize_foh(f, q, u0, uf, h, 2,
                                                  substeps=lin_substeps))(
            qs[S:T], ur[S:T], ur[S + 1:N], dt[S:T])
        A_all = jnp.concatenate([Az, Af])
        B0_all = jnp.concatenate([Bz, B0f])
        Bf_all = jnp.concatenate([jnp.zeros((S, 6, 2), dtype), Bff])
        c_all = jnp.concatenate([cz, cf])

    B0n = B0_all * unorm[None, None, :]
    Bfn = Bf_all * unorm[None, None, :]

    q_curr = qs[0]
    u_curr = us[0] / unorm

    # ---- rollout over the FREE u columns, pins folded into the offset --
    # q_{t+1} = G[t] u_free + g[t];  u_free = normalized u at knots 1..N-1.
    if T >= ROLLOUT_SCAN_MIN_T:
        # long-horizon path: gather-index insert construction + log-N
        # associative scan (SURVEY §5).  The scatter + scan lowering is
        # MEASURABLY slower than the static unroll at reference-scale T
        # (77 -> 165 ms fleet step at B=8192, T=15 on v5e) but its
        # ceil(log2 T) critical path wins for long horizons.
        E = jnp.zeros((T, 6, n + 1), dtype)
        # stage 0's B0 hits the pinned u0 (-> offset), its Bf the first
        # free knot; stage t>=1 couples knots t, t+1
        E = E.at[0, :, 0:2].add(Bfn[0])
        cols0 = 2 * (jnp.arange(1, T) - 1)
        E = E.at[jnp.arange(1, T)[:, None, None],
                 jnp.arange(6)[None, :, None],
                 (cols0[:, None, None] + jnp.arange(2)[None, None, :])
                 ].add(B0n[1:T])
        E = E.at[jnp.arange(1, T)[:, None, None],
                 jnp.arange(6)[None, :, None],
                 (cols0[:, None, None] + 2 + jnp.arange(2)[None, None, :])
                 ].add(Bfn[1:T])
        e0 = A_all[0] @ q_curr + c_all[0] + B0n[0] @ u_curr
        e_col = jnp.concatenate([e0[None], c_all[1:T]])      # (T, 6)
        E = E.at[:, :, n].add(e_col)
        M_cum = rollout_affine_scan(A_all, E)
        G = M_cum[:, :, :n]                      # (T, 6, n)
        g = M_cum[:, :, n]                       # (T, 6)
    else:
        # reference-scale horizons: static unroll with STATIC-slice
        # inserts — per-stage (6,6)@(6,n) batched matmuls +
        # dynamic_update_slice, which XLA fuses cleanly (no scatter HLO)
        Gp = jnp.zeros((6, n), dtype)
        gp = q_curr
        G_list, g_list = [], []
        for t in range(T):                       # static unroll
            Gn = A_all[t] @ Gp
            gn = A_all[t] @ gp + c_all[t]
            if t == 0:
                # B0 multiplies the pinned u0; Bf the first free knot
                gn = gn + B0n[0] @ u_curr
                Gn = Gn.at[:, 0:2].add(Bfn[0])
            else:
                c0 = 2 * (t - 1)
                Gn = Gn.at[:, c0:c0 + 2].add(B0n[t])
                Gn = Gn.at[:, c0 + 2:c0 + 4].add(Bfn[t])
            G_list.append(Gn)
            g_list.append(gn)
            Gp, gp = Gn, gn
        G = jnp.stack(G_list)                    # (T, 6, n)
        g = jnp.stack(g_list)                    # (T, 6)

    # per-stage envelope + bounds at the t+1 NODE states (reference
    # :356-366)
    Ux_t = qs[1:, 1]
    Fxf_t, Fxr_t = dyn.longitudinal_split(veh, us[1:, 1])
    lim = dyn.stable_limits(veh, Ux_t, Fxf_t, Fxr_t)
    d_min = jnp.maximum(lim.delta_min, -veh.delta_max) / unorm[0]
    d_max = jnp.minimum(lim.delta_max, veh.delta_max) / unorm[0]
    Fx_hi = jnp.minimum(veh.Px_max / Ux_t, veh.Fx_max) / unorm[1]
    Fx_lo = jnp.full(N - 1, veh.Fx_min / float(u_normalization(veh)[1]),
                     dtype)
    dd_lim = ctl.delta_dot_max * dt / unorm[0]

    H_veh = jnp.broadcast_to(lim.H_veh, (T, 4, 2)).astype(dtype)
    Henv = jnp.einsum("tij,tjk->tik", H_veh, G[:, 2:4, :])   # (T, 4, n)
    Henv_off = jnp.einsum("tij,tj->ti", H_veh, g[:, 2:4])    # (T, 4)

    # ---- constraint matrix ---------------------------------------------
    A = jnp.zeros((L.m, n), dtype)
    A = A.at[jnp.asarray(L.r_ux)].set(G[:, 1, :])
    A = A.at[jnp.asarray(L.r_env).ravel()].set(Henv.reshape(4 * T, n))
    if ctl.use_walls:
        A = A.at[jnp.asarray(L.r_wall)].set(G[:, 5, :])
    sp_vals = jnp.concatenate([
        jnp.ones(N - 1, dtype),                          # fx
        jnp.broadcast_to(data.hji_M * unorm, (S - 1, 2)).ravel(),
        jnp.ones(T, dtype),                              # delta
        jnp.ones(1, dtype),                              # rate t=0
        jnp.tile(jnp.asarray([1.0, -1.0], dtype), T - 1),
    ])
    A = A.at[jnp.asarray(L._sp_rows), jnp.asarray(L._sp_cols)].add(sp_vals)

    big = jnp.asarray(INF, dtype)
    lo = jnp.concatenate([
        ctl.V_min - g[:, 1],                             # ux
        Fx_lo,                                           # fx
        jnp.full(S - 1, -data.hji_b, dtype),             # hji
        d_min,                                           # delta
        jnp.full(4 * T, -INF, dtype),                    # envelope
        jnp.concatenate([u_curr[0:1] - dd_lim[0:1], -dd_lim[1:]]),
    ] + ([data.edges[1:, 1] + ctl.wall_margin - g[:, 5]]
         if ctl.use_walls else []))
    hi = jnp.concatenate([
        ctl.V_max - g[:, 1],
        Fx_hi,
        jnp.full(S - 1, big),
        d_max,
        (lim.G_veh - Henv_off).reshape(-1),
        jnp.concatenate([u_curr[0:1] + dd_lim[0:1], dd_lim[1:]]),
    ] + ([data.edges[1:, 0] - ctl.wall_margin - g[:, 5]]
         if ctl.use_walls else []))

    # ---- per-row penalty weights ----------------------------------------
    # (soft rows mirror the slack-variable linear costs of `build_qp`)
    w_hji = jnp.where(jnp.arange(1, S) < ctl.N_HJI, ctl.W_HJI,
                      0.0).astype(dtype)
    w_env = jnp.stack([ctl.W_beta * dt, ctl.W_beta * dt,
                       ctl.W_r * dt, ctl.W_r * dt], axis=-1)  # (T, 4)
    # The FIRST slew row anchors on the externally-commanded u_curr; an
    # HJI bang-bang override (or any external command) can put u_curr at
    # full lock while the stable-envelope delta bound at speed is
    # tighter — the two HARD rows are then DISJOINT (measured: at
    # Ux=12 m/s the stable range is +-0.222 rad vs a rate window
    # [0.311, 0.314] around lock) and ADMM cannot converge on an
    # infeasible QP (the r5 safety A/B's hammer-arm conv 0.77-0.93 was
    # exactly this).  A large exact penalty keeps the row binding
    # whenever feasible (W exceeds any realistic dual) and yields the
    # least-slew-violation solution when not.
    w_rate = jnp.concatenate([jnp.full(1, 1e3, dtype),
                              jnp.full(T - 1, big)])
    w = jnp.concatenate([
        jnp.full(T, big),                                # ux hard
        jnp.full(N - 1, big),                            # fx hard
        w_hji,
        jnp.full(T, big),                                # delta hard
        w_env.reshape(-1),
        w_rate,
    ] + ([ctl.W_wall * dt] if ctl.use_walls else []))

    # ---- objective -------------------------------------------------------
    # state tracking cost folded through the rollout (P = 2Q convention)
    Wst = 2.0 * dt[:, None] * jnp.stack(
        [jnp.full_like(dt, ctl.Q_ds), jnp.full_like(dt, ctl.Q_dpsi),
         jnp.full_like(dt, ctl.Q_e)], axis=-1)           # (T, 3)
    Gsel = G[:, jnp.array([0, 4, 5]), :]                 # (T, 3, n)
    gsel = g[:, jnp.array([0, 4, 5])]                    # (T, 3)
    P = jnp.einsum("tkn,tk,tkm->nm", Gsel, Wst, Gsel)
    qlin = jnp.einsum("tkn,tk,tk->n", Gsel, Wst, gsel)

    diag = jnp.zeros(n, dtype)
    diag = diag.at[jnp.asarray(L.u[:, 0])].set(2.0 * ctl.R_delta * dt)
    diag = diag.at[jnp.asarray(L.u[:, 1])].set(2.0 * ctl.R_Fx * dt)
    P = P + jnp.diag(diag)

    # slew quadratics (dd/dF variables eliminated):
    #   sum_t (R/dt_t) (v_{t+1} - v_t)^2, v_0 pinned to u_curr
    for k, R in ((0, ctl.R_ddelta), (1, ctl.R_dFx)):
        if R == 0.0:
            continue
        cw = 2.0 * R / dt                               # (T,)
        vidx = jnp.asarray(L.u[:, k])                   # knots 1..N-1
        # t = 0: (v_1 - u_curr)^2
        P = P.at[vidx[0], vidx[0]].add(cw[0])
        qlin = qlin.at[vidx[0]].add(-cw[0] * u_curr[k])
        # t >= 1: (v_{t+1} - v_t)^2
        a, b_ = vidx[1:], vidx[:-1]
        P = P.at[a, a].add(cw[1:])
        P = P.at[b_, b_].add(cw[1:])
        P = P.at[a, b_].add(-cw[1:])
        P = P.at[b_, a].add(-cw[1:])

    return SoftQP(P=P, q=qlin, A=A, l=lo, u=hi, w=w, G=G, g=g)


def extract_control_soft(veh: VehicleParams, hz: HorizonParams,
                         x: jnp.ndarray, use_walls: bool = False):
    """Next physical control (reference `get_next_control`)."""
    L = get_soft_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    return x[jnp.asarray(L.u[0])] * unorm


def extract_trajectory_soft(hz: HorizonParams, x: jnp.ndarray,
                            veh: VehicleParams, G, g, q_curr, u_curr,
                            use_walls: bool = False):
    """Full (q, u) solution for warm-start resampling; q recovered through
    the rollout map, the knot-0 rows are the pinned current state/control
    (what the q0/u0 pin rows of the slack formulation return)."""
    L = get_soft_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    q_tail = jnp.einsum("tij,j->ti", G, x) + g           # (T, 6)
    q_sol = jnp.concatenate([q_curr[None], q_tail])      # (N, 6)
    u_sol = jnp.concatenate([u_curr[None], x.reshape(-1, 2) * unorm])
    return q_sol, u_sol


def extract_trajectory(hz: HorizonParams, x: jnp.ndarray,
                       veh: VehicleParams, G, g, use_walls: bool = False):
    """Full (q, u) solution for warm-start resampling: states recovered
    through the rollout map q_{t+1} = G_t [q0; u] + g_t."""
    L = get_layout(hz, use_walls)
    unorm = jnp.asarray(u_normalization(veh), x.dtype)
    xg = x[jnp.asarray(L.gcols)]
    q_tail = jnp.einsum("tij,j->ti", G, xg) + g        # (T, 6)
    q_sol = jnp.concatenate([x[L.q0][None], q_tail])   # (N, 6)
    return q_sol, x[L.u] * unorm
