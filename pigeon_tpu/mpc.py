"""MPC orchestration: two-timescale time grid, linearization-node seeding
(cold-start trim rollout / warm-start resampling), the single jitted
`mpc_step`, and the closed-loop `simulate` rollout.

Functional reimplementation of the reference's mutable 4-phase pipeline
`compute_time_steps! -> compute_linearization_nodes! -> update_QP! ->
solve!` (`src/model_predictive_control.jl:70-78`,
`src/coupled_lat_long.jl:62-142`, `src/ros_integration.jl:94-103`): all
mutable controller state becomes the explicit `MPCCarry`, and the whole
step — projection, rollout, linearization, assembly, ADMM, extraction, HJI
filtering, NaN fallback — is one XLA program, vmappable over scenarios.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu import hji as hji_mod
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import (CoupledControlParams, DecoupledControlParams,
                               HorizonParams, SolverOptions, VehicleParams)
from pigeon_tpu.math_utils import adiff
from pigeon_tpu.qp import coupled as qp_coupled
from pigeon_tpu.qp import decoupled as qp_decoupled
from pigeon_tpu.solver.admm import QPSolution, QPWarmStart, solve_qp


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static controller configuration (hashable -> one compiled program
    per config)."""

    veh: VehicleParams
    hz: HorizonParams
    coupled: CoupledControlParams = CoupledControlParams()
    decoupled: DecoupledControlParams = DecoupledControlParams()
    solver: SolverOptions = SolverOptions()
    formulation: str = "coupled"          # "coupled" | "decoupled"
    # condensed=True eliminates the state variables through the dynamics
    # (qp/condensed.py): n 193->103 (one MXU tile), m 290->200, no stiff
    # dynamics equality rows; mathematically equivalent QP.
    condensed: bool = False
    # soft=True selects the SOFT condensed formulation: additionally
    # eliminates the q0/u0 pins, slack variables and slew auxiliaries —
    # coupled: n=30, m=124 (qp/condensed.py SoftQP); decoupled: n=30,
    # m=180 (qp/decoupled.py build_qp_soft) — ZERO equality rows; slack
    # costs become per-row exact penalties in the ADMM z-update.  Pairs
    # with solver backend "lanes" (solver/lane_admm.py).  Implies
    # condensed semantics; `condensed` is ignored when set.
    soft: bool = False
    timed_mode: bool = False              # reference tracking_mode :traj
    hji_eps: float = 0.05                 # reference HJI_eps (Pigeon.jl:67)
    use_hji_policy: bool = False          # "hammer" override flag
    sim_substeps: int = 1
    warm_nodes: bool = True               # resample prev solution as nodes
                                          # (reference coupled warm branch)
    # --- parity knobs (the deviation set vs the reference algorithm) -----
    # tire_inverse: "corrected" restores the 3*Fy_max/Ca factor the
    # reference omits (`dynamics._inv_fiala`); "reference" replicates the
    # reference's formula verbatim (src/vehicle_dynamics.jl:56-62).
    tire_inverse: str = "corrected"
    # lin_method: "expm" = continuous-linearize + exact discretization
    # (unconditionally stable for the stiff tire modes); "rk4" = jacfwd
    # through an RK4 integrator step, the reference coupled controller's
    # path (src/coupled_lat_long.jl:253,262) with `lin_substeps` steps.
    lin_method: str = "expm"
    lin_substeps: int = 1
    # clamp_commands: apply actuation limits to the published command (the
    # reference publishes the raw QP value and relies on OSQP convergence
    # + the ECU's physical limits).
    clamp_commands: bool = True
    # hji_row_normalize: condition the HJI half-plane row before it enters
    # the QP (deviation from the reference, which injects the raw
    # linearized Hamiltonian row, src/coupled_lat_long.jl:259).  Measured
    # motivation (round 5): at active states the raw row is scale-wild
    # (|M.unorm| spans 0.06..18 across states) and frequently infeasible
    # within the control box by 1-3 orders of magnitude (|b|/||M|| p50=10,
    # p99=827 in normalized-u units where the box is [-1,1]^2) — ADMM
    # convergence collapses to 0.25 on active steps.  The half-plane is
    # scale-invariant, so the row is (a) normalized to unit norm in the
    # normalized-u metric and (b) its lower bound clamped to the best
    # value achievable over the control box (the l1 norm of the unit row)
    # minus a 5% margin — "steer as hard toward u* as the box allows"
    # replaces an unreachable demand.  Geometry of the feasible-case
    # constraint is unchanged; the infeasible case becomes a well-scaled
    # push toward the HJI-optimal control instead of a numerically wild
    # one.  False replicates the reference's raw row.
    hji_row_normalize: bool = True


def x1_coupled_config(**kw) -> MPCConfig:
    """The live coupled singleton: N_short=5, N_long=10
    (reference `src/Pigeon.jl:35`)."""
    from pigeon_tpu.config import x1_params
    hz = kw.pop("hz", HorizonParams(N_short=5, N_long=10))
    return MPCConfig(veh=x1_params(), hz=hz, formulation="coupled", **kw)


def x1_decoupled_config(**kw) -> MPCConfig:
    """The decoupled singleton: N_short=10, N_long=20
    (reference `src/Pigeon.jl:34`)."""
    from pigeon_tpu.config import x1_params
    hz = kw.pop("hz", HorizonParams(N_short=10, N_long=20))
    return MPCConfig(veh=x1_params(), hz=hz, formulation="decoupled", **kw)


# ---------------------------------------------------------------------------
# Time grid (reference MPCTimeSteps / compute_time_steps!,
# src/model_predictive_control.jl:1-30)
# ---------------------------------------------------------------------------

def compute_time_steps(hz: HorizonParams, t0):
    S, Lg = hz.N_short, hz.N_long
    dts, dtl = hz.dt_short, hz.dt_long
    t0 = jnp.asarray(t0)
    ts_short = t0 + dts * jnp.arange(S + 1, dtype=t0.dtype)
    t0_long = t0 + S * dts
    if hz.use_correction_step:
        t0_long = dtl * jnp.ceil((t0_long + dts) / dtl - 1.0)
    ts_long = t0_long + dtl * jnp.arange(1, Lg + 1, dtype=t0.dtype)
    ts = jnp.concatenate([ts_short, ts_long])
    return ts, jnp.diff(ts)


# ---------------------------------------------------------------------------
# Carry state
# ---------------------------------------------------------------------------

class MPCCarry(NamedTuple):
    """All controller state threaded between steps — the functional analog
    of the reference's mutable TrajectoryTrackingMPC fields + OSQP warm
    memory (SURVEY.md §7 "Warm-start semantics")."""

    prev_ts: jnp.ndarray         # (N,)
    q_prev: jnp.ndarray          # (N, nx) previous solution states
    u_prev: jnp.ndarray          # (N, 2) previous solution controls (physical)
    solved: jnp.ndarray          # () bool — warm data valid
    warm_x: jnp.ndarray          # (n,) ADMM warm start
    warm_y: jnp.ndarray          # (m,)
    warm_z: jnp.ndarray          # (m,)
    current_control: jnp.ndarray  # (3,) last commanded (delta, Fxf, Fxr)
    nan_fallback: jnp.ndarray    # () bool — previous step already fell back
    warm_rho: jnp.ndarray        # () adapted ADMM rho multiplier


class StepDiagnostics(NamedTuple):
    s: jnp.ndarray
    e: jnp.ndarray
    V_hji: jnp.ndarray
    hji_active: jnp.ndarray
    iterations: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray
    solution_finite: jnp.ndarray


def init_carry(cfg: MPCConfig, dtype=jnp.float32) -> MPCCarry:
    hz = cfg.hz
    N = hz.N
    nx = 6 if cfg.formulation == "coupled" else 4
    if cfg.formulation == "coupled":
        from pigeon_tpu.qp import condensed as qp_condensed
        if cfg.soft:
            L = qp_condensed.get_soft_layout(hz, cfg.coupled.use_walls)
        elif cfg.condensed:
            L = qp_condensed.get_layout(hz, cfg.coupled.use_walls)
        else:
            L = qp_coupled.get_layout(hz, cfg.coupled.use_walls)
    else:
        L = (qp_decoupled.get_soft_layout(hz) if cfg.soft
             else qp_decoupled.get_layout(hz))
    return MPCCarry(
        prev_ts=jnp.arange(1, N + 1, dtype=dtype),
        q_prev=jnp.zeros((N, nx), dtype),
        u_prev=jnp.zeros((N, 2), dtype),
        solved=jnp.asarray(False),
        warm_x=jnp.zeros(L.n, dtype),
        warm_y=jnp.zeros(L.m, dtype),
        warm_z=jnp.zeros(L.m, dtype),
        current_control=jnp.zeros(3, dtype),
        nan_fallback=jnp.asarray(False),
        warm_rho=jnp.ones((), dtype),
    )


# ---------------------------------------------------------------------------
# Linearization nodes — coupled (reference src/coupled_lat_long.jl:62-142)
# ---------------------------------------------------------------------------

def _accel_desired(cfg, tj_A, tj_V, V, ds_i, tau):
    """Feedforward accel law (reference :115-116 / decoupled :76-77)."""
    ctl = cfg.coupled if cfg.formulation == "coupled" else cfg.decoupled
    A = tj_A + ctl.k_V * (tj_V - V) / tau
    if cfg.timed_mode:
        A = A - ctl.k_s * ds_i / (tau * tau)
    return jnp.clip(A, (ctl.V_min - V) / tau, (ctl.V_max - V) / tau)


def _nodes_coupled_cold(cfg: MPCConfig, tube, q0, u0, ts, dt):
    """Stage 0 explicit + stages 1..N-1 as a lax.scan with branch selects
    (one compiled stage body instead of N unrolled copies — the unrolled
    version dominated XLA compile time)."""
    veh, hz = cfg.veh, cfg.hz
    S, N = hz.N_short, hz.N
    s0, e0, _ = trj.path_coordinates(tube, q0[:2])
    tj0 = trj.eval_arclength(tube, s0, fields=("psi", "kappa"))
    dpsi0 = adiff(q0[2], tj0.psi)
    u20 = jnp.stack([u0[0], u0[1] + u0[2]])

    sD, cD = jnp.sin(dpsi0), jnp.cos(dpsi0)
    V0 = q0[3] * cD - q0[4] * sD          # reference :106
    beta0 = jnp.arctan2(q0[4], q0[3])
    r0, delta0 = q0[5], u0[0]
    Fyf0, _ = dyn.lateral_tire_forces(veh, q0[3], q0[4], q0[5], u0)

    # stage 0 (reference :117-120)
    ds0 = s0 - trj.eval_time(tube, ts[0], fields=()).s
    q_0 = jnp.stack([ds0, q0[3], q0[4], q0[5], dpsi0, e0])
    p_0 = jnp.stack([tj0.V, tj0.kappa, 0.0 * s0, 0.0 * s0])
    qdot = dyn.vehicle_ode(veh, "bicycle", q0, u20, jnp.zeros(4, q0.dtype))
    A_0 = (qdot[3] - q0[5] * q0[4]) * cD - (qdot[4] + q0[5] * q0[3]) * sD

    tau0 = dt[0]
    V1 = V0 + A_0 * tau0                   # reference :138-139 update order
    s1 = s0 + V1 * tau0 + A_0 * tau0 * tau0 / 2.0

    taus = jnp.concatenate([dt[1:], dt[N - 2:N - 1]])   # tau for i=1..N-1

    cti = cfg.tire_inverse == "corrected"

    # The short/long stage split (`i <= S`) is STATIC, so the horizon is
    # seeded by two scans — the short stages run only the warm-state
    # 1-iteration trim, the long stages only the 4-iteration cold trim —
    # instead of one scan computing BOTH per stage and selecting (5 trim
    # iterations of work per stage where 1 or 4 suffice; the trim
    # fixed point dominates cold node seeding).  Bitwise-identical
    # outputs: the carry (V, s) flows from the first scan into the
    # second exactly as in the fused loop.
    def body_short(carry, inp):
        V, s = carry
        tau, t_i = inp
        tj = trj.eval_arclength(tube, s, fields=("psi", "kappa"))
        ds_i = s - trj.eval_time(tube, t_i, fields=()).s
        A_des = _accel_desired(cfg, tj.A, tj.V, V, ds_i, tau)
        est1 = dyn.steady_state_estimates(
            veh, V, A_des, tj.kappa, num_iters=1, r=r0, beta0=beta0,
            delta0=delta0, Fyf0=Fyf0, corrected_tire_inverse=cti)
        q = jnp.stack([ds_i, q0[3], q0[4], q0[5],
                       adiff(q0[2], tj.psi), e0])
        u = jnp.stack([est1.delta, est1.Fxf + est1.Fxr])
        p = jnp.stack([tj.V, tj.kappa, 0.0 * s, 0.0 * s])
        V_n = V + est1.A * tau
        s_n = s + V_n * tau + est1.A * tau * tau / 2.0
        return (V_n, s_n), (q, u, p)

    def body_long(carry, inp):
        V, s = carry
        tau, t_i = inp
        tj = trj.eval_arclength(tube, s, fields=("psi", "kappa"))
        ds_i = s - trj.eval_time(tube, t_i, fields=()).s
        A_des = _accel_desired(cfg, tj.A, tj.V, V, ds_i, tau)
        est4 = dyn.steady_state_estimates(veh, V, A_des, tj.kappa,
                                          num_iters=4,
                                          corrected_tire_inverse=cti)
        q = jnp.stack([ds_i, est4.Ux, est4.Uy, est4.r, -est4.beta,
                       0.0 * s])
        u = jnp.stack([est4.delta, est4.Fxf + est4.Fxr])
        p = jnp.stack([tj.V, tj.kappa, 0.0 * s, 0.0 * s])
        V_n = V + est4.A * tau
        s_n = s + V_n * tau + est4.A * tau * tau / 2.0
        return (V_n, s_n), (q, u, p)

    carry1, (q_s, u_s, p_s) = jax.lax.scan(
        body_short, (V1, s1), (taus[:S], ts[1:S + 1]))
    _, (q_l, u_l, p_l) = jax.lax.scan(
        body_long, carry1, (taus[S:], ts[S + 1:]))
    qs = jnp.concatenate([q_0[None], q_s, q_l])
    us = jnp.concatenate([u20[None], u_s, u_l])
    ps = jnp.concatenate([p_0[None], p_s, p_l])
    return qs, us, ps


def _nodes_coupled_warm(cfg: MPCConfig, tube, q0, u0, ts, carry: MPCCarry):
    """Resample the previous solution onto the new grid
    (reference :83-102)."""
    s0, e0, _ = trj.path_coordinates(tube, q0[:2])
    tj0 = trj.eval_arclength(tube, s0, fields=("psi", "kappa"))
    ds0 = s0 - trj.eval_time(tube, ts[0], fields=()).s
    q_node0 = jnp.stack([ds0, q0[3], q0[4], q0[5], adiff(q0[2], tj0.psi), e0])
    u_node0 = jnp.stack([u0[0], u0[1] + u0[2]])
    p_node0 = jnp.stack([tj0.V, tj0.kappa, 0.0 * s0, 0.0 * s0])

    # resample the previous solution onto the new grid as ONE interp-
    # weight matmul: the knot count is tiny (N+1 = 16), so building the
    # (T, K) weight matrix from comparisons and contracting it with the
    # stacked [q_prev | u_prev] columns costs no gathers at all — a
    # per-element batched gather Y[j] lowers to scatter/gather HLO that
    # dominates this phase at fleet batch sizes
    tq = jnp.clip(ts[1:], carry.prev_ts[0], carry.prev_ts[-1])
    Y = jnp.concatenate([carry.q_prev, carry.u_prev], axis=-1)  # (K, 8)
    nxq = carry.q_prev.shape[-1]
    K = carry.prev_ts.shape[0]
    # segment index by counting knots <= tq (compare + reduce, no search)
    j = jnp.clip(jnp.sum((tq[:, None] >= carry.prev_ts[None, :])
                         .astype(jnp.int32), axis=1) - 1, 0, K - 2)
    kk = jnp.arange(K)
    oh_j = (kk[None, :] == j[:, None]).astype(Y.dtype)        # (T, K)
    oh_j1 = (kk[None, :] == (j + 1)[:, None]).astype(Y.dtype)
    ts_j = oh_j @ carry.prev_ts
    ts_j1 = oh_j1 @ carry.prev_ts
    # duplicate-knot guard: compute_time_steps yields strictly increasing
    # ts, but a degenerate carry must clamp (as jnp.interp would), not NaN
    lam = jnp.clip((tq - ts_j) / jnp.maximum(
        ts_j1 - ts_j, jnp.asarray(1e-9, carry.prev_ts.dtype)), 0.0, 1.0)
    W = (1.0 - lam)[:, None] * oh_j + lam[:, None] * oh_j1    # (T, K)
    vals = W @ Y
    q_tail, u_tail = vals[:, :nxq], vals[:, nxq:]
    s_tail = jax.vmap(lambda t: trj.eval_time(tube, t, fields=()).s)(
        ts[1:]) + q_tail[:, 0]
    tj = jax.vmap(lambda s: trj.eval_arclength(tube, s,
                                               fields=("kappa",)))(s_tail)
    p_tail = jnp.stack([tj.V, tj.kappa, jnp.zeros_like(tj.V),
                        jnp.zeros_like(tj.V)], axis=-1)
    qs = jnp.concatenate([q_node0[None], q_tail])
    us = jnp.concatenate([u_node0[None], u_tail])
    ps = jnp.concatenate([p_node0[None], p_tail])
    return qs, us, ps


# ---------------------------------------------------------------------------
# Linearization nodes — decoupled (reference src/decoupled_lat_long.jl:52-104;
# always cold/trim-seeded: the reference decoupled MPC has no warm branch)
# ---------------------------------------------------------------------------

def _nodes_decoupled(cfg: MPCConfig, tube, q0, u0, ts, dt):
    veh, hz = cfg.veh, cfg.hz
    S, N = hz.N_short, hz.N
    s0, e0, _ = trj.path_coordinates(tube, q0[:2])
    V0 = jnp.hypot(q0[3], q0[4])           # reference :67
    beta0 = jnp.arctan2(q0[4], q0[3])
    r0, delta0 = q0[5], u0[0]
    Fyf0, _ = dyn.lateral_tire_forces(veh, q0[3], q0[4], q0[5], u0)
    u20 = jnp.stack([u0[0], u0[1] + u0[2]])

    tj0 = trj.eval_arclength(tube, s0, fields=("psi", "kappa"))
    q_0 = jnp.stack([q0[4], q0[5], adiff(q0[2], tj0.psi), e0])
    p_0 = jnp.stack([q0[3], tj0.kappa, 0.0 * s0, 0.0 * s0])
    qdot = dyn.vehicle_ode(veh, "bicycle", q0, u20, jnp.zeros(4, q0.dtype))
    A_0 = ((qdot[3] - q0[5] * q0[4]) * jnp.cos(beta0)
           + (qdot[4] + q0[5] * q0[3]) * jnp.sin(beta0))

    tau0 = dt[0]
    V1 = V0 + A_0 * tau0
    s1 = s0 + V1 * tau0 + A_0 * tau0 * tau0 / 2.0
    # keep the scan carry dtype-stable when the tube dtype (often f64 on
    # CPU) is wider than the state dtype
    ctype = jnp.result_type(V1, s1)
    V1, s1 = V1.astype(ctype), s1.astype(ctype)

    taus = jnp.concatenate([dt[1:], dt[N - 2:N - 1]])

    cti = cfg.tire_inverse == "corrected"

    # static short/long split — two scans, each running ONLY the trim its
    # stages need (see _nodes_coupled_cold; bitwise-identical outputs,
    # ~45% less trim work on the always-cold decoupled path)
    def body_short(carry, inp):
        V, s = carry
        tau, t_i = inp
        tj = trj.eval_arclength(tube, s, fields=("psi", "kappa"))
        ds_i = s - trj.eval_time(tube, t_i, fields=()).s
        A_des = _accel_desired(cfg, tj.A, tj.V, V, ds_i, tau)
        est1 = dyn.steady_state_estimates(
            veh, V, A_des, tj.kappa, num_iters=1, r=r0, beta0=beta0,
            delta0=delta0, Fyf0=Fyf0, corrected_tire_inverse=cti)
        q = jnp.stack([q0[4], q0[5], adiff(q0[2], tj.psi), e0])
        u = jnp.stack([est1.delta, est1.Fxf + est1.Fxr])
        p = jnp.stack([est1.Ux, tj.kappa, 0.0 * s, 0.0 * s])
        V_n = V + est1.A * tau
        s_n = s + V_n * tau + est1.A * tau * tau / 2.0
        return (V_n, s_n), (q, u, p)

    def body_long(carry, inp):
        V, s = carry
        tau, t_i = inp
        tj = trj.eval_arclength(tube, s, fields=("psi", "kappa"))
        ds_i = s - trj.eval_time(tube, t_i, fields=()).s
        A_des = _accel_desired(cfg, tj.A, tj.V, V, ds_i, tau)
        est4 = dyn.steady_state_estimates(veh, V, A_des, tj.kappa,
                                          num_iters=4,
                                          corrected_tire_inverse=cti)
        q = jnp.stack([est4.Uy, est4.r, -est4.beta, 0.0 * s])
        u = jnp.stack([est4.delta, est4.Fxf + est4.Fxr])
        p = jnp.stack([est4.Ux, tj.kappa, 0.0 * s, 0.0 * s])
        V_n = V + est4.A * tau
        s_n = s + V_n * tau + est4.A * tau * tau / 2.0
        return (V_n, s_n), (q, u, p)

    carry1, (q_s, u_s, p_s) = jax.lax.scan(
        body_short, (V1, s1), (taus[:S], ts[1:S + 1]))
    _, (q_l, u_l, p_l) = jax.lax.scan(
        body_long, carry1, (taus[S:], ts[S + 1:]))
    qs = jnp.concatenate([q_0[None], q_s, q_l])
    us = jnp.concatenate([u20[None], u_s, u_l])
    ps = jnp.concatenate([p_0[None], p_s, p_l])
    return qs, us, ps


# ---------------------------------------------------------------------------
# The MPC step
# ---------------------------------------------------------------------------

class _PreAux(NamedTuple):
    """Pre-solve values the post-solve phase needs."""

    ts: jnp.ndarray
    s0: jnp.ndarray
    e0: jnp.ndarray
    V_hji: jnp.ndarray
    gradV: jnp.ndarray
    x_rel: jnp.ndarray
    us: jnp.ndarray      # node controls (decoupled control extraction)
    G: jnp.ndarray = None   # condensed rollout map (state recovery)
    g: jnp.ndarray = None
    w: jnp.ndarray = None   # soft-row penalty weights (soft formulation)
    q0_node: jnp.ndarray = None  # stage-0 tracking state (soft extraction)


def _banded_plan_for(cfg: MPCConfig):
    if (cfg.solver.factor_method in ("banded", "banded_cr")
            and cfg.formulation == "coupled" and not cfg.condensed
            and not cfg.soft):
        from pigeon_tpu.solver.banded import coupled_stage_plan
        return coupled_stage_plan(cfg.hz, cfg.coupled.use_walls)
    return None


def _eq_rows_for(cfg: MPCConfig):
    """Statically-known equality rows of the QP (the solver's
    mixed-precision Pallas modes keep their matvec tiles at fp32)."""
    if cfg.formulation == "coupled" and not cfg.soft:
        if cfg.condensed:
            from pigeon_tpu.qp.condensed import get_layout
        else:
            from pigeon_tpu.qp.coupled import get_layout
        return get_layout(cfg.hz, cfg.coupled.use_walls).eq_rows
    return None


def _pre_solve(cfg: MPCConfig, tube, cache, carry: MPCCarry, q0, u0,
               other_car, t, nodes_mode: str = "auto"):
    """Projection, node seeding, HJI constraint, linearization and QP
    assembly — everything up to the solver call."""
    veh, hz = cfg.veh, cfg.hz
    ts, dt = compute_time_steps(hz, t)
    s0, e0, _ = trj.path_coordinates(tube, q0[:2])

    if cfg.formulation == "coupled":
        if nodes_mode == "warm_only" and cfg.warm_nodes:
            qs, us, ps = _nodes_coupled_warm(cfg, tube, q0, u0, ts, carry)
        elif cfg.warm_nodes:
            cold = _nodes_coupled_cold(cfg, tube, q0, u0, ts, dt)
            warm = _nodes_coupled_warm(cfg, tube, q0, u0, ts, carry)
            qs, us, ps = jax.tree.map(
                lambda c, w: jnp.where(carry.solved, w, c), cold, warm)
        else:
            qs, us, ps = _nodes_coupled_cold(cfg, tube, q0, u0, ts, dt)

        u_lin = jnp.stack([u0[0], u0[1] + u0[2]])
        x_rel = hji_mod.relative_state(q0, other_car)
        if cfg.coupled.use_hji:
            M, b, V_hji, gradV = hji_mod.reachability_constraint(
                veh, cache, x_rel, cfg.hji_eps, u_lin)
            if cfg.hji_row_normalize:
                # unit-normalize in the normalized-u metric + clamp the
                # bound to the achievable set (see MPCConfig docstring)
                unorm = jnp.asarray(qp_coupled.u_normalization(veh),
                                    q0.dtype)
                Mn = M * unorm
                nrm = jnp.sqrt(jnp.sum(Mn * Mn))
                live = nrm > 1e-9
                scale = jnp.where(live, 1.0 / jnp.maximum(nrm, 1e-9), 1.0)
                M = M * scale
                b = b * scale
                l1 = jnp.sum(jnp.abs(Mn)) * scale     # ||Mhat.unorm||_1
                b = jnp.where(live, jnp.maximum(b, -0.95 * l1), b)
        else:
            M = jnp.zeros(2, q0.dtype)
            b = jnp.ones((), q0.dtype)
            V_hji = jnp.asarray(jnp.inf, q0.dtype)
            gradV = jnp.zeros(7, q0.dtype)

        if cfg.coupled.use_walls:
            s_nodes = jax.vmap(
                lambda t: trj.eval_time(tube, t, fields=()).s)(ts) \
                + qs[:, 0]
            tj_nodes = jax.vmap(lambda s: trj.eval_arclength(
                tube, s, fields=("edge_L", "edge_R")))(s_nodes)
            edges = jnp.stack([tj_nodes.edge_L, tj_nodes.edge_R], axis=-1)
        else:
            edges = None
        data = qp_coupled.CoupledStageData(dt=dt, qs=qs, us=us, ps=ps,
                                           hji_M=M, hji_b=b, edges=edges)
        G_map = g_off = w_soft = q0_node = None
        if cfg.soft:
            from pigeon_tpu.qp import condensed as qp_condensed
            from pigeon_tpu.solver.admm import QPData
            sqp = qp_condensed.build_qp_soft(veh, cfg.coupled, hz, data,
                                             lin_method=cfg.lin_method,
                                             lin_substeps=cfg.lin_substeps)
            qp = QPData(sqp.P, sqp.q, sqp.A, sqp.l, sqp.u)
            G_map, g_off, w_soft = sqp.G, sqp.g, sqp.w
            q0_node = qs[0]
        elif cfg.condensed:
            from pigeon_tpu.qp import condensed as qp_condensed
            cqp = qp_condensed.build_qp(veh, cfg.coupled, hz, data,
                                        lin_method=cfg.lin_method,
                                        lin_substeps=cfg.lin_substeps)
            from pigeon_tpu.solver.admm import QPData
            qp = QPData(cqp.P, cqp.q, cqp.A, cqp.l, cqp.u)
            G_map, g_off = cqp.G, cqp.g
        else:
            qp = qp_coupled.build_qp(veh, cfg.coupled, hz, data,
                                     lin_method=cfg.lin_method,
                                     lin_substeps=cfg.lin_substeps)
    else:
        qs, us, ps = _nodes_decoupled(cfg, tube, q0, u0, ts, dt)
        V_hji = jnp.asarray(jnp.inf, q0.dtype)
        gradV = jnp.zeros(7, q0.dtype)
        x_rel = hji_mod.relative_state(q0, other_car)
        data = qp_decoupled.DecoupledStageData(dt=dt, qs=qs, us=us, ps=ps)
        G_map = g_off = w_soft = q0_node = None
        if cfg.soft:
            from pigeon_tpu.solver.admm import QPData
            sqp = qp_decoupled.build_qp_soft(veh, cfg.decoupled, hz, data)
            qp = QPData(sqp.P, sqp.q, sqp.A, sqp.l, sqp.u)
            G_map, g_off, w_soft = sqp.G, sqp.g, sqp.w
            q0_node = qs[0]
        else:
            qp = qp_decoupled.build_qp(veh, cfg.decoupled, hz, data)

    warm_start = QPWarmStart(
        x=jnp.where(carry.solved, carry.warm_x, 0.0),
        y=jnp.where(carry.solved, carry.warm_y, 0.0),
        z=jnp.where(carry.solved, carry.warm_z, 0.0),
        rho_scale=jnp.where(carry.solved, carry.warm_rho, 1.0))
    aux = _PreAux(ts=ts, s0=s0, e0=e0, V_hji=V_hji, gradV=gradV,
                  x_rel=x_rel, us=us, G=G_map, g=g_off, w=w_soft,
                  q0_node=q0_node)
    return qp, warm_start, aux


def _post_solve(cfg: MPCConfig, carry: MPCCarry, q0,
                sol: QPSolution, aux: _PreAux):
    """Control extraction, clamping, HJI override, NaN fallback, carry
    update (reference src/ros_integration.jl:115-150)."""
    veh, hz = cfg.veh, cfg.hz
    if cfg.formulation == "coupled":
        if cfg.soft:
            from pigeon_tpu.qp import condensed as qp_condensed
            u2 = qp_condensed.extract_control_soft(veh, hz, sol.x,
                                                   cfg.coupled.use_walls)
            q_sol, u_sol = qp_condensed.extract_trajectory_soft(
                hz, sol.x, veh, aux.G, aux.g, aux.q0_node, aux.us[0],
                cfg.coupled.use_walls)
        elif cfg.condensed:
            from pigeon_tpu.qp import condensed as qp_condensed
            u2 = qp_condensed.extract_control(veh, hz, sol.x,
                                              cfg.coupled.use_walls)
            q_sol, u_sol = qp_condensed.extract_trajectory(
                hz, sol.x, veh, aux.G, aux.g, cfg.coupled.use_walls)
        else:
            u2 = qp_coupled.extract_control(veh, hz, sol.x,
                                            cfg.coupled.use_walls)
            q_sol, u_sol = qp_coupled.extract_trajectory(
                hz, sol.x, veh, cfg.coupled.use_walls)
    elif cfg.soft:
        u2 = qp_decoupled.extract_control_soft(hz, sol.x, aux.us)
        q_sol, u_sol = qp_decoupled.extract_trajectory_soft(
            hz, sol.x, aux.G, aux.g, aux.q0_node, aux.us)
    else:
        u2 = qp_decoupled.extract_control(hz, sol.x, aux.us)
        L = qp_decoupled.get_layout(hz)
        q_sol, u_sol = sol.x[L.q], jnp.stack(
            [sol.x[L.d], aux.us[:, 1]], axis=-1)

    # Actuation clamp on the commanded control (robustness deviation from
    # the reference, which publishes the raw QP value: the autobox ECU
    # enforces these limits physically, and a non-converged ADMM iterate
    # can otherwise exceed them; reference relies on OSQP's 4000-iteration
    # budget instead).  Disabled in the parity harness's faithful mode.
    if cfg.clamp_commands:
        u2 = dyn.apply_control_limits(veh, u2, q0[3])
    Fxf, Fxr = dyn.longitudinal_split(veh, u2[1])
    u3 = jnp.stack([u2[0], Fxf, Fxr])

    finite = jnp.all(jnp.isfinite(u3))
    fallback = jnp.where(carry.nan_fallback, jnp.zeros(3, u3.dtype),
                         carry.current_control)
    u3_out = jnp.where(finite, u3, fallback)

    # HJI least-restrictive override ("hammer"; reference
    # src/ros_integration.jl:115-125)
    hji_active = aux.V_hji <= cfg.hji_eps
    overridden = jnp.asarray(False)
    if cfg.formulation == "coupled" and cfg.use_hji_policy:
        u2_opt = hji_mod.optimal_control(veh, aux.x_rel, aux.gradV)
        Fxf_o, Fxr_o = dyn.longitudinal_split(veh, u2_opt[1])
        u3_opt = jnp.stack([u2_opt[0], Fxf_o, Fxr_o])
        u3_out = jnp.where(hji_active, u3_opt, u3_out)
        overridden = hji_active

    new_carry = MPCCarry(
        prev_ts=aux.ts,
        q_prev=jnp.where(finite, q_sol, carry.q_prev),
        u_prev=jnp.where(finite, u_sol, carry.u_prev),
        # An applied override invalidates the warm start: the published
        # bang-bang command is far from the QP's plan, so resampling
        # that plan next step seeds the solver with stale dynamics
        # (r5 safety A/B measured hammer-arm converged_frac 0.85-0.91
        # from exactly this staleness); the post-override cold trim
        # reseeds from the actual state.  Deviation from the reference,
        # which keeps its warm start through overrides
        # (src/ros_integration.jl:115-125).
        solved=finite & jnp.logical_not(overridden),
        warm_x=jnp.where(finite, sol.x, 0.0),
        warm_y=jnp.where(finite, sol.y, 0.0),
        warm_z=jnp.where(finite, sol.z, 0.0),
        current_control=u3_out,
        nan_fallback=jnp.logical_not(finite),
        warm_rho=jnp.where(finite, sol.rho_scale, 1.0),
    )
    diag = StepDiagnostics(
        s=aux.s0, e=aux.e0, V_hji=aux.V_hji, hji_active=hji_active,
        iterations=sol.iterations, prim_res=sol.prim_res,
        dual_res=sol.dual_res, converged=sol.converged,
        solution_finite=finite)
    return new_carry, u3_out, diag


def mpc_step(cfg: MPCConfig, tube: trj.TrajectoryTube,
             cache: hji_mod.HJICache, carry: MPCCarry, q0, u0, other_car, t,
             nodes_mode: str = "auto"):
    """One full control step.  Pure function of its inputs; vmap over
    (tube, carry, q0, u0, other_car, t) for scenario batching (but prefer
    `mpc_step_batched`, which batches the solver natively).

    Mirrors the reference callback pipeline `src/ros_integration.jl:94-150`
    (4-phase MPC + HJI override + NaN fallback).
    Returns (new_carry, u3_command, diagnostics).

    nodes_mode: "auto" selects cold/warm per the carry's solved flag
    (computing both under vmap); "warm_only" skips the cold trim rollout —
    valid only when the caller guarantees every carry is warm (see
    `mpc_step_batched`, which branches once per batch on that predicate).
    """
    qp, warm_start, aux = _pre_solve(cfg, tube, cache, carry, q0, u0,
                                     other_car, t, nodes_mode)
    sol = solve_qp(qp, warm=warm_start, opts=cfg.solver,
                   banded_plan=_banded_plan_for(cfg),
                   eq_rows=_eq_rows_for(cfg), w_soft=aux.w)
    return _post_solve(cfg, carry, q0, sol, aux)


# ---------------------------------------------------------------------------
# Closed-loop simulation (reference `simulate`,
# src/model_predictive_control.jl:80-100)
# ---------------------------------------------------------------------------

class SimLog(NamedTuple):
    q: jnp.ndarray        # (n_steps, 6) plant states
    u: jnp.ndarray        # (n_steps, 3) commands in effect
    diag: StepDiagnostics  # stacked


def simulate(cfg: MPCConfig, tube: trj.TrajectoryTube,
             cache: hji_mod.HJICache, q0, u0=None, other_car=None,
             dt: float = 0.01, n_steps: int = 100) -> SimLog:
    """Closed loop: log -> MPC step -> propagate plant with the *previous*
    control -> adopt the new command, exactly mirroring the reference loop
    order (src/model_predictive_control.jl:87-98)."""
    veh = cfg.veh
    if u0 is None:
        u0 = jnp.zeros(3, q0.dtype)
    if other_car is None:
        other_car = jnp.asarray([1e4, 1e4, 0.0, 0.0], q0.dtype)

    def f(q, ur):
        return dyn.vehicle_ode(veh, "bicycle", q, ur[:2], ur[2:])

    def body(state, i):
        q, u, carry = state
        t = i * dt
        carry, u_next, diag = mpc_step(cfg, tube, cache, carry, q, u,
                                       other_car, t)
        u2 = jnp.stack([u[0], u[1] + u[2]])
        ur = jnp.concatenate([u2, jnp.zeros(4, q.dtype)])
        q_next = dz.propagate(f, q, ur, dt, substeps=cfg.sim_substeps)
        return (q_next, u_next, carry), (q, u, diag)

    carry0 = init_carry(cfg, dtype=q0.dtype)
    (_, _, _), (q_log, u_log, diag_log) = jax.lax.scan(
        body, (q0, u0, carry0), jnp.arange(n_steps))
    return SimLog(q=q_log, u=u_log, diag=diag_log)


def mpc_step_batched(cfg: MPCConfig, tube: trj.TrajectoryTube,
                     cache: hji_mod.HJICache, carries: MPCCarry, q0s, u0s,
                     other_cars, ts):
    """Batched control step: vmapped pre-solve (with a batch-level
    cold/warm branch), NATIVELY BATCHED solver, vmapped post-solve.

    The batch-level lax.cond on "is anyone cold" executes only the warm
    node path on steady-state steps (under plain vmap the per-element
    select would compute the cold trim rollout for every scenario every
    step).  The solver runs through `solve_qp_batched`, which on the
    pallas backend tiles `cfg.solver.pallas_tile` instances per VMEM block
    and applies the bf16-bulk + fp32-polish precision ladder — structure
    that is impossible under per-instance vmap.
    """
    from pigeon_tpu.solver.admm import solve_qp_batched

    def pre(mode):
        def run(args):
            c, q, u, oc, t = args
            return jax.vmap(lambda c_, q_, u_, oc_, t_: _pre_solve(
                cfg, tube, cache, c_, q_, u_, oc_, t_, mode))(c, q, u, oc,
                                                              t)
        return run

    args = (carries, q0s, u0s, other_cars, ts)
    if cfg.formulation == "coupled" and cfg.warm_nodes:
        any_cold = jnp.logical_not(jnp.all(carries.solved))
        qp, warm, aux = jax.lax.cond(any_cold, pre("auto"),
                                     pre("warm_only"), args)
    else:
        qp, warm, aux = pre("auto")(args)

    sol = solve_qp_batched(qp, warm, cfg.solver,
                           banded_plan=_banded_plan_for(cfg),
                           eq_rows=_eq_rows_for(cfg), w_soft=aux.w)
    return jax.vmap(lambda c, q, s, a: _post_solve(cfg, c, q, s, a))(
        carries, q0s, sol, aux)
