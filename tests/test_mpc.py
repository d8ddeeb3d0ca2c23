"""MPC orchestration tests: time grid, QP assembly vs a reference solver,
single steps, warm starts, closed-loop tracking on straight + recorded X1
paths, and batched execution (SURVEY.md §4 "golden-trace tests")."""

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import HorizonParams, SolverOptions
from pigeon_tpu.qp import coupled as QC
from pigeon_tpu.qp import decoupled as QD
from pigeon_tpu.solver.admm import solve_qp
from tests.conftest import REFERENCE_PATHS


# ---------------------------------------------------------------------------
# Time grid
# ---------------------------------------------------------------------------

def _ref_time_steps(hz, t0):
    """Straight transcription of the reference's compute_time_steps!
    (src/model_predictive_control.jl:17-30) in plain Python."""
    ts = np.zeros(hz.N)
    t0_long = t0 + hz.N_short * hz.dt_short
    if hz.use_correction_step:
        t0_long = hz.dt_long * math.ceil(
            (t0_long + hz.dt_short) / hz.dt_long - 1)
    ts[:hz.N_short + 1] = t0 + hz.dt_short * np.arange(hz.N_short + 1)
    ts[hz.N_short + 1:] = t0_long + hz.dt_long * np.arange(1, hz.N_long + 1)
    return ts


@pytest.mark.parametrize("t0", [0.0, 0.013, 0.199, 0.86, 5.5555])
def test_compute_time_steps(t0):
    hz = HorizonParams(N_short=5, N_long=10)
    ts, dt = M.compute_time_steps(hz, t0)
    np.testing.assert_allclose(np.asarray(ts), _ref_time_steps(hz, t0),
                               rtol=1e-12)
    dts = np.asarray(dt)
    np.testing.assert_allclose(np.asarray(dt), np.diff(np.asarray(ts)),
                               rtol=1e-12)
    # correction step lies in [dt_short, dt_long + dt_short)
    assert hz.dt_short - 1e-9 <= dts[hz.N_short] < hz.dt_long + hz.dt_short
    assert np.all(dts > 0)


# ---------------------------------------------------------------------------
# QP assembly against a dense reference solve
# ---------------------------------------------------------------------------

def _scipy_qp(qp):
    P = np.asarray(qp.P_diag)
    q = np.asarray(qp.q)
    A = np.asarray(qp.A)
    lo = np.asarray(qp.l)
    hi = np.asarray(qp.u)
    eq = (hi - lo) < 1e-10
    cons = [scipy.optimize.LinearConstraint(A[eq], lo[eq], hi[eq]),
            scipy.optimize.LinearConstraint(A[~eq], lo[~eq], hi[~eq])]
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ (P * x) + q @ x, np.zeros_like(q),
        jac=lambda x: P * x + q, constraints=cons, method="SLSQP",
        options={"maxiter": 2000, "ftol": 1e-14})
    return res


@pytest.fixture(scope="module")
def small_cfg():
    """Small horizon so the scipy reference solve stays fast."""
    return M.x1_coupled_config(hz=HorizonParams(N_short=2, N_long=3))


def _kkt_check(qp, sol, tol):
    """Direct optimality check (solver-independent): stationarity, primal
    feasibility, complementary slackness."""
    x = np.asarray(sol.x)
    y = np.asarray(sol.y)
    P = np.asarray(qp.P_diag)
    A = np.asarray(qp.A)
    lo, hi = np.asarray(qp.l), np.asarray(qp.u)
    scale = max(1.0, np.abs(P * x).max(), np.abs(np.asarray(qp.q)).max(),
                np.abs(A.T @ y).max())
    stat = np.abs(P * x + np.asarray(qp.q) + A.T @ y).max() / scale
    Ax = A @ x
    feas = max(np.maximum(lo - Ax, 0.0).max(), np.maximum(Ax - hi, 0.0).max())
    gap_u = np.where(np.isfinite(hi), hi - Ax, 1.0)
    gap_l = np.where(np.isfinite(lo), Ax - lo, 1.0)
    comp = max(np.abs(np.maximum(y, 0) * gap_u).max(),
               np.abs(np.minimum(y, 0) * gap_l).max())
    assert stat < tol, f"stationarity {stat}"
    assert feas < tol, f"feasibility {feas}"
    assert comp < 100 * tol, f"complementarity {comp}"


def test_coupled_qp_kkt_optimal(small_cfg):
    """ADMM solution of the assembled coupled QP satisfies the KKT
    conditions (scipy SLSQP cannot reliably solve this conditioning, so the
    reference check is direct optimality)."""
    cfg = small_cfg
    tube = trj.straight_trajectory(100.0, 6.0, pad_to=16)
    q0 = jnp.array([0.3, 0.0, 0.02, 6.0, 0.0, 0.0])
    u0 = jnp.zeros(3)
    ts, dt = M.compute_time_steps(cfg.hz, 0.0)
    qs, us, ps = M._nodes_coupled_cold(cfg, tube, q0, u0, ts, dt)
    data = QC.CoupledStageData(dt=dt, qs=qs, us=us, ps=ps,
                               hji_M=jnp.zeros(2), hji_b=jnp.ones(()))
    qp = QC.build_qp(cfg.veh, cfg.coupled, cfg.hz, data)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=10000, eps_abs=1e-9,
                                          eps_rel=1e-9))
    assert bool(sol.converged)
    _kkt_check(qp, sol, tol=1e-5)


def test_decoupled_qp_matches_scipy():
    cfg = M.x1_decoupled_config(hz=HorizonParams(N_short=2, N_long=3))
    tube = trj.straight_trajectory(100.0, 6.0, pad_to=16)
    q0 = jnp.array([0.3, 0.0, 0.02, 6.0, 0.0, 0.0])
    u0 = jnp.zeros(3)
    ts, dt = M.compute_time_steps(cfg.hz, 0.0)
    qs, us, ps = M._nodes_decoupled(cfg, tube, q0, u0, ts, dt)
    data = QD.DecoupledStageData(dt=dt, qs=qs, us=us, ps=ps)
    qp = QD.build_qp(cfg.veh, cfg.decoupled, cfg.hz, data)
    res = _scipy_qp(qp)
    assert res.success, res.message
    sol = solve_qp(qp, opts=SolverOptions(max_iter=4000, eps_abs=1e-8,
                                          eps_rel=1e-8))
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), res.x, atol=2e-3)


def test_coupled_qp_solution_dynamics_consistent(small_cfg):
    """The QP solution must satisfy its own LTV dynamics rows."""
    cfg = small_cfg
    tube = trj.straight_trajectory(100.0, 6.0, pad_to=16)
    q0 = jnp.array([0.5, 0.0, 0.0, 6.0, 0.0, 0.0])
    ts, dt = M.compute_time_steps(cfg.hz, 0.0)
    qs, us, ps = M._nodes_coupled_cold(cfg, tube, q0, jnp.zeros(3), ts, dt)
    data = QC.CoupledStageData(dt=dt, qs=qs, us=us, ps=ps,
                               hji_M=jnp.zeros(2), hji_b=jnp.ones(()))
    qp = QC.build_qp(cfg.veh, cfg.coupled, cfg.hz, data)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=4000, eps_abs=1e-9,
                                          eps_rel=1e-9))
    q_sol, u_sol = QC.extract_trajectory(cfg.hz, sol.x, cfg.veh)
    # initial pins (reference :250-251)
    np.testing.assert_allclose(np.asarray(q_sol[0]), np.asarray(qs[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(u_sol[0]), np.asarray(us[0]),
                               atol=1e-5)
    # speed bounds (reference :246-247)
    assert np.all(np.asarray(q_sol[:, 1]) >= cfg.coupled.V_min - 1e-5)
    assert np.all(np.asarray(q_sol[:, 1]) <= cfg.coupled.V_max + 1e-5)
    # steering within hardware bounds (reference :286-287)
    assert np.all(np.abs(np.asarray(u_sol[1:, 0]))
                  <= cfg.veh.delta_max + 1e-6)


# ---------------------------------------------------------------------------
# Single steps + warm start
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def step_setup():
    cfg = M.x1_coupled_config()
    tube = trj.straight_trajectory(60.0, 5.0, pad_to=32)
    cache = H.inactive_cache()
    carry = M.init_carry(cfg, dtype=jnp.float64)
    q0 = jnp.array([0.3, 0.0, 0.02, 5.0, 0.0, 0.0])
    oc = jnp.array([1e4, 1e4, 0.0, 0.0])
    return cfg, tube, cache, carry, q0, oc


def test_mpc_step_converges(step_setup):
    cfg, tube, cache, carry, q0, oc = step_setup
    carry, u3, diag = M.mpc_step(cfg, tube, cache, carry, q0, jnp.zeros(3),
                                 oc, 0.0)
    assert bool(diag.converged)
    assert bool(diag.solution_finite)
    assert np.all(np.isfinite(np.asarray(u3)))
    assert abs(float(u3[0])) <= cfg.veh.delta_max


def test_mpc_step_warm_start_cheaper(step_setup):
    cfg, tube, cache, carry, q0, oc = step_setup
    carry1, _, d1 = M.mpc_step(cfg, tube, cache, carry, q0, jnp.zeros(3),
                               oc, 0.0)
    _, _, d2 = M.mpc_step(cfg, tube, cache, carry1, q0, jnp.zeros(3),
                          oc, 0.01)
    assert int(d2.iterations) <= int(d1.iterations)
    assert bool(d2.converged)


def test_mpc_step_vmap_batch(step_setup):
    cfg, tube, cache, carry, q0, oc = step_setup
    B = 4
    q_batch = jnp.stack([q0 + jnp.zeros(6).at[0].set(0.2 * i)
                         for i in range(B)])
    carry_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           carry)
    stepf = jax.vmap(lambda c, q: M.mpc_step(cfg, tube, cache, c, q,
                                             jnp.zeros(3), oc, 0.0))
    carry2, u3, diag = stepf(carry_b, q_batch)
    assert u3.shape == (B, 3)
    assert np.all(np.isfinite(np.asarray(u3)))
    assert np.all(np.asarray(diag.solution_finite))
    # batch element 0 matches the unbatched step
    _, u3_single, _ = M.mpc_step(cfg, tube, cache, carry, q0, jnp.zeros(3),
                                 oc, 0.0)
    np.testing.assert_allclose(np.asarray(u3[0]), np.asarray(u3_single),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Closed loop
# ---------------------------------------------------------------------------

def _sim(cfg, tube, q0, n_steps):
    cache = H.inactive_cache()
    log = jax.jit(lambda q: M.simulate(cfg, tube, cache, q, dt=0.01,
                                       n_steps=n_steps))(q0)
    jax.block_until_ready(log.q)
    return log


@pytest.mark.parametrize("form", ["coupled", "decoupled"])
def test_closed_loop_straight_converges(form):
    cfg = (M.x1_coupled_config() if form == "coupled"
           else M.x1_decoupled_config())
    tube = trj.straight_trajectory(100.0, 8.0, pad_to=32)
    q0 = jnp.array([0.8, 0.0, 0.03, 8.0, 0.0, 0.0])
    log = _sim(cfg, tube, q0, 300)
    e = np.asarray(log.diag.e)
    assert abs(e[0]) > 0.7           # starts offset
    assert abs(e[-1]) < 0.1          # converges
    assert np.all(np.isfinite(np.asarray(log.q)))
    assert np.all(np.abs(np.asarray(log.u[:, 0])) <= cfg.veh.delta_max + 1e-9)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_PATHS),
                    reason="reference test paths not mounted")
@pytest.mark.parametrize("form", ["coupled", "decoupled"])
def test_closed_loop_skidpad_oval(form):
    """Track the recorded X1 skidpad oval through its first corner entry."""
    cfg = (M.x1_coupled_config() if form == "coupled"
           else M.x1_decoupled_config())
    tube = trj.tube_from_world(
        os.path.join(REFERENCE_PATHS, "skidpadoval.world"), pad_to=1024)
    q0 = jnp.array([float(tube.E[0]), float(tube.N[0]), float(tube.psi[0]),
                    6.0, 0.0, 0.0])
    log = _sim(cfg, tube, q0, 400)
    e = np.asarray(log.diag.e)
    conv = np.asarray(log.diag.converged)
    assert abs(e).max() < 0.3, abs(e).max()
    assert conv.mean() > 0.99
    Ux = np.asarray(log.q[:, 3])
    assert Ux.min() > 5.0 and Ux.max() < 7.0


def test_simulate_speed_tracking_varied():
    """Speed-up/slow-down profile: the coupled controller must follow V."""
    s = np.linspace(0.0, 200.0, 201)
    V = 5.0 + 3.0 * np.sin(s / 200.0 * np.pi)
    from pigeon_tpu.math_utils import invcumtrapz
    t = np.asarray(invcumtrapz(jnp.asarray(V), jnp.asarray(s)))
    A = np.gradient(V, t)
    tube = trj.make_tube(t=t, s=s, V=V, A=A, E=np.zeros_like(s), N=s,
                         psi=np.zeros_like(s), kappa=np.zeros_like(s),
                         pad_to=256)
    cfg = M.x1_coupled_config()
    q0 = jnp.array([0.0, 0.0, 0.0, 5.0, 0.0, 0.0])
    log = _sim(cfg, tube, q0, 500)
    Ux = np.asarray(log.q[:, 3])
    t_log = 0.01 * np.arange(500)
    V_nom = np.interp(t_log, t, V)
    assert np.abs(Ux - V_nom).max() < 0.5, np.abs(Ux - V_nom).max()
