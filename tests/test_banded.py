"""Block-banded KKT factorization tests: structure, exactness against the
dense inverse, and end-to-end solver agreement."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import HorizonParams, SolverOptions
from pigeon_tpu.qp import coupled as QC
from pigeon_tpu.solver import admm, banded
from pigeon_tpu.solver.admm import solve_qp


def _real_qp(hz):
    cfg = M.x1_coupled_config(hz=hz)
    tube = trj.straight_trajectory(100.0, 6.0, pad_to=16)
    q0 = jnp.array([0.3, 0.0, 0.02, 6.0, 0.0, 0.0])
    ts, dt = M.compute_time_steps(cfg.hz, 0.0)
    qs, us, ps = M._nodes_coupled_cold(cfg, tube, q0, jnp.zeros(3), ts, dt)
    data = QC.CoupledStageData(dt=dt, qs=qs, us=us, ps=ps,
                               hji_M=jnp.zeros(2), hji_b=jnp.ones(()))
    return cfg, QC.build_qp(cfg.veh, cfg.coupled, cfg.hz, data)


@pytest.mark.parametrize("hz", [HorizonParams(N_short=2, N_long=3),
                                HorizonParams(N_short=5, N_long=10)])
def test_permuted_K_is_block_tridiagonal(hz):
    """Empirical check of the bandwidth claim: the stage-permuted K has no
    coupling beyond adjacent blocks."""
    cfg, qp = _real_qp(hz)
    qps, D, E, c = admm._ruiz(qp, 10)
    rho = jnp.where((qp.u - qp.l) < 1e-10, 100.0, 0.1)
    K = (qps.A.T * rho[None, :]) @ qps.A + jnp.diag(qps.P_diag + 1e-6)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, False)
    slots_np = np.asarray(slots)
    K_np = np.asarray(K)
    K_ext = np.zeros((n + 1, n + 1))
    K_ext[:n, :n] = K_np
    for t1 in range(nb):
        for t2 in range(nb):
            if abs(t1 - t2) >= 2:
                blk = K_ext[np.ix_(slots_np[t1], slots_np[t2])]
                assert np.abs(blk).max() < 1e-9, (t1, t2, np.abs(blk).max())


@pytest.mark.parametrize("hz", [HorizonParams(N_short=2, N_long=3),
                                HorizonParams(N_short=5, N_long=10)])
def test_banded_inverse_matches_dense(hz):
    cfg, qp = _real_qp(hz)
    qps, D, E, c = admm._ruiz(qp, 10)
    rho = jnp.where((qp.u - qp.l) < 1e-10, 100.0, 0.1).astype(qps.q.dtype)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, False)
    Kinv_b = banded.factor_inv_banded(qps.P_diag, qps.A, rho, 1e-6,
                                      slots, n, bw, nb)
    K = (qps.A.T * rho[None, :]) @ qps.A + jnp.diag(qps.P_diag + 1e-6)
    Kinv_d = jnp.linalg.inv(K)
    err = np.abs(np.asarray(Kinv_b - Kinv_d)).max()
    scale = np.abs(np.asarray(Kinv_d)).max()
    assert err < 1e-8 * max(1.0, scale), (err, scale)


def test_banded_end_to_end_solver_matches_chol():
    hz = HorizonParams(N_short=5, N_long=10)
    cfg, qp = _real_qp(hz)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, False)
    opts_c = SolverOptions(max_iter=600, eps_abs=1e-6, eps_rel=1e-6)
    opts_b = dataclasses.replace(opts_c, factor_method="banded")
    sol_c = solve_qp(qp, opts=opts_c)
    sol_b = solve_qp(qp, opts=opts_b, banded_plan=(slots, n, bw, nb))
    assert bool(sol_b.converged)
    np.testing.assert_allclose(np.asarray(sol_b.x), np.asarray(sol_c.x),
                               atol=1e-5)


def test_banded_closed_loop():
    """Closed loop with the banded factorization tracks identically."""
    cfg = M.x1_coupled_config()
    cfg = dataclasses.replace(cfg, solver=SolverOptions(
        factor_method="banded"))
    tube = trj.straight_trajectory(100.0, 8.0, pad_to=32)
    from pigeon_tpu import hji as H
    q0 = jnp.array([0.8, 0.0, 0.03, 8.0, 0.0, 0.0])
    log = jax.jit(lambda q: M.simulate(cfg, tube, H.inactive_cache(), q,
                                       dt=0.01, n_steps=150))(q0)
    e = np.asarray(log.diag.e)
    assert abs(e[-1]) < 0.25
    assert np.all(np.isfinite(np.asarray(log.u)))


def test_banded_with_walls_plan():
    """The stage plan covers the wall-slack variables too."""
    hz = HorizonParams(N_short=2, N_long=3)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, True)
    from pigeon_tpu.qp import coupled as qc
    L = qc.get_layout(hz, True)
    covered = set(np.asarray(slots).reshape(-1).tolist()) - {n}
    assert covered == set(range(L.n))
