"""Log-N horizon-parallel KKT factorization (block cyclic reduction):
exactness against dense solves and end-to-end solver agreement.

This is the SURVEY §5 long-context obligation on the KKT axis: the
sequential O(nb) Cholesky stage scan replaced by ceil(log2 nb) levels of
batched block elimination (`solve_block_tridiag_cr`), selected with
SolverOptions(factor_method="banded_cr").
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import HorizonParams, SolverOptions
from pigeon_tpu.qp import coupled as QC
from pigeon_tpu.solver import admm, banded
from pigeon_tpu.solver.admm import solve_qp


def _random_spd_block_tridiag(nb, bw, k, seed=0):
    """Diagonally-dominant symmetric block-tridiagonal system (=> SPD)."""
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(nb, bw, bw)) * 0.3
    L[0] = 0.0
    Dsym = rng.normal(size=(nb, bw, bw))
    Dsym = (Dsym + np.swapaxes(Dsym, -1, -2)) / 2
    D = Dsym + (2.0 * bw) * np.eye(bw)[None]
    F = rng.normal(size=(nb, bw, k))
    return jnp.asarray(D), jnp.asarray(L), jnp.asarray(F)


def _dense(D, L):
    nb, bw = D.shape[0], D.shape[-1]
    K = np.zeros((nb * bw, nb * bw))
    for t in range(nb):
        K[t * bw:(t + 1) * bw, t * bw:(t + 1) * bw] = np.asarray(D[t])
        if t > 0:
            blk = np.asarray(L[t])
            K[t * bw:(t + 1) * bw, (t - 1) * bw:t * bw] = blk
            K[(t - 1) * bw:t * bw, t * bw:(t + 1) * bw] = blk.T
    return K


@pytest.mark.parametrize("nb", [1, 2, 3, 7, 16, 31, 40])
def test_cr_solve_matches_dense(nb):
    bw, k = 5, 7
    D, L, F = _random_spd_block_tridiag(nb, bw, k, seed=nb)
    x = banded.solve_block_tridiag_cr(D, L, F)
    K = _dense(D, L)
    x_ref = np.linalg.solve(K, np.asarray(F).reshape(nb * bw, k))
    np.testing.assert_allclose(np.asarray(x).reshape(nb * bw, k), x_ref,
                               atol=1e-4, rtol=1e-4)


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
def test_cr_inverse_matches_dense(hz):
    cfg, qp = _real_qp(hz)
    qps, D, E, c = admm._ruiz(qp, 10)
    rho = jnp.where((qp.u - qp.l) < 1e-10, 100.0, 0.1).astype(qps.q.dtype)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, False)
    Kinv_cr = banded.factor_inv_banded(qps.P_diag, qps.A, rho, 1e-6,
                                       slots, n, bw, nb, method="cr")
    K = (qps.A.T * rho[None, :]) @ qps.A + jnp.diag(qps.P_diag + 1e-6)
    Kinv_d = jnp.linalg.inv(K)
    err = np.abs(np.asarray(Kinv_cr - Kinv_d)).max()
    scale = np.abs(np.asarray(Kinv_d)).max()
    assert err < 1e-6 * max(1.0, scale), (err, scale)


def test_cr_end_to_end_solver_matches_chol():
    hz = HorizonParams(N_short=5, N_long=10)
    cfg, qp = _real_qp(hz)
    slots, n, bw, nb = banded.coupled_stage_plan(hz, False)
    opts_c = SolverOptions(max_iter=600, eps_abs=1e-6, eps_rel=1e-6)
    opts_cr = dataclasses.replace(opts_c, factor_method="banded_cr")
    sol_c = solve_qp(qp, opts=opts_c)
    sol_cr = solve_qp(qp, opts=opts_cr, banded_plan=(slots, n, bw, nb))
    assert bool(sol_cr.converged)
    np.testing.assert_allclose(np.asarray(sol_cr.x), np.asarray(sol_c.x),
                               atol=1e-5)
