"""Solver tests: KKT optimality of the batched ADMM against direct
optimality conditions and scipy reference solves (SURVEY.md §4 "solver
tests (ADMM vs a dense reference QP solve, KKT residuals)")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from pigeon_tpu.config import SolverOptions
from pigeon_tpu.solver.admm import (QPData, QPWarmStart, cold_start,
                                    solve_qp)


def random_qp(rng, n=20, m=35, n_eq=5):
    """Random feasible QP with diagonal PSD cost."""
    P = rng.uniform(0.1, 10.0, n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x_feas = rng.standard_normal(n)
    Ax = A @ x_feas
    lo = Ax - rng.uniform(0.0, 2.0, m)
    hi = Ax + rng.uniform(0.0, 2.0, m)
    # first n_eq rows become equalities
    lo[:n_eq] = Ax[:n_eq]
    hi[:n_eq] = Ax[:n_eq]
    return QPData(P_diag=jnp.asarray(P), q=jnp.asarray(q), A=jnp.asarray(A),
                  l=jnp.asarray(lo), u=jnp.asarray(hi))


def kkt_check(qp, sol, tol=5e-3):
    """Direct optimality check: stationarity, feasibility, complementarity."""
    x = np.asarray(sol.x)
    y = np.asarray(sol.y)
    P = np.asarray(qp.P_diag)
    A = np.asarray(qp.A)
    lo = np.asarray(qp.l)
    hi = np.asarray(qp.u)
    scale = max(1.0, np.abs(P * x).max(), np.abs(np.asarray(qp.q)).max(),
                np.abs(A.T @ y).max())
    stat = np.abs(P * x + np.asarray(qp.q) + A.T @ y).max() / scale
    Ax = A @ x
    feas = max(np.maximum(lo - Ax, 0.0).max(), np.maximum(Ax - hi, 0.0).max())
    # complementarity: y>0 only near upper bound, y<0 only near lower
    comp_u = np.abs(np.maximum(y, 0) * (hi - Ax)).max()
    comp_l = np.abs(np.minimum(y, 0) * (Ax - lo)).max()
    assert stat < tol, f"stationarity {stat}"
    assert feas < tol, f"feasibility {feas}"
    assert comp_u < 10 * tol and comp_l < 10 * tol, (comp_u, comp_l)


def scipy_solve(qp):
    P = np.asarray(qp.P_diag)
    q = np.asarray(qp.q)
    A = np.asarray(qp.A)
    lo = np.asarray(qp.l)
    hi = np.asarray(qp.u)
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ (P * x) + q @ x,
        np.zeros_like(q),
        jac=lambda x: P * x + q,
        constraints=[
            scipy.optimize.LinearConstraint(A, lo, hi),
        ],
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-12})
    assert res.success, res.message
    return res.x, res.fun


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_admm_kkt_random(seed):
    rng = np.random.default_rng(seed)
    qp = random_qp(rng)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=2000, eps_abs=1e-6,
                                          eps_rel=1e-6))
    assert bool(sol.converged)
    kkt_check(qp, sol, tol=1e-4)


@pytest.mark.parametrize("seed", [0, 5])
def test_admm_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    qp = random_qp(rng, n=12, m=20, n_eq=3)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=4000, eps_abs=1e-8,
                                          eps_rel=1e-8))
    x_ref, f_ref = scipy_solve(qp)
    P = np.asarray(qp.P_diag)
    q = np.asarray(qp.q)
    x = np.asarray(sol.x)
    f = 0.5 * x @ (P * x) + q @ x
    assert f <= f_ref + 1e-5 * (1 + abs(f_ref))
    np.testing.assert_allclose(x, x_ref, atol=5e-4)


def test_admm_equality_rows_tight():
    """Equality rows must be satisfied to solver tolerance."""
    rng = np.random.default_rng(7)
    qp = random_qp(rng, n=15, m=25, n_eq=8)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=2000, eps_abs=1e-7,
                                          eps_rel=1e-7))
    Ax = np.asarray(qp.A) @ np.asarray(sol.x)
    eq_err = np.abs(Ax[:8] - np.asarray(qp.l)[:8]).max()
    assert eq_err < 1e-5, eq_err


def test_admm_warm_start_fewer_iters():
    rng = np.random.default_rng(3)
    qp = random_qp(rng)
    opts = SolverOptions(max_iter=2000, eps_abs=1e-6, eps_rel=1e-6)
    sol1 = solve_qp(qp, opts=opts)
    # perturb q slightly -> warm start should converge much faster
    qp2 = qp._replace(q=qp.q + 1e-3)
    warm = QPWarmStart(x=sol1.x, y=sol1.y, z=sol1.z)
    sol_cold = solve_qp(qp2, opts=opts)
    sol_warm = solve_qp(qp2, warm=warm, opts=opts)
    assert bool(sol_warm.converged)
    assert int(sol_warm.iterations) <= int(sol_cold.iterations)
    kkt_check(qp2, sol_warm, tol=1e-4)


def test_admm_batched_vmap():
    rng = np.random.default_rng(11)
    qps = [random_qp(rng) for _ in range(6)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qps)
    opts = SolverOptions(max_iter=2000, eps_abs=1e-6, eps_rel=1e-6)
    sols = jax.vmap(lambda qp: solve_qp(qp, opts=opts))(batch)
    for i in range(6):
        sol_i = jax.tree.map(lambda x: x[i], sols)
        kkt_check(qps[i], sol_i, tol=1e-4)
        single = solve_qp(qps[i], opts=opts)
        np.testing.assert_allclose(np.asarray(sol_i.x), np.asarray(single.x),
                                   atol=1e-3)


def test_admm_infeasible_start_bounds_only():
    """Pure box-constrained QP: solution is the clipped unconstrained
    minimizer."""
    n = 8
    P = jnp.ones(n) * 2.0
    q = jnp.arange(-4.0, 4.0)
    A = jnp.eye(n)
    lo = -jnp.ones(n) * 0.5
    hi = jnp.ones(n) * 0.5
    qp = QPData(P, q, A, lo, hi)
    sol = solve_qp(qp, opts=SolverOptions(max_iter=1000, eps_abs=1e-8,
                                          eps_rel=1e-8))
    expect = np.clip(-np.asarray(q) / 2.0, -0.5, 0.5)
    np.testing.assert_allclose(np.asarray(sol.x), expect, atol=1e-6)


def test_admm_jit_compiles_once():
    rng = np.random.default_rng(2)
    qp = random_qp(rng)
    f = jax.jit(lambda qp: solve_qp(qp, opts=SolverOptions(max_iter=500)))
    sol = f(qp)
    assert np.all(np.isfinite(np.asarray(sol.x)))


def test_ruiz_zero_rows_stay_unscaled():
    """An all-zero constraint row (e.g. an inactive HJI half-plane) must
    not blow up the Ruiz row scaling: the eps-floored update would grow
    its E by 1e6 per sweep and overflow fp32 to inf within ~7 sweeps,
    NaN-poisoning the scaled bounds (l*E with inf*0 rows) and with them
    the whole solve.  Regression for the soft formulation's default
    SolverOptions (scaling_iters=10) divergence."""
    from pigeon_tpu.solver.admm import _ruiz
    rng = np.random.default_rng(0)
    n, m = 6, 9
    A = rng.normal(size=(m, n)).astype(np.float32)
    A[3, :] = 0.0                       # inactive half-plane row
    A[7, :] = 0.0
    P = np.abs(rng.normal(size=n)).astype(np.float32) + 0.5
    q = rng.normal(size=n).astype(np.float32)
    l = np.full(m, -1.0, np.float32)
    u = np.full(m, 1.0, np.float32)
    qp = QPData(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                jnp.asarray(l), jnp.asarray(u))
    for iters in (2, 10, 30):
        qps, D, E, c = _ruiz(qp, iters)
        assert np.all(np.isfinite(np.asarray(E))), iters
        assert np.all(np.isfinite(np.asarray(D)))
        assert np.isfinite(float(c))
        np.testing.assert_allclose(np.asarray(E)[[3, 7]], 1.0)
        for arr in qps:
            assert np.all(np.isfinite(np.asarray(arr)))
        # live rows still equilibrated: scaled row norms ~ 1
        rn = np.abs(np.asarray(qps.A)).max(axis=1)
        live = [i for i in range(m) if i not in (3, 7)]
        np.testing.assert_allclose(rn[live], 1.0, rtol=0.35)
