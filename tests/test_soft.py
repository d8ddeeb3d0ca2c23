"""Soft condensed formulation (qp/condensed.py SoftQP) + lane backend
(solver/lane_admm.py).

The soft QP must be solution-equivalent to the slack condensed QP (exact
L1 penalties replace slack variables; pins substituted), and the
lane-batched solver must agree with the XLA reference path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import HorizonParams, SolverOptions
from pigeon_tpu.solver.admm import (QPData, QPWarmStart, cold_start,
                                    solve_qp, solve_qp_batched)


def _setup(B=3, **cfg_kw):
    cfg = M.x1_coupled_config(hz=HorizonParams(N_short=2, N_long=3),
                              **cfg_kw)
    tube = trj.straight_trajectory(60.0, 5.0, pad_to=32)
    cache = H.inactive_cache()
    carry = M.init_carry(cfg, dtype=jnp.float64)
    carry_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           carry)
    q0 = jnp.stack([jnp.asarray([0.2 * i, 0.3 * i, 0.01, 5.0, 0.05, 0.0])
                    for i in range(B)])
    u0 = jnp.zeros((B, 3))
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0]), (B, 4))
    ts = jnp.zeros(B)
    return cfg, tube, cache, carry_b, q0, u0, oc, ts


def test_soft_matches_condensed_controls():
    """Cold + warm steps of the soft formulation reproduce the slack
    condensed formulation's commands (same QP modulo exact-penalty
    elimination) within solver tolerance."""
    outs = {}
    for name, kw in (("slack", dict(condensed=True)),
                     ("soft", dict(soft=True))):
        cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup(**kw)
        cfg = dataclasses.replace(cfg, solver=SolverOptions(
            max_iter=4000, check_every=100, eps_abs=1e-6, eps_rel=1e-6,
            backend="xla", scaling_iters=4))
        cb1, u1, d1 = M.mpc_step_batched(cfg, tube, cache, carry_b, q0,
                                         u0, oc, ts)
        cb2, u2, d2 = M.mpc_step_batched(cfg, tube, cache, cb1, q0, u1,
                                         oc, ts + 0.01)
        assert np.all(np.asarray(d2.converged)), name
        outs[name] = (np.asarray(u1), np.asarray(u2))
    for i in range(2):
        # delta in rad, Fx in N: tolerance scaled per component
        d = np.abs(outs["slack"][i] - outs["soft"][i])
        assert d[:, 0].max() < 2e-4, (i, d)
        assert d[:, 1:].max() < 2.0, (i, d)


def test_soft_prox_equals_slack_qp():
    """On a random QP, a soft row (exact penalty via the z-update prox)
    must reproduce the solution of the explicit slack-variable
    formulation: min 1/2 x'Px + q'x + W s, s >= 0, a'x <= u + s."""
    rng = np.random.default_rng(3)
    n, m = 6, 5
    L_ = rng.normal(size=(n, n))
    P = L_ @ L_.T + n * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_unc = np.linalg.solve(P, -q)
    # hard rows loose; the soft row cut 1.0 below the unconstrained
    # optimum with a small W, so the optimum PAYS the penalty (violates)
    u = A @ x_unc + 0.5
    u[m - 1] = A[m - 1] @ x_unc - 1.0
    lo = np.full(m, -np.inf)
    W = 0.5

    opts = SolverOptions(max_iter=20000, check_every=200, eps_abs=1e-9,
                         eps_rel=1e-9, backend="xla", scaling_iters=4)

    # soft: last row gets the penalty
    w = jnp.asarray(np.concatenate([np.full(m - 1, np.inf), [W]]))
    qp_soft = QPData(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                     jnp.asarray(lo), jnp.asarray(u))
    sol_soft = solve_qp(qp_soft, None, opts, w_soft=w)
    assert bool(sol_soft.converged)

    # slack: extra variable s, rows [a'x - s <= u, s >= 0], cost W s
    P2 = np.zeros((n + 1, n + 1)); P2[:n, :n] = P
    q2 = np.concatenate([q, [W]])
    A2 = np.zeros((m + 1, n + 1))
    A2[:m, :n] = A
    A2[m - 1, n] = -1.0
    A2[m, n] = 1.0
    lo2 = np.concatenate([lo, [0.0]])
    u2 = np.concatenate([u, [np.inf]])
    qp_slack = QPData(jnp.asarray(P2), jnp.asarray(q2), jnp.asarray(A2),
                      jnp.asarray(lo2), jnp.asarray(u2))
    sol_slack = solve_qp(qp_slack, None, opts)
    assert bool(sol_slack.converged)

    np.testing.assert_allclose(np.asarray(sol_soft.x),
                               np.asarray(sol_slack.x)[:n],
                               rtol=1e-5, atol=1e-6)
    # the soft row must actually be active (exercise the shrink branch)
    viol = A[m - 1] @ np.asarray(sol_soft.x) - u[m - 1]
    assert viol > 1e-6, "test problem should violate the soft row"


def test_lane_backend_matches_xla():
    """Full batched MPC step on the lanes backend (interpret mode on CPU)
    agrees with the XLA backend within solver tolerance, and its
    convergence claims are truthful against independently recomputed
    residuals."""
    outs = {}
    for backend in ("xla", "lanes"):
        cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup(soft=True)
        cfg = dataclasses.replace(cfg, solver=SolverOptions(
            max_iter=2000, check_every=100, eps_abs=1e-6, eps_rel=1e-6,
            backend=backend, scaling_iters=2, pallas_check_inner=25))
        cb1, u1, d1 = M.mpc_step_batched(cfg, tube, cache, carry_b, q0,
                                         u0, oc, ts)
        cb2, u2, d2 = M.mpc_step_batched(cfg, tube, cache, cb1, q0, u1,
                                         oc, ts + 0.01)
        assert np.all(np.asarray(d2.converged)), backend
        outs[backend] = (np.asarray(u1), np.asarray(u2))
    for i in range(2):
        d = np.abs(outs["xla"][i] - outs["lanes"][i])
        assert d[:, 0].max() < 2e-4, (i, d)
        assert d[:, 1:].max() < 2.0, (i, d)


def test_lane_solver_stats_truthful():
    """Lane-kernel residual stats (computed in kernel, unscaled) must match
    residuals recomputed from the returned solution."""
    cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup(soft=True)
    opts = SolverOptions(max_iter=300, check_every=300, eps_abs=1e-5,
                         eps_rel=1e-5, backend="lanes", scaling_iters=2,
                         pallas_check_inner=0)
    cfg = dataclasses.replace(cfg, solver=opts)
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "auto"))(carry_b, q0, u0,
                                                       oc, ts)
    sol = solve_qp_batched(qp, jax.vmap(cold_start)(qp), opts,
                           w_soft=aux.w)
    x, z, y = np.asarray(sol.x), np.asarray(sol.z), np.asarray(sol.y)
    A, P, qv = np.asarray(qp.A), np.asarray(qp.P_diag), np.asarray(qp.q)
    for b in range(x.shape[0]):
        r_prim = np.max(np.abs(A[b] @ x[b] - z[b]))
        r_dual = np.max(np.abs(P[b] @ x[b] + qv[b] + A[b].T @ y[b]))
        np.testing.assert_allclose(float(sol.prim_res[b]), r_prim,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(float(sol.dual_res[b]), r_dual,
                                   rtol=1e-4, atol=1e-6)


def test_lane_chol_inverse():
    """Per-lane Cholesky inverse kernel vs numpy inverse on random SPD
    matrices, including lane and row padding."""
    from pigeon_tpu.solver.lane_admm import chol_inverse_lanes
    rng = np.random.default_rng(0)
    B, n, n_pad = 5, 7, 8
    Ks = []
    for _ in range(B):
        Q = rng.normal(size=(n, n))
        Ks.append(Q @ Q.T + n * np.eye(n))
    K = np.stack(Ks)
    K_l = np.zeros((n_pad, n_pad, 128), np.float32)
    K_l[:n, :n, :B] = np.moveaxis(K, 0, -1)
    for j in range(n, n_pad):
        K_l[j, j, :] = 1.0
    for b in range(B, 128):
        K_l[:, :, b] = np.eye(n_pad)
    out = chol_inverse_lanes(jnp.asarray(K_l), n, polish=1,
                             interpret=True)
    out = np.asarray(out)
    for b in range(B):
        np.testing.assert_allclose(out[:n, :n, b], np.linalg.inv(K[b]),
                                   rtol=2e-4, atol=2e-5)
    # padded lanes stay identity
    np.testing.assert_allclose(out[:, :, B + 1], np.eye(n_pad), atol=1e-6)


def test_rollout_affine_scan_matches_unroll():
    """The log-N associative-scan rollout (long-horizon path,
    SURVEY §5) computes the same cumulative affine recursion as the
    sequential unroll used at reference-scale horizons — including a
    T >= ROLLOUT_SCAN_MIN_T case where `rollout_affine` dispatches to
    the scan."""
    from pigeon_tpu.qp import condensed as C
    rng = np.random.default_rng(3)
    for T in (2, 15, C.ROLLOUT_SCAN_MIN_T):
        # contractive-ish A keeps the product well-conditioned
        A = jnp.asarray(rng.normal(size=(T, 6, 6)) * 0.4)
        E = jnp.asarray(rng.normal(size=(T, 6, 31)))
        M_seq = C.rollout_affine_unroll(A, E)
        M_scan = C.rollout_affine_scan(A, E)
        np.testing.assert_allclose(np.asarray(M_scan), np.asarray(M_seq),
                                   rtol=5e-6, atol=5e-7)
        M_dispatch = C.rollout_affine(A, E)
        ref = M_scan if T >= C.ROLLOUT_SCAN_MIN_T else M_seq
        np.testing.assert_allclose(np.asarray(M_dispatch),
                                   np.asarray(ref), rtol=0, atol=0)
