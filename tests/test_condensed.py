"""Condensed coupled QP (qp/condensed.py): equivalence with the sparse
formulation, closed-loop behavior, and the dense-P batched solver path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.qp import condensed as qd
from pigeon_tpu.qp import coupled as qc
from pigeon_tpu.solver.admm import cold_start, solve_qp, solve_qp_batched


def _setup():
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    q0 = jnp.asarray(
        [float(tube.E[3]), float(tube.N[3]) + 0.3, float(tube.psi[3]),
         6.0, 0.0, 0.0])
    u0 = jnp.zeros(3)
    oc = jnp.asarray([1e4, 1e4, 0, 0])
    t = jnp.asarray(float(tube.t[3]))
    return tube, cache, q0, u0, oc, t


def test_condensed_equivalent_to_sparse():
    """The condensed QP is the sparse QP with the dynamics equalities
    eliminated: on the sparse solution, the rollout reproduces the state
    trajectory, the condensed constraints hold, and the objectives agree
    up to the dropped constant g'Qg."""
    tube, cache, q0, u0, oc, t = _setup()
    cfg_s = M.x1_coupled_config()
    cfg_c = M.x1_coupled_config(condensed=True)
    qp_s, _, _ = M._pre_solve(cfg_s, tube, cache, M.init_carry(cfg_s),
                              q0, u0, oc, t, "auto")
    qp_c, _, aux_c = M._pre_solve(cfg_c, tube, cache, M.init_carry(cfg_c),
                                  q0, u0, oc, t, "auto")
    Ls = qc.get_layout(cfg_s.hz, False)
    Lc = qd.get_layout(cfg_c.hz, False)
    assert qp_c.P_diag.ndim == 2 and Lc.n < Ls.n

    opts = dataclasses.replace(
        cfg_s.solver, max_iter=3000, check_every=200, eps_abs=1e-6,
        eps_rel=1e-6, backend="xla", factor_method="chol",
        pallas_check_inner=0)
    sol = solve_qp(qp_s, cold_start(qp_s), opts)
    xs = np.asarray(sol.x, np.float64)

    xc = np.zeros(Lc.n)
    xc[Lc.q0] = xs[Ls.q[0]]
    xc[np.asarray(Lc.u).ravel()] = xs[np.asarray(Ls.u).ravel()]
    xc[np.asarray(Lc.sig).ravel()] = xs[np.asarray(Ls.sig).ravel()]
    xc[np.asarray(Lc.sHJI)] = xs[np.asarray(Ls.sHJI)]
    xc[np.asarray(Lc.dd)] = xs[np.asarray(Ls.dd)]
    xc[np.asarray(Lc.dF)] = xs[np.asarray(Ls.dF)]

    G = np.asarray(aux_c.G, np.float64)
    g = np.asarray(aux_c.g, np.float64)
    q_roll = G @ xc[np.asarray(Lc.gcols)] + g
    q_sparse = xs[np.asarray(Ls.q)][1:]
    np.testing.assert_allclose(q_roll, q_sparse, atol=5e-3)

    Ac = np.asarray(qp_c.A, np.float64)
    lc = np.asarray(qp_c.l, np.float64)
    uc = np.asarray(qp_c.u, np.float64)
    viol = np.maximum(lc - Ac @ xc, Ac @ xc - uc)
    assert viol.max() < 5e-3

    ctl = cfg_s.coupled
    _, dt = M.compute_time_steps(cfg_s.hz, t)
    dtv = np.asarray(dt, np.float64)
    Qs = np.array([ctl.Q_ds, ctl.Q_dpsi, ctl.Q_e])
    gsel = g[:, [0, 4, 5]]
    const = float(np.einsum("tk,k,t->", gsel ** 2, Qs, dtv))
    Ps = np.asarray(qp_s.P_diag, np.float64)
    Pc = np.asarray(qp_c.P_diag, np.float64)
    obj_s = 0.5 * xs @ (Ps * xs) + np.asarray(qp_s.q, np.float64) @ xs
    obj_c = (0.5 * xc @ (Pc @ xc)
             + np.asarray(qp_c.q, np.float64) @ xc + const)
    np.testing.assert_allclose(obj_s, obj_c, rtol=1e-2, atol=1e-3)


def test_condensed_closed_loop():
    """Condensed closed loop tracks like the sparse formulation."""
    tube, cache, _, _, _, _ = _setup()
    q0 = jnp.asarray(
        [float(tube.E[0]), float(tube.N[0]), float(tube.psi[0]),
         float(tube.V[0]), 0.0, 0.0])
    cfg = M.x1_coupled_config(condensed=True)
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, factor_method="chol"))
    logs = M.simulate(cfg, tube, cache, q0, n_steps=150)
    e = np.asarray(logs.diag.e)
    u = np.asarray(logs.u)
    assert np.abs(e).max() < 0.01
    assert np.all(np.isfinite(u))
    assert float(np.asarray(logs.diag.converged).mean()) > 0.95


def test_condensed_pallas_batched_stats_truthful():
    """The dense-P pallas path (interpret mode) reports truthful
    residuals (the kernel's Px term is a matvec for dense P)."""
    tube, cache, q0, u0, oc, t = _setup()
    cfg = M.x1_coupled_config(condensed=True)
    B = 3
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                      M.init_carry(cfg))
    q0s = jnp.broadcast_to(q0, (B, 6)) + jnp.linspace(
        0, 0.2, B)[:, None] * jnp.asarray([0, 1, 0, 0, 0, 0.])
    u0s = jnp.zeros((B, 3))
    ocs = jnp.broadcast_to(oc, (B, 4))
    ts = jnp.full((B,), float(t))
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, tt: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                            tt, "auto"))(cb, q0s, u0s,
                                                         ocs, ts)
    opts = dataclasses.replace(cfg.solver, backend="pallas",
                               pallas_tile=2, factor_method="ns",
                               pallas_precision="mixedk6",
                               pallas_check_inner=10,
                               max_iter=150, check_every=150)
    sol = solve_qp_batched(qp, jax.vmap(cold_start)(qp), opts,
                           None, eq_rows=M._eq_rows_for(cfg))
    x, z, y = np.asarray(sol.x), np.asarray(sol.z), np.asarray(sol.y)
    A, P, qv = np.asarray(qp.A), np.asarray(qp.P_diag), np.asarray(qp.q)
    for b in range(B):
        Ax = A[b] @ x[b]
        rp = np.max(np.abs(Ax - z[b]))
        rd = np.max(np.abs(P[b] @ x[b] + qv[b] + A[b].T @ y[b]))
        # kernel stats are fp32; the fp64 recompute of the fp32 iterate
        # differs at the 1e-4 level (termination thresholds are >= 1e-3)
        np.testing.assert_allclose(float(sol.prim_res[b]), rp,
                                   rtol=1e-2, atol=2e-4)
        np.testing.assert_allclose(float(sol.dual_res[b]), rd,
                                   rtol=1e-2, atol=2e-4)


def test_condensed_walls_closed_loop():
    """Condensed formulation with wall/edge soft bounds enabled (the
    reference both_walls configuration): builds, solves, tracks."""
    from pigeon_tpu.config import CoupledControlParams

    tube, cache, _, _, _, _ = _setup()
    q0 = jnp.asarray(
        [float(tube.E[0]), float(tube.N[0]), float(tube.psi[0]),
         float(tube.V[0]), 0.0, 0.0])
    cfg = M.x1_coupled_config(
        condensed=True, coupled=CoupledControlParams(use_walls=True))
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, factor_method="chol"))
    logs = M.simulate(cfg, tube, cache, q0, n_steps=80)
    e = np.asarray(logs.diag.e)
    assert np.abs(e).max() < 0.05
    assert np.all(np.isfinite(np.asarray(logs.u)))
