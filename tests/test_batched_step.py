"""mpc_step_batched: the batch-level cold/warm branch must be bitwise
consistent with the per-element auto path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj


def _setup(B=3):
    from pigeon_tpu.config import HorizonParams
    cfg = M.x1_coupled_config(hz=HorizonParams(N_short=2, N_long=3))
    tube = trj.straight_trajectory(60.0, 5.0, pad_to=32)
    cache = H.inactive_cache()
    carry = M.init_carry(cfg, dtype=jnp.float64)
    carry_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           carry)
    q0 = jnp.stack([jnp.asarray([0.2 * i, 0.0, 0.01, 5.0, 0.0, 0.0])
                    for i in range(B)])
    u0 = jnp.zeros((B, 3))
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0]), (B, 4))
    ts = jnp.zeros(B)
    return cfg, tube, cache, carry_b, q0, u0, oc, ts


def test_batched_step_matches_vmap_cold_and_warm():
    cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup()
    vstep = jax.vmap(lambda c, q, u, o, t: M.mpc_step(
        cfg, tube, cache, c, q, u, o, t))

    # cold step: any_cold is True -> batched takes the auto branch
    cb1, u1, d1 = M.mpc_step_batched(cfg, tube, cache, carry_b, q0, u0,
                                     oc, ts)
    cb1r, u1r, d1r = vstep(carry_b, q0, u0, oc, ts)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u1r), atol=1e-12)

    # warm step: every carry solved -> batched takes warm_only; outputs
    # must match the per-element auto path (which selects warm anyway)
    assert bool(jnp.all(cb1.solved))
    cb2, u2, d2 = M.mpc_step_batched(cfg, tube, cache, cb1, q0, u0, oc,
                                     ts + 0.01)
    cb2r, u2r, d2r = vstep(cb1r, q0, u0, oc, ts + 0.01)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u2r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(cb2.q_prev),
                               np.asarray(cb2r.q_prev), atol=1e-8)
    assert np.all(np.isfinite(np.asarray(u2)))


def test_batched_step_mixed_solved_uses_auto():
    """One cold element in an otherwise warm fleet must still get correct
    cold-seeded nodes (the auto branch)."""
    cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup()
    cb1, _, _ = M.mpc_step_batched(cfg, tube, cache, carry_b, q0, u0, oc, ts)
    # invalidate element 1's warm state
    solved = cb1.solved.at[1].set(False)
    cb_mixed = cb1._replace(solved=solved)
    cb2, u2, d2 = M.mpc_step_batched(cfg, tube, cache, cb_mixed, q0, u0,
                                     oc, ts + 0.01)
    vstep = jax.vmap(lambda c, q, u, o, t: M.mpc_step(
        cfg, tube, cache, c, q, u, o, t))
    cb2r, u2r, _ = vstep(cb_mixed, q0, u0, oc, ts + 0.01)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u2r), atol=1e-12)


@pytest.mark.parametrize("precision", ["highest", "mixedk6"])
def test_batched_step_pallas_stats_truthful(precision):
    """The natively-batched pallas solver path (interpret mode on CPU)
    computes its residuals IN KERNEL from the VMEM-resident iterates
    (solver/pallas_admm.py stats output); a bug in the stats unscaling
    would silently corrupt the convergence control.  Guard: the reported
    prim/dual residuals must equal residuals recomputed independently
    from the returned solution, and `converged` must imply they satisfy
    the OSQP tolerance.  Covers the mixed-precision row-split mode
    (equality rows permuted to the front; solver/pallas_admm._kernel)."""
    import dataclasses

    from pigeon_tpu.solver.admm import cold_start, solve_qp_batched

    cfg, tube, cache, carry_b, q0, u0, oc, ts = _setup()
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "auto"))(carry_b, q0, u0,
                                                       oc, ts)
    opts = dataclasses.replace(cfg.solver, backend="pallas",
                               pallas_tile=2,
                               pallas_precision=precision)
    sol = solve_qp_batched(qp, jax.vmap(cold_start)(qp), opts,
                           M._banded_plan_for(cfg),
                           eq_rows=M._eq_rows_for(cfg))
    x, z, y = np.asarray(sol.x), np.asarray(sol.z), np.asarray(sol.y)
    A, P, qv = np.asarray(qp.A), np.asarray(qp.P_diag), np.asarray(qp.q)
    # mixed modes compute the inequality-tile stats matvecs at bf16x3
    # (~2e-5 absolute noise floor — far below the >=1e-3 termination
    # thresholds); "highest" stats are exact to fp32 roundoff
    atol = 1e-7 if precision == "highest" else 5e-5
    for b in range(x.shape[0]):
        Ax = A[b] @ x[b]
        Aty = A[b].T @ y[b]
        Px = P[b] * x[b]
        rp = np.max(np.abs(Ax - z[b]))
        rd = np.max(np.abs(Px + qv[b] + Aty))
        np.testing.assert_allclose(float(sol.prim_res[b]), rp,
                                   rtol=1e-2, atol=atol)
        np.testing.assert_allclose(float(sol.dual_res[b]), rd,
                                   rtol=1e-2, atol=atol)
        if bool(np.asarray(sol.converged)[b]):
            eps_p = opts.eps_abs + opts.eps_rel * max(
                np.abs(Ax).max(), np.abs(z[b]).max())
            eps_d = opts.eps_abs + opts.eps_rel * max(
                np.abs(Px).max(), np.abs(Aty).max(), np.abs(qv[b]).max())
            assert rp <= eps_p * 1.01 and rd <= eps_d * 1.01
