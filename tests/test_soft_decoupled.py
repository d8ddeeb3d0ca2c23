"""Soft condensed DECOUPLED formulation (qp/decoupled.py build_qp_soft).

The TPU-native form of the reference's DEFAULT controller (X1DMPC,
`src/Pigeon.jl:34`): states/pins/slacks/slew eliminated -> n = N-1 = 30
steering variables, m = 6T rows, zero equality rows, lane-backend
compatible.  Must be solution-equivalent to the sparse decoupled QP
(`qp/decoupled.py build_qp`), whose closed loop is itself pinned against
the reference algorithm by the parity harness (tests/test_parity.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import HorizonParams, SolverOptions

from tests.conftest import REFERENCE_PATHS


def _run(cfg, tube, q0, t0, n_steps=40):
    import pigeon_tpu.discretize as dz
    import pigeon_tpu.dynamics as dyn

    cache = H.inactive_cache()
    oc = jnp.asarray([1e4, 1e4, 0.0, 0.0])

    def body(state, i):
        q, u, carry = state
        t = t0 + i * 0.01
        carry, u_next, diag = M.mpc_step(cfg, tube, cache, carry, q, u,
                                         oc, t)
        u2 = jnp.stack([u[0], u[1] + u[2]])

        def f(q_, ur):
            return dyn.vehicle_ode(cfg.veh, "bicycle", q_, ur[:2], ur[2:])
        qn = dz.propagate(f, q, jnp.concatenate([u2, jnp.zeros(4)]), 0.01)
        return (qn, u_next, carry), (u_next, diag.converged, diag.e)

    carry0 = M.init_carry(cfg, dtype=jnp.float64)
    (_, _, _), (us, conv, es) = jax.lax.scan(
        body, (q0, jnp.zeros(3), carry0), jnp.arange(n_steps))
    return np.asarray(us), np.asarray(conv), np.asarray(es)


def _start(tube, k0=150):
    q0 = jnp.asarray([float(tube.E[k0]) + 0.4, float(tube.N[k0]) - 0.3,
                      float(tube.psi[k0]) + 0.03, float(tube.V[k0]),
                      0.1, 0.02])
    return q0, float(tube.t[k0])


def test_soft_decoupled_matches_sparse():
    """Closed-loop command sequences of the soft condensed decoupled
    formulation match the sparse formulation on a perturbed curvy-path
    start (both at tight solver tolerance)."""
    tube = trj.tube_from_world(f"{REFERENCE_PATHS}/curvy.world",
                               pad_to=1024)
    q0, t0 = _start(tube)
    so = SolverOptions(max_iter=6000, check_every=200, eps_abs=1e-7,
                       eps_rel=1e-7, backend="xla", scaling_iters=4)
    outs = {}
    for name, kw in (("sparse", dict()), ("soft", dict(soft=True))):
        cfg = dataclasses.replace(M.x1_decoupled_config(**kw), solver=so)
        us, conv, es = _run(cfg, tube, q0, t0)
        assert conv.mean() == 1.0, name
        outs[name] = us
    d = np.abs(outs["sparse"] - outs["soft"])
    assert d[:, 0].max() < 1e-6, d[:, 0].max()     # rad
    assert d[:, 1:].max() < 1e-3, d[:, 1:].max()   # N


def test_soft_decoupled_lane_backend():
    """The lane-batched solver (interpret mode on CPU) reproduces the XLA
    backend on the soft decoupled QP within solver tolerance.

    Driven through `mpc_step_batched` — the only entry point that
    dispatches to `solve_lanes_batched` (plain `mpc_step` always runs the
    generic XLA iteration body regardless of `backend`), so this test
    genuinely exercises the lane kernel on the n=30/m=180 decoupled QP.

    Tolerance 1e-5, not 1e-6: the lane kernel iterates in fp32, whose
    accumulated-residual floor on this QP (row scales ~1e4 N) sits between
    1e-5 and 1e-6 (measured: warm steps converge in 50 iters at 1e-5 and
    stall at 8000 iters at 1e-6); production runs at 1e-3.
    """
    tube = trj.tube_from_world(f"{REFERENCE_PATHS}/curvy.world",
                               pad_to=1024)
    cache = H.inactive_cache()
    B = 2
    k0 = np.asarray([150, 400])
    q0 = jnp.asarray(np.stack(
        [np.asarray(tube.E)[k0] + 0.4, np.asarray(tube.N)[k0] - 0.3,
         np.asarray(tube.psi)[k0] + 0.03, np.asarray(tube.V)[k0],
         np.full(B, 0.1), np.full(B, 0.02)], axis=1))
    ts = jnp.asarray(np.asarray(tube.t)[k0])
    u0 = jnp.zeros((B, 3))
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0]), (B, 4))
    outs = {}
    for backend, so in (
        ("xla", SolverOptions(max_iter=4000, check_every=200,
                              eps_abs=1e-5, eps_rel=1e-5, backend="xla",
                              scaling_iters=2)),
        ("lanes", SolverOptions(max_iter=2000, check_every=100,
                                eps_abs=1e-5, eps_rel=1e-5,
                                backend="lanes", scaling_iters=2,
                                pallas_check_inner=25)),
    ):
        cfg = dataclasses.replace(M.x1_decoupled_config(soft=True),
                                  solver=so)
        carry = M.init_carry(cfg, dtype=jnp.float64)
        cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          carry)
        cb, u1, d1 = M.mpc_step_batched(cfg, tube, cache, cb, q0, u0,
                                        oc, ts)
        cb, u2, d2 = M.mpc_step_batched(cfg, tube, cache, cb, q0, u1,
                                        oc, ts + 0.01)
        assert np.all(np.asarray(d2.converged)), backend
        outs[backend] = (np.asarray(u1), np.asarray(u2))
    for i in range(2):
        d = np.abs(outs["xla"][i] - outs["lanes"][i])
        assert d[:, 0].max() < 2e-4, (i, d)
        assert d[:, 1:].max() < 2.0, (i, d)


def test_soft_decoupled_batched_step():
    """mpc_step_batched on the soft decoupled config: lanes backend,
    mixed-knot batch, converges and stays finite over several warm
    steps (the bench path)."""
    tube = trj.tube_from_world(f"{REFERENCE_PATHS}/skidpadoval.world",
                               pad_to=1024)
    cache = H.inactive_cache()
    B = 4
    rng = np.random.default_rng(0)
    k0 = rng.integers(0, 600, B)
    q0 = jnp.asarray(np.stack(
        [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
         np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
         np.zeros(B)], axis=1))
    ts = jnp.asarray(np.asarray(tube.t)[k0])
    u0 = jnp.zeros((B, 3))
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0]), (B, 4))
    cfg = dataclasses.replace(
        M.x1_decoupled_config(soft=True),
        solver=SolverOptions(max_iter=600, check_every=200, eps_abs=1e-4,
                             eps_rel=1e-4, backend="lanes",
                             scaling_iters=2, pallas_check_inner=25))
    carry = M.init_carry(cfg, dtype=jnp.float64)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)
    for i in range(3):
        cb, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0, u0,
                                          oc, ts + 0.01 * i)
        assert bool(jnp.all(jnp.isfinite(u3)))
    assert np.asarray(diag.converged).all()


def test_soft_decoupled_layout_shape():
    """Layout accounting: n = N-1, m = 6T, no equality rows."""
    from pigeon_tpu.qp.decoupled import get_soft_layout
    hz = HorizonParams(N_short=10, N_long=20)
    L = get_soft_layout(hz)
    assert L.n == 30
    assert L.m == 6 * 30
    assert L.eq_rows.size == 0
