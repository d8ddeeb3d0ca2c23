"""Interpret-mode tests for the in-VMEM Ruiz equilibration kernel
(solver/pallas_ruiz.py) against the XLA reference `admm._ruiz`."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pigeon_tpu.solver import admm
from pigeon_tpu.solver.pallas_ruiz import ruiz_batched


@pytest.mark.parametrize("shape", [(3, 290, 193), (2, 100, 60)])
def test_ruiz_kernel_matches_xla(shape):
    B, m, n = shape
    rng = np.random.default_rng(1)
    P = jnp.asarray(np.abs(rng.standard_normal((B, n))) * 3, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, n)) * 100, jnp.float32)
    A = jnp.asarray(
        rng.standard_normal((B, m, n))
        * (rng.random((B, m, n)) < 0.05), jnp.float32)
    l = jnp.asarray(-np.abs(rng.standard_normal((B, m))), jnp.float32)
    u = jnp.asarray(np.abs(rng.standard_normal((B, m))), jnp.float32)

    qps, D_r, E_r, c_r = jax.vmap(
        lambda Pq, qq, Aq, lq, uq: admm._ruiz(
            admm.QPData(Pq, qq, Aq, lq, uq), 4))(P, q, A, l, u)
    Pb, qb, Ab, lb, ub, D, E, c = ruiz_batched(P, q, A, l, u, iters=4,
                                               tile=2, interpret=True)
    for a, b in [(Pb, qps.P_diag), (qb, qps.q), (Ab, qps.A), (lb, qps.l),
                 (ub, qps.u), (D, D_r), (E, E_r), (c, c_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_ruiz_kernel_on_mpc_qp():
    """End to end: the batched pallas solve path (which now routes Ruiz
    through the kernel) still produces truthful residuals on real MPC
    QPs — covered transitively by test_batched_step, but pin the scaling
    itself here on one assembled QP."""
    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj

    cfg = M.x1_coupled_config()
    tube = trj.tube_from_world(
        "/root/reference/test/path/curvy.world", pad_to=1024)
    cache = H.inactive_cache()
    B = 2
    q0 = jnp.stack([jnp.asarray(
        [float(tube.E[0]), float(tube.N[0]), float(tube.psi[0]),
         float(tube.V[0]), 0.0, 0.0], dtype=jnp.float32)] * B)
    u0 = jnp.zeros((B, 3), jnp.float32)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0, 0], jnp.float32),
                          (B, 4))
    ts = jnp.zeros((B,), jnp.float32)
    carry = M.init_carry(cfg)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)
    qp, _, _ = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "auto"))(cb, q0, u0, oc, ts)
    qps, D_r, E_r, c_r = jax.vmap(lambda q: admm._ruiz(q, 4))(qp)
    Pb, qb, Ab, lb, ub, D, E, c = ruiz_batched(
        qp.P_diag, qp.q, qp.A, qp.l, qp.u, iters=4, tile=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(Ab), np.asarray(qps.A),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(D), np.asarray(D_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_r), rtol=1e-5)
