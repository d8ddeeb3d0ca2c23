"""shard_map scale-out tests on the 8-device CPU mesh: dp sharding
equivalence, psum'd fleet metrics, tensor-parallel factorization
equivalence, and the presence of real collectives in the compiled HLO
(SURVEY.md §2 parallelism axes dp + tp)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import SolverOptions
from pigeon_tpu.parallel.shard import (FleetMetrics, make_mesh_2d,
                                       make_sharded_step, shard_batch_dp)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _setup(B=8):
    cfg = dataclasses.replace(M.x1_coupled_config(), solver=SolverOptions(
        max_iter=100, check_every=50, backend="xla",
        factor_method="banded", scaling_iters=4))
    tube = trj.straight_trajectory(80.0, 6.0, pad_to=32)
    cache = H.inactive_cache()
    carry = M.init_carry(cfg, dtype=jnp.float64)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)
    q0 = jnp.asarray([[0.3, 2.0 * i, 0.0, 6.0, 0.0, 0.0]
                      for i in range(B)], jnp.float64)
    u0 = jnp.zeros((B, 3), jnp.float64)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], jnp.float64),
                          (B, 4))
    ts = jnp.zeros(B, jnp.float64)
    return cfg, tube, cache, (cb, q0, u0, oc, ts)


def test_sharded_step_matches_unsharded():
    cfg, tube, cache, args = _setup()
    ref_c, ref_u3, ref_diag = M.mpc_step_batched(cfg, tube, cache, *args)

    mesh = make_mesh_2d(8, tp=1)
    step = make_sharded_step(cfg, tube, cache, mesh)
    sargs = shard_batch_dp(args, mesh)
    with mesh:
        c2, u3, diag, metrics = jax.jit(step)(*sargs)

    np.testing.assert_allclose(np.asarray(u3), np.asarray(ref_u3),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(diag.e), np.asarray(ref_diag.e),
                               rtol=1e-6, atol=1e-9)
    assert isinstance(metrics, FleetMetrics)
    assert float(metrics.n_scenarios) == 8.0
    assert float(metrics.n_converged) == float(
        np.asarray(ref_diag.converged).sum())
    assert float(metrics.max_abs_e) == pytest.approx(
        float(np.abs(np.asarray(ref_diag.e)).max()), rel=1e-6)


def test_tensor_parallel_factor_matches():
    """tp=2: the column-sharded + all_gather'd K^-1 must reproduce the
    replicated factorization's control outputs."""
    cfg, tube, cache, args = _setup()
    ref_c, ref_u3, ref_diag = M.mpc_step_batched(cfg, tube, cache, *args)

    mesh = make_mesh_2d(8, tp=2)
    step = make_sharded_step(cfg, tube, cache, mesh)
    sargs = shard_batch_dp(args, mesh)
    with mesh:
        f = jax.jit(step)
        c2, u3, diag, metrics = f(*sargs)
        hlo = f.lower(*sargs).compile().as_text()

    np.testing.assert_allclose(np.asarray(u3), np.asarray(ref_u3),
                               rtol=1e-6, atol=1e-8)
    # the TP re-assembly must appear as a real collective
    assert "all-gather" in hlo
    assert "all-reduce" in hlo       # psum'd fleet metrics


def test_sharded_closed_loop_stays_consistent():
    """A few closed-loop steps through the sharded path keep carries
    consistent (warm starts survive resharding)."""
    cfg, tube, cache, (cb, q0, u0, oc, ts) = _setup()
    mesh = make_mesh_2d(8, tp=1)
    step = make_sharded_step(cfg, tube, cache, mesh)
    cb, q0, u0, oc, ts = shard_batch_dp((cb, q0, u0, oc, ts), mesh)
    with mesh:
        f = jax.jit(step)
        for i in range(3):
            cb, u3, diag, metrics = f(cb, q0, u0, oc, ts + 0.01 * i)
            u0 = u3
    assert bool(metrics.all_finite)
    # whole fleet warm by step 3
    assert float(metrics.n_converged) >= 6.0
