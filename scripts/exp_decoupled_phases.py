"""Round-5: phase decomposition of the DECOUPLED soft+lanes step at fleet
batch (the VERDICT r4 item-4 target: decoupled 67.4k -> >=100k solves/s).

Times, with varying inputs and block_until_ready between launches:
  full      — mpc_step_batched (the bench step, minus plant glue)
  nodes     — _nodes_decoupled alone (trim-seeded horizon; the decoupled
              path is ALWAYS cold-seeded, so the r5 short/long scan split
              lands here)
  assemble  — build_qp_soft alone (linearization + QP assembly) from
              fixed nodes
  solve     — solve_qp_batched alone from a fixed assembled QP

Usage: python scripts/exp_decoupled_phases.py [B]
"""
import dataclasses
import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

from pigeon_tpu import hji as H  # noqa: E402
from pigeon_tpu import mpc as M  # noqa: E402
from pigeon_tpu import trajectory as trj  # noqa: E402
from pigeon_tpu.compile import tpu_jit  # noqa: E402
from pigeon_tpu.config import SolverOptions  # noqa: E402
from pigeon_tpu.qp import decoupled as qpd  # noqa: E402
from pigeon_tpu.solver.admm import QPData, solve_qp_batched, cold_start  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32
platform = jax.devices()[0].platform
cfg = M.x1_decoupled_config(soft=True)
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=300, check_every=300, eps_abs=1e-3, eps_rel=1e-3,
    backend=("lanes" if platform == "tpu" else "xla"),
    scaling_iters=2, pallas_check_inner=10))
veh, hz = cfg.veh, cfg.hz

rng = np.random.default_rng(0)
k0 = rng.integers(0, 900, B)
q0 = jnp.asarray(np.stack(
    [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
     np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
     np.zeros(B)], axis=1), dtype)
t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
u0 = jnp.zeros((B, 3), dtype)
oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
carry = M.init_carry(cfg, dtype=dtype)
cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)


def timed(fn, *args, n=6):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        a = tuple(x + 0.0 if isinstance(x, jnp.ndarray)
                  and x.dtype in (jnp.float32,) and x.ndim == 1 else x
                  for x in args)
        t1 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t1)
    return float(np.median(ts)), out


@tpu_jit
def full(cb, q0, u0, ts):
    return M.mpc_step_batched(cfg, tube, cache, cb, q0, u0, oc, ts)


@tpu_jit
def nodes(q0, u0, ts):
    def one(q, u, t):
        tss, dt = M.compute_time_steps(hz, t)
        return M._nodes_decoupled(cfg, tube, q, u, tss, dt)
    return jax.vmap(one)(q0, u0, ts)


@tpu_jit
def assemble(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        tss, dt = M.compute_time_steps(hz, t)
        data = qpd.DecoupledStageData(dt=dt, qs=q_, us=u_, ps=p_)
        sqp = qpd.build_qp_soft(veh, cfg.decoupled, hz, data)
        return sqp.P, sqp.q, sqp.A, sqp.l, sqp.u, sqp.w
    return jax.vmap(one)(qs, us, ps, ts)


@tpu_jit
def solve(P, qv, A, l, u, w):
    qp = QPData(P, qv, A, l, u)
    return solve_qp_batched(qp, jax.vmap(cold_start)(qp), cfg.solver,
                            w_soft=w)


t_full, (cb2, u3, diag) = timed(full, cb, q0, u0, t0)
t_nodes, (qs, us, ps) = timed(nodes, q0, u0, t0)
t_asm, (P, qv, A, l, u, w) = timed(assemble, qs, us, ps, t0)
t_solve, sol = timed(solve, P, qv, A, l, u, w)

out = {
    "metric": "decoupled_phase_decomposition",
    "platform": platform, "batch": B,
    "full_step_ms": round(t_full * 1e3, 2),
    "nodes_ms": round(t_nodes * 1e3, 2),
    "assemble_ms": round(t_asm * 1e3, 2),
    "solve_ms_coldstart": round(t_solve * 1e3, 2),
    "solves_per_s_full": round(B / t_full, 1),
    "converged_frac": round(float(np.asarray(diag.converged).mean()), 4),
    "iters_mean": round(float(np.asarray(diag.iterations).mean()), 1),
}
print(json.dumps(out))
