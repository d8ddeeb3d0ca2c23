"""On-chip sweep of the ADMM iteration kernel: precision mode x tile.

Times ONE 50-iteration segment call at B=2048 on the real coupled-MPC QP
shapes, isolating the kernel from the rest of the step.  Validates the
MXU-pass cost model (highest=96 passes/instance/iter, mixedk6=72,
high=48) and whether a larger tile helps pipelining.
"""

import itertools
import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.compile import tpu_jit
from pigeon_tpu.solver import admm
from pigeon_tpu.solver.pallas_admm import admm_iterations

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
cfg = M.x1_coupled_config()
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32
rng = np.random.default_rng(0)
k0 = rng.integers(0, 900, B)
q0 = jnp.asarray(np.stack(
    [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
     np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
     np.zeros(B)], axis=1), dtype)
ts = jnp.asarray(np.asarray(tube.t)[k0], dtype)
u0 = jnp.zeros((B, 3), dtype)
oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
carry = M.init_carry(cfg, dtype=dtype)
cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)


@tpu_jit
def setup(cb, q0, u0, oc, ts):
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "auto"))(cb, q0, u0, oc, ts)
    qps, D, E, c = jax.vmap(lambda q: admm._ruiz(q, 4))(qp)
    is_eq = (qp.u - qp.l) < 1e-10
    rho_vec = jnp.where(is_eq, 0.1 * 1e3, 0.1).astype(dtype)
    plan = M._banded_plan_for(cfg)
    with jax.default_matmul_precision("highest"):
        Kinv = jax.vmap(lambda P, A_, r: admm._factor_inv(
            P, A_, r, 1e-6, cfg.solver, plan))(qps.P_diag, qps.A, rho_vec)
    scalings = (D, E, c, qp.P_diag, qp.q)
    return qps, rho_vec, Kinv, scalings


qps, rho_vec, Kinv, scalings = jax.block_until_ready(
    setup(cb, q0, u0, oc, ts))
n, m = qps.q.shape[-1], qps.l.shape[-1]
x0 = jnp.zeros((B, n), dtype)
z0 = jnp.zeros((B, m), dtype)
y0 = jnp.zeros((B, m), dtype)
eq_rows = M._eq_rows_for(cfg)
perm = np.concatenate([eq_rows,
                       np.setdiff1d(np.arange(m), eq_rows)])
permj = jnp.asarray(perm)

for prec, tile in itertools.product(
        ["highest", "mixedk6", "high"], [4, 8]):
    m_eq = len(eq_rows) if prec.startswith("mixed") else 0
    if m_eq:
        A_, l_, u_, r_ = (qps.A[:, permj], qps.l[:, permj],
                          qps.u[:, permj], rho_vec[:, permj])
        sc = (scalings[0], scalings[1][:, permj], scalings[2],
              scalings[3], scalings[4])
    else:
        A_, l_, u_, r_ = qps.A, qps.l, qps.u, rho_vec
        sc = scalings

    def run():
        return admm_iterations(Kinv, A_, qps.q, l_, u_, r_, x0, z0, y0,
                               50, 1e-6, 1.6, tile=tile, precision=prec,
                               scalings=sc, m_eq=m_eq)

    try:
        out = jax.block_until_ready(run())
        lat = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run())
            lat.append(time.perf_counter() - t0)
        ms = float(np.median(lat)) * 1e3
        print(json.dumps({"prec": prec, "tile": tile,
                          "iterate50_ms": round(ms, 2),
                          "us_per_iter_inst": round(
                              ms * 1e3 / 50 / B, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"prec": prec, "tile": tile,
                          "error": str(e)[:200]}), flush=True)
