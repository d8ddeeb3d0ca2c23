"""On-chip A/B: iteration-kernel matmul precision (HIGHEST vs HIGH).

Measures fleet step latency and converged_frac at B=2048 for the bench
configuration with the Pallas iteration matvecs at 6-pass fp32 vs 3-pass
bf16x3 (factorization pinned at HIGHEST in both).
"""

import dataclasses
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
from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu.config import SolverOptions
from pigeon_tpu.compile import tpu_jit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32


def run(tag, **solver_kw):
    cfg_kw = {k[4:]: solver_kw.pop(k) for k in list(solver_kw)
              if k.startswith("cfg_")}
    cfg = M.x1_coupled_config(**cfg_kw)
    base = dict(max_iter=100, check_every=50, eps_abs=1e-3, eps_rel=1e-3,
                backend="pallas", scaling_iters=4, factor_method="banded",
                bf16_bulk_iters=0, pallas_tile=4)
    base.update(solver_kw)
    cfg = dataclasses.replace(cfg, solver=SolverOptions(**base))
    rng = np.random.default_rng(0)
    k0 = rng.integers(0, 900, B)
    E = np.asarray(tube.E)[k0] + rng.uniform(-0.5, 0.5, B)
    N_ = np.asarray(tube.N)[k0] + rng.uniform(-0.5, 0.5, B)
    psi = np.asarray(tube.psi)[k0] + rng.uniform(-0.05, 0.05, B)
    q0 = jnp.asarray(np.stack(
        [E, N_, psi, np.full(B, 6.0), np.zeros(B), np.zeros(B)], axis=1),
        dtype)
    t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
    u0 = jnp.zeros((B, 3), dtype)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
    carry = M.init_carry(cfg, dtype=dtype)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)

    def plant_f(q, ur):
        return dyn.vehicle_ode(cfg.veh, "bicycle", q, ur[:2], ur[2:])

    @tpu_jit
    def step(cb, q0s, u0s, ts):
        c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s,
                                          oc, ts)

        def plant(q, u):
            ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                                  jnp.zeros(4, dtype)])
            return dz.propagate(plant_f, q, ur, 0.01)
        return c2, jax.vmap(plant)(q0s, u3), u3, diag

    cb, q0, u0, diag = step(cb, q0, u0, t0)
    jax.block_until_ready(q0)
    for _ in range(3):
        t0 = t0 + 0.01
        cb, q0, u0, diag = step(cb, q0, u0, t0)
        jax.block_until_ready(q0)
    lat = []
    for _ in range(10):
        t1 = time.time()
        t0 = t0 + 0.01
        cb, q0, u0, diag = step(cb, q0, u0, t0)
        jax.block_until_ready(q0)
        lat.append(time.time() - t1)
    p50 = float(np.percentile(lat, 50))
    conv = float(np.asarray(diag.converged).mean())
    e_mag = float(np.abs(np.asarray(diag.e)).max())
    print(json.dumps({
        "tag": tag, "batch": B, "p50_ms": round(p50 * 1e3, 2),
        "solves_per_s": round(B / p50, 1), "converged_frac": round(conv, 4),
        "max_abs_e_m": round(e_mag, 4),
        "finite": bool(np.all(np.isfinite(np.asarray(u0)))),
    }), flush=True)


import ast

configs = [("highest", {"pallas_precision": "highest"}),
           ("high", {"pallas_precision": "high"})]
if len(sys.argv) > 2:
    # extra configs as "tag:{dict literal}" args
    configs = [(a.split(":", 1)[0], ast.literal_eval(a.split(":", 1)[1]))
               for a in sys.argv[2:]]
for tag, kw in configs:
    run(tag, **kw)
