"""Coarse full-step decomposition by timing jitted sub-programs:
vmapped pre-solve (projection/nodes/linearize/assemble/HJI), the batched
solve (ruiz+factor+iterations), and the full step — with VARYING inputs
(the remote runtime value-caches identical calls).
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
from pigeon_tpu.compile import tpu_jit
from pigeon_tpu.config import SolverOptions
from pigeon_tpu.solver.admm import cold_start, solve_qp_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32

CONDENSED = len(sys.argv) > 2 and sys.argv[2] == "condensed"
cfg = M.x1_coupled_config(condensed=CONDENSED)
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=150, check_every=150, eps_abs=1e-3, eps_rel=1e-3,
    backend="pallas", scaling_iters=2,
    factor_method=("ns" if CONDENSED else "banded"), ns_iters=40,
    pallas_tile=2, pallas_precision="mixedk6", pallas_check_inner=10))

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
cb0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)


@tpu_jit
def warm_step(cb, q0s, u0s, ts):
    return M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s, oc, ts)


cb, u3, diag = warm_step(cb0, q0, u0, t0)
cb = jax.block_until_ready(cb)


@tpu_jit
def pre(cb, q0s, u0s, ts):
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "warm_only"))(cb, q0s, u0s,
                                                            oc, ts)
    return qp, warm, aux


qp, warm, aux = jax.block_until_ready(pre(cb, q0, u0, t0))
plan = M._banded_plan_for(cfg)
eqr = M._eq_rows_for(cfg)


@tpu_jit
def solve(qp, warm):
    return solve_qp_batched(qp, warm, cfg.solver, plan, eq_rows=eqr)


sol = jax.block_until_ready(solve(qp, warm))


@tpu_jit
def post(cb, sol, qp, q0s, u0s, ts, aux):
    return jax.vmap(lambda c, s, q, u0_, t, a: M._post_solve(
        cfg, c, q, u0_, t, s, a))(cb, sol, q0, u0, ts, aux) \
        if False else None


def timeit(tag, fn, make_args, iters=6):
    _ = jax.block_until_ready(fn(*make_args(0)))
    lat = []
    for i in range(1, iters + 1):
        a = make_args(i)
        jax.block_until_ready(a)
        t0_ = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        lat.append(time.perf_counter() - t0_)
    print(json.dumps({"tag": tag, "ms": round(
        float(np.median(lat)) * 1e3, 2)}), flush=True)


timeit("full_step", warm_step,
       lambda i: (cb, q0 + i * 1e-5, u0, t0 + i * 0.01))
timeit("pre_solve", pre,
       lambda i: (cb, q0 + i * 1e-5, u0, t0 + i * 0.01))


def solve_args(i):
    qp2 = qp._replace(q=qp.q + i * 1e-6)
    return (qp2, warm)


timeit("solve_only", solve, solve_args)


@tpu_jit
def tunnel_floor(x):
    return x + 1.0


timeit("tunnel_floor", tunnel_floor,
       lambda i: (jnp.float32(i),))


if CONDENSED:
    import sys as _sys
    _sys.exit(0)

# --- solve internals -------------------------------------------------------
from pigeon_tpu.solver import admm as _admm
from pigeon_tpu.solver.pallas_ruiz import ruiz_batched


@tpu_jit
def ruiz_only(qp):
    return ruiz_batched(qp.P_diag, qp.q, qp.A, qp.l, qp.u, iters=4,
                        tile=2)


rz = jax.block_until_ready(ruiz_only(qp))
Pb, qb, Ab, lb, ub, Dsc, Esc, csc = rz
is_eq = (qp.u - qp.l) < 1e-10
rho_vec = jnp.where(is_eq, 0.1e3, 0.1).astype(dtype)


@tpu_jit
def factor_only(Pb, Ab, rho_vec):
    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda P, A_, r: _admm._factor_inv(
            P, A_, r, 1e-6, cfg.solver, plan))(Pb, Ab, rho_vec)


Kinv = jax.block_until_ready(factor_only(Pb, Ab, rho_vec))

from pigeon_tpu.solver.pallas_admm import admm_iterations

eqr_np = np.asarray(eqr, np.int64)
perm = np.concatenate([eqr_np, np.setdiff1d(np.arange(qp.l.shape[-1]),
                                            eqr_np)])
permj = jnp.asarray(perm)


@tpu_jit
def iterate_only(Kinv, Ab, qb, lb, ub, rho_vec, Esc):
    scal = (Dsc, Esc[:, permj], csc, qp.P_diag, qp.q)
    x0 = jnp.zeros_like(qb)
    z0 = jnp.zeros((B, qp.l.shape[-1]), dtype)
    return admm_iterations(
        Kinv, Ab[:, permj], qb, lb[:, permj], ub[:, permj],
        rho_vec[:, permj], x0, z0, z0, 150, 1e-6, 1.6, tile=2,
        precision="mixedk6", scalings=scal, m_eq=len(eqr_np), check=10)


timeit("ruiz_only", ruiz_only, lambda i: (qp._replace(q=qp.q + i * 1e-6),))
timeit("factor_only", factor_only,
       lambda i: (Pb + i * 1e-7, Ab, rho_vec))
timeit("iterate150_cold_only", iterate_only,
       lambda i: (Kinv, Ab + i * 1e-8, qb, lb, ub, rho_vec, Esc))
timeit("solve_only2", solve, solve_args)
