"""Round-3 phase decomposition of the SOFT+LANES flagship step.

Times (with varying inputs, steady-state warm fleet): full step, vmapped
pre-solve, batched lane solve, and the solve internals (XLA Ruiz, K build,
lane Cholesky factor kernel, lane ADMM iterate kernel), plus the
steady-state executed-iteration distribution.  Usage:

    python scripts/exp_phases3.py [B]
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
from pigeon_tpu.solver.admm import solve_qp_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32

cfg = M.x1_coupled_config(soft=True)
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=150, check_every=150, eps_abs=1e-3, eps_rel=1e-3,
    backend="lanes", scaling_iters=2, pallas_check_inner=10))

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


@tpu_jit
def warm_step(cb, q0s, u0s, ts):
    return M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s, oc, ts)


# run to steady state (5 steps) so the iteration counts are honest
for i in range(5):
    cb, u0, diag = warm_step(cb, q0, u0, t0 + 0.01 * i)
cb = jax.block_until_ready(cb)
it = np.asarray(diag.iterations)
print(json.dumps({"tag": "steady_iters", "mean": float(it.mean()),
                  "p50": float(np.percentile(it, 50)),
                  "p90": float(np.percentile(it, 90)),
                  "p99": float(np.percentile(it, 99)),
                  "max": float(it.max()),
                  "conv": float(np.asarray(diag.converged).mean())}),
      flush=True)


@tpu_jit
def pre(cb, q0s, u0s, ts):
    return jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "warm_only"))(cb, q0s, u0s,
                                                            oc, ts)


qp, warm, aux = jax.block_until_ready(pre(cb, q0, u0, t0))


@tpu_jit
def solve(qp, warm, w):
    return solve_qp_batched(qp, warm, cfg.solver, w_soft=w)


sol = jax.block_until_ready(solve(qp, warm, aux.w))


def timeit(tag, fn, make_args, iters=6):
    _ = jax.block_until_ready(fn(*make_args(0)))
    lat = []
    for i in range(1, iters + 1):
        a = make_args(i)
        jax.block_until_ready(a)
        t0_ = time.perf_counter()
        jax.block_until_ready(fn(*a))
        lat.append(time.perf_counter() - t0_)
    print(json.dumps({"tag": tag, "ms": round(
        float(np.median(lat)) * 1e3, 2)}), flush=True)


timeit("full_step", warm_step,
       lambda i: (cb, q0 + i * 1e-5, u0, t0 + 0.01 * i))
timeit("pre_solve", pre,
       lambda i: (cb, q0 + i * 1e-5, u0, t0 + 0.01 * i))
timeit("solve_only", solve,
       lambda i: (qp._replace(q=qp.q + i * 1e-6), warm, aux.w))


@tpu_jit
def tunnel_floor(x):
    return x + 1.0


timeit("tunnel_floor", tunnel_floor, lambda i: (jnp.float32(i),))

# ---- solve internals -------------------------------------------------------
from pigeon_tpu.solver import admm as _admm
from pigeon_tpu.solver import lane_admm as LA


@tpu_jit
def ruiz_only(qp):
    return jax.vmap(lambda q: _admm._ruiz(q, cfg.solver.scaling_iters))(qp)


(qps, D, E, c) = jax.block_until_ready(ruiz_only(qp))
Pb, qb, Ab, lb, ub = qps
rho_vec = jnp.full_like(qp.l, cfg.solver.rho)
n = qp.q.shape[-1]


@tpu_jit
def kbuild(Pb, Ab, rho_vec):
    K = Pb + jnp.einsum("bmi,bm,bmj->bij", Ab, rho_vec, Ab,
                        precision=jax.lax.Precision.HIGHEST)
    return K + cfg.solver.sigma * jnp.eye(n, dtype=K.dtype)


K = jax.block_until_ready(kbuild(Pb, Ab, rho_vec))
n_pad = LA._round_up(n, 8)
Bp = LA._round_up(B, LA.LANES)


@tpu_jit
def to_lanes(K):
    K_l = jnp.zeros((n_pad, n_pad, Bp), jnp.float32)
    K_l = K_l.at[:n, :n, :B].set(jnp.moveaxis(K, 0, -1))
    didx = jnp.arange(n_pad)
    pad_d = jnp.concatenate([jnp.zeros(n), jnp.ones(n_pad - n)]
                            ).astype(jnp.float32)
    K_l = K_l + pad_d[:, None, None] * (didx[:, None, None]
                                        == didx[None, :, None])
    if B != Bp:
        lane_pad = (jnp.arange(Bp) >= B).astype(jnp.float32)
        K_l = K_l + (didx[:, None, None] == didx[None, :, None]) \
            * (1.0 - pad_d)[:, None, None] * lane_pad[None, None, :]
    return K_l


K_l = jax.block_until_ready(to_lanes(K))


@tpu_jit
def factor_only(K_l):
    return LA.chol_inverse_lanes(K_l, n, polish=cfg.solver.lane_polish)


Kinv_l = jax.block_until_ready(factor_only(K_l))

timeit("ruiz_only", ruiz_only, lambda i: (qp._replace(q=qp.q + i * 1e-6),))
timeit("kbuild", kbuild, lambda i: (Pb + i * 1e-7, Ab, rho_vec))
timeit("to_lanes", to_lanes, lambda i: (K + i * 1e-7,))
timeit("factor_kernel", factor_only, lambda i: (K_l + i * 1e-7,))

# iterate kernel alone (steady-state warm start, 150-iter budget,
# early exit every 10)
m = qp.l.shape[-1]
m_pad = LA._round_up(m, 8)
wb = c[:, None] * jnp.broadcast_to(aux.w, (B, m)) / E


def lane_vec(v, length, fill=0.0):
    out = jnp.full((length, Bp), fill, jnp.float32)
    return out.at[:v.shape[-1], :B].set(v.T.astype(jnp.float32))


def lane_mat(Mx, r, ccols):
    out = jnp.zeros((r, ccols, Bp), jnp.float32)
    return out.at[:Mx.shape[1], :Mx.shape[2], :B].set(
        jnp.moveaxis(Mx, 0, -1).astype(jnp.float32))


@tpu_jit
def iterate_only(Kinv_l, Ab, qb, lb, ub, rho_vec, wb, warm):
    A_l = lane_mat(Ab, m_pad, n_pad)
    AT_l = jnp.swapaxes(A_l, 0, 1)
    PuD = D[:, :, None] * qp.P_diag
    return LA.admm_iterations_lanes(
        Kinv_l, A_l, AT_l, lane_vec(qb, n_pad), lane_vec(lb, m_pad),
        lane_vec(ub, m_pad), lane_vec(rho_vec, m_pad, 1.0),
        lane_vec(wb / rho_vec, m_pad, jnp.inf),
        lane_vec(warm.x / D, n_pad), lane_vec(E * warm.z, m_pad),
        lane_vec(c[:, None] * warm.y / E, m_pad),
        lane_vec(E, m_pad, 1.0), lane_mat(PuD, n_pad, n_pad),
        lane_vec(qp.q, n_pad), lane_vec(1.0 / (D * c[:, None]), n_pad),
        150, cfg.solver.sigma, cfg.solver.alpha, check=10,
        eps_abs=1e-3, eps_rel=1e-3)


out = jax.block_until_ready(iterate_only(Kinv_l, Ab, qb, lb, ub, rho_vec,
                                         wb, warm))
print(json.dumps({"tag": "iterate_exec_iters",
                  "mean": float(np.asarray(out[3])[6, :B].mean())}),
      flush=True)
timeit("iterate_kernel", iterate_only,
       lambda i: (Kinv_l, Ab + i * 1e-8, qb, lb, ub, rho_vec, wb, warm))
