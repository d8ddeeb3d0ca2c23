"""On-chip micro-profile of the QP build phase: expm linearization vs
constraint-matrix assembly (scatter vs static-gather formulations)."""

import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.qp import coupled as qp_coupled
from pigeon_tpu.compile import tpu_jit

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
cfg = M.x1_coupled_config()
hz, veh, ctl = cfg.hz, cfg.veh, cfg.coupled
S, Lg, N, T = hz.N_short, hz.N_long, hz.N, hz.N_short + hz.N_long
L = qp_coupled.get_layout(hz, False)
dtype = jnp.float32
rng = np.random.default_rng(0)

qs = jnp.asarray(rng.normal(0, 0.1, (B, N, 6)), dtype) \
    + jnp.asarray([0, 6, 0, 0, 0, 0], dtype)
us = jnp.asarray(rng.normal(0, 0.01, (B, N, 2)), dtype)
ps = jnp.concatenate([
    jnp.full((B, N, 1), 6.0, dtype), jnp.zeros((B, N, 3), dtype)], axis=-1)
ts = jnp.asarray(rng.uniform(0, 10, B), dtype)
hji_M = jnp.zeros((B, 2), dtype)
hji_b = jnp.ones((B,), dtype)


def timeit(tag, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    print(json.dumps({"tag": tag, "ms": round(
        float(np.median(lat)) * 1e3, 3), "batch": B}), flush=True)
    return out


def f(q, ur):
    return dyn.vehicle_ode(veh, "tracking", q, ur[:2], ur[2:])


# --- full build (current path) ------------------------------------------
@tpu_jit
def build(qs, us, ps, ts, hji_M, hji_b):
    def one(q_, u_, p_, t, m_, b_):
        tgrid, dt = M.compute_time_steps(hz, t)
        data = qp_coupled.CoupledStageData(
            dt=dt, qs=q_, us=u_, ps=p_, hji_M=m_, hji_b=b_, edges=None)
        return qp_coupled.build_qp(veh, ctl, hz, data)
    return jax.vmap(one)(qs, us, ps, ts, hji_M, hji_b)


# --- linearization only ---------------------------------------------------
@tpu_jit
def lin_only(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        tgrid, dt = M.compute_time_steps(hz, t)
        ur = jnp.concatenate([u_, p_], axis=-1)
        return dz.linearize_horizon_fused(f, q_, ur, dt, S, 2,
                                          squarings=7, order=6,
                                          precision="high")
    return jax.vmap(one)(qs, us, ps, ts)


# --- scatter-assembly only (random values, same shapes) -------------------
nnz = int(np.sum(L.lay._sizes))
vals = jnp.asarray(rng.normal(0, 1, (B, nnz)), dtype)
row_cat = jnp.asarray(L.lay._row_cat)
col_cat = jnp.asarray(L.lay._col_cat)


@tpu_jit
def assemble_scatter(vals):
    def one(v):
        A = jnp.zeros((L.m, L.n), dtype)
        return A.at[row_cat, col_cat].add(v)
    return jax.vmap(one)(vals)


# --- static-gather assembly ------------------------------------------------
flat_pos = L.lay._row_cat.astype(np.int64) * L.n + L.lay._col_cat
assert np.unique(flat_pos).size == flat_pos.size, "duplicate entries!"
inv = np.full(L.m * L.n, nnz, np.int32)
inv[flat_pos] = np.arange(nnz)
inv_j = jnp.asarray(inv)


@tpu_jit
def assemble_gather(vals):
    def one(v):
        v_ext = jnp.concatenate([v, jnp.zeros((1,), dtype)])
        return v_ext[inv_j].reshape(L.m, L.n)
    return jax.vmap(one)(vals)


qp1 = timeit("full_build", build, qs, us, ps, ts, hji_M, hji_b)
timeit("linearize_only", lin_only, qs, us, ps, ts)
A1 = timeit("assemble_scatter", assemble_scatter, vals)
A2 = timeit("assemble_gather", assemble_gather, vals)
np.testing.assert_allclose(np.asarray(A1[:4]), np.asarray(A2[:4]),
                           rtol=1e-6, atol=1e-6)
print("gather == scatter OK", flush=True)


# --- artifact check: vary inputs per call + HBM write floor ---------------
@tpu_jit
def write_floor(x):
    return jnp.broadcast_to(x, (B, L.m, L.n)) + 1.0


def timeit_vary(tag, fn, make_args, iters=8):
    out = jax.block_until_ready(fn(*make_args(0)))
    lat = []
    for i in range(1, iters + 1):
        a = make_args(i)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        lat.append(time.perf_counter() - t0)
    print(json.dumps({"tag": tag, "ms": round(
        float(np.median(lat)) * 1e3, 3), "batch": B}), flush=True)


timeit_vary("full_build_vary", build,
            lambda i: (qs + i * 1e-6, us, ps, ts, hji_M, hji_b))
timeit_vary("linearize_vary", lin_only,
            lambda i: (qs + i * 1e-6, us, ps, ts))
timeit_vary("write_floor_vary", write_floor,
            lambda i: (jnp.float32(i),))


# --- linearize sub-phases --------------------------------------------------
@tpu_jit
def jac_only(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        tgrid, dt = M.compute_time_steps(hz, t)
        ur = jnp.concatenate([u_, p_], axis=-1)
        return dz.linearize_affine_horizon(f, q_[:T], ur[:T], ur[1:], dt, 2)
    return jax.vmap(one)(qs, us, ps, ts)


timeit_vary("jac_M_build_vary", jac_only,
            lambda i: (qs + i * 1e-6, us, ps, ts))


@tpu_jit
def expm_only(Ms, dts):
    return jax.vmap(lambda Mb, d: dz._expm_stage_packed(
        Mb * d[:, None, None], squarings=7, order=6, precision="high"))(
        Ms, dts)


Ms = jnp.asarray(rng.normal(0, 0.05, (B, T, 19, 19)), dtype)
dts_b = jnp.broadcast_to(jnp.asarray(
    np.concatenate([np.full(S, 0.01), np.full(Lg, 0.2)]), dtype), (B, T))
timeit_vary("expm_only_vary", expm_only,
            lambda i: (Ms + i * 1e-6, dts_b))


# --- kernel-only timing (pre-packed input) --------------------------------
big_pre = jnp.asarray(rng.normal(0, 0.02, (B, 3, 128, 128)), dtype)


@tpu_jit
def kernel_only(big):
    return dz._expm_chain_batched(big, squarings=7, order=6)


timeit_vary("expm_kernel_only_vary", kernel_only,
            lambda i: (big_pre + i * 1e-6,))


@tpu_jit
def pack_only(Ms):
    def one(Mb):
        T_, d = Mb.shape[0], Mb.shape[-1]
        k = 128 // d
        G = -(-T_ // k)
        pad = G * k - T_
        Mp = jnp.concatenate([Mb, jnp.zeros((pad, d, d), Mb.dtype)])
        big = jnp.zeros((G, 128, 128), Mb.dtype)
        Mg = Mp.reshape(G, k, d, d)
        for j in range(k):
            big = big.at[:, j * d:(j + 1) * d,
                         j * d:(j + 1) * d].set(Mg[:, j])
        return big
    return jax.vmap(one)(Ms)


timeit_vary("pack_only_vary", pack_only, lambda i: (Ms + i * 1e-6,))
