"""On-chip breakdown of the banded KKT factorization phases.

Times (a) the block-tridiagonal Cholesky scan (chol+inv unrolled per
stage), (b) the forward substitution scan against identity, (c) the
final W^T W GEMM — to locate where factor_inv_banded's ~55 ms at B=2048
goes before optimizing (dispatch-bound scan vs MXU GEMM).
"""

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
from pigeon_tpu.solver import banded

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

plan = banded.coupled_stage_plan(cfg.hz, cfg.coupled.use_walls)
slots, n, bw, nb = plan
slots_j = slots


@tpu_jit
def setup(cb, q0, u0, oc, ts):
    qp, _, _ = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg, tube, cache, c, q, u, o,
                                           t, "auto"))(cb, q0, u0, oc, ts)
    qps, D, E, c = jax.vmap(lambda q: admm._ruiz(q, 4))(qp)
    is_eq = (qp.u - qp.l) < 1e-10
    rho_vec = jnp.where(is_eq, 0.1 * 1e3, 0.1).astype(dtype)
    return qps, rho_vec


qps, rho_vec = jax.block_until_ready(setup(cb, q0, u0, oc, ts))
Pb, Ab = qps.P_diag, qps.A
sigma = 1e-6


def timeit(tag, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    print(json.dumps({"tag": tag,
                      "ms": round(float(np.median(lat)) * 1e3, 3)}),
          flush=True)
    return out


def blocks_one(Pb1, Ab1, rho1):
    P_ext = jnp.concatenate([Pb1 + sigma, jnp.ones((1,), dtype)])
    P_blk = P_ext[slots_j]
    with jax.default_matmul_precision("highest"):
        K_full = (Ab1.T * rho1[None, :]) @ Ab1
    K_ext = jnp.pad(K_full, ((0, 1), (0, 1)))
    K_diag = K_ext[slots_j[:, :, None], slots_j[:, None, :]]
    K_diag = K_diag + jax.vmap(jnp.diag)(P_blk)
    K_sub = K_ext[slots_j[1:, :, None], slots_j[:-1, None, :]]
    K_sub = jnp.concatenate([jnp.zeros((1, bw, bw), dtype), K_sub])
    return K_diag, K_sub


@tpu_jit
def gemm_blocks(Pb, Ab, rho_vec):
    return jax.vmap(blocks_one)(Pb, Ab, rho_vec)


K_diag, K_sub = timeit("K_gemm_blocks", gemm_blocks, Pb, Ab, rho_vec)


def chol_one(K_diag1, K_sub1):
    def chol_body(Linv_prev, inp):
        Ktt, Koff = inp
        S = Koff @ jnp.swapaxes(Linv_prev, -1, -2)
        D_ = Ktt - S @ jnp.swapaxes(S, -1, -2)
        L = banded._chol_unrolled(D_)
        Linv = banded._inv_lower_unrolled(L)
        return Linv, (Linv, S)
    with jax.default_matmul_precision("highest"):
        _, (Linvs, Ss) = jax.lax.scan(
            chol_body, jnp.zeros((bw, bw), dtype), (K_diag1, K_sub1))
    return Linvs, Ss


@tpu_jit
def chol_scan(K_diag, K_sub):
    return jax.vmap(chol_one)(K_diag, K_sub)


Linvs, Ss = timeit("chol_scan", chol_scan, K_diag, K_sub)

n_perm = nb * bw


def fwd_one(Linvs1, Ss1):
    eye_full = jnp.eye(n_perm, dtype=dtype).reshape(nb, bw, n_perm)

    def fwd_body(y_prev, inp):
        Linv, S, It = inp
        y = Linv @ (It - S @ y_prev)
        return y, y
    with jax.default_matmul_precision("highest"):
        _, ys = jax.lax.scan(fwd_body, jnp.zeros((bw, n_perm), dtype),
                             (Linvs1, Ss1, eye_full))
    return ys.reshape(n_perm, n_perm)


@tpu_jit
def fwd_scan(Linvs, Ss):
    return jax.vmap(fwd_one)(Linvs, Ss)


W = timeit("fwd_subst_scan", fwd_scan, Linvs, Ss)


@tpu_jit
def wtw(W):
    with jax.default_matmul_precision("highest"):
        return jnp.einsum("bij,bik->bjk", W, W)


timeit("WtW_gemm", wtw, W)


@tpu_jit
def full(Pb, Ab, rho_vec):
    return jax.vmap(lambda P, A_, r: banded.factor_inv_banded(
        P, A_, r, sigma, slots, n, bw, nb))(Pb, Ab, rho_vec)


timeit("factor_full", full, Pb, Ab, rho_vec)
