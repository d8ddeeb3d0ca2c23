"""True-residual audit of the bf16x3 ("high") Pallas iteration mode.

Solves the bench fleet's QPs on-chip with pallas_precision in
{highest, high}, then recomputes OSQP residuals offline in fp64 from the
returned solutions.  Separates (a) iteration noise — does the bf16x3
fixed point sit inside the OSQP tolerance? — from (b) measurement noise —
the kernel's own stats matvecs carry the same bf16x3 error, so the
REPORTED residuals can sit above tolerance even when the true ones don't
(the eq rows' rho_eq=1e3 scaling amplifies relative matvec error into
absolute dual-residual error).
"""

import dataclasses
import json
import sys

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

cfg0 = M.x1_coupled_config()
rng = np.random.default_rng(0)
k0 = rng.integers(0, 900, B)
E = np.asarray(tube.E)[k0] + rng.uniform(-0.5, 0.5, B)
N_ = np.asarray(tube.N)[k0] + rng.uniform(-0.5, 0.5, B)
psi = np.asarray(tube.psi)[k0] + rng.uniform(-0.05, 0.05, B)
q0 = jnp.asarray(np.stack(
    [E, N_, psi, np.full(B, 6.0), np.zeros(B), np.zeros(B)], axis=1), dtype)
t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
u0 = jnp.zeros((B, 3), dtype)
oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
carry = M.init_carry(cfg0, dtype=dtype)
cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)


@tpu_jit
def get_qp(cb, q0, u0, oc, ts):
    qp, warm, aux = jax.vmap(
        lambda c, q, u, o, t: M._pre_solve(cfg0, tube, cache, c, q, u, o,
                                           t, "auto"))(cb, q0, u0, oc, ts)
    return qp


qp = get_qp(cb, q0, u0, oc, t0)
jax.block_until_ready(qp.q)

eps_abs = eps_rel = 1e-3


def true_residuals(x, z, y, A, P, qv):
    Ax = np.einsum("bmn,bn->bm", A, x)
    Aty = np.einsum("bmn,bm->bn", A, y)
    Px = P * x
    rp = np.max(np.abs(Ax - z), axis=-1)
    rd = np.max(np.abs(Px + qv + Aty), axis=-1)
    ep = eps_abs + eps_rel * np.maximum(np.abs(Ax).max(-1), np.abs(z).max(-1))
    ed = eps_abs + eps_rel * np.maximum(
        np.maximum(np.abs(Px).max(-1), np.abs(Aty).max(-1)),
        np.abs(qv).max(-1))
    return rp, rd, ep, ed


A64 = np.asarray(qp.A, np.float64)
P64 = np.asarray(qp.P_diag, np.float64)
q64 = np.asarray(qp.q, np.float64)

plan = M._banded_plan_for(cfg0)
results = {}
for tag in ["highest", "high"]:
    opts = SolverOptions(
        max_iter=100, check_every=50, eps_abs=eps_abs, eps_rel=eps_rel,
        backend="pallas", scaling_iters=4, factor_method="banded",
        bf16_bulk_iters=0, pallas_tile=4, pallas_precision=tag)

    @tpu_jit
    def solve(qp):
        return solve_qp_batched(qp, jax.vmap(cold_start)(qp), opts, plan)

    sol = solve(qp)
    jax.block_until_ready(sol.x)
    x = np.asarray(sol.x, np.float64)
    z = np.asarray(sol.z, np.float64)
    y = np.asarray(sol.y, np.float64)
    rp, rd, ep, ed = true_residuals(x, z, y, A64, P64, q64)
    conv_true = float(np.mean((rp <= ep) & (rd <= ed)))
    results[tag] = x
    print(json.dumps({
        "tag": tag,
        "reported_conv": round(float(np.asarray(sol.converged).mean()), 4),
        "true_conv": round(conv_true, 4),
        "true_rp_p50": round(float(np.median(rp)), 6),
        "true_rd_p50": round(float(np.median(rd)), 6),
        "true_rd_p99": round(float(np.percentile(rd, 99)), 6),
        "eps_d_p50": round(float(np.median(ed)), 6),
        "reported_rd_p50": round(float(np.median(np.asarray(sol.dual_res))),
                                 6),
    }), flush=True)

dx = np.abs(results["highest"] - results["high"]).max()
print(json.dumps({"max_x_diff": round(float(dx), 6)}), flush=True)
