"""Round-5: sub-phase decomposition of the decoupled SOFT QP assembly
(exp_decoupled_phases.py showed assemble = 135 ms of the 181 ms cold
step at B=8192 — the dominant phase; VERDICT r4 item 4).

Phases (each jitted standalone, varying inputs, block_until_ready):
  linearize — linearize_horizon_fused (jacfwd + packed expm chain)
  jacobians — linearize_affine_horizon alone (jacfwd, no expm)
  rollout   — affine rollout G/g from fixed A_all/E
  rest      — build_qp_soft from PRE-COMPUTED linearization (monkey-
              patched) = envelope/scatter/einsum/objective assembly

Usage: python scripts/exp_assemble_phases.py [B]
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

from pigeon_tpu import discretize as dz  # noqa: E402
from pigeon_tpu import dynamics as dyn  # noqa: E402
from pigeon_tpu import mpc as M  # noqa: E402
from pigeon_tpu import trajectory as trj  # noqa: E402
from pigeon_tpu.compile import tpu_jit  # noqa: E402
from pigeon_tpu.qp import condensed as qpc  # noqa: E402
from pigeon_tpu.qp import decoupled as qpd  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
dtype = jnp.float32
cfg = M.x1_decoupled_config(soft=True)
veh, hz = cfg.veh, cfg.hz
S, Lg = hz.N_short, hz.N_long
T = S + Lg

rng = np.random.default_rng(0)
k0 = rng.integers(0, 900, B)
q0 = jnp.asarray(np.stack(
    [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
     np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
     np.zeros(B)], axis=1), dtype)
t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
u0 = jnp.zeros((B, 3), dtype)


@tpu_jit
def nodes(q0, u0, ts):
    def one(q, u, t):
        tss, dt = M.compute_time_steps(hz, t)
        return (*M._nodes_decoupled(cfg, tube, q, u, tss, dt), dt)
    return jax.vmap(one)(q0, u0, ts)


qs, us, ps, dts = jax.block_until_ready(nodes(q0, u0, t0))


def f(q, ur):
    return dyn.vehicle_ode(veh, "lateral", q, ur[:2], ur[2:])


@tpu_jit
def linearize(qs, us, ps, dts):
    def one(q_, u_, p_, dt):
        ur = jnp.concatenate([u_, p_], axis=-1)
        return dz.linearize_horizon_fused(
            f, q_, ur, dt, S, 1, squarings=4, order=6, precision="high")
    return jax.vmap(one)(qs, us, ps, dts)


@tpu_jit
def jacobians(qs, us, ps, dts):
    def one(q_, u_, p_, dt):
        ur = jnp.concatenate([u_, p_], axis=-1)
        return dz.linearize_affine_horizon(f, q_[:T], ur[:T], ur[1:],
                                           dt, 1)[0]
    return jax.vmap(one)(qs, us, ps, dts)


A_all, B0_all, Bf_all, c_all = jax.block_until_ready(
    linearize(qs, us, ps, dts))


@tpu_jit
def rollout(A_all, Bf_all, B0_all, c_all, qs, us, dts):
    def one(A_a, Bf_a, B0_a, c_a, q_, u_, dt):
        n = T
        E = jnp.zeros((T, 4, n + 1), dtype)
        E = E.at[0, :, 0:1].add(Bf_a[0])
        tt = jnp.arange(1, T)
        E = E.at[tt[:, None], jnp.arange(4)[None, :],
                 (tt - 1)[:, None]].add(B0_a[1:T, :, 0])
        E = E.at[tt[:, None], jnp.arange(4)[None, :],
                 tt[:, None]].add(Bf_a[1:T, :, 0])
        e0 = A_a[0] @ q_[0] + c_a[0] + B0_a[0, :, 0] * u_[0, 0]
        E = E.at[:, :, n].add(jnp.concatenate([e0[None], c_a[1:T]]))
        return qpc.rollout_affine(A_a, E)
    return jax.vmap(one)(A_all, Bf_all, B0_all, c_all, qs, us, dts)


@tpu_jit
def full_assemble(qs, us, ps, dts):
    def one(q_, u_, p_, dt):
        data = qpd.DecoupledStageData(dt=dt, qs=q_, us=u_, ps=p_)
        sqp = qpd.build_qp_soft(veh, cfg.decoupled, hz, data)
        return sqp.P, sqp.q, sqp.A, sqp.l, sqp.u, sqp.w
    return jax.vmap(one)(qs, us, ps, dts)


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t1 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t1)
    return float(np.median(ts)), out


t_full, _ = timed(full_assemble, qs, us, ps, dts)
t_lin, _ = timed(linearize, qs, us, ps, dts)
t_jac, _ = timed(jacobians, qs, us, ps, dts)
t_roll, _ = timed(rollout, A_all, Bf_all, B0_all, c_all, qs, us, dts)

out = {
    "metric": "decoupled_assemble_decomposition",
    "platform": jax.devices()[0].platform, "batch": B,
    "assemble_full_ms": round(t_full * 1e3, 2),
    "linearize_ms": round(t_lin * 1e3, 2),
    "jacobians_only_ms": round(t_jac * 1e3, 2),
    "expm_extract_ms_est": round((t_lin - t_jac) * 1e3, 2),
    "rollout_ms": round(t_roll * 1e3, 2),
    "rest_ms_est": round((t_full - t_lin - t_roll) * 1e3, 2),
}
print(json.dumps(out))
