"""Round-4 decomposition of the PRE-SOLVE phase of the soft+lanes step.

Pre-solve is now ~95% of the flagship fleet step (exp_phases3, r4).
Times, with varying inputs on a steady-state warm fleet: warm node
seeding (projection / resample / tail lookups separately), horizon
linearization, and soft QP assembly.  Usage:

    python scripts/exp_phases4.py [B]
"""
import dataclasses, json, sys, time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from pigeon_tpu import hji as H, mpc as M, trajectory as trj
from pigeon_tpu import discretize as dz, dynamics as dyn
from pigeon_tpu.compile import tpu_jit
from pigeon_tpu.config import SolverOptions
from pigeon_tpu.qp import condensed as qpc
from pigeon_tpu.qp import coupled as qpcp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32
cfg = M.x1_coupled_config(soft=True)
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=150, check_every=150, eps_abs=1e-3, eps_rel=1e-3,
    backend="lanes", scaling_iters=2, pallas_check_inner=10))
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

@tpu_jit
def warm_step(cb, q0s, u0s, ts):
    return M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s, oc, ts)

for i in range(5):
    cb, u0, diag = warm_step(cb, q0, u0, t0 + 0.01 * i)
cb = jax.block_until_ready(cb)
ts5 = t0 + 0.05

def timeit(tag, fn, make_args, iters=6):
    _ = jax.block_until_ready(fn(*make_args(0)))
    lat = []
    for i in range(1, iters + 1):
        a = jax.block_until_ready(make_args(i))
        t_ = time.perf_counter()
        jax.block_until_ready(fn(*a))
        lat.append(time.perf_counter() - t_)
    print(json.dumps({"tag": tag, "ms": round(
        float(np.median(lat)) * 1e3, 2)}), flush=True)

@tpu_jit
def tunnel_floor(x):
    return x + 1.0
timeit("tunnel_floor", tunnel_floor, lambda i: (jnp.float32(i),))

# ---- warm nodes only -------------------------------------------------------
@tpu_jit
def nodes_only(cb, q0s, u0s, ts):
    def one(c, q, u, t):
        tgrid, dt = M.compute_time_steps(hz, t)
        return M._nodes_coupled_warm(cfg, tube, q, u, tgrid, c)
    return jax.vmap(one)(cb, q0s, u0s, ts)
qs_b, us_b, ps_b = jax.block_until_ready(
    nodes_only(cb, q0, u0, ts5))
timeit("nodes_warm", nodes_only, lambda i: (cb, q0 + i * 1e-5, u0, ts5))

# projection alone
@tpu_jit
def proj_only(q0s):
    return jax.vmap(lambda q: trj.path_coordinates(tube, q[:2]))(q0s)
timeit("nodes.projection", proj_only, lambda i: (q0 + i * 1e-5,))

# ---- linearization only ----------------------------------------------------
@tpu_jit
def lin_only(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        _, dt = M.compute_time_steps(hz, t)
        ur = jnp.concatenate([u_, p_], axis=-1)
        def f(q, urr):
            return dyn.vehicle_ode(veh, "tracking", q, urr[:2], urr[2:])
        return dz.linearize_horizon_fused(f, q_, ur, dt, hz.N_short, 2,
                                          squarings=7, order=6,
                                          precision="high")
    return jax.vmap(one)(qs, us, ps, ts)
lin_out = jax.block_until_ready(lin_only(qs_b, us_b, ps_b, ts5))
timeit("linearize", lin_only, lambda i: (qs_b + i * 1e-6, us_b, ps_b, ts5))

# ---- soft QP assembly only (includes linearization internally) ------------
@tpu_jit
def build_only(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        tgrid, dt = M.compute_time_steps(hz, t)
        data = qpcp.CoupledStageData(
            dt=dt, qs=q_, us=u_, ps=p_,
            hji_M=jnp.zeros(2, dtype), hji_b=jnp.ones((), dtype),
            edges=None)
        return qpc.build_qp_soft(veh, cfg.coupled, hz, data,
                                 lin_method=cfg.lin_method,
                                 lin_substeps=cfg.lin_substeps)
    return jax.vmap(one)(qs, us, ps, ts)
_ = jax.block_until_ready(build_only(qs_b, us_b, ps_b, ts5))
timeit("build_qp_soft(incl lin)", build_only,
       lambda i: (qs_b + i * 1e-6, us_b, ps_b, ts5))

# ---- linearization internals: jacfwd/M-build vs expm chain -----------------
@tpu_jit
def lin_jac_only(qs, us, ps, ts):
    def one(q_, u_, p_, t):
        _, dt = M.compute_time_steps(hz, t)
        ur = jnp.concatenate([u_, p_], axis=-1)
        def f(q, urr):
            return dyn.vehicle_ode(veh, "tracking", q, urr[:2], urr[2:])
        T = dt.shape[0]
        Mx, dim = dz.linearize_affine_horizon(f, q_[:T], ur[:T], ur[1:],
                                              dt, 2)
        return Mx * dt[:, None, None]
    return jax.vmap(one)(qs, us, ps, ts)

Mb = jax.block_until_ready(lin_jac_only(qs_b, us_b, ps_b, ts5))
timeit("lin.jacfwd+Mbuild", lin_jac_only,
       lambda i: (qs_b + i * 1e-6, us_b, ps_b, ts5))

@tpu_jit
def expm_only(Mb):
    return jax.vmap(lambda Mx: dz._expm_stage_packed(
        Mx, squarings=7, order=6, precision="high"))(Mb)

_ = jax.block_until_ready(expm_only(Mb))
timeit("lin.expm(sq7,o6)", expm_only, lambda i: (Mb + i * 1e-7,))

@tpu_jit
def expm_only5(Mb):
    return jax.vmap(lambda Mx: dz._expm_stage_packed(
        Mx, squarings=5, order=6, precision="high"))(Mb)

_ = jax.block_until_ready(expm_only5(Mb))
timeit("lin.expm(sq5,o6)", expm_only5, lambda i: (Mb + i * 1e-7,))
