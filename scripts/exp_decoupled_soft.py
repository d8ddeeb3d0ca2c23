"""Round-4: decoupled formulation in SOFT CONDENSED form on the lane
backend (TPU throughput probe for the bench decoupled record)."""
import dataclasses, json, time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from pigeon_tpu import hji as H, mpc as M, trajectory as trj
from pigeon_tpu.config import SolverOptions
from pigeon_tpu.compile import tpu_jit
import pigeon_tpu.discretize as dz, pigeon_tpu.dynamics as dyn

B, chain = 8192, 10
tube = trj.tube_from_world("/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32
cfg = M.x1_decoupled_config(soft=True)
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=300, check_every=300, eps_abs=1e-3, eps_rel=1e-3,
    backend="lanes", scaling_iters=2, pallas_check_inner=10))

rng = np.random.default_rng(0)
k0 = rng.integers(0, 900, B)
q0 = jnp.asarray(np.stack([np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
    np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B), np.zeros(B)], axis=1), dtype)
t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
u0 = jnp.zeros((B, 3), dtype)
oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
carry = M.init_carry(cfg, dtype=dtype)
cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)

def plant_f(q, ur):
    return dyn.vehicle_ode(cfg.veh, "bicycle", q, ur[:2], ur[2:])

@tpu_jit
def one_step(cb, q0s, u0s, ts):
    c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s, oc, ts)
    def plant(q, u):
        ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]), jnp.zeros(4, dtype)])
        return dz.propagate(plant_f, q, ur, 0.01)
    return c2, jax.vmap(plant)(q0s, u3), u3, diag

@tpu_jit
def chained(cb, q0s, u0s, ts):
    def body(state, i):
        cb, q0s, u0s, ts = state
        cb, q0s, u0s, diag = one_step(cb, q0s, u0s, ts)
        return (cb, q0s, u0s, ts + 0.01), (diag.converged, diag.iterations)
    state, (conv, iters) = jax.lax.scan(body, (cb, q0s, u0s, ts), jnp.arange(chain))
    return state, conv, iters

t_c = time.time()
cb, q0, u0, diag = one_step(cb, q0, u0, t0)
t0v = t0 + 0.01
jax.block_until_ready(u0)
(cb, q0, u0, t0v), conv, iters = chained(cb, q0, u0, t0v)
jax.block_until_ready(u0)
print("compile_s", round(time.time()-t_c, 1), flush=True)

lat = []
for _ in range(6):
    t1 = time.time()
    (cb, q0, u0, t0v), conv, iters = chained(cb, q0, u0, t0v)
    jax.block_until_ready(u0)
    lat.append(time.time()-t1)
p50 = float(np.median(lat))
print(json.dumps({"solves_per_s": round(B/(p50/chain),1),
  "step_ms": round(p50/chain*1e3,2),
  "conv": float(np.asarray(conv)[-1].mean()),
  "iters": float(np.asarray(iters)[-1].mean())}))
