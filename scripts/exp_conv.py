"""Convergence anatomy of the bench fleet at B=2048.

Questions: (1) are the ~8% unconverged instances persistent or churning?
(2) how many iterations would they need (conv at 50/100/150/200)?
(3) does adaptive-rho drift trigger refactorization every step (doubling
factor cost)?  (4) do stragglers correlate with track curvature?
"""

import dataclasses
import json
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu import hji as H
from pigeon_tpu import mpc as M
from pigeon_tpu import trajectory as trj
from pigeon_tpu.compile import tpu_jit
from pigeon_tpu.config import SolverOptions

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 200
tube = trj.tube_from_world(
    "/root/reference/test/path/skidpadoval.world", pad_to=1024)
cache = H.inactive_cache()
dtype = jnp.float32

cfg = M.x1_coupled_config()
cfg = dataclasses.replace(cfg, solver=SolverOptions(
    max_iter=max_iter, check_every=50, eps_abs=1e-3, eps_rel=1e-3,
    backend="pallas", scaling_iters=4, factor_method="banded",
    pallas_tile=4, pallas_precision="mixedk6"))

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
    c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s, oc,
                                      ts)

    def plant(q, u):
        ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                              jnp.zeros(4, dtype)])
        return dz.propagate(plant_f, q, ur, 0.01)
    return c2, jax.vmap(plant)(q0s, u3), u3, diag


# warm up 4 steps, then record 6 steps of convergence masks
cb, q0, u0, diag = step(cb, q0, u0, t0)
for _ in range(3):
    t0 = t0 + 0.01
    cb, q0, u0, diag = step(cb, q0, u0, t0)
jax.block_until_ready(q0)

masks, iters_list, kappas = [], [], []
for _ in range(6):
    t0 = t0 + 0.01
    cb, q0, u0, diag = step(cb, q0, u0, t0)
    masks.append(np.asarray(diag.converged))
    iters_list.append(np.asarray(diag.iterations))
    s = np.asarray(diag.s)
    kap = np.interp(s, np.asarray(tube.s), np.asarray(tube.kappa))
    kappas.append(kap)

mk = np.stack(masks)                        # (6, B)
it = np.stack(iters_list)
never = np.all(~mk, axis=0).mean()
always = np.all(mk, axis=0).mean()
per_step = mk.mean(axis=1)
# iteration histogram at the final step
vals, counts = np.unique(it[-1], return_counts=True)
kap_conv = np.abs(kappas[-1][mk[-1]]).mean()
kap_unconv = (np.abs(kappas[-1][~mk[-1]]).mean()
              if (~mk[-1]).any() else float("nan"))
print(json.dumps({
    "B": B, "max_iter": max_iter,
    "conv_per_step": [round(float(x), 4) for x in per_step],
    "frac_always_conv": round(float(always), 4),
    "frac_never_conv": round(float(never), 4),
    "iter_hist": {int(v): int(c) for v, c in zip(vals, counts)},
    "mean_abs_kappa_converged": round(float(kap_conv), 4),
    "mean_abs_kappa_unconverged": round(float(kap_unconv), 4),
    "prim_res_p99_last": round(float(np.percentile(
        np.asarray(diag.prim_res), 99)), 5),
    "dual_res_p99_last": round(float(np.percentile(
        np.asarray(diag.dual_res), 99)), 5),
}), flush=True)
