"""Explicit-collective scale-out: `shard_map` over a (dp, tp) device mesh.

`parallel/mesh.py` scales by sharded-array annotations (NamedSharding +
jit, XLA infers collectives — pure DP needs none).  This module is the
explicit layer the SURVEY §2 parallelism table calls for:

- **dp** (scenario/data parallel, primary axis): the batch is split across
  `dp`; every device runs the full MPC step on its local shard.  Fleet
  metrics (convergence counts, tracking-error maxima) are reduced across
  the mesh with `psum` / `pmax` over ICI — the explicit analog of the
  reference's per-node loginfo aggregation (`src/ros_integration.jl`).
- **tp** (tensor parallel over the KKT linear algebra): the banded
  factorization's identity right-hand-side columns are sharded over `tp`
  inside the solver (`solver/banded.py factor_inv_banded(tp_axis=...)`),
  re-assembled with `all_gather` — sharding the per-instance
  factorization flops for the latency-critical small-batch configuration.

Multi-host: the same mesh spans hosts (`jax.distributed.initialize` +
`jax.devices()`); dp shards then ride DCN between hosts while tp stays
intra-host on ICI.  See tests/test_distributed.py for the 2-process CPU
wiring.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import mpc as mpc_mod
from pigeon_tpu import trajectory as trj


class FleetMetrics(NamedTuple):
    """Mesh-reduced per-step fleet statistics (psum/pmax over dp)."""

    n_scenarios: jnp.ndarray       # () total fleet size
    n_converged: jnp.ndarray       # () solver-converged count
    n_hji_active: jnp.ndarray      # () HJI-filter-active count
    max_abs_e: jnp.ndarray         # () worst tracking error in the fleet
    max_prim_res: jnp.ndarray      # () worst primal residual
    all_finite: jnp.ndarray        # () every command finite


def make_mesh_2d(n_devices: int | None = None, tp: int = 1,
                 devices=None) -> Mesh:
    """(dp, tp) mesh over the first n devices; tp divides n."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide {n} devices")
    return Mesh(np.asarray(devs).reshape(n // tp, tp), ("dp", "tp"))


def make_sharded_step(cfg: mpc_mod.MPCConfig, tube: trj.TrajectoryTube,
                      cache: hji_mod.HJICache, mesh: Mesh,
                      use_tp_factor: bool | None = None):
    """Build the shard_map'd batched control step.

    Returns step(carries, q0s, u0s, other_cars, ts) ->
    (new_carries, u3, diag, FleetMetrics); batch arrays must have their
    leading axis divisible by mesh.shape['dp'] and be placed with
    `shard_batch_dp` (or any P('dp') sharding).
    """
    import dataclasses

    has_tp = mesh.shape.get("tp", 1) > 1
    if use_tp_factor is None:
        use_tp_factor = has_tp and cfg.solver.factor_method == "banded"
    if use_tp_factor:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, tp_axis="tp"))

    batch_spec = P("dp")
    specs_in = (batch_spec,) * 5
    specs_out = (batch_spec, batch_spec, batch_spec, P())

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=specs_in, out_specs=specs_out, check_rep=False)
    def step(carries, q0s, u0s, other_cars, ts):
        c2, u3, diag = mpc_mod.mpc_step_batched(
            cfg, tube, cache, carries, q0s, u0s, other_cars, ts)
        fsum = lambda v: jax.lax.psum(jnp.sum(v.astype(jnp.float32)), "dp")
        fmax = lambda v: jax.lax.pmax(jnp.max(v.astype(jnp.float32)), "dp")
        metrics = FleetMetrics(
            n_scenarios=fsum(jnp.ones_like(ts)),
            n_converged=fsum(diag.converged),
            n_hji_active=fsum(diag.hji_active),
            max_abs_e=fmax(jnp.abs(diag.e)),
            max_prim_res=fmax(diag.prim_res),
            all_finite=jax.lax.pmin(
                jnp.all(jnp.isfinite(u3)).astype(jnp.float32), "dp"),
        )
        return c2, u3, diag, metrics

    def wrapped(carries, q0s, u0s, other_cars, ts):
        return step(carries, q0s, u0s, other_cars, ts)

    return wrapped


def shard_batch_dp(tree, mesh: Mesh):
    """Place a batch pytree with its leading axis sharded over dp (and
    replicated over tp)."""
    def put(x):
        spec = P(*(("dp",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


from pigeon_tpu.parallel.mesh import replicate  # noqa: E402  (shared helper)
