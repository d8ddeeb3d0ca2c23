"""Scale-out: scenario batching over a device mesh.

The reference is single-process / single-threaded on the hot path; its only
"distributed backend" is ROS pub/sub between OS processes (SURVEY.md §2
"Parallelism inventory", reference `src/ros_integration.jl:158-169`).  The
TPU build *creates* the scaling axes:

- **data parallel (primary)**: thousands of independent MPC scenario
  instances batched per chip via `vmap`, sharded across chips/hosts with
  `jax.sharding.NamedSharding` over a Mesh; XLA inserts the (nil, for pure
  DP) collectives and the per-shard work runs on ICI-connected devices.
- metric aggregation across the mesh is a `psum`-shaped reduction done by
  jnp reductions over sharded arrays (XLA lowers to ICI all-reduce).

All controller state is an explicit pytree (`MPCCarry`), so scaling is
"shard the leading axis of everything" — no parameter servers, no
cross-instance communication on the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import mpc as mpc_mod
from pigeon_tpu import trajectory as trj
from pigeon_tpu.compile import tpu_jit


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D scenario-parallel mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a batch pytree with its leading axis sharded over `axis`."""
    def put(x):
        spec = P(*((axis,) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)


class BatchState(NamedTuple):
    carry: mpc_mod.MPCCarry     # leading batch axis on every leaf
    q: jnp.ndarray              # (B, 6) plant states
    u: jnp.ndarray              # (B, 3) commands in effect


class BatchedController:
    """Batched (and optionally mesh-sharded) closed-loop controller: the
    Monte-Carlo / fleet-scale execution engine (BASELINE.json
    `dynamic_obstacle` config: 10k batched scenario rollouts).

    One shared trajectory tube + HJI cache (replicated), B independent
    scenario states (sharded).  `step` advances every scenario one control
    period; `rollout` scans n steps on device.
    """

    def __init__(self, cfg: mpc_mod.MPCConfig, tube: trj.TrajectoryTube,
                 cache: hji_mod.HJICache | None = None,
                 mesh: Mesh | None = None, dt: float = 0.01):
        self.cfg = cfg
        self.dt = dt
        self.mesh = mesh
        self.tube = tube
        self.cache = cache if cache is not None else hji_mod.inactive_cache()
        if mesh is not None:
            self.tube = replicate(self.tube, mesh)
            self.cache = replicate(self.cache, mesh)

        cfg_ = self.cfg

        # tube/cache are ARGUMENTS of the jitted programs, not closure
        # constants: a closed-over production HJI cache (~300 MB of V +
        # gradV) would be embedded into the serialized HLO, which blows
        # past compile-request size limits on remote-compile backends
        # (HTTP 413 through the axon tunnel) and bloats the executable.
        def _step(tube_, cache_, state: BatchState, other_car, t):
            B_ = state.q.shape[0]
            ts_b = jnp.broadcast_to(jnp.asarray(t, state.q.dtype), (B_,))
            carry, u3, diag = mpc_mod.mpc_step_batched(
                cfg_, tube_, cache_, state.carry, state.q, state.u,
                other_car, ts_b)
            import pigeon_tpu.discretize as dz
            import pigeon_tpu.dynamics as dyn

            def f(qq, ur):
                return dyn.vehicle_ode(cfg_.veh, "bicycle", qq, ur[:2],
                                       ur[2:])

            def plant(q, u):
                ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                                      jnp.zeros(4, q.dtype)])
                return dz.propagate(f, q, ur, dt, cfg_.sim_substeps)

            q_next = jax.vmap(plant)(state.q, state.u)
            return BatchState(carry=carry, q=q_next, u=u3), diag

        # tpu_jit (not plain jit): the lane/MXU solver kernels need the
        # raised scoped-VMEM budget on TPU backends (compile.py)
        self._step = tpu_jit(_step)

        def _advance_other(oc):
            # constant-velocity human prediction (the dynamic_obstacle
            # config; heading measured from N like the ego convention)
            E, N, psi, V = oc[..., 0], oc[..., 1], oc[..., 2], oc[..., 3]
            return jnp.stack([E - V * jnp.sin(psi) * dt,
                              N + V * jnp.cos(psi) * dt, psi, V], axis=-1)

        def _rollout(tube_, cache_, state: BatchState, other_car, t0,
                     n_steps):
            def body(carry_st, i):
                st, oc = carry_st
                st, diag = _step(tube_, cache_, st, oc, t0 + i * dt)
                return (st, _advance_other(oc)), (st.q, st.u, oc, diag)
            (state, _), out = jax.lax.scan(
                body, (state, other_car), jnp.arange(n_steps))
            return state, out

        self._rollout = tpu_jit(_rollout, static_argnums=(5,))

    def init_state(self, q0_batch, u0_batch=None) -> BatchState:
        B = q0_batch.shape[0]
        dtype = q0_batch.dtype
        carry = mpc_mod.init_carry(self.cfg, dtype=dtype)
        carry_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)
        u0 = (jnp.zeros((B, 3), dtype) if u0_batch is None else u0_batch)
        state = BatchState(carry=carry_b, q=q0_batch, u=u0)
        if self.mesh is not None:
            state = shard_batch(state, self.mesh)
        return state

    def step(self, state: BatchState, other_car=None, t=0.0):
        if other_car is None:
            B = state.q.shape[0]
            other_car = jnp.broadcast_to(
                jnp.asarray([1e4, 1e4, 0.0, 0.0], state.q.dtype), (B, 4))
        return self._step(self.tube, self.cache, state, other_car,
                          jnp.asarray(t, state.q.dtype))

    def rollout(self, state: BatchState, n_steps: int, other_car=None,
                t0=0.0):
        """t0 may be a scalar or a (B,) array of per-scenario start times
        (the dynamic_obstacle Monte-Carlo engine anchors each scenario at
        its own sampled path time)."""
        if other_car is None:
            B = state.q.shape[0]
            other_car = jnp.broadcast_to(
                jnp.asarray([1e4, 1e4, 0.0, 0.0], state.q.dtype), (B, 4))
        return self._rollout(self.tube, self.cache, state, other_car,
                             jnp.asarray(t0, state.q.dtype), n_steps)
