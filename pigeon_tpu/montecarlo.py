"""Monte-Carlo scenario engine: the `dynamic_obstacle` configuration.

BASELINE.json config 5: "10k batched scenario rollouts (human-car
constant-velocity prediction) across a multi-host pod slice".  The
reference ran ONE controller against ONE live human car over ROS
(`src/ros_integration.jl:153-155`); the TPU build turns this into a
batched study: thousands of perturbed (ego, human) initial conditions roll
out in closed loop simultaneously, the HJI filter active per scenario, and
safety/tracking statistics are reduced on device (the psum-shaped
aggregations of SURVEY.md §5 observability).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import mpc as mpc_mod
from pigeon_tpu import trajectory as trj
from pigeon_tpu.parallel.mesh import BatchedController


class ScenarioSet(NamedTuple):
    q0: jnp.ndarray          # (B, 6) ego initial states
    other0: jnp.ndarray      # (B, 4) human car initial states (E,N,psi,V)
    t0: jnp.ndarray          # (B,) initial path times


def sample_scenarios(tube: trj.TrajectoryTube, B: int,
                     seed: int = 0,
                     speed: float = 6.0,
                     pos_noise: float = 0.5,
                     psi_noise: float = 0.05,
                     oncoming_gap: tuple = (15.0, 60.0),
                     oncoming_lateral: tuple = (-2.0, 2.0),
                     dtype=jnp.float32) -> ScenarioSet:
    """Perturbed ego states along the path + an oncoming human car placed
    ahead with a lateral offset, driving back along the path direction."""
    rng = np.random.default_rng(seed)
    n = int(tube.n_valid)
    k = rng.integers(0, max(1, n - 100), B)
    E = np.asarray(tube.E)[k] + rng.uniform(-pos_noise, pos_noise, B)
    N = np.asarray(tube.N)[k] + rng.uniform(-pos_noise, pos_noise, B)
    psi = np.asarray(tube.psi)[k] + rng.uniform(-psi_noise, psi_noise, B)
    q0 = np.stack([E, N, psi, np.full(B, speed), np.zeros(B), np.zeros(B)],
                  axis=1)
    t0 = np.asarray(tube.t)[k]

    # human: `gap` meters further along the path, offset laterally,
    # heading back toward the ego
    gap = rng.uniform(*oncoming_gap, B)
    lat = rng.uniform(*oncoming_lateral, B)
    s_h = np.asarray(tube.s)[k] + gap
    node = jax.vmap(lambda s: trj.eval_arclength(tube, s))(
        jnp.asarray(s_h, dtype))
    psi_h = np.asarray(node.psi) + np.pi          # oncoming
    # lateral offset: left-normal of the path heading
    En = np.asarray(node.E) - lat * np.cos(np.asarray(node.psi))
    Nn = np.asarray(node.N) - lat * np.sin(np.asarray(node.psi))
    v_h = rng.uniform(2.0, 8.0, B)
    other0 = np.stack([En, Nn, psi_h, v_h], axis=1)
    return ScenarioSet(q0=jnp.asarray(q0, dtype),
                       other0=jnp.asarray(other0, dtype),
                       t0=jnp.asarray(t0, dtype))


class MonteCarloSummary(NamedTuple):
    n_scenarios: int
    n_steps: int
    min_separation_m: float        # fleet-wide minimum car-to-car distance
    collision_frac: float          # scenarios whose separation < threshold
    hji_active_frac: float         # step-fraction with the filter active
    tracking_e_p50: float
    tracking_e_p99: float
    converged_frac: float
    controls_finite: bool


def run_dynamic_obstacle(cfg: mpc_mod.MPCConfig, tube: trj.TrajectoryTube,
                         cache: hji_mod.HJICache, scen: ScenarioSet,
                         n_steps: int = 200, dt: float = 0.01,
                         collision_threshold: float = 2.5,
                         mesh=None) -> MonteCarloSummary:
    """Roll out every scenario in closed loop with a constant-velocity
    human; reduce the safety/tracking statistics on device."""
    ctrl = BatchedController(cfg, tube, cache=cache, mesh=mesh, dt=dt)
    state = ctrl.init_state(scen.q0)
    # Per-scenario start times: the coupled QP carries the
    # Q_ds*(s - s_ref(t))^2 objective term, so every scenario must be
    # anchored at its own sampled path time (a shared t0=0 would make
    # mid-path scenarios see Delta-s of tens of meters and brake to V_min).
    state, (q_log, u_log, oc_log, diag) = ctrl.rollout(
        state, n_steps, other_car=scen.other0, t0=scen.t0)

    sep = jnp.hypot(q_log[..., 0] - oc_log[..., 0],
                    q_log[..., 1] - oc_log[..., 1])     # (n_steps, B)
    min_sep_per = jnp.min(sep, axis=0)
    e_abs = jnp.abs(diag.e)
    return MonteCarloSummary(
        n_scenarios=int(scen.q0.shape[0]),
        n_steps=n_steps,
        min_separation_m=float(jnp.min(min_sep_per)),
        collision_frac=float(jnp.mean(
            (min_sep_per < collision_threshold).astype(jnp.float32))),
        hji_active_frac=float(jnp.mean(
            diag.hji_active.astype(jnp.float32))),
        tracking_e_p50=float(jnp.percentile(e_abs, 50)),
        tracking_e_p99=float(jnp.percentile(e_abs, 99)),
        converged_frac=float(jnp.mean(
            diag.converged.astype(jnp.float32))),
        controls_finite=bool(jnp.all(jnp.isfinite(u_log))),
    )
