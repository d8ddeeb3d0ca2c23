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

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
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


def certify_avoidable(veh, scen: ScenarioSet, n_steps: int = 500,
                      dt: float = 0.01, threshold: float = 2.5,
                      margin: float = 0.5):
    """Per-scenario avoidability certificate (VERDICT r4 item 1c).

    Rolls out a menu of OPEN-LOOP evasion policies — constant
    (steering, Fx) pairs spanning bang-bang left/right at several
    braking levels, each clamped through the actuation limits — under
    the full nonlinear bicycle dynamics against the same
    constant-velocity human the Monte-Carlo uses, and certifies a
    scenario "avoidable" if ANY policy keeps car-to-car separation
    above threshold + margin for the whole episode.

    This makes the safety A/B's headline measurable: on the certified
    subset a perfect filter could drive collision_frac to ~0, so the
    off-vs-on reduction there quantifies the filter itself rather than
    the unavoidable-start mass (near-head-on sampling makes that mass
    large: uncertified scenarios are ones where even full-lock evasion
    from t=0 collides).

    Returns (avoidable_mask (B,) bool, best_policy_sep (B,) meters).
    """
    d = veh.delta_max
    menu = jnp.asarray([
        [d, 0.0], [-d, 0.0],
        [d, veh.Fx_min], [-d, veh.Fx_min],
        [0.5 * d, veh.Fx_min], [-0.5 * d, veh.Fx_min],
        [0.0, veh.Fx_min],
        [d, 0.5 * veh.Fx_min], [-d, 0.5 * veh.Fx_min],
    ], scen.q0.dtype)                                   # (K, 2)
    K = menu.shape[0]

    def plant(q, u2):
        # clamp through the actuation envelope each step (the commanded
        # policy may exceed the power curve at speed)
        u2c = dyn.apply_control_limits(veh, u2, q[3])
        Fxf, Fxr = dyn.longitudinal_split(veh, u2c[1])
        ur = jnp.concatenate([jnp.stack([u2c[0], Fxf + Fxr]),
                              jnp.zeros(4, q.dtype)])

        def f(q_, ur_):
            return dyn.vehicle_ode(veh, "bicycle", q_, ur_[:2], ur_[2:])
        return dz.propagate(f, q, ur, dt)

    def one_policy_min_sep(q0, oc0, u2):
        def body(carry, _):
            q, oc = carry
            E, N, psi, V = oc[0], oc[1], oc[2], oc[3]
            oc_n = jnp.stack([E - V * jnp.sin(psi) * dt,
                              N + V * jnp.cos(psi) * dt, psi, V])
            q_n = plant(q, u2)
            sep = jnp.hypot(q_n[0] - oc_n[0], q_n[1] - oc_n[1])
            return (q_n, oc_n), sep

        _, seps = jax.lax.scan(body, (q0, oc0), None, length=n_steps)
        sep0 = jnp.hypot(q0[0] - oc0[0], q0[1] - oc0[1])
        return jnp.minimum(jnp.min(seps), sep0)

    @jax.jit
    def run(q0s, oc0s):
        per_policy = jax.vmap(
            lambda q0, oc0: jax.vmap(
                lambda u2: one_policy_min_sep(q0, oc0, u2))(menu)
        )(q0s, oc0s)                                     # (B, K)
        best = jnp.max(per_policy, axis=-1)
        return best >= threshold + margin, best

    return run(scen.q0, scen.other0)


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


class PerScenario(NamedTuple):
    """Per-scenario rollout outcomes (for certified-subset analysis)."""

    min_separation_m: jnp.ndarray   # (B,)
    collided: jnp.ndarray           # (B,) bool
    converged_frac: jnp.ndarray     # (B,) step-fraction converged
    hji_active_frac: jnp.ndarray    # (B,)
    V_min: jnp.ndarray              # (B,) minimum finite V seen (inf if none)


def run_dynamic_obstacle(cfg: mpc_mod.MPCConfig, tube: trj.TrajectoryTube,
                         cache: hji_mod.HJICache, scen: ScenarioSet,
                         n_steps: int = 200, dt: float = 0.01,
                         collision_threshold: float = 2.5,
                         mesh=None, per_scenario: bool = False):
    """Roll out every scenario in closed loop with a constant-velocity
    human; reduce the safety/tracking statistics on device.

    per_scenario=True additionally returns a `PerScenario` record
    (summary, per) so callers can slice outcomes by an external mask
    (e.g. the `certify_avoidable` certificate)."""
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
    if per_scenario:
        Vh = diag.V_hji                                  # (n_steps, B)
        V_min = jnp.min(jnp.where(jnp.isfinite(Vh), Vh, jnp.inf), axis=0)
        per = PerScenario(
            min_separation_m=min_sep_per,
            collided=min_sep_per < collision_threshold,
            converged_frac=jnp.mean(
                diag.converged.astype(jnp.float32), axis=0),
            hji_active_frac=jnp.mean(
                diag.hji_active.astype(jnp.float32), axis=0),
            V_min=V_min)
        return _summary(scen, n_steps, min_sep_per, e_abs, diag, u_log,
                        collision_threshold), per
    return _summary(scen, n_steps, min_sep_per, e_abs, diag, u_log,
                    collision_threshold)


def _summary(scen, n_steps, min_sep_per, e_abs, diag, u_log,
             collision_threshold):
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
