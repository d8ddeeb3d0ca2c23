"""Host-side real-time control loop: the functional analog of the
reference's ROS node (`src/ros_integration.jl`).

The reference's `/from_autobox` callback IS the control loop (SURVEY.md
§3.1): ingest the state estimate, run the 4-phase MPC, apply HJI override
and NaN fallback, publish `/to_autobox`.  Here the same semantics live in
`ControllerRuntime.on_state`, with the MPC step a single jitted device
program and all gating checks (`pre_flag`, trajectory time window,
low-speed pause, heartbeat tracking) on the host where they belong.

Transport is pluggable: in-process calls for simulation, or the native UDP
autobox link (`pigeon_tpu.runtime.transport`) replacing the reference's
rospy/roscpp process boundary.
"""

from __future__ import annotations

import dataclasses
import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import mpc as mpc_mod
from pigeon_tpu import trajectory as trj
from pigeon_tpu.compile import tpu_jit

log = logging.getLogger("pigeon_tpu.runtime")


@dataclasses.dataclass
class FromAutobox:
    """State-estimate message (reference `from_autobox` msg fields used at
    `src/ros_integration.jl:50-52,70,78,88`)."""

    seq: int
    stamp: float
    E_m: float
    N_m: float
    psi_rad: float
    ux_mps: float
    uy_mps: float
    r_radps: float
    pre_flag: int = 1


@dataclasses.dataclass
class ToAutobox:
    """Command message (reference `to_autobox` fill,
    `src/ros_integration.jl:126-133`)."""

    stamp: float
    post_flag: int
    heartbeat: int
    s_m: float
    e_m: float
    delta_cmd_rad: float
    fxf_cmd_N: float
    fxr_cmd_N: float


class ControllerRuntime:
    """Stateful host loop around the pure `mpc_step`.

    Mirrors the reference's mutable node state: latest trajectory +
    tracking mode (`src/ros_integration.jl:28-41`), heartbeat
    (`:88-92,112`), other-car state (`:153-155`), HJI policy flag (`:47`).

    Like the reference node, the runtime holds TWO controllers and selects
    per control period by tracking mode: the decoupled (path) controller in
    `:path` mode, the coupled (trajectory) controller in `:traj` mode
    (reference `src/ros_integration.jl:48-49`, singletons
    `src/Pigeon.jl:34-35`).  The HJI "hammer" override is additionally
    gated on `:traj` mode (reference `:115-116`).  Passing a single `cfg`
    uses it for both modes (single-controller runtime, useful for tests
    and single-formulation deployments).
    """

    def __init__(self, cfg: Optional[mpc_mod.MPCConfig] = None,
                 cache: Optional[hji_mod.HJICache] = None,
                 tube: Optional[trj.TrajectoryTube] = None,
                 use_hji_policy: bool = False,
                 pad_to: int = 1024,
                 cfg_path: Optional[mpc_mod.MPCConfig] = None,
                 cfg_traj: Optional[mpc_mod.MPCConfig] = None,
                 warmup: bool = True,
                 step_budget_s: float = 0.010):
        if cfg is not None:
            cfg_path = cfg_path if cfg_path is not None else cfg
            cfg_traj = cfg_traj if cfg_traj is not None else cfg
        else:
            # reference module-load singletons X1DMPC / X1CMPC
            # (src/Pigeon.jl:34-35)
            cfg_path = (cfg_path if cfg_path is not None
                        else mpc_mod.x1_decoupled_config())
            cfg_traj = (cfg_traj if cfg_traj is not None
                        else mpc_mod.x1_coupled_config())
        if use_hji_policy and not cfg_traj.use_hji_policy:
            cfg_traj = dataclasses.replace(cfg_traj, use_hji_policy=True)
        # HJI override only ever fires in :traj mode (reference :115):
        # strip the policy flag from the path-mode program.
        if cfg_path.use_hji_policy:
            cfg_path = dataclasses.replace(cfg_path, use_hji_policy=False)
        self.cfgs = {"path": cfg_path, "traj": cfg_traj}
        self.cfg = cfg_traj          # primary/legacy accessor
        self.cache = cache if cache is not None else hji_mod.inactive_cache()
        self.pad_to = pad_to
        # default trajectory mirrors the module-load singleton
        # (straight_trajectory(30, 5), reference src/Pigeon.jl:34-35)
        self.tube = tube if tube is not None else trj.straight_trajectory(
            30.0, 5.0, pad_to=pad_to)
        self.tracking_mode = "path"          # :path | :traj
        self.time_offset = math.nan
        self.use_hji_policy = use_hji_policy
        self.heartbeat = 0
        self.other_car = jnp.asarray([1e4, 1e4, 0.0, 0.0], jnp.float32)
        self.carries = {m: mpc_mod.init_carry(c, dtype=jnp.float32)
                        for m, c in self.cfgs.items()}
        self.last_command = ToAutobox(0.0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)

        def make_step(c):
            # tpu_jit: solver kernels need the raised scoped-VMEM budget
            return tpu_jit(
                lambda tube, carry, q0, u0, oc, t: mpc_mod.mpc_step(
                    c, tube, self.cache, carry, q0, u0, oc, t))
        self._steps = {m: make_step(c) for m, c in self.cfgs.items()}
        self._project = tpu_jit(
            lambda tube, x: trj.path_coordinates(tube, x))

        # per-step wall timing vs the hard real-time budget (reference
        # @elapsed + >10 ms logwarn, src/ros_integration.jl:94,105-109)
        self.step_budget_s = step_budget_s
        self.budget_violations = 0
        self._step_times = []                  # rolling window (s)
        self._step_times_max = 1024

        if warmup:
            self.warmup()

    def warmup(self):
        """Construction-time dry runs of every jitted program (BOTH mode
        controllers + the projection), so the first real control period
        does not eat the compile (reference `__init__` warm-runs the full
        pipeline for exactly this reason, src/Pigeon.jl:44-58).  Device
        results are blocked on; carries are restored untouched."""
        import time as _time

        t0 = _time.perf_counter()
        q0 = jnp.asarray([float(self.tube.E[0]), float(self.tube.N[0]),
                          float(self.tube.psi[0]),
                          max(float(self.tube.V[0]), 2.0), 0.0, 0.0],
                         jnp.float32)
        u0 = jnp.zeros(3, jnp.float32)
        jax.block_until_ready(self._project(self.tube, q0[:2]))
        for m, step in self._steps.items():
            carry, u3, diag = step(self.tube, self.carries[m], q0, u0,
                                   self.other_car,
                                   jnp.asarray(0.0, jnp.float32))
            jax.block_until_ready(u3)
        log.info("warmup compiled %d programs in %.1f s",
                 len(self._steps) + 1, _time.perf_counter() - t0)

    @property
    def carry(self):
        """Carry of the currently-selected controller."""
        return self.carries[self.tracking_mode]

    @carry.setter
    def carry(self, value):
        self.carries[self.tracking_mode] = value

    # -- trajectory ingest (reference nominal_trajectory_callback,
    #    src/ros_integration.jl:30-41) ------------------------------------
    def set_path(self, tube: trj.TrajectoryTube):
        """Spatial path (`/des_path`): path-tracking mode, time recovered
        by projection each step.  Drops the path controller's warm start
        (reference `src/ros_integration.jl:30-34`)."""
        self.tube = tube
        self.tracking_mode = "path"
        self.time_offset = math.nan
        self.carries["path"] = self.carries["path"]._replace(
            solved=jnp.asarray(False))

    def set_trajectory(self, tube: trj.TrajectoryTube, stamp: float):
        """Timed trajectory (`/des_traj`): planner time is meaningful.
        Drops the trajectory controller's warm start (reference `:36-41`)."""
        self.tube = tube
        self.tracking_mode = "traj"
        self.time_offset = float(stamp)
        self.carries["traj"] = self.carries["traj"]._replace(
            solved=jnp.asarray(False))

    def set_trajectory_msg(self, buf: bytes):
        """Wire-level `/des_traj` ingest: parse a serialized ROS1
        VehicleTrajectory message and switch to :traj mode with the
        header stamp as the time offset — the byte-for-byte twin of the
        reference's `nominal_trajectory_callback(msg::VehicleTrajectory)`
        (`src/ros_integration.jl:17-20,36-41`)."""
        tube, stamp = trj.tube_from_trajmsg_bytes(buf, pad_to=self.pad_to)
        self.set_trajectory(tube, stamp)

    def latency_stats(self) -> dict:
        """Measured end-to-end `on_state` MPC latency over the rolling
        window (the reference only warns past the budget; this also
        records the distribution)."""
        if not self._step_times:
            return {"n": 0}
        ts = np.asarray(self._step_times)
        return {
            "n": int(ts.size),
            "p50_ms": round(float(np.percentile(ts, 50)) * 1e3, 3),
            "p99_ms": round(float(np.percentile(ts, 99)) * 1e3, 3),
            "max_ms": round(float(ts.max()) * 1e3, 3),
            "budget_ms": self.step_budget_s * 1e3,
            "budget_violations": self.budget_violations,
        }

    def set_other_car(self, x: float, y: float, th: float, v: float):
        """reference other_car_callback (src/ros_integration.jl:153-155):
        note the theta - pi/2 heading convention shift."""
        self.other_car = jnp.asarray([x, y, th - math.pi / 2, v],
                                     jnp.float32)

    # -- the control loop -------------------------------------------------
    def on_state(self, msg: FromAutobox) -> Optional[ToAutobox]:
        """One control period.  Returns the command, or None when the MPC
        is gated off (reference gating ladder,
        src/ros_integration.jl:70-92)."""
        q0 = jnp.asarray([msg.E_m, msg.N_m, msg.psi_rad, msg.ux_mps,
                          msg.uy_mps, msg.r_radps], jnp.float32)
        u0 = jnp.asarray([self.last_command.delta_cmd_rad,
                          self.last_command.fxf_cmd_N,
                          self.last_command.fxr_cmd_N], jnp.float32)

        if msg.pre_flag == 0:
            log.info("pre_flag == 0, MPC inactive")
            return None
        if math.isnan(self.time_offset):
            _, _, t = (float(v) for v in self._project(self.tube, q0[:2]))
        else:
            t = msg.stamp - self.time_offset
            t_end = float(trj.end_time(self.tube))
            if t < 0 or t > t_end:
                log.info("time %.2f outside trajectory [0, %.2f]", t, t_end)
                return None
        if msg.ux_mps < 1.0:
            log.info("speed < 1 m/s, pausing MPC")
            return None
        missed = msg.seq - (self.heartbeat + 1)
        if missed != 0:
            log.warning("%d from_autobox messages lost", missed)
            self.heartbeat = msg.seq - 1

        import time as _time

        t_mpc = _time.perf_counter()
        mode = self.tracking_mode
        self.carries[mode], u3, diag = self._steps[mode](
            self.tube, self.carries[mode], q0, u0, self.other_car,
            jnp.asarray(t, jnp.float32))
        u3 = np.asarray(u3)                    # device sync included
        elapsed = _time.perf_counter() - t_mpc
        self._step_times.append(elapsed)
        if len(self._step_times) > self._step_times_max:
            del self._step_times[:len(self._step_times)
                                 - self._step_times_max]
        if elapsed > self.step_budget_s:
            # reference: logwarn past the 10 ms budget with the heartbeat
            # (src/ros_integration.jl:105-109)
            self.budget_violations += 1
            log.warning("MPC step exceeded budget: %.1f ms > %.1f ms "
                        "(heartbeat %d)", elapsed * 1e3,
                        self.step_budget_s * 1e3, self.heartbeat)
        self.heartbeat += 1
        cmd = ToAutobox(
            stamp=msg.stamp, post_flag=1, heartbeat=self.heartbeat,
            s_m=float(diag.s), e_m=float(diag.e),
            delta_cmd_rad=float(u3[0]), fxf_cmd_N=float(u3[1]),
            fxr_cmd_N=float(u3[2]))
        self.last_command = cmd
        return cmd

    def diagnostics_row(self, diag) -> dict:
        """Structured per-step metrics (the build's replacement for the
        reference's loginfo lines; SURVEY.md §5 observability)."""
        return {
            "heartbeat": self.heartbeat,
            "s": float(diag.s), "e": float(diag.e),
            "V_hji": float(diag.V_hji),
            "iterations": int(diag.iterations),
            "prim_res": float(diag.prim_res),
            "dual_res": float(diag.dual_res),
            "converged": bool(diag.converged),
        }
