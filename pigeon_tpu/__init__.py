"""pigeon_tpu — a TPU-native MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
StanfordASL/Pigeon.jl (reference mounted at /root/reference): a real-time
coupled lateral+longitudinal bicycle-model trajectory-tracking MPC with Fiala
tire dynamics, safe-driving-envelope stability constraints, and an HJI
reachability-based safety filter.

Design stance (see SURVEY.md §7): the reference's mutable-singleton +
parameter-rewriting-QP + ROS-callback architecture is replaced by a pure
functional, batched controller.  A single jitted

    mpc_step(params, traj, carry, obs) -> (carry, command, diagnostics)

runs the whole pipeline — path projection, linearization-node rollout, ZOH/FOH
linearization, QP assembly, batched ADMM (OSQP-style) solve, control
extraction, HJI filtering — as one XLA program.  The batch axis is scenarios;
device meshes shard the batch (data parallel) via `jax.sharding`.
"""

from pigeon_tpu import math_utils
from pigeon_tpu.config import (
    VehicleParams,
    CoupledControlParams,
    DecoupledControlParams,
    HorizonParams,
    SolverOptions,
    x1_params,
)
from pigeon_tpu import dynamics
from pigeon_tpu import trajectory
from pigeon_tpu import discretize
from pigeon_tpu import hji
from pigeon_tpu import qp
from pigeon_tpu import solver
from pigeon_tpu import mpc
from pigeon_tpu.mpc import (MPCConfig, MPCCarry, init_carry, mpc_step,
                            simulate, x1_coupled_config, x1_decoupled_config)

__version__ = "0.1.0"
