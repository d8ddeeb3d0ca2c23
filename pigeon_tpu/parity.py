"""Parity harness: deviation-set vs reference-faithful closed loops.

BASELINE.md's accuracy target is "control sequences matched within
tolerance vs Pigeon `vanilla_mpc` on the X1 test paths".  The build ships
a small set of deliberate algorithmic deviations from the reference
(README "Notable design deviations"): a corrected inverse-tire formula, an
exact-expm discretization instead of single-step-RK4 jacfwd linearization,
and an actuation clamp on the published command.  This module quantifies
those deviations: it configures a REFERENCE-FAITHFUL mode (replicating the
reference's `_invfialatiremodel` without the 3*Fy_max/Ca factor,
`src/vehicle_dynamics.jl:56-62`; jacfwd-RK4 single-step ZOH/FOH
linearization, `src/coupled_lat_long.jl:253,262`; raw unclamped commands,
`src/coupled_lat_long.jl:370-374`) and runs both modes through the same
fp64 closed loop (`mpc.simulate` mirroring
`src/model_predictive_control.jl:80-100`) on the recorded X1 `.world`
paths, reporting per-path control-sequence deltas max|d delta|, max|d Fx|.

Run `python -m pigeon_tpu.parity` for the full 8-path x 2-formulation
table (the README parity table); `tests/test_parity.py` pins a subset in
CI.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import mpc as mpc_mod
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import SolverOptions

REFERENCE_PATHS = "/root/reference/test/path"
ALL_WORLDS = ("skidpadoval", "newskidpadoval", "flidpadoval", "paddockoval",
              "EastPaddock", "westpaddock", "curvy", "vail")

# Solver settings for parity runs: tight tolerance, big budget, exact
# factorization — the "OSQP with its full iteration budget" analog, so
# solver differences do not pollute the algorithmic comparison.  10000:
# vail's low-speed (stiff) QPs run 300-1800 iterations on typical steps
# and occasionally spiked past the old 4000 cap even with a stable
# faithful discretization; early exit (check_every=50) makes the raised
# cap free on healthy steps.
PARITY_SOLVER = SolverOptions(eps_abs=1e-6, eps_rel=1e-6, max_iter=10000,
                              check_every=50, backend="xla",
                              factor_method="chol", scaling_iters=10)


def stiff_eigenvalue(veh, V: float, kappa: float = 0.02) -> complex:
    """Dominant (most negative) eigenvalue of the continuous tracking
    dynamics linearized at the trim for speed V — the lateral tire
    relaxation mode, which scales like -Ca/(m*Ux): SLOW paths are the
    STIFF ones."""
    from pigeon_tpu import dynamics as dyn

    est = dyn.steady_state_estimates(veh, V, 0.0, kappa)
    q = jnp.asarray([0.0, est.Ux, est.Uy, est.r, -est.beta, 0.0],
                    jnp.float64)
    ur = jnp.asarray([est.delta, est.Fxf + est.Fxr, V, kappa, 0.0, 0.0],
                     jnp.float64)
    J = jax.jacfwd(lambda q_: dyn.vehicle_ode(veh, "tracking", q_,
                                              ur[:2], ur[2:]))(q)
    ev = np.linalg.eigvals(np.asarray(J))
    return complex(ev[np.argmax(np.abs(ev.real))])


def rk4_amplification(z: complex) -> float:
    """|R(z)| of the classical RK4 stability polynomial."""
    R = 1 + z + z ** 2 / 2 + z ** 3 / 6 + z ** 4 / 24
    return abs(R)


def stable_substeps(veh, tube: trj.TrajectoryTube, dt_long: float = 0.2,
                    target_R: float = 0.8) -> int:
    """Minimum RK4 substep count over dt_long that keeps the faithful
    linearization inside the RK4 stability region at the path's SLOWEST
    speed (with margin target_R < 1).

    Measured motivation (round 5, the vail parity gap): at vail's
    V_min = 2.7 m/s the stiff mode is lambda = -98.7/s, so
    lin_substeps=4 gives |R(lambda*0.05)| = 12.9 — the round-4
    "stabilized" table was amplifying 12.9x per long stage on vail
    (solver conv 0.73, QP matrices swinging 2.4 -> 620 in max|A| step
    to step); westpaddock sat at the margin (|R| = 0.69, one missed
    step).  substeps=8 yields |R| <= 0.62 on every recorded path."""
    n = int(tube.n_valid)
    V_min = float(np.min(np.asarray(tube.V)[:n]))
    lam = stiff_eigenvalue(veh, max(V_min, 1.0))
    for sub in (1, 2, 4, 8, 16, 32):
        if rk4_amplification(lam * dt_long / sub) <= target_R:
            return sub
    return 64


def faithful_config(cfg: mpc_mod.MPCConfig,
                    lin_substeps: int = 1) -> mpc_mod.MPCConfig:
    """The reference-faithful variant of `cfg`.

    lin_substeps=1 is the literal reference algorithm (one RK4 step per
    stage through `DifferentialDynamicsModels.propagate`); note the
    resulting long-horizon (dt_long=0.2) discrete models AMPLIFY the stiff
    lateral tire modes (|R(lambda h)| >> 1) — that instability is the
    reference's, reproduced deliberately.  Only meaningful for the coupled
    formulation; the reference decoupled controller already uses the exact
    double-linearization this build defaults to.
    """
    return dataclasses.replace(
        cfg, tire_inverse="reference", lin_method="rk4",
        lin_substeps=lin_substeps, clamp_commands=False,
        solver=PARITY_SOLVER)


def deviation_config(cfg: mpc_mod.MPCConfig) -> mpc_mod.MPCConfig:
    """The deviation set under the same parity solver settings."""
    return dataclasses.replace(cfg, solver=PARITY_SOLVER)


class ParityResult(NamedTuple):
    path: str
    formulation: str
    n_steps: int
    prefix_steps: int          # mutually-converged prefix the deltas cover
    max_d_delta_rad: float     # max |delta_dev - delta_faithful| on prefix
    max_d_Fx_N: float          # max |Fx_dev - Fx_faithful| on prefix
    rms_d_delta_rad: float
    rms_d_Fx_N: float
    max_e_faithful_m: float    # faithful closed-loop tracking error (full)
    max_e_deviation_m: float
    conv_frac_faithful: float  # solver convergence rate over the full run
    conv_frac_deviation: float
    faithful_finite: bool
    deviation_finite: bool


def run_closed_loop(cfg: mpc_mod.MPCConfig, world: str, n_steps: int,
                    pad_to: int = 1024, start_t: float = 0.5,
                    offset_e: float = 0.3, offset_psi: float = 0.03):
    """fp64 closed loop on a `.world` path from a perturbed start pose
    (lateral offset + heading error, so the comparison exercises the
    transient, not just the on-path equilibrium).

    Returns (u_log (n,3), e_log (n,), q_log)."""
    tube = trj.tube_from_world(
        os.path.join(REFERENCE_PATHS, world + ".world"), pad_to=pad_to)
    cache = hji_mod.inactive_cache()
    node = trj.eval_time(tube, start_t)
    psi = float(node.psi)
    # left-normal offset (e > 0 is left of path), normal taken from the
    # local path tangent in (E, N)
    node2 = trj.eval_arclength(tube, float(node.s) + 0.5)
    tx, ty = float(node2.E) - float(node.E), float(node2.N) - float(node.N)
    tn = np.hypot(tx, ty)
    nx, ny = -ty / tn, tx / tn           # left normal
    E0 = float(node.E) + offset_e * nx
    N0 = float(node.N) + offset_e * ny
    q0 = jnp.asarray([E0, N0, psi + offset_psi, node.V, 0.0, 0.0],
                     jnp.float64)
    log = mpc_mod.simulate(cfg, tube, cache, q0, dt=0.01, n_steps=n_steps)
    return (np.asarray(log.u), np.asarray(log.diag.e), np.asarray(log.q),
            np.asarray(log.diag.converged))


def compare(world: str, formulation: str = "coupled", n_steps: int = 200,
            lin_substeps: int = 1, hz=None) -> ParityResult:
    """Deviation-set vs reference-faithful control sequences on one path."""
    base = (mpc_mod.x1_coupled_config() if formulation == "coupled"
            else mpc_mod.x1_decoupled_config())
    if hz is not None:
        base = dataclasses.replace(base, hz=hz)
    u_dev, e_dev, _, c_dev = run_closed_loop(deviation_config(base), world,
                                             n_steps)
    u_fai, e_fai, _, c_fai = run_closed_loop(
        faithful_config(base, lin_substeps), world, n_steps)

    # Deltas are meaningful only while BOTH solvers converge: once either
    # run publishes a max-iteration garbage iterate (which the reference's
    # OSQP does too — finite non-converged solutions poison its warm
    # starts the same way), the closed loops decouple chaotically.
    both = c_dev & c_fai
    bad = np.nonzero(~both)[0]
    prefix = int(bad[0]) if bad.size else n_steps
    prefix = max(prefix, 1)
    sl = slice(0, prefix)

    d_delta = np.abs(u_dev[sl, 0] - u_fai[sl, 0])
    Fx_dev = u_dev[sl, 1] + u_dev[sl, 2]
    Fx_fai = u_fai[sl, 1] + u_fai[sl, 2]
    d_Fx = np.abs(Fx_dev - Fx_fai)
    return ParityResult(
        path=world, formulation=formulation, n_steps=n_steps,
        prefix_steps=prefix,
        max_d_delta_rad=float(np.max(d_delta)),
        max_d_Fx_N=float(np.max(d_Fx)),
        rms_d_delta_rad=float(np.sqrt(np.mean(d_delta ** 2))),
        rms_d_Fx_N=float(np.sqrt(np.mean(d_Fx ** 2))),
        max_e_faithful_m=float(np.max(np.abs(e_fai))),
        max_e_deviation_m=float(np.max(np.abs(e_dev))),
        conv_frac_faithful=float(np.mean(c_fai)),
        conv_frac_deviation=float(np.mean(c_dev)),
        faithful_finite=bool(np.all(np.isfinite(u_fai))),
        deviation_finite=bool(np.all(np.isfinite(u_dev))),
    )


def _main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--paths", nargs="*", default=list(ALL_WORLDS))
    ap.add_argument("--formulations", nargs="*",
                    default=["coupled", "decoupled"])
    ap.add_argument("--lin-substeps", type=int, default=1)
    args = ap.parse_args()

    jax.config.update("jax_enable_x64", True)
    rows = []
    for form in args.formulations:
        for w in args.paths:
            r = compare(w, form, args.steps, args.lin_substeps)
            rows.append(r._asdict())
            print(json.dumps(r._asdict()), flush=True)
    # markdown table for the README
    print("\n| path | form | prefix | max dDelta (mrad) | max dFx (N) | "
          "rms dDelta (mrad) | rms dFx (N) | max e faith (mm) | "
          "max e dev (mm) | conv faith | conv dev |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['path']} | {r['formulation']} "
              f"| {r['prefix_steps']}/{r['n_steps']} "
              f"| {1e3*r['max_d_delta_rad']:.2f} | {r['max_d_Fx_N']:.0f} "
              f"| {1e3*r['rms_d_delta_rad']:.3f} | {r['rms_d_Fx_N']:.1f} "
              f"| {1e3*r['max_e_faithful_m']:.1f} "
              f"| {1e3*r['max_e_deviation_m']:.1f} "
              f"| {r['conv_frac_faithful']:.2f} "
              f"| {r['conv_frac_deviation']:.2f} |")


if __name__ == "__main__":
    _main()
