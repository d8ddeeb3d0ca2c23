"""Safety A/B: Monte-Carlo `dynamic_obstacle` with the SOLVED HJI cache,
filter ON vs OFF (VERDICT r2 item 4; the IJRR paper's experimental point,
reference README.md:48-57 + src/HJI_computation.jl:160-170).

Three arms over the same scenario set:
  off     — HJI rows disabled, no override (vanilla coupled MPC)
  feather — HJI half-plane rows in the QP (least-restrictive filtering)
  hammer  — feather + the bang-bang optimal-control override when
            V(x_rel) <= eps (reference `use_HJI_policy`)

Writes SAFETY_AB.json; the headline is collision_frac(on) <
collision_frac(off) with min-separation and activation stats alongside.

Usage: python scripts/exp_safety_ab.py [--scenarios 512] [--steps 300]
       [--cache assets/hji_cache_proto.npz]
"""

import argparse
import dataclasses
import json

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

from pigeon_tpu import hji_solve as HS  # noqa: E402
from pigeon_tpu import montecarlo as mc  # noqa: E402
from pigeon_tpu import mpc as M  # noqa: E402
from pigeon_tpu import trajectory as trj  # noqa: E402
from pigeon_tpu.config import SolverOptions  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=512)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cache", default="/root/repo/assets/hji_cache_proto.npz")
    ap.add_argument("--collision-threshold", type=float, default=2.5)
    ap.add_argument("--gap-min", type=float, default=8.0)
    ap.add_argument("--gap-max", type=float, default=30.0)
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    cache = HS.load_cache(args.cache)
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    # adversarial-ish sampling: oncoming car close and near the lane
    scen = mc.sample_scenarios(tube, args.scenarios, seed=7,
                               oncoming_gap=(args.gap_min, args.gap_max),
                               oncoming_lateral=(-1.0, 1.0))

    solver = SolverOptions(
        max_iter=150, check_every=150, eps_abs=1e-3, eps_rel=1e-3,
        backend=("lanes" if platform == "tpu" else "xla"),
        scaling_iters=2, pallas_check_inner=10)

    arms = {
        "off": dict(use_hji=False, policy=False),
        "feather": dict(use_hji=True, policy=False),
        "hammer": dict(use_hji=True, policy=True),
    }
    out = {"metric": "hji_safety_ab", "platform": platform,
           "scenarios": args.scenarios, "steps": args.steps,
           "collision_threshold_m": args.collision_threshold,
           "cache": args.cache}
    for name, a in arms.items():
        cfg = M.x1_coupled_config(soft=True)
        cfg = dataclasses.replace(
            cfg, solver=solver, use_hji_policy=a["policy"],
            coupled=dataclasses.replace(cfg.coupled, use_hji=a["use_hji"]))
        s = mc.run_dynamic_obstacle(
            cfg, tube, cache, scen, n_steps=args.steps,
            collision_threshold=args.collision_threshold)
        out[name] = {
            "collision_frac": round(s.collision_frac, 4),
            "min_separation_m": round(s.min_separation_m, 3),
            "hji_active_frac": round(s.hji_active_frac, 4),
            "tracking_e_p99_m": round(s.tracking_e_p99, 4),
            "converged_frac": round(s.converged_frac, 4),
            "controls_finite": s.controls_finite,
        }
        print(json.dumps({name: out[name]}), flush=True)

    out["collision_reduction_feather"] = round(
        out["off"]["collision_frac"] - out["feather"]["collision_frac"], 4)
    out["collision_reduction_hammer"] = round(
        out["off"]["collision_frac"] - out["hammer"]["collision_frac"], 4)
    with open("/root/repo/SAFETY_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
