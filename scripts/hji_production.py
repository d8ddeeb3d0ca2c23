"""Production-resolution 7-D HJI solve on the TPU + refinement study.

VERDICT r2 item 5: solve the avoid-set HJI-VI at >=2x-per-axis resolution
(the raised DEFAULT_SHAPE, 54M grid points), TIME it on-chip (per-sweep
and total — substantiating/correcting hji_solve.py's cost claims), and
quantify coarse->fine refinement deltas on the Monte-Carlo scenario set:
filter-activation agreement and constraint half-plane changes.

Artifacts: HJI_PROD.json (timings + refinement metrics) and
assets/hji_cache_proto.npz (the prototype-grid cache used by the safety
A/B and CI tests; the production cache is ~450 MB and is regenerated
on-device in ~a minute rather than committed).

Usage: python scripts/hji_production.py [--sweeps 400]
"""

import argparse
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from pigeon_tpu import hji as hji_mod
from pigeon_tpu import hji_solve as HS
from pigeon_tpu import montecarlo as mc
from pigeon_tpu import trajectory as trj
from pigeon_tpu.config import x1_params


def timed_solve(veh, shape, sweeps, fx_samples=15):
    t0 = time.perf_counter()
    cache, deltas = HS.solve_hji(veh, shape=shape, n_sweeps=sweeps,
                                 fx_samples=fx_samples)
    jax.block_until_ready(cache.V)
    total = time.perf_counter() - t0
    # re-run to split compile from execute
    t1 = time.perf_counter()
    cache, deltas = HS.solve_hji(veh, shape=shape, n_sweeps=sweeps,
                                 fx_samples=fx_samples)
    jax.block_until_ready(cache.V)
    run_s = time.perf_counter() - t1
    return cache, deltas, total, run_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=600)
    ap.add_argument("--scenarios", type=int, default=512)
    args = ap.parse_args()
    veh = x1_params()

    out = {"metric": "hji_production_solve",
           "platform": jax.devices()[0].platform}

    caches = {}
    for name, shape in (("proto", HS.PROTO_SHAPE),
                        ("production", HS.DEFAULT_SHAPE)):
        n_pts = int(np.prod(shape))
        cache, deltas, total_s, run_s = timed_solve(veh, shape,
                                                    args.sweeps)
        caches[name] = cache
        out[name] = {
            "shape": list(shape),
            "grid_points": n_pts,
            "sweeps": args.sweeps,
            "total_first_s": round(total_s, 2),
            "run_s": round(run_s, 2),
            "ms_per_sweep": round(run_s / args.sweeps * 1e3, 2),
            "final_delta_sup": float(deltas[-1]),
            "converged_1e-3": bool(deltas[-1] < 1e-3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    # ---- refinement study on the MC scenario set -------------------------
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    scen = mc.sample_scenarios(tube, args.scenarios, seed=1)
    x_rel = jax.vmap(lambda q, o: hji_mod.relative_state(q, o))(
        scen.q0, scen.other0)

    eps = 0.05
    rows = {}
    for name, cache in caches.items():
        V, gradV = jax.vmap(lambda x: hji_mod.interpolate(cache, x))(x_rel)
        u_lin = jnp.zeros((args.scenarios, 2), x_rel.dtype)
        M_, b_, V2, g2 = jax.vmap(
            lambda x, u: hji_mod.reachability_constraint(
                veh, cache, x, eps, u))(x_rel, u_lin)
        rows[name] = (np.asarray(V), np.asarray(M_), np.asarray(b_))
    Vc, Mc, bc = rows["proto"]
    Vf, Mf, bf = rows["production"]
    act_c, act_f = Vc <= eps, Vf <= eps
    both = act_c & act_f
    out["refinement"] = {
        "scenarios": args.scenarios,
        "active_frac_proto": round(float(act_c.mean()), 4),
        "active_frac_production": round(float(act_f.mean()), 4),
        "activation_agreement": round(float((act_c == act_f).mean()), 4),
        "V_mean_abs_delta": round(float(np.abs(Vf - Vc).mean()), 4),
        "V_p99_abs_delta": round(
            float(np.percentile(np.abs(Vf - Vc), 99)), 4),
        "halfplane_M_p99_delta_on_both_active": (
            round(float(np.percentile(
                np.abs(Mf - Mc).max(axis=-1)[both], 99)), 4)
            if both.any() else None),
        "halfplane_b_p99_delta_on_both_active": (
            round(float(np.percentile(np.abs(bf - bc)[both], 99)), 4)
            if both.any() else None),
    }

    os.makedirs("/root/repo/assets", exist_ok=True)
    HS.save_cache("/root/repo/assets/hji_cache_proto.npz", caches["proto"])
    out["proto_cache_file"] = "assets/hji_cache_proto.npz"

    with open("/root/repo/HJI_PROD.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
