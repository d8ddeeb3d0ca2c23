"""Production-resolution 7-D HJI solve on the TPU + refinement study.

Round 5 (VERDICT r4 items 1a + 2): the value grid now COVERS the
Monte-Carlo scenario families (dE +-48 m vs r4's +-20 — in_grid_frac
0.29-0.54 meant most scenarios started where V=+inf and the filter was
structurally inert), and the refinement ladder gained a third level so
"the two finest grids" (mid 7.0M -> production 37.8M points) quantify
grid convergence of exactly what the QP consumes: the half-plane
(M, b).  The production sweep runs slab-chunked (hji_solve slab_chunk)
to bound single-chip HBM, and mid+production share a FIXED dt below
both CFL bounds so the ladder compares identical pseudo-time grids
(first-order scheme: free-running CFL paths add O(dt) noise to the
deltas).

Artifacts (saved INCREMENTALLY so a mid-run TPU fault loses nothing):
HJI_PROD.json, assets/hji_cache_proto.npz (CI / fast-iteration cache),
assets/hji_cache_mid.npz (committed refinement-pair cache, V-only), and
/tmp/hji_cache_production.npz (V-only, ~150 MB — regenerated on-device
rather than committed; the safety A/B consumes it).

Usage: python scripts/hji_production.py [--sweeps 1100]
       [--phase proto|mid|production|refine|all]
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

OUT = "/root/repo/HJI_PROD.json"
PROTO_NPZ = "/root/repo/assets/hji_cache_proto.npz"
MID_NPZ = "/root/repo/assets/hji_cache_mid.npz"
PROD_NPZ = "/tmp/hji_cache_production.npz"
# refinement-pair grid: one ladder step below DEFAULT_SHAPE on the same
# bounds (7.0M points)
# refinement-pair grid: ~half the production resolution per axis, same
# bounds, same padding-aware storage order (dE=64 still pads to 128 —
# a 2x expansion the small grid can afford)
MID_SHAPE = (64, 16, 7, 7, 7, 7, 7)
# fixed pseudo-time step shared by mid+production (below both grids'
# CFL bounds; production CFL dt ~ 0.0028 at the h_dE = 0.76 m grid)
DT_FIXED = 0.0022


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"metric": "hji_production_solve",
            "platform": jax.devices()[0].platform}


def _save(out):
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


def timed_solve(veh, shape, sweeps, fx_samples=15, chunk=50,
                horizon_s=None, retime=True, slab_chunk=0,
                dt_fixed=None, axis_order=None, with_grad=True):
    # chunked launches: a single multi-minute device execution crashes
    # the remote TPU worker (watchdog); ~30 s chunks are safe
    kw = dict(shape=shape, n_sweeps=sweeps, fx_samples=fx_samples,
              sweep_chunk=chunk, horizon_s=horizon_s,
              slab_chunk=slab_chunk, dt_fixed=dt_fixed,
              axis_order=axis_order, with_grad=with_grad)
    t0 = time.perf_counter()
    cache, deltas, times = HS.solve_hji(veh, **kw)
    jax.block_until_ready(cache.V)
    total = time.perf_counter() - t0
    run_s = total
    if retime:
        # re-run to split compile from execute
        t1 = time.perf_counter()
        cache, deltas, times = HS.solve_hji(veh, **kw)
        jax.block_until_ready(cache.V)
        run_s = time.perf_counter() - t1
    return cache, deltas, times, total, run_s


def solve_phase(out, veh, name, shape, sweeps, npz, horizon_s=None,
                retime=True, slab_chunk=0, dt_fixed=None,
                include_grad=True, axis_order=None, with_grad=True):
    n_pts = int(np.prod(shape))
    cache, deltas, times, total_s, run_s = timed_solve(
        veh, shape, sweeps, horizon_s=horizon_s, retime=retime,
        slab_chunk=slab_chunk, dt_fixed=dt_fixed, axis_order=axis_order,
        with_grad=with_grad)
    # the avoid game between equal-agility vehicles is pursuer-won at
    # infinite horizon (V -> floor everywhere; measured: the fully
    # converged global-LF proto cache sat in [-3.0, -2.5] on the WHOLE
    # grid) — the useful artifact is the FINITE-horizon value
    # "collision forceable within horizon_s", solved with local-LF
    # dissipation; delta at the horizon records the remaining
    # truncation, consumed under hji_eps >= 0.05 which dominates it.
    k_h = (int(np.searchsorted(times, horizon_s)) if horizon_s
           else len(deltas))
    k_h = min(max(k_h, 1), len(deltas))
    sweeps = len(deltas)        # early stop at horizon shortens the run
    out[name] = {
        "shape": list(shape), "grid_points": n_pts, "sweeps": sweeps,
        "bounds": [list(b) for b in HS.DEFAULT_BOUNDS],
        "slab_chunk": slab_chunk, "dt_fixed": dt_fixed,
        "axis_order": (list(axis_order) if axis_order else None),
        "horizon_s": horizon_s,
        "pseudo_time_reached_s": round(float(times[-1]), 3),
        "sweeps_to_horizon": k_h if horizon_s else None,
        "total_first_s": round(total_s, 2), "run_s": round(run_s, 2),
        "ms_per_sweep": round(run_s / sweeps * 1e3, 2),
        "delta_at_horizon": float(deltas[k_h - 1]),
        "final_delta_sup": float(deltas[-1]),
        "converged_1e-3": bool(deltas[-1] < 1e-3),
    }
    os.makedirs(os.path.dirname(npz), exist_ok=True)
    HS.save_cache(npz, cache, include_grad=include_grad)
    _save(out)
    print(json.dumps({name: out[name]}), flush=True)


def _halfplane_rows(veh, cache, x_rel, eps_hp):
    n = x_rel.shape[0]
    V, _ = jax.vmap(lambda x: hji_mod.interpolate(cache, x))(x_rel)
    u_lin = jnp.zeros((n, 2), x_rel.dtype)
    M_, b_, _, _ = jax.vmap(
        lambda x, u: hji_mod.reachability_constraint(
            veh, cache, x, eps_hp, u))(x_rel, u_lin)
    return np.asarray(V), np.asarray(M_), np.asarray(b_)


def _pair_stats(coarse, fine, eps_hp, label_c, label_f):
    Vc, Mc, bc = coarse
    Vf, Mf, bf = fine
    # V deltas only over states INSIDE both grids: outside-grid queries
    # interpolate to +inf (reference semantics) and inf - inf is NaN
    ingrid = np.isfinite(Vf) & np.isfinite(Vc)
    dV = np.abs(Vf[ingrid] - Vc[ingrid]) if ingrid.any() else np.zeros(1)
    rec = {
        "pair": [label_c, label_f],
        "in_grid_frac": round(float(ingrid.mean()), 4),
        "V_mean_abs_delta": round(float(dV.mean()), 4),
        "V_p99_abs_delta": round(float(np.percentile(dV, 99)), 4),
    }
    for eps in (0.05, 0.3, 0.6):
        act_c, act_f = Vc <= eps, Vf <= eps
        rec[f"eps_{eps}"] = {
            f"active_frac_{label_c}": round(float(act_c.mean()), 4),
            f"active_frac_{label_f}": round(float(act_f.mean()), 4),
            "activation_agreement": round(float((act_c == act_f).mean()),
                                          4),
        }
    both = (Vc <= eps_hp) & (Vf <= eps_hp)
    rec["halfplane_eps"] = eps_hp
    rec["halfplane_M_p99_delta_on_both_active"] = (
        round(float(np.percentile(np.abs(Mf - Mc).max(axis=-1)[both], 99)),
              4) if both.any() else None)
    rec["halfplane_b_p99_delta_on_both_active"] = (
        round(float(np.percentile(np.abs(bf - bc)[both], 99)), 4)
        if both.any() else None)
    # the QP consumes the NORMALIZED row (mpc.py hji_row_normalize), so
    # grid convergence of the unit-row direction + clamped bound is what
    # actually propagates downstream
    def unit_rows(Mx, bx):
        nrm = np.maximum(np.linalg.norm(Mx, axis=-1), 1e-9)
        return Mx / nrm[:, None], bx / nrm
    Mcu, bcu = unit_rows(Mc, bc)
    Mfu, bfu = unit_rows(Mf, bf)
    if both.any():
        rec["halfplane_unitrow_M_p99_delta_on_both_active"] = round(
            float(np.percentile(np.abs(Mfu - Mcu).max(axis=-1)[both], 99)),
            4)
        rec["halfplane_unitrow_b_p99_delta_on_both_active"] = round(
            float(np.percentile(
                np.abs(np.clip(bfu[both], -2, None)
                       - np.clip(bcu[both], -2, None)), 99)), 4)
    return rec


def refine_phase(out, veh, scenarios):
    caches = {"proto": HS.load_cache(PROTO_NPZ),
              "mid": HS.load_cache(MID_NPZ),
              "production": HS.load_cache(PROD_NPZ)}
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    # the "pressed" MC regime (near head-on, 8-30 m gaps): default
    # sampling leaves every scenario with V > eps on BOTH grids, which
    # certifies agreement but exercises no active half-planes
    scen = mc.sample_scenarios(tube, scenarios, seed=1,
                               oncoming_gap=(8.0, 30.0),
                               oncoming_lateral=(-1.0, 1.0))
    x_rel = jax.vmap(lambda q, o: hji_mod.relative_state(q, o))(
        scen.q0, scen.other0)
    # half-plane comparison at the LARGEST ladder eps (hji.py's V is in
    # meters of optimal-play clearance, so the reference's 0.05 activates
    # only when the game is nearly lost; 0.6 m is the A/B's early-engage
    # arm) so the "both active" set is non-trivial
    eps_hp = 0.6
    rows = {name: _halfplane_rows(veh, cache, x_rel, eps_hp)
            for name, cache in caches.items()}
    out["refinement"] = {
        "scenarios": scenarios,
        "ladder": {n: list(c.dims) for n, c in caches.items()},
        # VERDICT r4 item 2's "two finest grids" deltas:
        "mid_to_production": _pair_stats(rows["mid"], rows["production"],
                                         eps_hp, "mid", "production"),
        "proto_to_production": _pair_stats(rows["proto"],
                                           rows["production"], eps_hp,
                                           "proto", "production"),
    }
    out["proto_cache_file"] = "assets/hji_cache_proto.npz"
    out["mid_cache_file"] = "assets/hji_cache_mid.npz"
    _save(out)
    print(json.dumps(out["refinement"]), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=1200)
    ap.add_argument("--scenarios", type=int, default=512)
    ap.add_argument("--horizon", type=float, default=3.0,
                    help="pseudo-time horizon (s); the finite-horizon "
                         "avoid value is the useful artifact")
    ap.add_argument("--phase", default="all",
                    choices=["proto", "mid", "production", "refine",
                             "all"])
    ap.add_argument("--single-run", action="store_true",
                    help="skip the compile/execute-splitting re-run "
                         "(run_s then includes compile)")
    args = ap.parse_args()
    veh = x1_params()
    out = _load()

    if args.phase in ("proto", "all"):
        solve_phase(out, veh, "proto", HS.PROTO_SHAPE, args.sweeps,
                    PROTO_NPZ, horizon_s=args.horizon,
                    retime=not args.single_run)
    if args.phase in ("mid", "all"):
        solve_phase(out, veh, "mid", MID_SHAPE, args.sweeps,
                    MID_NPZ, horizon_s=args.horizon, retime=False,
                    dt_fixed=DT_FIXED, include_grad=False,
                    slab_chunk=1, axis_order=HS.PROD_AXIS_ORDER,
                    with_grad=False)
    if args.phase in ("production", "all"):
        solve_phase(out, veh, "production", HS.DEFAULT_SHAPE, args.sweeps,
                    PROD_NPZ, horizon_s=args.horizon, retime=False,
                    slab_chunk=1, dt_fixed=DT_FIXED, include_grad=False,
                    axis_order=HS.PROD_AXIS_ORDER, with_grad=False)
    if args.phase in ("refine", "all"):
        refine_phase(out, veh, args.scenarios)


if __name__ == "__main__":
    main()
