"""Benchmark: batched coupled-MPC solve throughput on the attached TPU chip.

Prints ONE primary JSON line (last line of output):
  {"metric": "mpc_solves_per_s_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": N/100000, "latency": [per-batch real-time records],
   "tunnel_overhead_ms_measured": X, ...extras}

Baseline context (BASELINE.md): the reference runs ONE controller instance
at ~100 Hz on a CPU (hard 10 ms budget, `src/ros_integration.jl:105-106`);
the build's north-star target is >=100k MPC solves/s per host.
`vs_baseline` is reported against the 100k north star; `vs_reference_rate`
(extra field) is against the reference's effective 100 solves/s.

Each "solve" is a FULL control step — path projection, node seeding,
horizon linearization, QP assembly, warm-started ADMM, control extraction,
plant propagation — not just the QP.

Flagship configuration: SOFT condensed formulation (qp/condensed.py
SoftQP; n=30, m=124, no equality rows) on the lane-batched VPU solver
(solver/lane_admm.py), in-kernel early exit every 10 iterations.

Timing methodology: the dev environment reaches the TPU through a tunnel
that adds ~25-30 ms of host round-trip per synchronized call.  The
overhead is MEASURED in-process (median of empty-jit round trips) and
reported; throughput and latency loops chain `--chain` dependent steps in
one on-device `lax.scan` launch so per-step numbers amortize the tunnel
instead of subtracting a constant.
"""

import argparse
import dataclasses
import json
import time

import numpy as np


def _setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    return jax


def _flagship_cfg(args, platform):
    import jax.numpy as jnp  # noqa: F401

    from pigeon_tpu import mpc as M
    from pigeon_tpu.config import SolverOptions

    backend = "lanes" if platform == "tpu" else "xla"
    cfg = M.x1_coupled_config(soft=True)
    return dataclasses.replace(cfg, solver=SolverOptions(
        max_iter=args.solver_iters, check_every=args.solver_iters,
        eps_abs=1e-3, eps_rel=1e-3, backend=backend, scaling_iters=2,
        pallas_check_inner=10))


def _decoupled_cfg(platform):
    """The reference's DEFAULT controller (X1DMPC, `src/Pigeon.jl:34`) in
    its TPU-native SOFT CONDENSED form (qp/decoupled.py build_qp_soft):
    states/pins/slacks/slew eliminated, n = 30 steering variables /
    m = 180 rows over the N=31 two-timescale horizon (vs n=245/m=395
    sparse), solved on the lane-batched VPU backend.  Equivalence to the
    sparse formulation: tests/test_soft_decoupled.py."""
    import dataclasses as _dc

    from pigeon_tpu import mpc as M
    from pigeon_tpu.config import SolverOptions

    backend = "lanes" if platform == "tpu" else "xla"
    cfg = M.x1_decoupled_config(soft=True)
    return _dc.replace(cfg, solver=SolverOptions(
        max_iter=300, check_every=300, eps_abs=1e-3, eps_rel=1e-3,
        backend=backend, scaling_iters=2, pallas_check_inner=10))


def decoupled_record(args, tube, cache, tunnel_s, platform):
    """Throughput + B=1 latency for the decoupled formulation (VERDICT r2
    'decoupled is out of the perf story'); appended to the main JSON."""
    import jax
    import jax.numpy as jnp

    from pigeon_tpu import mpc as M

    dtype = jnp.float32
    cfg = _decoupled_cfg(platform)
    B, chain = args.decoupled_batch, 5
    cb, q0, u0, oc, t0 = _fleet(tube, B, dtype, cfg, M, jnp)
    one_step, chained = _make_steps(cfg, tube, cache, oc, dtype, chain)
    cb, q0, u0, diag = one_step(cb, q0, u0, t0)
    t0 = t0 + 0.01
    jax.block_until_ready(u0)
    totals = []
    conv = None
    for i in range(4):
        t1 = time.perf_counter()
        (cb, q0, u0, t0), conv, iters = chained(cb, q0, u0, t0)
        jax.block_until_ready(u0)
        if i > 0:                              # first timed launch warms
            totals.append(time.perf_counter() - t1)
    step_dev = max(float(np.median(totals)) - tunnel_s, 1e-9) / chain
    from pigeon_tpu.qp.decoupled import get_soft_layout
    L = get_soft_layout(cfg.hz)
    rec = {
        "batch": B,
        "device_step_ms": round(step_dev * 1e3, 3),
        "solves_per_s": round(B / step_dev, 1),
        "converged_frac": round(float(np.asarray(conv)[-1].mean()), 4),
        "iters_mean": round(float(np.asarray(iters)[-1].mean()), 1),
        "n_vars": int(L.n), "m_rows": int(L.m),
        "horizon_N": int(cfg.hz.N_short + cfg.hz.N_long + 1),
        "formulation": "soft-condensed-decoupled",
        "solver_backend": cfg.solver.backend,
    }
    # B=1 real-time latency (chain of dependent on-device steps)
    cb1, q01, u01, oc1, t01 = _fleet(tube, 1, dtype, cfg, M, jnp)
    one1, chained1 = _make_steps(cfg, tube, cache, oc1, dtype,
                                 args.latency_chain)
    cb1, q01, u01, _ = one1(cb1, q01, u01, t01)
    t01 = t01 + 0.01
    jax.block_until_ready(u01)
    (cb1, q01, u01, t01), conv1, _ = chained1(cb1, q01, u01, t01)
    jax.block_until_ready(u01)
    totals1 = []
    for _ in range(3):
        t1 = time.perf_counter()
        (cb1, q01, u01, t01), conv1, _ = chained1(cb1, q01, u01, t01)
        jax.block_until_ready(u01)
        totals1.append(time.perf_counter() - t1)
    dev1 = (float(np.median(totals1)) - tunnel_s) / args.latency_chain
    rec["latency_b1_device_step_ms"] = round(dev1 * 1e3, 3)
    rec["latency_b1_within_10ms_budget"] = bool(dev1 < 0.010)
    rec["latency_b1_converged_frac"] = round(
        float(np.asarray(conv1)[-1].mean()), 4)
    return rec


def _fleet(tube, B, dtype, cfg, M, jnp):
    import jax

    rng = np.random.default_rng(0)
    k0 = rng.integers(0, 900, B)
    E = np.asarray(tube.E)[k0] + rng.uniform(-0.5, 0.5, B)
    N_ = np.asarray(tube.N)[k0] + rng.uniform(-0.5, 0.5, B)
    psi = np.asarray(tube.psi)[k0] + rng.uniform(-0.05, 0.05, B)
    q0 = jnp.asarray(
        np.stack([E, N_, psi, np.full(B, 6.0), np.zeros(B), np.zeros(B)],
                 axis=1), dtype)
    t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
    u0 = jnp.zeros((B, 3), dtype)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
    carry = M.init_carry(cfg, dtype=dtype)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), carry)
    return cb, q0, u0, oc, t0


def _make_steps(cfg, tube, cache, oc, dtype, chain):
    """One full closed-loop control period and its `chain`-step on-device
    scan (the 100 Hz loop: fresh QP each step, plant advances with the
    command)."""
    import jax
    import jax.numpy as jnp

    import pigeon_tpu.discretize as dz
    import pigeon_tpu.dynamics as dyn
    from pigeon_tpu import mpc as M
    from pigeon_tpu.compile import tpu_jit

    def plant_f(q, ur):
        return dyn.vehicle_ode(cfg.veh, "bicycle", q, ur[:2], ur[2:])

    @tpu_jit
    def one_step(cb, q0s, u0s, ts):
        c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s, u0s,
                                          oc, ts)

        def plant(q, u):
            ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                                  jnp.zeros(4, dtype)])
            return dz.propagate(plant_f, q, ur, 0.01)
        return c2, jax.vmap(plant)(q0s, u3), u3, diag

    @tpu_jit
    def chained(cb, q0s, u0s, ts):
        def body(state, i):
            cb, q0s, u0s, ts = state
            cb, q0s, u0s, diag = one_step(cb, q0s, u0s, ts)
            return (cb, q0s, u0s, ts + 0.01), (diag.converged,
                                               diag.iterations)
        state, (conv, iters) = jax.lax.scan(
            body, (cb, q0s, u0s, ts), jnp.arange(chain))
        return state, conv, iters

    return one_step, chained


def _measure_tunnel_overhead():
    """Median wall time of an empty jitted round trip in THIS process —
    the per-sync host<->device cost that locally-attached hardware does
    not pay."""
    import jax
    import jax.numpy as jnp

    from pigeon_tpu.compile import tpu_jit

    @tpu_jit
    def floor_fn(x):
        return x + 1.0

    jax.block_until_ready(floor_fn(jnp.float32(0)))
    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(floor_fn(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def latency_records(args, cfg_base, tube, cache, tunnel_s, platform):
    """Small-batch real-time launch configuration: per-step device latency
    from a chain of dependent on-device steps (one launch), with the raw
    single-call wall time (which includes the tunnel) alongside."""
    import jax
    import jax.numpy as jnp

    from pigeon_tpu import mpc as M

    dtype = jnp.float32
    chain = args.latency_chain
    records = []
    for B in args.latency_batches:
        cfg = cfg_base
        cb, q0, u0, oc, t0 = _fleet(tube, B, dtype, cfg, M, jnp)
        one_step, chained = _make_steps(cfg, tube, cache, oc, dtype, chain)

        cb, q0, u0, diag = one_step(cb, q0, u0, t0)   # cold trim once
        t0 = t0 + 0.01
        jax.block_until_ready(u0)
        (cb, q0, u0, t0), conv, _ = chained(cb, q0, u0, t0)
        jax.block_until_ready(u0)

        walls = []
        for i in range(10):
            t1 = time.perf_counter()
            cb, q0, u0, diag = one_step(cb, q0, u0, t0)
            t0 = t0 + 0.01
            jax.block_until_ready(u0)
            walls.append(time.perf_counter() - t1)

        totals = []
        for i in range(5):
            t1 = time.perf_counter()
            (cb, q0, u0, t0), conv, _ = chained(cb, q0, u0, t0)
            jax.block_until_ready(u0)
            totals.append(time.perf_counter() - t1)
        # one launch still pays one tunnel round trip; the remaining
        # (chain-1) steps are pure device time
        dev_step = (float(np.median(totals)) - tunnel_s) / chain
        records.append({
            "batch": B,
            "device_step_ms": round(dev_step * 1e3, 3),
            "within_10ms_budget": bool(dev_step < 0.010),
            "wall_single_call_p50_ms": round(
                float(np.median(walls)) * 1e3, 2),
            "chain": chain,
            "converged_frac": round(float(np.asarray(conv)[-1].mean()), 4),
        })
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=8,
                    help="timed chained launches (throughput mode)")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--solver-iters", type=int, default=150,
                    help="ADMM budget; in-kernel early exit checks every "
                         "10 iterations, so executed counts are "
                         "data-dependent (warm fleet: ~20)")
    ap.add_argument("--chain", type=int, default=10,
                    help="on-device steps per timed launch (throughput)")
    ap.add_argument("--latency-chain", type=int, default=50,
                    help="on-device steps per launch (latency records); "
                         "longer chains shrink the tunnel-noise floor "
                         "on the derived per-step time")
    ap.add_argument("--latency-batches", type=int, nargs="*",
                    default=[1, 16, 64])
    ap.add_argument("--skip-latency", action="store_true")
    ap.add_argument("--skip-decoupled", action="store_true")
    ap.add_argument("--decoupled-batch", type=int, default=8192)
    args = ap.parse_args()

    jax = _setup_jax()
    import jax.numpy as jnp

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj

    platform = jax.devices()[0].platform
    B = args.batch
    cfg = _flagship_cfg(args, platform)
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    dtype = jnp.float32

    tunnel_s = _measure_tunnel_overhead()

    cb, q0, u0, oc, t0 = _fleet(tube, B, dtype, cfg, M, jnp)
    one_step, chained = _make_steps(cfg, tube, cache, oc, dtype,
                                    args.chain)

    t_compile = time.time()
    cb, q0, u0, diag = one_step(cb, q0, u0, t0)       # cold trim path
    t0 = t0 + 0.01
    jax.block_until_ready(u0)
    (cb, q0, u0, t0), conv, iters = chained(cb, q0, u0, t0)
    jax.block_until_ready(u0)
    compile_s = time.time() - t_compile
    for _ in range(args.warmup):
        (cb, q0, u0, t0), conv, iters = chained(cb, q0, u0, t0)
        jax.block_until_ready(u0)

    # Timed: the fleet advances `chain` closed-loop 100 Hz periods per
    # launch, entirely on device.
    lat = []
    for _ in range(args.iters):
        t1 = time.time()
        (cb, q0, u0, t0), conv, iters = chained(cb, q0, u0, t0)
        jax.block_until_ready(u0)
        lat.append(time.time() - t1)
    lat = np.asarray(lat)
    launch_p50 = float(np.percentile(lat, 50))
    step_p50 = launch_p50 / args.chain
    step_dev = max(launch_p50 - tunnel_s, 1e-9) / args.chain
    solves_per_s = B / step_p50

    conv_np = np.asarray(conv)            # (chain, B)
    iters_np = np.asarray(iters)
    conv_frac = float(conv_np[-1].mean())
    finite = bool(np.all(np.isfinite(np.asarray(u0))))

    lat_recs = []
    if not args.skip_latency:
        lat_recs = latency_records(args, cfg, tube, cache, tunnel_s,
                                   platform)
        for rec in lat_recs:
            print(json.dumps({"metric": "mpc_step_latency", **rec}),
                  flush=True)

    dec_rec = None
    if not args.skip_decoupled:
        dec_rec = decoupled_record(args, tube, cache, tunnel_s, platform)
        print(json.dumps({"metric": "mpc_decoupled", **dec_rec}),
              flush=True)

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 100000.0, 4),
        "batch": B,
        "step_latency_p50_ms": round(step_p50 * 1e3, 3),
        "device_step_ms": round(step_dev * 1e3, 3),
        "chain": args.chain,
        "within_10ms_budget": bool(
            any(r["within_10ms_budget"] for r in lat_recs)),
        "latency": lat_recs,
        "decoupled": dec_rec,
        "tunnel_overhead_ms_measured": round(tunnel_s * 1e3, 2),
        "vs_reference_rate": round(solves_per_s / 100.0, 1),
        "converged_frac": round(conv_frac, 4),
        "iters_mean": round(float(iters_np[-1].mean()), 1),
        "controls_finite": finite,
        "compile_s": round(compile_s, 1),
        "formulation": "soft-condensed",
        "solver_backend": cfg.solver.backend,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
