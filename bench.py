"""Benchmark: batched coupled-MPC solve throughput on the attached TPU chip.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": N/100000, ...extras}

Baseline context (BASELINE.md): the reference runs ONE controller instance
at ~100 Hz on a CPU (hard 10 ms budget, `src/ros_integration.jl:105-106`);
the build's north-star target is >=100k MPC solves/s per host.
`vs_baseline` is reported against the 100k north star; `vs_reference_rate`
(extra field) is against the reference's effective 100 solves/s.

Each "solve" is a FULL control step — path projection, node seeding,
horizon linearization, QP assembly, warm-started ADMM, control extraction —
not just the QP.
"""

import argparse
import json
import time

import numpy as np


def latency_mode(args):
    """Small-batch real-time launch configuration: p99 per control step.

    The dev-environment tunnel adds ~27 ms of HOST round-trip per
    synchronized call that does not exist on locally-attached hardware,
    so the device step time is measured by chaining `chain` dependent
    steps in one `lax.scan` program (one launch, on-device loop) and
    dividing; the raw single-call wall time is reported alongside.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.config import SolverOptions
    from pigeon_tpu.compile import tpu_jit

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    platform = jax.devices()[0].platform
    backend = "pallas" if platform == "tpu" else "xla"
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    dtype = jnp.float32
    chain = args.chain

    records = []
    for B in args.latency_batches:
        cfg = M.x1_coupled_config(condensed=True)
        cfg = dataclasses.replace(cfg, solver=SolverOptions(
            max_iter=args.solver_iters, check_every=args.solver_iters,
            eps_abs=1e-3, eps_rel=1e-3, backend=backend, scaling_iters=2,
            factor_method="ns", ns_iters=40, pallas_tile=min(2, B),
            pallas_precision="mixedk6", pallas_check_inner=10))
        rng = np.random.default_rng(0)
        k0 = rng.integers(0, 900, B)
        q0 = jnp.asarray(np.stack(
            [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
             np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
             np.zeros(B)], axis=1), dtype)
        ts = jnp.asarray(np.asarray(tube.t)[k0], dtype)
        u0 = jnp.zeros((B, 3), dtype)
        oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype),
                              (B, 4))
        carry = M.init_carry(cfg, dtype=dtype)
        cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          carry)

        import pigeon_tpu.discretize as dz
        import pigeon_tpu.dynamics as dyn

        def plant_f(q, ur):
            return dyn.vehicle_ode(cfg.veh, "bicycle", q, ur[:2], ur[2:])

        @tpu_jit
        def one_step(cb, q0s, u0s, ts):
            c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s,
                                              u0s, oc, ts)

            def plant(q, u):
                ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                                      jnp.zeros(4, dtype)])
                return dz.propagate(plant_f, q, ur, 0.01)
            return c2, jax.vmap(plant)(q0s, u3), u3, diag

        @tpu_jit
        def chained(cb, q0s, u0s, ts):
            def body(state, i):
                cb, q0s, u0s, ts = state
                cb, q0s, u0s, diag = one_step(cb, q0s, u0s, ts + 0.01 * i)
                return (cb, q0s, u0s, ts), diag
            state, diags = jax.lax.scan(body, (cb, q0s, u0s, ts),
                                        jnp.arange(chain))
            return state, diags

        # warm the fleet (cold trim path once), then measure
        cb, q0, u0, diag = one_step(cb, q0, u0, ts)
        jax.block_until_ready(u0)
        (cb, q0, u0, _), diags = chained(cb, q0, u0, ts)
        jax.block_until_ready(u0)

        # single-call wall latency (includes any host/tunnel overhead)
        walls = []
        for i in range(10):
            t0 = time.perf_counter()
            cb, q0, u0, diag = one_step(cb, q0, u0, ts + 0.01 * i)
            _ = float(jnp.sum(u0))
            walls.append(time.perf_counter() - t0)

        # chained device-step latency
        totals = []
        for i in range(5):
            t0 = time.perf_counter()
            (cb, q0, u0, _), diags = chained(cb, q0, u0, ts)
            _ = float(jnp.sum(u0))
            totals.append(time.perf_counter() - t0)
        dev_step = (float(np.median(totals)) - args.tunnel_overhead_s) \
            / chain
        conv = float(np.asarray(diags.converged).mean())
        rec = {
            "metric": "mpc_step_latency",
            "batch": B,
            "device_step_ms": round(dev_step * 1e3, 3),
            "within_10ms_budget": dev_step < 0.010,
            "wall_single_call_p50_ms": round(
                float(np.median(walls)) * 1e3, 2),
            "tunnel_overhead_ms": round(args.tunnel_overhead_s * 1e3, 1),
            "converged_frac": round(conv, 4),
            "solver_iters": args.solver_iters,
            "platform": platform,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--solver-iters", type=int, default=50,
                    help="ADMM budget unit: throughput mode runs up to\n"
                         "3x this, latency mode up to 1x; both use\n"
                         "in-kernel early exit (checks every 10 iters),\n"
                         "so executed counts are data-dependent")
    ap.add_argument("--mode", default="throughput",
                    choices=["throughput", "latency"])
    ap.add_argument("--latency-batches", type=int, nargs="*",
                    default=[1, 16, 64])
    ap.add_argument("--chain", type=int, default=50,
                    help="on-device steps per timed launch (latency mode)")
    ap.add_argument("--tunnel-overhead-s", type=float, default=0.0267,
                    help="fixed per-sync host round-trip of this dev "
                         "environment's remote-TPU tunnel, subtracted "
                         "from chained totals (measured: empty jit+fetch)")
    args = ap.parse_args()

    if args.mode == "latency":
        latency_mode(args)
        return

    import jax

    # Persistent compilation cache: the full mpc_step graph is large and
    # this environment compiles remotely; cache across runs.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.config import SolverOptions
    from pigeon_tpu.compile import tpu_jit
    import dataclasses

    platform = jax.devices()[0].platform
    B = args.batch

    # Fixed-iteration solver budget: every batch element runs the same
    # number of ADMM segments -> deterministic latency (the real-time
    # launch configuration; convergence at this budget is checked below).
    # CONDENSED formulation (qp/condensed.py): states eliminated through
    # the dynamics — n 193->103 (one MXU tile), no stiff dynamics rows;
    # mathematically equivalent QP, ~20% faster end-to-end than the
    # sparse path at the same tolerance.
    cfg = M.x1_coupled_config(condensed=True)
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    # Solver config: ONE kernel call of up to 3*solver_iters iterations
    # with in-kernel convergence checks every 10 — each Pallas grid step
    # (pallas_tile instances) exits as soon as its instances converge, so
    # the fleet pays the mean iteration count while stragglers get the
    # full budget.  Dense-P factor via Newton-Schulz (pure 1-tile MXU
    # matmuls).
    cfg = dataclasses.replace(cfg, solver=SolverOptions(
        max_iter=3 * args.solver_iters, check_every=3 * args.solver_iters,
        eps_abs=1e-3, eps_rel=1e-3, backend=backend, scaling_iters=2,
        factor_method="ns", ns_iters=40, bf16_bulk_iters=0, pallas_tile=2,
        pallas_precision="mixedk6", pallas_check_inner=10))

    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    dtype = jnp.float32
    carry = M.init_carry(cfg, dtype=dtype)

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
    carry_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           carry)

    from pigeon_tpu import discretize as dz
    from pigeon_tpu import dynamics as dyn

    def plant_f(q, ur):
        return dyn.vehicle_ode(cfg.veh, "bicycle", q, ur[:2], ur[2:])

    @tpu_jit
    def batched_step(carries, q0s, u0s, ts):
        """One fleet control period: every scenario runs a FULL warm-started
        MPC step and the plant advances with the command — each timed call
        solves a fresh QP, like the real 100 Hz loop."""
        B_ = q0s.shape[0]
        ocs = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0, 0], dtype),
                               (B_, 4))
        c2, u3, diag = M.mpc_step_batched(cfg, tube, cache, carries, q0s,
                                          u0s, ocs, ts)

        def plant(q, u):
            ur = jnp.concatenate([jnp.stack([u[0], u[1] + u[2]]),
                                  jnp.zeros(4, dtype)])
            return dz.propagate(plant_f, q, ur, 0.01)
        q2 = jax.vmap(plant)(q0s, u3)
        return c2, q2, u3, diag

    # Warmup / compile
    t_compile = time.time()
    carry_b, q0, u0, diag = batched_step(carry_b, q0, u0, t0)
    jax.block_until_ready(q0)
    compile_s = time.time() - t_compile
    for _ in range(args.warmup):
        t0 = t0 + 0.01
        carry_b, q0, u0, diag = batched_step(carry_b, q0, u0, t0)
        jax.block_until_ready(q0)

    # Timed loop: the fleet advances in closed loop at 100 Hz
    lat = []
    for _ in range(args.iters):
        t1 = time.time()
        t0 = t0 + 0.01
        carry_b, q0, u0, diag = batched_step(carry_b, q0, u0, t0)
        jax.block_until_ready(q0)
        lat.append(time.time() - t1)
    lat = np.asarray(lat)
    step_p50 = float(np.percentile(lat, 50))
    step_p99 = float(np.percentile(lat, 99))
    solves_per_s = B / step_p50

    conv = float(np.asarray(diag.converged).mean())
    finite = bool(np.all(np.isfinite(np.asarray(u0))))

    print(json.dumps({
        "metric": "mpc_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 100000.0, 4),
        "batch": B,
        "step_latency_p50_ms": round(step_p50 * 1e3, 3),
        "step_latency_p99_ms": round(step_p99 * 1e3, 3),
        "within_10ms_budget": step_p99 < 0.010,
        "vs_reference_rate": round(solves_per_s / 100.0, 1),
        "converged_frac": round(conv, 4),
        "controls_finite": finite,
        "compile_s": round(compile_s, 1),
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
