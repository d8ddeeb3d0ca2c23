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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--solver-iters", type=int, default=50,
                    help="fixed ADMM budget for deterministic latency")
    args = ap.parse_args()

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
    import dataclasses

    platform = jax.devices()[0].platform
    B = args.batch

    # Fixed-iteration solver budget: every batch element runs the same
    # number of ADMM segments -> deterministic latency (the real-time
    # launch configuration; convergence at this budget is checked below).
    cfg = M.x1_coupled_config()
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    # Precision ladder: `solver_iters` bf16 bulk iterations (one MXU pass
    # each) + up to two fp32 polish segments of solver_iters/2.
    cfg = dataclasses.replace(cfg, solver=SolverOptions(
        max_iter=args.solver_iters, check_every=max(args.solver_iters // 2,
                                                    1),
        eps_abs=1e-3, eps_rel=1e-3, backend=backend, scaling_iters=4,
        factor_method="banded", bf16_bulk_iters=args.solver_iters,
        pallas_tile=4))

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

    @jax.jit
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
