"""Per-phase device profiling of the MPC step.

The reference's only profiling is `@elapsed` around the whole MPC step
(`src/ros_integration.jl:94,105-109`).  This module times each phase of
the batched step — node seeding, horizon linearization + QP assembly,
Ruiz scaling, KKT factorization, ADMM iteration segments, solution
extraction — as separately-jitted device programs, and emits one JSON row
(SURVEY.md §5 "per-phase device timing ... XLA profiler hooks").

The phase programs recompute their inputs' producing phases' outputs, so
the timings are *per-phase costs under the same data*, not a partition of
one program (XLA fuses across phase boundaries inside the real step, so
the sum is an upper bound on the fused step time).

`xla_trace` wraps a callable in the XLA profiler, producing a TensorBoard
trace directory for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _time_fn(fn, args, iters: int = 5, warmup: int = 2) -> float:
    """Median wall seconds of fn(*args) with blocking."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_step(cfg, tube, cache, carry_b, q0s, u0s, ocs, ts,
                 iters: int = 5, include_full: bool = True) -> dict:
    """Time each phase of the batched coupled MPC step.

    Inputs are a batch exactly as passed to `mpc_step_batched`.  Returns
    {"phase_ms": {...}, "batch": B, ...}; also usable from the bench CLI:
    `python -m pigeon_tpu.profiling`.
    """
    from pigeon_tpu import hji as hji_mod
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.qp import coupled as qp_coupled
    from pigeon_tpu.compile import tpu_jit
    from pigeon_tpu.solver import admm

    assert cfg.formulation == "coupled", "profiler covers the coupled step"
    B = q0s.shape[0]
    out = {}

    # ---- phase: node seeding (warm branch — the steady-state path) ------
    @tpu_jit
    def nodes(carry_b, q0s, u0s, ts):
        def one(c, q, u, t):
            tgrid, dt = M.compute_time_steps(cfg.hz, t)
            return M._nodes_coupled_warm(cfg, tube, q, u, tgrid, c)
        return jax.vmap(one)(carry_b, q0s, u0s, ts)

    qs, us, ps = nodes(carry_b, q0s, u0s, ts)
    out["nodes_warm"] = _time_fn(nodes, (carry_b, q0s, u0s, ts), iters)

    # ---- phase: cold node seeding (trim rollout) ------------------------
    @tpu_jit
    def nodes_cold(q0s, u0s, ts):
        def one(q, u, t):
            tgrid, dt = M.compute_time_steps(cfg.hz, t)
            return M._nodes_coupled_cold(cfg, tube, q, u, tgrid, dt)
        return jax.vmap(one)(q0s, u0s, ts)

    out["nodes_cold"] = _time_fn(nodes_cold, (q0s, u0s, ts), iters)

    # ---- phase: linearization + QP assembly -----------------------------
    hji_M = jnp.zeros((B, 2), q0s.dtype)
    hji_b = jnp.ones((B,), q0s.dtype)

    @tpu_jit
    def build(qs, us, ps, ts, hji_M, hji_b):
        def one(q_, u_, p_, t, m_, b_):
            tgrid, dt = M.compute_time_steps(cfg.hz, t)
            data = qp_coupled.CoupledStageData(
                dt=dt, qs=q_, us=u_, ps=p_, hji_M=m_, hji_b=b_, edges=None)
            return qp_coupled.build_qp(cfg.veh, cfg.coupled, cfg.hz, data)
        return jax.vmap(one)(qs, us, ps, ts, hji_M, hji_b)

    qp = build(qs, us, ps, ts, hji_M, hji_b)
    out["linearize_assemble"] = _time_fn(
        build, (qs, us, ps, ts, hji_M, hji_b), iters)

    # ---- phase: Ruiz equilibration --------------------------------------
    @tpu_jit
    def scale(qp):
        return jax.vmap(lambda q: admm._ruiz(q, cfg.solver.scaling_iters))(qp)

    qps, D, E, c = scale(qp)
    out["ruiz"] = _time_fn(scale, (qp,), iters)

    # ---- phase: KKT factorization ---------------------------------------
    banded_plan = None
    if cfg.solver.factor_method == "banded":
        from pigeon_tpu.solver.banded import coupled_stage_plan
        banded_plan = coupled_stage_plan(cfg.hz, cfg.coupled.use_walls)

    is_eq = (qp.u - qp.l) < 1e-10
    rho_vec = jnp.where(is_eq, cfg.solver.rho * cfg.solver.rho_eq_scale,
                        cfg.solver.rho).astype(q0s.dtype)

    @tpu_jit
    def factor(qps, rho_vec):
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lambda P, A, r: admm._factor_inv(
                P, A, r, cfg.solver.sigma, cfg.solver, banded_plan))(
                qps.P_diag, qps.A, rho_vec)

    Kinv = factor(qps, rho_vec)
    out["factor"] = _time_fn(factor, (qps, rho_vec), iters)

    # ---- phase: ADMM iteration segment ----------------------------------
    n, m = qp.q.shape[-1], qp.l.shape[-1]
    x0 = jnp.zeros((B, n), q0s.dtype)
    z0 = jnp.zeros((B, m), q0s.dtype)
    y0 = jnp.zeros((B, m), q0s.dtype)
    k = cfg.solver.check_every

    if cfg.solver.backend == "pallas":
        from pigeon_tpu.solver.pallas_admm import admm_iterations

        def iterate(Kinv, qps, rho_vec, x0, z0, y0):
            return admm_iterations(
                Kinv, qps.A, qps.q, qps.l, qps.u, rho_vec, x0, z0, y0,
                k, cfg.solver.sigma, cfg.solver.alpha,
                tile=getattr(cfg.solver, "pallas_tile", 1))
    else:
        @tpu_jit
        def iterate(Kinv, qps, rho_vec, x0, z0, y0):
            def one(Ki, Pb, qb, Ab, lb, ub, rv, x, z, y):
                def body(_, carry):
                    x, z, y = carry
                    rhs = cfg.solver.sigma * x - qb + Ab.T @ (rv * z - y)
                    x_t = Ki @ rhs
                    z_t = Ab @ x_t
                    a = cfg.solver.alpha
                    x_n = a * x_t + (1 - a) * x
                    z_mix = a * z_t + (1 - a) * z
                    z_n = jnp.clip(z_mix + y / rv, lb, ub)
                    y_n = y + rv * (z_mix - z_n)
                    return x_n, z_n, y_n
                with jax.default_matmul_precision("highest"):
                    return jax.lax.fori_loop(0, k, body, (x, z, y))
            return jax.vmap(one)(Kinv, qps.P_diag, qps.q, qps.A, qps.l,
                                 qps.u, rho_vec, x0, z0, y0)

    out[f"iterate_{k}"] = _time_fn(
        iterate, (Kinv, qps, rho_vec, x0, z0, y0), iters)

    # ---- phase: residual check ------------------------------------------
    @tpu_jit
    def resid(qp, x0, z0, y0):
        def one(q_, x, z, y):
            Ax = q_.A @ x
            Px = q_.P_diag * x
            Aty = q_.A.T @ y
            return (jnp.max(jnp.abs(Ax - z)),
                    jnp.max(jnp.abs(Px + q_.q + Aty)))
        with jax.default_matmul_precision("highest"):
            return jax.vmap(one)(qp, x0, z0, y0)

    out["residuals"] = _time_fn(resid, (qp, x0, z0, y0), iters)

    # ---- full fused step (reference point) ------------------------------
    if include_full:
        @tpu_jit
        def full(carry_b, q0s, u0s, ocs, ts):
            return M.mpc_step_batched(cfg, tube, cache, carry_b, q0s, u0s,
                                      ocs, ts)
        out["full_step"] = _time_fn(full, (carry_b, q0s, u0s, ocs, ts),
                                    iters)

    row = {"phase_ms": {kk: round(v * 1e3, 3) for kk, v in out.items()},
           "batch": int(B),
           "solver_backend": cfg.solver.backend,
           "factor_method": cfg.solver.factor_method,
           "platform": jax.devices()[0].platform}
    return row


# ---------------------------------------------------------------------------
# FLOP accounting / roofline (SURVEY §6 / BASELINE north-star framing)
# ---------------------------------------------------------------------------

# v5e per-chip peaks (public: 197 bf16 TFLOP/s; fp32 MXU runs as 6-pass
# emulation; VPU is 8x128 lanes x ~2 FLOP/cycle at ~0.94 GHz).
PEAKS_V5E = {
    "mxu_bf16_tflops": 197.0,
    "mxu_fp32_tflops": 197.0 / 6.0,
    "vpu_fp32_tflops": 8 * 128 * 2 * 0.94e9 / 1e12,   # ~1.93
    "hbm_gbps": 819.0,
}


def soft_step_flops(hz, n: int, m: int, iters: float,
                    check_every: int = 10, ns_polish: int = 1,
                    ruiz_iters: int = 2) -> dict:
    """Static per-instance FLOP counts for one flagship (soft condensed)
    control step, by phase.  These are exact op counts of the algorithm as
    written (2 FLOPs per MAC), not device-padded counts."""
    T = hz.N_short + hz.N_long
    d = 19                       # augmented expm stage matrix (n+2m+1)
    jac_ode = 500                # vehicle_ode ~250 MACs, fwd-mode x12 tangents
    lin = T * (12 * jac_ode * 2            # jacfwd duals (rough)
               + 9 * d ** 3 * 2            # expm chain: 5 Horner + 4 squarings
               + 2 * d * d * 2)            # extraction einsums
    rollout = T * (6 * 6 * (n + 2) * 2 + 6 * (n + 2) * 2)
    pbuild = T * 3 * n * n * 2 + n * n * 2
    nodes = T * 200 * 2          # lookups + trim-free warm resample (approx)
    ruiz = ruiz_iters * 3 * m * n * 2
    kbuild = m * n * n * 2
    factor = int((1.0 / 3 + 1.0 / 3 + 1.0 + 2.0 * ns_polish) * n ** 3) * 2
    per_iter = (2 * m * n + n * n + 8 * m) * 2
    per_check = 2 * m * n * 2
    iterate = int(iters * per_iter + (iters / max(check_every, 1))
                  * per_check)
    return {
        "nodes": nodes, "linearize": lin, "rollout_assemble":
        rollout + pbuild, "ruiz": ruiz, "kbuild": kbuild,
        "factor": factor, "iterate": iterate,
        "total": (nodes + lin + rollout + pbuild + ruiz + kbuild + factor
                  + iterate),
    }


def mfu_row(B: int, step_s: float, flops_per_step: dict,
            peaks: dict = PEAKS_V5E) -> dict:
    """One roofline JSON row: achieved FLOP/s vs peak for the whole step.

    The honest headline for this workload: per-instance problems are TINY
    (n=30, m=124), so the total algorithmic work at 100k solves/s is
    <1 GFLOP/s — per-chip throughput is bound by VPU op issue, gathers
    and dispatch, NOT by FLOPs.  MFU is reported against both the MXU
    fp32 peak (the conventional denominator) and the VPU fp32 peak (the
    unit the lane solver actually runs on)."""
    total = flops_per_step["total"] * B
    achieved = total / step_s
    return {
        "metric": "mfu_roofline",
        "batch": B,
        "flops_per_solve": flops_per_step["total"],
        "achieved_gflops": round(achieved / 1e9, 2),
        "mfu_vs_mxu_fp32_pct": round(
            100.0 * achieved / (peaks["mxu_fp32_tflops"] * 1e12), 4),
        "mfu_vs_vpu_fp32_pct": round(
            100.0 * achieved / (peaks["vpu_fp32_tflops"] * 1e12), 3),
        "phase_flops": flops_per_step,
        "bound_by": "vpu-ops/gathers/dispatch (tiny-problem regime), "
                    "not FLOPs",
        "peaks_assumed": peaks,
    }


@contextlib.contextmanager
def xla_trace(logdir: str = "/tmp/pigeon_xla_trace"):
    """XLA profiler hook: `with xla_trace(dir): step(...)` writes a
    TensorBoard trace with per-kernel device timings."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _mfu_main(args):
    """Run the flagship chained step at --batch and print the MFU row."""
    import dataclasses

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.compile import tpu_jit
    from pigeon_tpu.config import SolverOptions

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    platform = jax.devices()[0].platform
    cfg = M.x1_coupled_config(soft=True)
    cfg = dataclasses.replace(cfg, solver=SolverOptions(
        max_iter=150, check_every=150, eps_abs=1e-3, eps_rel=1e-3,
        backend=("lanes" if platform == "tpu" else "xla"),
        scaling_iters=2, pallas_check_inner=10))
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    B = args.batch
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    k0 = rng.integers(0, 900, B)
    q0 = jnp.asarray(np.stack(
        [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
         np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
         np.zeros(B)], axis=1), dtype)
    t0 = jnp.asarray(np.asarray(tube.t)[k0], dtype)
    u0 = jnp.zeros((B, 3), dtype)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0, 0], dtype), (B, 4))
    carry = M.init_carry(cfg, dtype=dtype)
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                      carry)
    chain = 10

    @tpu_jit
    def chained(cb, q0s, u0s, ts):
        def body(state, i):
            cb, q0s, u0s, ts = state
            cb, u3, diag = M.mpc_step_batched(cfg, tube, cache, cb, q0s,
                                              u0s, oc, ts)
            return (cb, q0s, u0s, ts + 0.01), (diag.converged,
                                               diag.iterations)
        return jax.lax.scan(body, (cb, q0s, u0s, ts), jnp.arange(chain))

    state, (conv, iters) = chained(cb, q0, u0, t0)
    jax.block_until_ready(state[0])
    lat = []
    for i in range(5):
        t1 = time.perf_counter()
        state, (conv, iters) = chained(*state)
        jax.block_until_ready(state[0])
        lat.append(time.perf_counter() - t1)
    step_s = float(np.median(lat)) / chain
    iters_mean = float(np.asarray(iters)[-1].mean())

    from pigeon_tpu.qp.condensed import get_soft_layout
    L = get_soft_layout(cfg.hz, cfg.coupled.use_walls)
    flops = soft_step_flops(cfg.hz, L.n, L.m, iters_mean)
    row = mfu_row(B, step_s, flops)
    row["step_ms"] = round(step_s * 1e3, 3)
    row["solves_per_s"] = round(B / step_s, 1)
    row["iters_mean"] = round(iters_mean, 1)
    row["platform"] = platform
    print(json.dumps(row))


def _main():
    import argparse
    import dataclasses

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.config import SolverOptions

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--solver-iters", type=int, default=50)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--factor", default="banded")
    ap.add_argument("--mfu", action="store_true",
                    help="measure the flagship soft-condensed step and "
                         "emit the roofline/MFU JSON row")
    args = ap.parse_args()

    if args.mfu:
        _mfu_main(args)
        return

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    backend = args.backend or (
        "pallas" if jax.devices()[0].platform == "tpu" else "xla")
    cfg = M.x1_coupled_config()
    cfg = dataclasses.replace(cfg, solver=SolverOptions(
        max_iter=args.solver_iters * 2, check_every=args.solver_iters,
        eps_abs=1e-3, eps_rel=1e-3, backend=backend, scaling_iters=4,
        factor_method=args.factor))

    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    B = args.batch
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    k0 = rng.integers(0, 900, B)
    q0 = jnp.asarray(np.stack([
        np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
        np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
        np.zeros(B)], axis=1), dtype)
    ts = jnp.asarray(np.asarray(tube.t)[k0], dtype)
    u0 = jnp.zeros((B, 3), dtype)
    oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0.0, 0.0], dtype), (B, 4))
    carry = M.init_carry(cfg, dtype=dtype)
    carry_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                           carry)
    from pigeon_tpu.compile import tpu_jit as _tj

    # warm the carry with one real step so the warm path profiles honestly
    carry_b, _, _ = _tj(lambda cb, q, u, o, t: M.mpc_step_batched(
        cfg, tube, cache, cb, q, u, o, t))(carry_b, q0, u0, oc, ts)
    carry_b = jax.block_until_ready(carry_b)

    row = profile_step(cfg, tube, cache, carry_b, q0, u0, oc, ts)
    print(json.dumps(row))


if __name__ == "__main__":
    _main()
