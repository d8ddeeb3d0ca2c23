"""Batched OSQP-style ADMM quadratic-program solver in pure JAX.

TPU-native replacement for the reference's only hot-path native component —
the OSQP C library (SURVEY.md §2 "Native components"; reference dependency
`Project.toml:15`, settings `src/coupled_lat_long.jl:201-203`).  Solves

    minimize   1/2 x' diag(P) x + q' x
    subject to l <= A x <= u

the canonical OSQP form.  P is diagonal by construction for every MPC QP in
this framework (all objective terms are per-variable quadratics; couplings
like ddelta enter through auxiliary variables and equality rows), which
makes the reduced KKT matrix  K = diag(P + sigma) + A' diag(rho) A  the
only dense object.  One batched Cholesky factorization per MPC step + cheap
triangular solves per iteration map straight onto the MXU.

Algorithm (mirrors OSQP):
  x~ : solve K x~ = sigma x - q + A'(rho z - y)
  z~ = A x~
  x+ = alpha x~ + (1-alpha) x
  z+ = clip(alpha z~ + (1-alpha) z + y/rho, l, u)
  y+ = y + rho (alpha z~ + (1-alpha) z - z+)
with over-relaxation alpha, per-row rho (equality rows get
rho*rho_eq_scale, as in OSQP), modified Ruiz equilibration, periodic
residual checks, and optional adaptive rho with refactorization.

The solver is written for a single QP instance and composed with
`jax.vmap` for scenario batching; under vmap the while_loop runs until the
whole batch converges (or max_iter), giving deterministic latency.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pigeon_tpu.config import SolverOptions


class QPData(NamedTuple):
    """One QP in canonical form.

    P_diag is the cost Hessian: a (n,) DIAGONAL for the sparse MPC
    formulations (all objective terms per-variable quadratics), or a
    full (n, n) DENSE matrix for the condensed formulation (the state
    cost folded through the rollout map; `qp/condensed.py`).  The solver
    branches on ndim."""

    P_diag: jnp.ndarray  # (n,) diagonal | (n, n) dense
    q: jnp.ndarray       # (n,)
    A: jnp.ndarray       # (m, n)
    l: jnp.ndarray       # (m,)
    u: jnp.ndarray       # (m,)


class QPWarmStart(NamedTuple):
    x: jnp.ndarray       # (n,)
    y: jnp.ndarray       # (m,) dual
    z: jnp.ndarray       # (m,) constraint-space iterate
    rho_scale: jnp.ndarray = None  # () adapted rho multiplier from a
    #                                  previous solve (OSQP keeps its
    #                                  adapted rho across warm solves)


class QPSolution(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    iterations: jnp.ndarray
    prim_res: jnp.ndarray
    dual_res: jnp.ndarray
    converged: jnp.ndarray
    rho_scale: jnp.ndarray


def cold_start(qp: QPData) -> QPWarmStart:
    n = qp.q.shape[-1]
    m = qp.l.shape[-1]
    z = jnp.zeros(m, qp.q.dtype)
    return QPWarmStart(x=jnp.zeros(n, qp.q.dtype), y=z, z=z,
                       rho_scale=jnp.ones((), qp.q.dtype))


# ---------------------------------------------------------------------------
# Ruiz equilibration (modified, as in OSQP)
# ---------------------------------------------------------------------------

def _ruiz(qp: QPData, iters: int):
    """Symmetric Ruiz equilibration of [[P, A'], [A, 0]] plus cost scaling.

    Returns scaled problem and the scalings (D, E, c) with
    x = D x_bar, constraint rows scaled by E, objective scaled by c.
    """
    P, q, A, l, u = qp
    n = q.shape[-1]
    m = l.shape[-1]
    dense_P = P.ndim == 2
    D = jnp.ones(n, q.dtype)
    E = jnp.ones(m, q.dtype)
    c = jnp.asarray(1.0, q.dtype)
    eps = 1e-12
    # |A| computed once; per-sweep row/col maxima of the scaled matrix
    # E|A|D are fused multiply-reductions (no (m, n) intermediate per
    # sweep — the scaled matrix is materialized exactly once, at the end).
    # For dense P the scaling heuristic uses its DIAGONAL (Ruiz is a
    # heuristic; the full scaled P is materialized at the end).
    absA = jnp.abs(A)
    absP = (jnp.max(jnp.abs(P), axis=-1) if dense_P else jnp.abs(P))
    absq = jnp.abs(q)
    for _ in range(iters):
        Ps = absP * D * D * c                   # |diagonal| of scaled P
        col_x = jnp.maximum(Ps, jnp.max(absA * E[:, None], axis=0) * D)
        col_y = jnp.max(absA * D[None, :], axis=1) * E
        # zero-norm rows/columns stay UNSCALED (OSQP convention): the eps
        # floor alone would multiply their scale by 1e6 per sweep — an
        # all-zero row (e.g. an inactive HJI constraint) overflows E to
        # inf within ~7 sweeps and NaN-poisons the scaled bounds
        D = D / jnp.sqrt(jnp.where(col_x <= eps, 1.0,
                                   jnp.maximum(col_x, eps)))
        E = E / jnp.sqrt(jnp.where(col_y <= eps, 1.0,
                                   jnp.maximum(col_y, eps)))
        # cost scaling: normalize the scaled gradient magnitude
        Ps = absP * D * D * c
        qs = c * D * absq
        g = jnp.maximum(jnp.mean(Ps), jnp.max(qs))
        c = c / jnp.maximum(g, 1.0)
    Pb = (c * (D[:, None] * P * D[None, :]) if dense_P
          else P * D * D * c)
    qb = c * D * q
    Ab = (E[:, None] * A) * D[None, :]
    lb = E * l
    ub = E * u
    return QPData(Pb, qb, Ab, lb, ub), D, E, c


# ---------------------------------------------------------------------------
# Core solve
# ---------------------------------------------------------------------------

def _factor_inv(Pb, Ab, rho_vec, sigma, opts=None, banded_plan=None):
    """Explicit inverse of the reduced KKT matrix K = P + sigma I + A'rhoA.

    The ADMM iterations then use pure matmuls — on TPU this matters a lot:
    per-iteration TriangularSolve with a single right-hand side lowers to a
    latency-bound sequential substitution, while K^-1 @ rhs is an MXU
    matmul.  K is sigma-regularized and Ruiz-equilibrated, so the explicit
    inverse is numerically safe at the solver's 1e-4 tolerance.

    Two methods:
    - "chol": blocked Cholesky + triangular inverse (XLA; exact but the
      batched Cholesky lowers poorly on TPU).
    - "ns": Newton-Schulz iteration X <- X(2I - KX) from X0 = K/||K||_inf^2
      — nothing but square MXU matmuls, ~6x faster on TPU; followed by two
      Newton polish steps.  The iterations are quadratically convergent so
      the fixed count covers condition numbers up to ~1e6 after Ruiz.
    """
    method = getattr(opts, "factor_method", "chol") if opts else "chol"
    if (method in ("banded", "banded_cr") and banded_plan is not None
            and Pb.ndim == 1):
        from pigeon_tpu.solver.banded import factor_inv_banded
        slots, n_, bw, nb = banded_plan
        return factor_inv_banded(Pb, Ab, rho_vec, sigma, slots, n_, bw, nb,
                                 tp_axis=getattr(opts, "tp_axis", None),
                                 method=("cr" if method == "banded_cr"
                                         else "scan"))
    K = (Ab.T * rho_vec[None, :]) @ Ab
    if Pb.ndim == 2:
        n0 = Pb.shape[-1]
        K = K + Pb + sigma * jnp.eye(n0, dtype=Pb.dtype)
    else:
        K = K + jnp.diag(Pb + sigma)
    n = Pb.shape[-1]
    if method == "ns":
        eye = jnp.eye(n, dtype=Pb.dtype)
        norm_inf = jnp.max(jnp.sum(jnp.abs(K), axis=-1))
        X = K / (norm_inf * norm_inf)
        total = getattr(opts, "ns_iters", 30)
        bulk = min(getattr(opts, "ns_bf16_iters", 0), total)
        if bulk > 0:
            # EXPERIMENTAL — measured NOT to work on the condensed KKT
            # family (converged_frac 0.0): Newton-Schulz's early phase
            # advances the residual by ~1/kappa^2 per iteration, SMALLER
            # than bf16 matmul noise, so the bulk phase never leaves the
            # starting region and the fp32 tail cannot recover.  Kept
            # (default off) as a record of the experiment; use full-fp32
            # ns_iters.
            Kb = K.astype(jnp.bfloat16)
            Xb = X.astype(jnp.bfloat16)
            eyeb = eye.astype(jnp.bfloat16)
            with jax.default_matmul_precision("default"):
                for _ in range(bulk):
                    Xb = (Xb @ (2.0 * eyeb - (Kb @ Xb).astype(
                        jnp.bfloat16))).astype(jnp.bfloat16)
            X = Xb.astype(Pb.dtype)
        for _ in range(total - bulk):
            X = X @ (2.0 * eye - K @ X)
        return 0.5 * (X + X.T)
    L = jnp.linalg.cholesky(K)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=Pb.dtype),
                                             lower=True)
    return Linv.T @ Linv


_RHO_MIN, _RHO_MAX = 1e-6, 1e6


def solve_qp(qp: QPData, warm: QPWarmStart | None = None,
             opts: SolverOptions = SolverOptions(),
             banded_plan=None, eq_rows=None, w_soft=None) -> QPSolution:
    """Solve one QP; vmap over a leading batch axis for scenario batching.

    Runs under matmul precision HIGHEST: TPU's default bf16 matmul passes
    destroy ADMM convergence at the 1e-4 tolerance (fp32 inputs, ~1e-3
    relative matmul error otherwise).

    banded_plan: optional static stage plan (see solver/banded.py)
    enabling the block-tridiagonal factorization when
    opts.factor_method == "banded".

    eq_rows: accepted for API symmetry with `solve_qp_batched`; the
    single-instance path always runs full-precision iterations, so the
    mixed-precision row split does not apply here.

    w_soft: optional (m,) per-row exact-penalty weights (+inf = hard row).
    Finite-weight rows replace the box projection in the z-update with the
    shrinkage prox of W*dist(., [l, u]) — the aux-free soft-constraint
    formulation (`qp/condensed.py SoftQP`).  Soft solves run the XLA
    iteration body regardless of opts.backend.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp(qp, warm, opts, banded_plan, w_soft)


def _solve_qp(qp: QPData, warm: QPWarmStart | None,
              opts: SolverOptions, banded_plan=None,
              w_soft=None) -> QPSolution:
    dtype = qp.q.dtype
    if warm is None:
        warm = cold_start(qp)

    qps, D, E, c = (_ruiz(qp, opts.scaling_iters) if opts.scaling_iters > 0
                    else (qp, jnp.ones_like(qp.q),
                          jnp.ones_like(qp.l), jnp.asarray(1.0, dtype)))
    Pb, qb, Ab, lb, ub = qps
    sigma = jnp.asarray(opts.sigma, dtype)
    alpha = jnp.asarray(opts.alpha, dtype)
    # soft-row penalty weights in the equilibrated space: the scaled
    # objective is c * f(D x_bar), and row r reads z_bar = E_r z, so
    # W_bar = c W / E keeps the penalty consistent (same law as y_bar).
    wb = None if w_soft is None else c * w_soft / E

    # Per-row rho: equality rows (l == u) get the stiff scaling, like OSQP.
    is_eq = (qp.u - qp.l) < 1e-10
    rho_base = jnp.where(is_eq, opts.rho * opts.rho_eq_scale, opts.rho
                         ).astype(dtype)
    rho_scale0 = (jnp.asarray(1.0, dtype) if warm.rho_scale is None
                  else jnp.clip(warm.rho_scale, 1e-6, 1e6).astype(dtype))

    # scale the warm start into the equilibrated space
    x0 = warm.x / D
    z0 = E * warm.z
    y0 = c * warm.y / E

    n_seg = max(1, opts.max_iter // opts.check_every)

    def residuals(x, z, y):
        """Unscaled residuals + termination thresholds (OSQP semantics)."""
        x_u = D * x
        z_u = z / E
        y_u = (E * y) / c
        Ax = qp.A @ x_u
        Px = (qp.P_diag @ x_u if qp.P_diag.ndim == 2
              else qp.P_diag * x_u)
        Aty = qp.A.T @ y_u
        r_prim = jnp.max(jnp.abs(Ax - z_u))
        r_dual = jnp.max(jnp.abs(Px + qp.q + Aty))
        eps_prim = opts.eps_abs + opts.eps_rel * jnp.maximum(
            jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u)))
        eps_dual = opts.eps_abs + opts.eps_rel * jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.max(jnp.abs(qp.q)))
        return r_prim, r_dual, eps_prim, eps_dual, Ax, z_u, Px, Aty

    def admm_iters(Kinv, rho_vec, x, z, y, k):
        if opts.backend == "pallas" and wb is None:
            from pigeon_tpu.solver.pallas_admm import admm_iterations
            x, z, y, _ = admm_iterations(
                Kinv[None], Ab[None], qb[None], lb[None], ub[None],
                rho_vec[None], x[None], z[None], y[None],
                k, opts.sigma, opts.alpha, tile=1)
            return x[0].astype(qb.dtype), z[0].astype(qb.dtype), \
                y[0].astype(qb.dtype)

        cap = None if wb is None else wb / rho_vec

        def body(_, carry):
            x, z, y = carry
            rhs = sigma * x - qb + Ab.T @ (rho_vec * z - y)
            x_t = Kinv @ rhs
            z_t = Ab @ x_t
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_mix = alpha * z_t + (1.0 - alpha) * z
            v = z_mix + y / rho_vec
            if cap is None:
                z_n = jnp.clip(v, lb, ub)
            else:
                # prox of W*dist(., [l, u]) / rho: shrink toward the box,
                # by at most W/rho per side (inf cap == hard projection)
                z_n = (v - jnp.clip(v - ub, 0.0, cap)
                       - jnp.clip(v - lb, -cap, 0.0))
            y_n = y + rho_vec * (z_mix - z_n)
            return x_n, z_n, y_n
        return jax.lax.fori_loop(0, k, body, (x, z, y))

    # Two-level loop: the outer level factorizes (expensive — batched
    # Cholesky/NS inverse); the inner level runs `check_every`-iteration
    # segments against the FIXED factor, refactoring only when the adaptive
    # rho has drifted by more than OSQP's adaptive_rho_tolerance (5x).
    # Under vmap the outer trip count is the batch max — typically 1 for
    # warm-started MPC — so factorization cost is paid once, not per
    # segment.
    ADAPT_TOL = 5.0

    def rho_suggestion(rho_scale, r_prim, r_dual, Ax, z_u, Px, Aty):
        num = r_prim / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u))), 1e-12)
        den = r_dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
            jnp.maximum(jnp.max(jnp.abs(qp.q)), 1e-12))
        scale = jnp.clip(jnp.sqrt(num / jnp.maximum(den, 1e-12)), 1e-3, 1e3)
        return jnp.clip(rho_scale * scale, 1e-6, 1e6), scale

    def inner_segment(carry):
        x, z, y, Kinv, rho_vec, rho_scale, pending, seg_i, _, _, _, _ = carry
        x, z, y = admm_iters(Kinv, rho_vec, x, z, y, opts.check_every)
        r_prim, r_dual, eps_prim, eps_dual, Ax, z_u, Px, Aty = residuals(
            x, z, y)
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        if opts.adaptive_rho:
            pending, scale = rho_suggestion(rho_scale, r_prim, r_dual,
                                            Ax, z_u, Px, Aty)
            drift = ((scale > ADAPT_TOL) | (scale < 1.0 / ADAPT_TOL)) \
                & jnp.logical_not(converged)
        else:
            drift = jnp.asarray(False)
        return (x, z, y, Kinv, rho_vec, rho_scale, pending, seg_i + 1,
                r_prim, r_dual, converged, drift)

    def inner_cond(carry):
        seg_i, converged, drift = carry[7], carry[10], carry[11]
        return (seg_i < n_seg) & jnp.logical_not(converged) \
            & jnp.logical_not(drift)

    def outer_round(carry):
        x, z, y, rho_scale, seg_i, _, _, converged = carry
        rho_vec = jnp.clip(rho_base * rho_scale, _RHO_MIN, _RHO_MAX)
        Kinv = _factor_inv(Pb, Ab, rho_vec, sigma, opts, banded_plan)
        inner = (x, z, y, Kinv, rho_vec, rho_scale, rho_scale, seg_i,
                 jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
                 converged, jnp.asarray(False))
        # run at least one segment per factorization
        inner = inner_segment(inner)
        inner = jax.lax.while_loop(inner_cond, inner_segment, inner)
        (x, z, y, _, _, _, pending, seg_i, r_prim, r_dual, converged,
         drift) = inner
        rho_scale = jnp.where(drift, pending, rho_scale)
        return x, z, y, rho_scale, seg_i, r_prim, r_dual, converged

    def outer_cond(carry):
        seg_i, converged = carry[4], carry[7]
        return (seg_i < n_seg) & jnp.logical_not(converged)

    init = (x0, z0, y0, rho_scale0, jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(False))
    x, z, y, rho_scale, seg_i, r_prim, r_dual, converged = jax.lax.while_loop(
        outer_cond, outer_round, init)

    return QPSolution(
        x=D * x, y=(E * y) / c, z=z / E,
        iterations=seg_i * opts.check_every,
        prim_res=r_prim, dual_res=r_dual, converged=converged,
        rho_scale=rho_scale)


# ---------------------------------------------------------------------------
# Batched solve (the TPU throughput path)
# ---------------------------------------------------------------------------

def solve_qp_batched(qp: QPData, warm: QPWarmStart,
                     opts: SolverOptions = SolverOptions(),
                     banded_plan=None, eq_rows=None,
                     w_soft=None) -> QPSolution:
    """Solve a BATCH of QPs (leading batch axis on every leaf).

    XLA backend: the vmapped single-instance solver (portable, CPU tests).
    Pallas backend: a natively batched pipeline — vmapped Ruiz +
    factorization, then ADMM segments as whole-batch VMEM kernel calls
    with `opts.pallas_tile` instances per grid step, a bf16 bulk phase
    (`opts.bf16_bulk_iters` one-MXU-pass iterations, ~6x cheaper) followed
    by fp32 polish segments, batch-level convergence control, and
    factorization reuse across segments (refactor only when some
    instance's adaptive rho drifts).  Under plain vmap the tile>1 VMEM
    batching is impossible (each traced instance has batch 1), which is
    why this path exists.
    Lanes backend: the lane-batched VPU solve (`solver/lane_admm.py`) for
    small equality-free QPs (the soft condensed formulation): instances
    mapped onto the 128-lane axis, everything — K build, Cholesky inverse,
    iterations, residuals — per-lane in VMEM.

    w_soft: (m,) or (B, m) exact-penalty weights (see `solve_qp`);
    supported by the xla and lanes backends.
    """
    if opts.backend == "lanes":
        from pigeon_tpu.solver.lane_admm import solve_lanes_batched
        with jax.default_matmul_precision("highest"):
            return solve_lanes_batched(qp, warm, opts, w_soft)
    if opts.backend != "pallas":
        if w_soft is not None and w_soft.ndim == 1:
            w_soft = jnp.broadcast_to(w_soft, qp.l.shape)
        if w_soft is None:
            return jax.vmap(lambda q, w: solve_qp(q, w, opts, banded_plan))(
                qp, warm)
        return jax.vmap(lambda q, w, ws: solve_qp(
            q, w, opts, banded_plan, w_soft=ws))(qp, warm, w_soft)
    if w_soft is not None:
        raise NotImplementedError(
            "soft rows are supported by the 'xla' and 'lanes' backends; "
            "the MXU 'pallas' kernel has no shrink prox")
    with jax.default_matmul_precision("highest"):
        return _solve_qp_pallas_batched(qp, warm, opts, banded_plan,
                                        eq_rows)


def _solve_qp_pallas_batched(qp: QPData, warm: QPWarmStart,
                             opts: SolverOptions,
                             banded_plan=None, eq_rows=None) -> QPSolution:
    import numpy as np

    from pigeon_tpu.solver.pallas_admm import admm_iterations

    dtype = qp.q.dtype
    B = qp.q.shape[0]
    dense_P = qp.P_diag.ndim == 3
    interpret = jax.devices()[0].platform != "tpu"
    if opts.scaling_iters > 0:
        # in-VMEM Ruiz kernel: one HBM round trip instead of ~9 whole-
        # batch passes (see solver/pallas_ruiz.py).  Dense P: the kernel
        # scales from the DIAGONAL (Ruiz is a heuristic); the full scaled
        # P is materialized here.
        from pigeon_tpu.solver.pallas_ruiz import ruiz_batched
        # dense P: scale from the ROW MAX of |P| (the diagonal alone
        # underestimates the condensed G'WG block's scale)
        P_for_scale = (jnp.max(jnp.abs(qp.P_diag), axis=-1)
                       if dense_P else qp.P_diag)
        Pb, qb, Ab, lb, ub, D, E, c = ruiz_batched(
            P_for_scale, qp.q, qp.A, qp.l, qp.u,
            iters=opts.scaling_iters, tile=opts.pallas_tile,
            interpret=interpret)
        if dense_P:
            Pb = (c[:, None, None] * qp.P_diag
                  * D[:, :, None] * D[:, None, :])
    else:
        Pb, qb, Ab, lb, ub = qp
        D, E, c = (jnp.ones_like(qp.q), jnp.ones_like(qp.l),
                   jnp.ones((B,), dtype))
    sigma = jnp.asarray(opts.sigma, dtype)

    if (opts.pallas_precision in ("mixed", "mixedk6")
            and eq_rows is not None):
        # Mixed-precision modes split matvec arithmetic by the STATIC
        # eq_rows set; the stiff rho_eq scaling must use the same mask —
        # a runtime row with l == u outside eq_rows (e.g. delta bounds
        # collapsing when stable_limits saturate) would otherwise get
        # rho_eq stiffness while its matvec tile runs bf16x3, exactly the
        # noise-amplification mechanism the row split exists to prevent.
        m = qp.l.shape[-1]
        eq_mask = np.zeros(m, bool)
        eq_mask[np.asarray(eq_rows)] = True
        is_eq = jnp.asarray(eq_mask)                          # (m,)
    else:
        is_eq = (qp.u - qp.l) < 1e-10                         # (B, m)
    rho_base = jnp.where(is_eq, opts.rho * opts.rho_eq_scale,
                         opts.rho).astype(dtype)
    rho_base = jnp.broadcast_to(rho_base, qp.l.shape)         # (B, m)
    rho_scale = (jnp.ones((B,), dtype) if warm.rho_scale is None
                 else jnp.clip(warm.rho_scale, 1e-6, 1e6).astype(dtype))

    x = warm.x / D
    z = E * warm.z
    y = c[:, None] * warm.y / E

    # Mixed-precision kernel modes need the statically-known equality rows
    # permuted to the front (see pallas_admm._kernel).  K = A' rho A is
    # invariant under row permutation, so the whole solve runs in permuted
    # row space; z/y/E are un-permuted at exit.
    mixed = (opts.pallas_precision in ("mixed", "mixedk6")
             and eq_rows is not None)
    identity_perm = True
    if mixed:
        m = qp.l.shape[-1]
        eq = np.asarray(eq_rows, np.int64)
        m_eq = int(eq.size)
        # layouts allocate equality rows first (qp/coupled.py), so the
        # permutation is usually the identity and all gathers vanish
        identity_perm = bool(np.array_equal(eq, np.arange(m_eq)))
        if not identity_perm:
            perm = np.concatenate([eq, np.setdiff1d(np.arange(m), eq)])
            inv_perm = jnp.asarray(np.argsort(perm))
            perm = jnp.asarray(perm)
            rowp = lambda a: a[:, perm]
            Ab, lb, ub = Ab[:, perm, :], rowp(lb), rowp(ub)
            rho_base, E, z, y = (rowp(rho_base), rowp(E), rowp(z),
                                 rowp(y))
    else:
        m_eq = 0

    def factor(rho_vec):
        return jax.vmap(lambda P, A_, r: _factor_inv(
            P, A_, r, sigma, opts, banded_plan))(Pb, Ab, rho_vec)


    scalings = (D, E, c, qp.P_diag, qp.q)
    amax = lambda v: jnp.max(jnp.abs(v), axis=-1)
    amax_qu = amax(qp.q)                                   # (B,)

    def run_iters(Kinv, rho_vec, x, z, y, k, bf16):
        xo, zo, yo, stats = admm_iterations(
            Kinv, Ab, qb, lb, ub, rho_vec, x, z, y, k,
            float(opts.sigma), float(opts.alpha),
            tile=opts.pallas_tile, bf16=bf16, interpret=interpret,
            precision=getattr(opts, "pallas_precision", "highest"),
            scalings=scalings, m_eq=m_eq, dense_P=dense_P,
            check=getattr(opts, "pallas_check_inner", 0),
            eps_abs=float(opts.eps_abs), eps_rel=float(opts.eps_rel))
        return (xo.astype(dtype), zo.astype(dtype), yo.astype(dtype),
                stats.astype(dtype))

    def residuals(stats):
        """UNSCALED residual statistics computed inside the kernel on the
        VMEM-resident iterates (stats columns: r_prim, r_dual, max|Ax|,
        max|z|, max|Px|, max|A'y|) — the residual check re-reads no
        (B, m, n) matrix from HBM."""
        r_prim, r_dual = stats[:, 0], stats[:, 1]
        m_Ax, m_z, m_Px, m_Aty = (stats[:, 2], stats[:, 3], stats[:, 4],
                                  stats[:, 5])
        eps_prim = opts.eps_abs + opts.eps_rel * jnp.maximum(m_Ax, m_z)
        eps_dual = opts.eps_abs + opts.eps_rel * jnp.maximum(
            jnp.maximum(m_Px, m_Aty), amax_qu)
        return r_prim, r_dual, eps_prim, eps_dual, m_Ax, m_z, m_Px, m_Aty

    def rho_suggestion(rho_scale, r_prim, r_dual, m_Ax, m_z, m_Px, m_Aty):
        num = r_prim / jnp.maximum(jnp.maximum(m_Ax, m_z), 1e-12)
        den = r_dual / jnp.maximum(
            jnp.maximum(m_Px, m_Aty), jnp.maximum(amax_qu, 1e-12))
        scale = jnp.clip(jnp.sqrt(num / jnp.maximum(den, 1e-12)),
                         1e-3, 1e3)
        return jnp.clip(rho_scale * scale, 1e-6, 1e6), scale

    rho_vec = jnp.clip(rho_base * rho_scale[:, None], _RHO_MIN, _RHO_MAX)
    Kinv = factor(rho_vec)

    # bf16 bulk: cheap one-pass-MXU iterations toward the perturbed fixed
    # point; the fp32 segments below close the gap to true tolerance.
    bulk = int(opts.bf16_bulk_iters)
    if bulk > 0:
        x, z, y, stats = run_iters(Kinv, rho_vec, x, z, y, bulk, True)
        r_prim, r_dual, eps_p, eps_d, *_ = residuals(stats)
        # Bulk-phase residual stats ran bf16 matvecs (~4e-3 noise vs the
        # 1e-3 tolerance): never let them declare convergence — at least
        # one fp32 polish segment always runs (the residuals stay as
        # diagnostics only).
        converged = jnp.zeros((B,), bool)
    else:
        # skip the pre-loop residual check (it would need fresh A x / A^T y
        # matvecs); at least one segment always runs, matching OSQP's
        # check-after-iterate semantics
        inf = jnp.full((B,), jnp.inf, dtype)
        r_prim, r_dual = inf, inf
        converged = jnp.zeros((B,), bool)

    n_seg = max(1, opts.max_iter // opts.check_every)
    ADAPT_TOL = 5.0

    def seg_cond(carry):
        seg_i, converged = carry[6], carry[9]
        return (seg_i < n_seg) & jnp.logical_not(jnp.all(converged))

    def seg_body(carry):
        (x, z, y, Kinv, rho_vec, rho_scale, seg_i, _, _, _,
         iters_acc) = carry
        x, z, y, stats = run_iters(Kinv, rho_vec, x, z, y,
                                   opts.check_every, False)
        iters_acc = iters_acc + stats[:, 6]     # executed (early exit)
        (r_prim, r_dual, eps_p, eps_d, m_Ax, m_z, m_Px,
         m_Aty) = residuals(stats)
        converged = (r_prim <= eps_p) & (r_dual <= eps_d)
        if opts.adaptive_rho:
            pending, scale = rho_suggestion(rho_scale, r_prim, r_dual,
                                            m_Ax, m_z, m_Px, m_Aty)
            drift = ((scale > ADAPT_TOL) | (scale < 1.0 / ADAPT_TOL)) \
                & jnp.logical_not(converged)
            rho_scale = jnp.where(drift, pending, rho_scale)
            # refactor only if another segment will actually consume the
            # new K^-1 — with check_every == max_iter (single-segment +
            # in-kernel early exit) the end-of-segment refactor would be
            # pure waste; the updated rho_scale still carries to the
            # next SOLVE through the warm start.
            more_segments = (seg_i + 1 < n_seg)
            new_rho_vec = jnp.clip(rho_base * rho_scale[:, None],
                                   _RHO_MIN, _RHO_MAX)
            Kinv, rho_vec = jax.lax.cond(
                jnp.any(drift) & more_segments,
                lambda: (factor(new_rho_vec), new_rho_vec),
                lambda: (Kinv, rho_vec))
        return (x, z, y, Kinv, rho_vec, rho_scale, seg_i + 1,
                r_prim, r_dual, converged, iters_acc)

    carry = (x, z, y, Kinv, rho_vec, rho_scale,
             jnp.asarray(0, jnp.int32), r_prim, r_dual, converged,
             jnp.full((B,), float(bulk), dtype))
    (x, z, y, _, _, rho_scale, seg_i, r_prim, r_dual,
     converged, iters_acc) = jax.lax.while_loop(seg_cond, seg_body, carry)

    iters = iters_acc.astype(jnp.int32)
    z_u, y_u = z / E, (E * y) / c[:, None]
    if mixed and not identity_perm:
        z_u, y_u = z_u[:, inv_perm], y_u[:, inv_perm]
    return QPSolution(
        x=D * x, y=y_u, z=z_u,
        iterations=iters, prim_res=r_prim, dual_res=r_dual,
        converged=converged, rho_scale=rho_scale)
