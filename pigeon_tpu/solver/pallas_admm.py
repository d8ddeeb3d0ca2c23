"""Pallas TPU kernel: VMEM-resident ADMM iterations.

The pure-XLA iteration path re-reads the (B, m, n) constraint matrix and
the (B, n, n) KKT inverse from HBM on *every* ADMM iteration (~1.2 GB/iter
at B=2048) and runs latency-bound batched GEMVs.  This kernel keeps each
instance's A, K^-1, bounds and iterates entirely in VMEM: HBM traffic drops
to one read + one write per solve segment, and the matvecs run from VMEM at
MXU speed.  This is the TPU-native replacement for the reference's OSQP hot
loop (SURVEY.md §2 "Native components").

Shapes are padded to MXU tile multiples by the caller-facing wrapper; the
padding is constructed so padded coordinates are exact fixed points of the
iteration (identity K^-1 diagonal, zero A rows/cols, [0,0] bounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pigeon_tpu.compile import tpu_jit

try:                                  # the TPU extension registers Mosaic
    from jax.experimental.pallas import tpu as pltpu  # lowerings; absent on
    _VMEM = pltpu.VMEM                # CPU-only installs (interpret mode
except (ImportError, NotImplementedError):            # works without it)
    pltpu = None
    _VMEM = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_iters: int, sigma: float, alpha: float, mode: str,
            m_eq_pad: int, check: int, eps_abs: float, eps_rel: float,
            dense_P: bool, *refs):
    """One grid step processes TILE instances resident in VMEM.

    All matvecs are expressed as v^T M with the matrix on the RHS
    (contracting its second-to-last dim, free dim a suffix) — the form
    Mosaic's tpu.matmul supports for batched vector x matrix.  K^-1 is
    symmetric, so rhs^T K^-1 == (K^-1 rhs)^T; the A^T product uses an
    explicitly materialized transpose.

    mode selects the matvec arithmetic (the iteration is MXU-PASS bound —
    each 128x128 operand tile costs one pass per precision "pass", so the
    pass count IS the iteration latency):
      "highest": fp32 operands, 6-pass fp32-emulation dots (reference
        grade; Mosaic rejects Precision.HIGH so 3-pass must be manual).
      "high": each matrix arrives as a bfloat16 (hi, lo) pair with
        hi = bf16(M), lo = bf16(M - hi) — same total bytes as fp32 — and
        v M ~= v_hi M_hi + v_hi M_lo + v_lo M_hi: three 1-pass bf16 dots,
        2x fewer passes than "highest" at ~1e-6 relative error, which
        only perturbs the ADMM fixed point below the 1e-3 tolerance
        (unlike the FACTOR, whose error the stiff rho_eq rows amplify;
        see solver/banded.py — the factorization stays at HIGHEST).
      "bf16": matrices are single bf16, one pass — fast bulk phase of the
        precision ladder; converges to a ~4e-3-perturbed fixed point, so
        callers follow with fp32 polish segments.
      "mixed" / "mixedk6": row-split arithmetic.  The caller permutes
        EQUALITY rows to the front (their rho_eq=1e3 scaling amplifies
        bf16x3 matvec noise through the dual update into a >1 loop gain —
        measured NaN divergence with all-rows "high"); their A/A^T tiles
        run 6-pass fp32 while the inequality tiles run 3-pass bf16x3.
        K^-1 is bf16x3 in "mixed", 6-pass fp32 in "mixedk6".
    """
    mixed = mode in ("mixed", "mixedk6")
    if mode == "high":
        (Khi_ref, Klo_ref, Ahi_ref, Alo_ref, AThi_ref, ATlo_ref,
         q_ref, l_ref, u_ref, rho_ref, x0_ref, z0_ref, y0_ref,
         E_ref, PuD_ref, qu_ref, invDc_ref,
         x_out, z_out, y_out, stats_out) = refs
        A = (Ahi_ref[:], Alo_ref[:])
        AT = (AThi_ref[:], ATlo_ref[:])
        Kinv = (Khi_ref[:], Klo_ref[:])
    elif mixed:
        if mode == "mixed":
            (Khi_ref, Klo_ref, Aeq_ref, Ahi_ref, Alo_ref,
             ATeq_ref, AThi_ref, ATlo_ref,
             q_ref, l_ref, u_ref, rho_ref, x0_ref, z0_ref, y0_ref,
             E_ref, PuD_ref, qu_ref, invDc_ref,
             x_out, z_out, y_out, stats_out) = refs
            Kinv = (Khi_ref[:], Klo_ref[:])
        else:
            (K_ref, Aeq_ref, Ahi_ref, Alo_ref,
             ATeq_ref, AThi_ref, ATlo_ref,
             q_ref, l_ref, u_ref, rho_ref, x0_ref, z0_ref, y0_ref,
             E_ref, PuD_ref, qu_ref, invDc_ref,
             x_out, z_out, y_out, stats_out) = refs
            Kinv = K_ref[:]
        Aeq = Aeq_ref[:]              # (TILE, m_eq_pad, n) fp32
        A = (Ahi_ref[:], Alo_ref[:])  # (TILE, m_in_pad, n) bf16 pair
        ATeq = ATeq_ref[:]            # (TILE, n, m_eq_pad) fp32
        AT = (AThi_ref[:], ATlo_ref[:])
    else:
        (Kinv_ref, A_ref, AT_ref, q_ref, l_ref, u_ref, rho_ref,
         x0_ref, z0_ref, y0_ref, E_ref, PuD_ref, qu_ref, invDc_ref,
         x_out, z_out, y_out, stats_out) = refs
        A = A_ref[:]          # (TILE, m, n)
        AT = AT_ref[:]        # (TILE, n, m)
        Kinv = Kinv_ref[:]    # (TILE, n, n), symmetric
    qv = q_ref[:]             # (TILE, 1, n) — vectors carried as [B, 1, K]
    lv = l_ref[:]
    uv = u_ref[:]
    rho = rho_ref[:]          # (TILE, 1, m)
    inv_rho = 1.0 / rho

    dims = (((2,), (1,)), ((0,), (0,)))
    bf16 = jnp.bfloat16

    def _dot(v, M):
        # precision pinned to DEFAULT on bf16 operands: an ambient
        # default_matmul_precision("highest") context (the solver sets
        # one) would otherwise request an fp32 contract, which Mosaic
        # rejects ("Bad lhs type").
        return jax.lax.dot_general(
            v, M, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def _dot6(v, M):
        return jax.lax.dot_general(
            v, M, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def _dot_split(v, Mpair):
        Mhi, Mlo = Mpair
        v_hi = v.astype(bf16)
        v_lo = (v - v_hi.astype(jnp.float32)).astype(bf16)
        return _dot(v_hi, Mhi) + _dot(v_hi, Mlo) + _dot(v_lo, Mhi)

    def vmat(v, M):
        # (TILE, 1, k) x (TILE, k, j) -> (TILE, 1, j)
        if mode == "bf16":
            return _dot(v.astype(bf16), M)
        if mode == "high":
            return _dot_split(v, M)
        return _dot6(v, M)

    if mixed:
        # matA: v over rows -> A^T v; matAT: v over cols -> A v
        def matA(v):
            return (_dot6(v[:, :, :m_eq_pad], Aeq)
                    + _dot_split(v[:, :, m_eq_pad:], A))

        def matAT(v):
            return jnp.concatenate(
                [_dot6(v, ATeq), _dot_split(v, AT)], axis=-1)

        matK = (lambda v: _dot_split(v, Kinv)) if mode == "mixed" \
            else (lambda v: _dot6(v, Kinv))
    else:
        matA = lambda v: vmat(v, A)
        matAT = lambda v: vmat(v, AT)
        matK = lambda v: vmat(v, Kinv)

    def body(_, carry):
        x, z, y = carry
        w = rho * z - y                                   # (TILE, m)
        rhs = sigma * x - qv + matA(w)                    # A^T w
        xt = matK(rhs)                                    # K^-1 rhs (sym)
        zt = matAT(xt)                                    # A xt
        x_n = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(z_mix + y * inv_rho, lv, uv)
        y_n = y + rho * (z_mix - z_n)
        return x_n, z_n, y_n

    # Residual statistics computed IN KERNEL: two extra matvecs per check
    # (vs whole-matrix HBM re-reads if the caller recomputed them) plus
    # VPU max-reductions on VMEM-resident data.  Scalars out — whole-batch
    # vector outputs would overflow XLA's scoped-VMEM result allocation
    # at B=2048.  Unscaling: with A = E^-1 A_bar D^-1, x = D x_bar,
    # y = E y_bar / c the unscaled products are elementwise rescalings of
    # the in-VMEM scaled ones (E_ref the row scaling, PuD = P_unscaled*D,
    # qu the unscaled q, invDc = 1/(D c)).
    invE = 1.0 / E_ref[:]
    amax_qu = jnp.max(jnp.abs(qu_ref[:]), axis=-1)      # (TILE, 1)

    def calc_stats(x, z, y):
        ax = matAT(x)                                   # A_bar x_bar
        aty = matA(y)                                   # A_bar^T y_bar
        Ax_u = ax * invE
        z_u = z * invE
        # P_u x_u: elementwise for diagonal P, one 6-pass matvec against
        # the row-scaled symmetric P for the dense (condensed) case
        Px_u = (_dot6(x, PuD_ref[:]) if dense_P
                else PuD_ref[:] * x)
        dual_vec = Px_u + qu_ref[:] + aty * invDc_ref[:]
        Aty_u = aty * invDc_ref[:]
        stat = lambda v: jnp.max(jnp.abs(v), axis=-1)   # (TILE, 1)
        z8 = jnp.zeros_like(amax_qu)
        stats = jnp.stack([stat(Ax_u - z_u), stat(dual_vec), stat(Ax_u),
                           stat(z_u), stat(Px_u), stat(Aty_u), z8, z8],
                          axis=-1)                      # (TILE, 1, 8)
        eps_p = eps_abs + eps_rel * jnp.maximum(stats[..., 2],
                                                stats[..., 3])
        eps_d = eps_abs + eps_rel * jnp.maximum(
            jnp.maximum(stats[..., 4], stats[..., 5]), amax_qu)
        conv = jnp.all((stats[..., 0] <= eps_p) & (stats[..., 1] <= eps_d))
        return stats, conv

    x0v, z0v, y0v = x0_ref[:], z0_ref[:], y0_ref[:]
    if 0 < check < n_iters:
        # EARLY EXIT per grid step: grid steps run sequentially on the
        # core, so a tile that stops at its convergence check converts
        # the batch's MEAN iteration count into wall time instead of the
        # fixed budget (warm fleets: most instances converge in a
        # fraction of max_iter while a few stragglers run long).  The
        # OSQP termination test here is IDENTICAL to the caller's
        # (solver/admm.py residuals()), so the outer segment loop agrees
        # with the in-kernel decision.  When `check` does not divide
        # n_iters the FINAL block runs only the remainder, keeping the
        # executed count (stats col 6) exact.
        n_blocks = -(-n_iters // check)

        def seg_cond(c):
            _, _, _, _, it, done = c
            return jnp.logical_not(done) & (it < n_blocks)

        def seg_body(c):
            x, z, y, stats, it, _ = c
            k_len = jnp.minimum(check, n_iters - it * check)
            x, z, y = jax.lax.fori_loop(0, k_len, body, (x, z, y))
            stats, conv = calc_stats(x, z, y)
            return x, z, y, stats, it + 1, conv

        stats0 = jnp.zeros((x0v.shape[0], 1, 8), jnp.float32)
        x, z, y, stats, it, _ = jax.lax.while_loop(
            seg_cond, seg_body,
            (x0v, z0v, y0v, stats0, jnp.asarray(0, jnp.int32),
             jnp.asarray(False)))
        col = jax.lax.broadcasted_iota(jnp.int32, stats.shape, 2)
        executed = jnp.minimum(it * check, n_iters)
        stats = jnp.where(col == 6, executed.astype(jnp.float32),
                          stats)
    else:
        x, z, y = jax.lax.fori_loop(0, n_iters, body, (x0v, z0v, y0v))
        stats, _ = calc_stats(x, z, y)
        col = jax.lax.broadcasted_iota(jnp.int32, stats.shape, 2)
        stats = jnp.where(col == 6, float(n_iters), stats)
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y
    stats_out[:] = stats


@functools.partial(tpu_jit, static_argnames=("n_iters", "sigma", "alpha",
                                             "tile", "interpret", "bf16",
                                             "precision", "m_eq", "check",
                                             "eps_abs", "eps_rel",
                                             "dense_P"))
def admm_iterations(Kinv, A, q, l, u, rho, x0, z0, y0,
                    n_iters: int, sigma: float, alpha: float,
                    tile: int = 1, interpret: bool = False,
                    bf16: bool = False, precision: str = "highest",
                    scalings=None, m_eq: int = 0, check: int = 0,
                    eps_abs: float = 1e-3, eps_rel: float = 1e-3,
                    dense_P: bool = False):
    """Run `n_iters` ADMM iterations for a batch of QPs entirely in VMEM.

    Inputs are the *scaled* problem quantities (post-Ruiz), batched on the
    leading axis.  Returns (x, z, y, stats) with stats (B, 8) the kernel-
    computed UNSCALED residual statistics
    [r_prim, r_dual, max|Ax|, max|z|, max|Px|, max|A'y|, 0, 0]
    (two extra in-VMEM matvecs per segment instead of whole-matrix HBM
    re-reads per residual check).

    scalings: optional (D, E, c, P_unscaled, q_unscaled) Ruiz quantities
    for the stats unscaling; identity scalings when omitted.

    interpret=True runs the kernel in Pallas interpret mode (CPU test
    path asserting bit-level agreement with the XLA backend).
    bf16=True rounds the matrices (and dot inputs) to bfloat16 — the fast
    bulk phase of the solver's precision ladder.
    """
    B, m, n = A.shape
    n_pad = _round_up(n, 128)
    B_pad = _round_up(B, tile)
    f32 = jnp.float32
    mode = "bf16" if bf16 else str(precision)
    if mode not in ("bf16", "high", "highest", "mixed", "mixedk6"):
        raise ValueError(f"unknown precision {precision!r}")
    mixed = mode in ("mixed", "mixedk6")
    if mixed and not 0 < m_eq <= m:
        raise ValueError("mixed precision requires m_eq leading equality "
                         "rows (caller permutes them to the front)")
    if mixed:
        # row space is padded per SEGMENT so the eq/ineq boundary falls on
        # a lane-tile multiple: [eq, pad, ineq, pad]
        m_eq_pad = _round_up(m_eq, 128)
        m_in = m - m_eq
        m_pad = m_eq_pad + _round_up(m_in, 128)
    else:
        m_eq_pad = 0
        m_pad = _round_up(m, 128)
    mat_dtype = jnp.bfloat16 if bf16 else f32

    if scalings is None:
        # identity scalings; P is not an iteration input, so r_dual stats
        # omit the Px term — pass `scalings` whenever stats are consumed
        D = jnp.ones((B, n), f32)
        E = jnp.ones((B, m), f32)
        c = jnp.ones((B,), f32)
        Pu, qu = jnp.zeros_like(q), q
    else:
        D, E, c, Pu, qu = scalings
    if dense_P:
        # symmetric P: the row-vector matvec x_bar @ (D_rows * P) equals
        # P (D x_bar) = P_u x_u
        PuD = D[:, :, None] * Pu
    else:
        PuD = Pu * D
    invDc = 1.0 / (D * c[:, None])

    def pad(arr, shape, fill=0.0, dtype=f32):
        out = jnp.full(shape, fill, dtype)
        sl = tuple(slice(0, s) for s in arr.shape)
        return out.at[sl].set(arr.astype(dtype))

    def padm(arr, fill=0.0):
        """Pad along the row axis; for mixed modes, per segment so row
        m_eq lands at lane-tile-aligned position m_eq_pad."""
        if not mixed:
            return pad(arr, (B_pad,) + arr.shape[1:-1] + (m_pad,),
                       fill=fill)
        out = jnp.full((B_pad,) + arr.shape[1:-1] + (m_pad,), fill, f32)
        out = out.at[:B, ..., :m_eq].set(arr[..., :m_eq].astype(f32))
        return out.at[:B, ..., m_eq_pad:m_eq_pad + m_in].set(
            arr[..., m_eq:].astype(f32))

    def split(M):
        # bf16 (hi, lo) — same total bytes as one fp32 copy
        hi = M.astype(jnp.bfloat16)
        lo = (M - hi.astype(f32)).astype(jnp.bfloat16)
        return hi, lo

    Kp = pad(Kinv, (B_pad, n_pad, n_pad), dtype=f32)
    # identity on the padded diagonal keeps padded x coords stable
    diag_idx = jnp.arange(n, n_pad)
    Kp = Kp.at[:, diag_idx, diag_idx].set(1.0)
    if mixed:
        Aeq = pad(A[:, :m_eq], (B_pad, m_eq_pad, n_pad), dtype=f32)
        Ain = pad(A[:, m_eq:], (B_pad, m_pad - m_eq_pad, n_pad),
                  dtype=f32)
        Ahi, Alo = split(Ain)
        ATeq = jnp.swapaxes(Aeq, -1, -2).copy()
        AThi, ATlo = split(jnp.swapaxes(Ain, -1, -2).copy())
        mats = ([*split(Kp)] if mode == "mixed" else [Kp]) \
            + [Aeq, Ahi, Alo, ATeq, AThi, ATlo]
    elif mode == "high":
        Ap = pad(A, (B_pad, m_pad, n_pad), dtype=f32)
        mats = [*split(Kp), *split(Ap),
                *split(jnp.swapaxes(Ap, -1, -2).copy())]
    else:
        Ap = pad(A, (B_pad, m_pad, n_pad), dtype=f32)
        mats = [Kp.astype(mat_dtype), Ap.astype(mat_dtype),
                jnp.swapaxes(Ap, -1, -2).astype(mat_dtype).copy()]
    vec = lambda a: a[:, None, :]
    qp_ = vec(pad(q, (B_pad, n_pad)))
    lp = vec(padm(l))
    up = vec(padm(u))
    rp = vec(padm(rho, fill=1.0))
    xp = vec(pad(x0, (B_pad, n_pad)))
    zp = vec(padm(z0))
    yp = vec(padm(y0))
    Ep = vec(padm(E, fill=1.0))                    # 1.0: no inf in 1/E pad
    PuDp = (pad(PuD, (B_pad, n_pad, n_pad)) if dense_P
            else vec(pad(PuD, (B_pad, n_pad))))
    qup = vec(pad(qu, (B_pad, n_pad)))
    invDcp = vec(pad(invDc, (B_pad, n_pad)))

    grid = (B_pad // tile,)

    def bspec(*dims):
        kw = {} if _VMEM is None else {"memory_space": _VMEM}
        return pl.BlockSpec((tile,) + dims,
                            lambda i: (i,) + (0,) * len(dims), **kw)

    if mixed:
        m_in_pad = m_pad - m_eq_pad
        k_specs = ([bspec(n_pad, n_pad)] * 2 if mode == "mixed"
                   else [bspec(n_pad, n_pad)])
        mat_specs = k_specs + [
            bspec(m_eq_pad, n_pad),
            bspec(m_in_pad, n_pad), bspec(m_in_pad, n_pad),
            bspec(n_pad, m_eq_pad),
            bspec(n_pad, m_in_pad), bspec(n_pad, m_in_pad)]
    elif mode == "high":
        mat_specs = [bspec(n_pad, n_pad), bspec(n_pad, n_pad),
                     bspec(m_pad, n_pad), bspec(m_pad, n_pad),
                     bspec(n_pad, m_pad), bspec(n_pad, m_pad)]
    else:
        mat_specs = [bspec(n_pad, n_pad), bspec(m_pad, n_pad),
                     bspec(n_pad, m_pad)]
    n_mats = len(mats)
    out = pl.pallas_call(
        functools.partial(_kernel, n_iters, float(sigma), float(alpha),
                          mode, m_eq_pad, int(check), float(eps_abs),
                          float(eps_rel), bool(dense_P)),
        grid=grid,
        in_specs=mat_specs + [
            bspec(1, n_pad),
            bspec(1, m_pad), bspec(1, m_pad), bspec(1, m_pad),
            bspec(1, n_pad), bspec(1, m_pad), bspec(1, m_pad),
            bspec(1, m_pad),
            (bspec(n_pad, n_pad) if dense_P else bspec(1, n_pad)),
            bspec(1, n_pad), bspec(1, n_pad),
        ],
        out_specs=(bspec(1, n_pad), bspec(1, m_pad), bspec(1, m_pad),
                   bspec(1, 8)),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, 1, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, 8), f32),
        ),
        # x0/z0/y0 are dead after the call: aliasing them to the x/z/y
        # outputs keeps the result buffers out of XLA's scoped-VMEM
        # result allocation (5 live whole-batch vector outputs overflow
        # the 16 MB scoped limit at B=2048) and saves three HBM buffers.
        input_output_aliases={n_mats + 4: 0, n_mats + 5: 1, n_mats + 6: 2},
        interpret=interpret,
    )(*mats, qp_, lp, up, rp, xp, zp, yp, Ep, PuDp, qup, invDcp)
    x, z, y, stats = out
    if mixed:
        unpadm = lambda a: jnp.concatenate(
            [a[:B, 0, :m_eq], a[:B, 0, m_eq_pad:m_eq_pad + m_in]],
            axis=-1)
        return (x[:B, 0, :n].astype(A.dtype), unpadm(z).astype(A.dtype),
                unpadm(y).astype(A.dtype), stats[:B, 0, :])
    return (x[:B, 0, :n].astype(A.dtype), z[:B, 0, :m].astype(A.dtype),
            y[:B, 0, :m].astype(A.dtype), stats[:B, 0, :])
