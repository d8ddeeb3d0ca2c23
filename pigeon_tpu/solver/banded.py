"""Block-banded KKT factorization exploiting the MPC stage structure.

The reduced KKT matrix K = diag(P + sigma) + A' diag(rho) A of the MPC QP
is block-TRIDIAGONAL under a stage-interleaved variable ordering: every
constraint row couples variables of at most two consecutive stages
(dynamics q_t,u_t -> q_{t+1}; slew u_t,u_{t+1}; envelope slacks sigma_t
with q_{t+1}; see `pigeon_tpu/qp/coupled.py`).  A dense batched Cholesky of
the 193x193 K costs ~2.4 MFLOP/instance and — much worse on TPU — lowers
through XLA's slow batched factorization path (~160 ms at B=2048).  The
banded factorization here is a 16-step scan of unrolled 13x13 block
operations: ~180x fewer factor flops, all expressed as small batched
matmuls/vector ops that XLA dispatches cheaply.

Produces the same dense K^-1 the Pallas iteration kernel consumes (computed
by block forward/backward substitution against the identity), so it slots
into `_factor_inv` as `factor_method="banded"` with everything downstream
unchanged.  This is SURVEY.md §7's "stagewise Riccati/Cholesky scan" /
"hard part #1" realized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu.config import HorizonParams


# ---------------------------------------------------------------------------
# Stage permutation planning (static, per layout)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def coupled_stage_plan(hz: HorizonParams, use_walls: bool = False):
    """Block plan for the coupled layout: per-stage variable index blocks,
    padded with dummy slots to a uniform width.

    Returns (slots, real_mask, n, bw, nb):
      slots (nb, bw) int32 — original variable index per block slot, with
      dummies pointing at index n (one past the end; callers pad arrays).
    """
    from pigeon_tpu.qp import coupled as qc
    L = qc.get_layout(hz, use_walls)
    S, T, N = hz.N_short, hz.N_short + hz.N_long, hz.N
    blocks = []
    for t in range(N):
        idx = list(L.q[t]) + list(L.u[t])
        if t < T:
            idx += list(L.sig[t]) + [L.dd[t], L.dF[t]]
            if use_walls:
                idx += [L.sw[t]]
        if t < S:
            idx += [L.sHJI[t]]
        blocks.append(np.asarray(idx, np.int32))
    bw = max(len(b) for b in blocks)
    nb = len(blocks)
    n = L.n
    slots = np.full((nb, bw), n, np.int32)       # dummy -> index n
    for t, b in enumerate(blocks):
        slots[t, :len(b)] = b
    # keep slots as STATIC numpy: the gathers below then use static
    # indices (and the un-permute map is computed at trace time)
    return slots, n, bw, nb


# ---------------------------------------------------------------------------
# Unrolled small-block primitives (w <= ~16; everything is vector ops on
# the trailing axes so they batch over vmap transparently)
# ---------------------------------------------------------------------------

def _chol_unrolled(Kb):
    """Cholesky of a (..., w, w) SPD block, unrolled over columns."""
    w = Kb.shape[-1]
    L = jnp.zeros_like(Kb)
    for j in range(w):
        if j == 0:
            d = jnp.sqrt(jnp.maximum(Kb[..., 0, 0], 1e-12))
            L = L.at[..., 0, 0].set(d)
            L = L.at[..., 1:, 0].set(Kb[..., 1:, 0] / d[..., None])
        else:
            r = Kb[..., j, j] - jnp.sum(L[..., j, :j] ** 2, axis=-1)
            d = jnp.sqrt(jnp.maximum(r, 1e-12))
            L = L.at[..., j, j].set(d)
            if j + 1 < w:
                col = (Kb[..., j + 1:, j]
                       - jnp.einsum("...ik,...k->...i", L[..., j + 1:, :j],
                                    L[..., j, :j]))
                L = L.at[..., j + 1:, j].set(col / d[..., None])
    return L

def _inv_lower_unrolled(L):
    """Inverse of a lower-triangular (..., w, w) block via forward
    substitution against the identity, unrolled."""
    w = L.shape[-1]
    X = jnp.zeros_like(L)
    for j in range(w):
        X = X.at[..., j, j].set(1.0 / L[..., j, j])
        if j > 0:
            # row j of X for columns < j: X[j,:j] = -(L[j,:j] @ X[:j,:j])/L[j,j]
            row = -jnp.einsum("...k,...kc->...c", L[..., j, :j],
                              X[..., :j, :j]) / L[..., j, j][..., None]
            X = X.at[..., j, :j].set(row)
    return X


# ---------------------------------------------------------------------------
# Block-tridiagonal Cholesky factor (Linv_t, S_t per stage)
# ---------------------------------------------------------------------------

def _chol_factor_impl(K_diag, K_sub):
    """Sequential stage scan of unrolled block ops (single instance)."""
    bw = K_diag.shape[-1]
    dtype = K_diag.dtype

    def chol_body(Linv_prev, inp):
        Ktt, Koff = inp
        S = Koff @ jnp.swapaxes(Linv_prev, -1, -2)       # K_{t,t-1} L^-T
        D = Ktt - S @ jnp.swapaxes(S, -1, -2)
        L = _chol_unrolled(D)
        Linv = _inv_lower_unrolled(L)
        return Linv, (Linv, S)

    with jax.default_matmul_precision("highest"):
        _, (Linvs, Ss) = jax.lax.scan(
            chol_body, jnp.zeros((bw, bw), dtype), (K_diag, K_sub))
    return Linvs, Ss


def _chol_lane_kernel(nb: int, bw: int, Kd_ref, Ks_ref, Linv_out, S_out):
    """Lane-batched block-tridiagonal Cholesky: instances on the 128-lane
    axis, every scalar of the unrolled 13-column block Cholesky/inverse a
    (lanes,)-wide VPU op.  The XLA scan pays XLA-op dispatch for each of
    the ~500 tiny column operations; in-kernel they are single VPU
    instructions on VMEM-resident data."""
    Kd = Kd_ref[:]                       # (nb, bw, bw, L)
    Ks = Ks_ref[:]
    L = Kd.shape[-1]
    dtype = Kd.dtype
    eps = 1e-12

    def matTmul(A, B):
        # C[i,j,:] = sum_k A[i,k,:] * B[j,k,:]
        acc = A[:, 0:1, :] * jnp.swapaxes(B[:, 0:1, :], 0, 1)
        for k in range(1, bw):
            acc = acc + A[:, k:k + 1, :] * jnp.swapaxes(
                B[:, k:k + 1, :], 0, 1)
        return acc

    Linv_prev = jnp.zeros((bw, bw, L), dtype)
    for t in range(nb):
        Ktt = Kd[t]
        S = matTmul(Ks[t], Linv_prev)
        D = Ktt - matTmul(S, S)
        # unrolled Cholesky of D (bw, bw, L)
        Lm = jnp.zeros((bw, bw, L), dtype)
        for j in range(bw):
            if j == 0:
                d = jnp.sqrt(jnp.maximum(D[0:1, 0:1, :], eps))
                col = D[1:, 0:1, :] / d
                Lm = jnp.concatenate(
                    [jnp.concatenate([d, col], axis=0),
                     jnp.zeros((bw, bw - 1, L), dtype)], axis=1)
            else:
                r = D[j:j + 1, j:j + 1, :] - jnp.sum(
                    Lm[j:j + 1, :j, :] ** 2, axis=1, keepdims=True)
                d = jnp.sqrt(jnp.maximum(r, eps))
                if j + 1 < bw:
                    col = (D[j + 1:, j:j + 1, :] - jnp.sum(
                        Lm[j + 1:, :j, :] * Lm[j:j + 1, :j, :],
                        axis=1, keepdims=True)) / d
                    newcol = jnp.concatenate(
                        [jnp.zeros((j, 1, L), dtype), d, col], axis=0)
                else:
                    newcol = jnp.concatenate(
                        [jnp.zeros((j, 1, L), dtype), d], axis=0)
                parts = [Lm[:, :j, :], newcol]
                if j + 1 < bw:
                    parts.append(Lm[:, j + 1:, :])
                Lm = jnp.concatenate(parts, axis=1)
        # unrolled inverse of lower-triangular Lm
        X = jnp.zeros((bw, bw, L), dtype)
        rows = []
        for j in range(bw):
            invd = 1.0 / Lm[j:j + 1, j:j + 1, :]
            if j == 0:
                row = jnp.concatenate(
                    [invd, jnp.zeros((1, bw - 1, L), dtype)], axis=1)
            else:
                prev = jnp.concatenate(rows, axis=0)     # (j, bw, L)
                acc = -jnp.sum(
                    jnp.swapaxes(Lm[j:j + 1, :j, :], 0, 1) * prev,
                    axis=0, keepdims=True) * invd        # (1, bw, L)
                mask = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, bw, 1), 1) < j)
                row = jnp.where(mask, acc, 0.0)
                parts = [row[:, :j, :], invd]
                if j + 1 < bw:
                    parts.append(jnp.zeros((1, bw - j - 1, L), dtype))
                row = jnp.concatenate(parts, axis=1)
            rows.append(row)
        X = jnp.concatenate(rows, axis=0)
        Linv_out[t] = X
        S_out[t] = S
        Linv_prev = X


def _chol_factor_lane_batched(K_diag_b, K_sub_b, lanes: int = 128):
    """Batched (B, nb, bw, bw) -> (Linvs, Ss), instances on lanes."""
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    B, nb, bw = K_diag_b.shape[0], K_diag_b.shape[1], K_diag_b.shape[-1]
    B_pad = -(-B // lanes) * lanes

    def to_lane(a):
        a = jnp.moveaxis(a, 0, -1)                   # (nb, bw, bw, B)
        if B_pad != B:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (B_pad - B,), a.dtype)],
                axis=-1)
        return a

    Kd, Ks = to_lane(K_diag_b), to_lane(K_sub_b)
    if lanes == 128:
        spec = pl.BlockSpec((nb, bw, bw, lanes), lambda i: (0, 0, 0, i),
                            **vmem_kw)
        Linvs, Ss = pl.pallas_call(
            _ft.partial(_chol_lane_kernel, nb, bw),
            grid=(B_pad // lanes,),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((nb, bw, bw, B_pad), Kd.dtype),
                jax.ShapeDtypeStruct((nb, bw, bw, B_pad), Kd.dtype)),
        )(Kd, Ks)
    else:
        # lanes < 128 (big bw blocks, e.g. the condensed dense 103-wide
        # factor): Mosaic requires the block's lane dim to equal the
        # array's, so run lane-sized chunks under lax.map
        spec = pl.BlockSpec((nb, bw, bw, lanes),
                            lambda: (0, 0, 0, 0), **vmem_kw)

        def run_chunk(args):
            Kd_c, Ks_c = args
            return pl.pallas_call(
                _ft.partial(_chol_lane_kernel, nb, bw),
                in_specs=[spec, spec], out_specs=(spec, spec),
                out_shape=(
                    jax.ShapeDtypeStruct((nb, bw, bw, lanes), Kd.dtype),
                    jax.ShapeDtypeStruct((nb, bw, bw, lanes), Kd.dtype)),
            )(Kd_c, Ks_c)

        n_chunks = B_pad // lanes
        split = lambda a: jnp.stack(
            [a[..., i * lanes:(i + 1) * lanes] for i in range(n_chunks)])
        Linv_c, Ss_c = jax.lax.map(run_chunk, (split(Kd), split(Ks)))
        join = lambda a: jnp.concatenate(list(a), axis=-1)
        Linvs, Ss = join(Linv_c), join(Ss_c)
    back = lambda a: jnp.moveaxis(a[..., :B], -1, 0)
    return back(Linvs), back(Ss)


@functools.lru_cache(maxsize=None)
def _chol_factor_fn():
    @jax.custom_batching.custom_vmap
    def chol_factor(K_diag, K_sub):
        return _chol_factor_impl(K_diag, K_sub)

    @chol_factor.def_vmap
    def _rule(axis_size, in_batched, K_diag_b, K_sub_b):
        if jax.devices()[0].platform == "tpu":
            return _chol_factor_lane_batched(K_diag_b, K_sub_b), \
                (True, True)
        return jax.vmap(_chol_factor_impl)(K_diag_b, K_sub_b), \
            (True, True)

    return chol_factor


def _chol_factor(K_diag, K_sub):
    return _chol_factor_fn()(K_diag, K_sub)


# ---------------------------------------------------------------------------
# Log-N horizon-parallel solve: block cyclic reduction
# ---------------------------------------------------------------------------

def _spd_inv(D):
    """Batched SPD block inverse via unrolled Cholesky: D^-1 = L^-T L^-1."""
    Linv = _inv_lower_unrolled(_chol_unrolled(D))
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def _cr_level(D, L, F):
    """One cyclic-reduction level.  D (m,bw,bw) diagonal blocks, L (m,bw,bw)
    sub-diagonal blocks with L[0] == 0 (L[t] couples row t to column t-1),
    F (m,bw,k) right-hand sides; m odd >= 3.  Eliminates the even-indexed
    unknowns, returning the reduced ((m-1)/2)-block system over the odd
    indices plus the pieces needed for back substitution."""
    De = D[0::2]                                   # (h+1, bw, bw)
    Dinv_e = _spd_inv(De)
    LT = jnp.swapaxes(L, -1, -2)
    G1 = L[1::2] @ Dinv_e[:-1]                     # L_j D_{j-1}^-1, (h,...)
    G2 = LT[2::2] @ Dinv_e[1:]                     # L_{j+1}' D_{j+1}^-1
    D2 = D[1::2] - G1 @ LT[1::2] - G2 @ L[2::2]
    L2 = -G1 @ L[0::2][:-1]                        # L[0]==0 => L2[0]==0
    F2 = F[1::2] - G1 @ F[0::2][:-1] - G2 @ F[2::2]
    return Dinv_e, D2, L2, F2


def _cr_back(Dinv_e, L, F, x_odd):
    """Back-substitute the even-indexed unknowns given the odd solution."""
    h = x_odd.shape[0]
    bw, k = F.shape[-2], F.shape[-1]
    z = jnp.zeros((1, bw, k), F.dtype)
    x_prev = jnp.concatenate([z, x_odd])           # x_{j-1} for even j=2i
    x_next = jnp.concatenate([x_odd, z])           # x_{j+1}
    LT_next = jnp.concatenate(
        [jnp.swapaxes(L[1::2], -1, -2),
         jnp.zeros((1, bw, bw), L.dtype)])         # L_{j+1}' (0 past end)
    x_e = Dinv_e @ (F[0::2] - L[0::2] @ x_prev - LT_next @ x_next)
    m = 2 * h + 1
    out = jnp.zeros((m, bw, k), F.dtype)
    return out.at[0::2].set(x_e).at[1::2].set(x_odd)


def _cr_solve(D, L, F):
    if D.shape[0] == 1:
        return _spd_inv(D) @ F
    Dinv_e, D2, L2, F2 = _cr_level(D, L, F)
    x_odd = _cr_solve(D2, L2, F2)
    return _cr_back(Dinv_e, L, F, x_odd)


def solve_block_tridiag_cr(K_diag, K_sub, rhs):
    """Horizon-parallel solve of the SPD block-tridiagonal system via block
    cyclic reduction: ceil(log2 nb) elimination levels of BATCHED block
    matmuls/inverses instead of the O(nb) sequential Cholesky stage scan
    (`_chol_factor_impl`).  This is the SURVEY §5 long-context obligation
    realized on the KKT factorization axis itself — each level halves the
    number of coupled stages, every block op within a level is independent
    and vmap-batched onto the MXU, so wall-clock depth is logarithmic in
    the horizon length.

    K_diag (nb, bw, bw); K_sub (nb, bw, bw) with K_sub[0] == 0 and K_sub[t]
    coupling stage t to stage t-1 (the `factor_inv_banded` convention);
    rhs (nb, bw, k).  Returns x with K x = rhs, shape (nb, bw, k).

    The grid is padded with decoupled identity blocks to m = 2^q - 1 so
    every level has an odd block count; padded unknowns solve to zero and
    never couple back.  Cyclic reduction of an SPD block-tridiagonal
    matrix keeps every reduced diagonal block SPD, so the unrolled
    Cholesky block inverses stay well-posed at each level.
    """
    nb, bw = K_diag.shape[0], K_diag.shape[-1]
    dtype = K_diag.dtype
    q = max(1, int(np.ceil(np.log2(nb + 1))))
    m = 2 ** q - 1
    pad = m - nb
    with jax.default_matmul_precision("highest"):
        if pad:
            eye = jnp.broadcast_to(jnp.eye(bw, dtype=dtype), (pad, bw, bw))
            D = jnp.concatenate([K_diag, eye])
            L = jnp.concatenate([K_sub, jnp.zeros((pad, bw, bw), dtype)])
            F = jnp.concatenate(
                [rhs, jnp.zeros((pad,) + rhs.shape[1:], dtype)])
        else:
            D, L, F = K_diag, K_sub, rhs
        x = _cr_solve(D, L, F)
    return x[:nb]


# ---------------------------------------------------------------------------
# Banded K^-1
# ---------------------------------------------------------------------------

def factor_inv_banded(Pb, Ab, rho_vec, sigma, slots, n: int, bw: int,
                      nb: int, tp_axis: str | None = None,
                      method: str = "scan"):
    """Dense K^-1 via block-tridiagonal Cholesky of the stage-permuted K.

    Pb (n,), Ab (m, n), rho_vec (m,) are the scaled problem quantities;
    `slots` the static stage plan.  Single instance (vmap for batching).

    tp_axis: optional shard_map mesh axis name for TENSOR-PARALLEL
    factorization — the identity right-hand-side columns of the forward
    substitution K X = I are split across the axis (each member solves
    n_perm/tp columns and computes its column block of K^-1 = W'W), then
    column blocks are re-assembled with `all_gather` over ICI.  This
    shards the dominant factorization flops (substitution + W'W) across
    chips for the latency-critical small-batch configuration (SURVEY.md
    §2 "Tensor parallel" axis).

    method: "scan" (default) — sequential block-Cholesky stage scan +
    forward substitution (O(nb) depth, lane-batched Pallas kernel when
    vmapped); "cr" — block cyclic reduction of K X = I (O(log nb) depth,
    `solve_block_tridiag_cr`) for long horizons.
    """
    dtype = Pb.dtype
    P_ext = jnp.concatenate([Pb + sigma, jnp.ones((1,), dtype)])
    P_blk = P_ext[slots]                          # (nb, bw)

    # Dense K = A' rho A as ONE MXU GEMM, then gather the stage blocks
    # with static indices (dummy slots read the zero padding row/col).
    # The per-stage-pair einsum formulation this replaces lowered to
    # nb x (m, bw, bw) contractions at ~2% MXU utilization (15.5 ms at
    # B=2048; see profiling.py).  Full fp32 ("highest") precision is
    # REQUIRED throughout the factorization: K's condition number (rho_eq
    # = 1e3*rho equality rows) amplifies matmul error into K^-1, and a
    # 3-pass ("high") factor was measured to destroy ADMM convergence
    # (dual residual floor ~2 vs 0.14; fleet conv 0.10 vs 0.93).
    with jax.default_matmul_precision("highest"):
        K_full = (Ab.T * rho_vec[None, :]) @ Ab   # (n, n)
    K_ext = jnp.pad(K_full, ((0, 1), (0, 1)))
    K_diag = K_ext[slots[:, :, None], slots[:, None, :]]    # (nb, bw, bw)
    K_diag = K_diag + jax.vmap(jnp.diag)(P_blk)
    K_sub = K_ext[slots[1:, :, None], slots[:-1, None, :]]  # (nb-1, bw, bw)
    K_sub = jnp.concatenate([jnp.zeros((1, bw, bw), dtype), K_sub])

    n_perm = nb * bw
    eye_full = jnp.zeros((n_perm, n_perm), dtype)
    rows = jnp.arange(n_perm)
    eye_full = eye_full.at[rows, rows].set(1.0)

    if method == "cr":
        if tp_axis is not None:
            raise NotImplementedError(
                "cyclic-reduction factor does not compose with tp_axis")
        X = solve_block_tridiag_cr(K_diag, K_sub,
                                   eye_full.reshape(nb, bw, n_perm))
        Kinv = _unpermute(X.reshape(n_perm, n_perm), slots, n, n_perm)
        # one Newton polish X <- X(2I - KX): the log-depth elimination
        # compounds Schur-complement rounding across levels in fp32 (the
        # sequential Cholesky scan does not), and the polish squares that
        # residual for two extra matmuls — measured to restore closed-loop
        # convergence parity with the scan factor.
        with jax.default_matmul_precision("highest"):
            K_dense = K_full + jnp.diag(Pb + sigma)
            Kinv = Kinv @ (2.0 * jnp.eye(n, dtype=dtype) - K_dense @ Kinv)
        return Kinv

    Linvs, Ss = _chol_factor(K_diag, K_sub)

    if tp_axis is not None:
        # tensor-parallel: this member solves only its column slice of I
        tp_size = jax.lax.psum(1, tp_axis)
        cols = n_perm // tp_size
        start = jax.lax.axis_index(tp_axis) * cols
        eye_blocks = jax.lax.dynamic_slice_in_dim(
            eye_full, start, cols, axis=1).reshape(nb, bw, cols)
    else:
        eye_blocks = eye_full.reshape(nb, bw, n_perm)

    # forward substitution: y_t = Linv_t (I_t - S_t y_{t-1})
    def fwd_body(y_prev, inp):
        Linv, S, It = inp
        y = Linv @ (It - S @ y_prev)
        return y, y

    with jax.default_matmul_precision("highest"):
        _, ys = jax.lax.scan(
            fwd_body, jnp.zeros((bw, eye_blocks.shape[-1]), dtype),
            (Linvs, Ss, eye_blocks))

        # The forward solve against the identity IS W = L^-1 (block rows);
        # K^-1 = (L L^T)^-1 = L^-T L^-1 = W^T W: one dense MXU matmul
        # replaces the 16-step backward-substitution scan.
        if tp_axis is not None:
            W_shard = ys.reshape(n_perm, -1)           # (n_perm, cols)
            # full W on every member (ICI all-gather), then each computes
            # its own K^-1 column block and the blocks are re-assembled
            W = jax.lax.all_gather(W_shard, tp_axis, axis=1, tiled=True)
            Kinv_cols = W.T @ W_shard                  # (n_perm, cols)
            Kinv_perm = jax.lax.all_gather(Kinv_cols, tp_axis, axis=1,
                                           tiled=True)
        else:
            W = ys.reshape(n_perm, n_perm)
            Kinv_perm = W.T @ W
    return _unpermute(Kinv_perm, slots, n, n_perm)


def _unpermute(Kinv_perm, slots, n: int, n_perm: int):
    # un-permute: real variable i lives at permuted position pos[i]
    # (slots is static numpy, so this is all trace-time index arithmetic)
    slots_flat = slots.reshape(-1)
    pos = np.zeros(n + 1, np.int64)
    pos[slots_flat] = np.arange(n_perm)
    pos = jnp.asarray(pos[:n])
    return Kinv_perm[pos][:, pos]
