"""Integration and horizon linearization.

TPU-native replacement for the reference's external
`DifferentialDynamicsModels` / `LinearDynamicsModels` dependencies
(SURVEY.md §1 "External stack"): RK4 `propagate`, and discrete affine models

    ZOH:  q+ = A q + B  u            + c   (StepControl)
    FOH:  q+ = A q + B0 u_t + Bf u_{t+1} + c   (RampControl)

obtained either by `jax.jacfwd` through the integrator (the coupled
controller's path, reference `src/coupled_lat_long.jl:253,262`) or by exact
discretization of the continuously-linearized system via a fixed
scaling-and-squaring matrix exponential (the decoupled controller's
double-linearization, reference `src/decoupled_lat_long.jl:172-173,182-183`).

All dynamics callables have signature f(q, ur) -> qdot with the trailing
`ur` the stacked [u2; p4] input; `n_keep` columns of the input Jacobian stay
decision variables, the rest (trajectory parameters) fold into the affine
offset c — replicating `keep_control_dims` semantics
(SURVEY.md §1, `linearize` bullets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# RK4 integration
# ---------------------------------------------------------------------------

def rk4_step(f, q, ur, dt):
    """One classical RK4 step with constant input."""
    k1 = f(q, ur)
    k2 = f(q + 0.5 * dt * k1, ur)
    k3 = f(q + 0.5 * dt * k2, ur)
    k4 = f(q + dt * k3, ur)
    return q + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rk4_step_ramp(f, q, ur0, urf, dt):
    """One RK4 step with input ramping linearly ur0 -> urf over dt
    (RampControl semantics): stage inputs at tau = 0, dt/2, dt/2, dt."""
    urm = 0.5 * (ur0 + urf)
    k1 = f(q, ur0)
    k2 = f(q + 0.5 * dt * k1, urm)
    k3 = f(q + 0.5 * dt * k2, urm)
    k4 = f(q + dt * k3, urf)
    return q + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def propagate(f, q, ur, dt, substeps: int = 1):
    """Integrate f over dt with constant input (reference `propagate`, used
    for the plant step in `simulate`, `src/model_predictive_control.jl:94`)."""
    h = dt / substeps
    for _ in range(substeps):
        q = rk4_step(f, q, ur, h)
    return q


# ---------------------------------------------------------------------------
# Discrete linearization by jacfwd through the integrator
# ---------------------------------------------------------------------------

def linearize_zoh(f, q, ur, dt, n_keep: int, substeps: int = 1):
    """Discrete ZOH affine model by differentiating an RK4 step
    (reference call site `src/coupled_lat_long.jl:253,336`).

    CAUTION: explicit RK4 is only stable for |lambda|*dt/substeps < 2.78;
    the vehicle's lateral tire dynamics have |lambda| up to ~250/Ux 1/s, so
    a single step over dt_long=0.2 produces an *amplifying* discrete model.
    Use enough substeps, or prefer `linearize_affine_zoh` (exact,
    unconditionally stable)."""
    def g(q_, ur_):
        return propagate(f, q_, ur_, dt, substeps)

    A = jax.jacfwd(g, argnums=0)(q, ur)
    B_full = jax.jacfwd(g, argnums=1)(q, ur)
    B = B_full[:, :n_keep]
    c = g(q, ur) - A @ q - B @ ur[:n_keep]
    return A, B, c


def linearize_foh(f, q, ur0, urf, dt, n_keep: int, substeps: int = 1):
    """Discrete FOH affine model by differentiating a ramp-input RK4 step
    (reference call site `src/coupled_lat_long.jl:262,348`).
    Same stability caveat as `linearize_zoh`."""
    def g(q_, ur0_, urf_):
        h = dt / substeps
        qq = q_
        for i in range(substeps):
            a0 = i / substeps
            af = (i + 1) / substeps
            u_a = ur0_ + (urf_ - ur0_) * a0
            u_b = ur0_ + (urf_ - ur0_) * af
            qq = rk4_step_ramp(f, qq, u_a, u_b, h)
        return qq

    A = jax.jacfwd(g, argnums=0)(q, ur0, urf)
    B0 = jax.jacfwd(g, argnums=1)(q, ur0, urf)[:, :n_keep]
    Bf = jax.jacfwd(g, argnums=2)(q, ur0, urf)[:, :n_keep]
    c = (g(q, ur0, urf) - A @ q - B0 @ ur0[:n_keep] - Bf @ urf[:n_keep])
    return A, B0, Bf, c


# ---------------------------------------------------------------------------
# Exact discretization of the continuously-linearized system
# ---------------------------------------------------------------------------

def expm_fixed(M, squarings: int = 8, order: int = 8,
               precision: str = "highest"):
    """Matrix exponential by fixed scaling-and-squaring + Taylor series.

    Deterministic and branch-free (unlike Pade implementations with
    norm-dependent scaling), hence cheap to vmap/jit on TPU.  With
    squarings=8 the scaled norm is ||M||/256; Taylor-8 then gives ~1e-14
    relative error for ||M|| up to ~10, which covers the vehicle Jacobians
    (|entries| * dt_long <~ 8; worst case ~190/s tire modes at V_min=1).

    precision: TPU matmul precision for the chain.  "highest" (6-pass
    fp32 emulation) for reference-grade accuracy; "high" (3-pass, ~5e-7
    relative per matmul, ~2^squarings amplified) is plenty for the MPC
    constraint rows at the solver's 1e-3 tolerance and twice as fast on
    the hot path.  The default bf16 single pass would wreck the
    repeated-squaring error amplification — never use it here.
    """
    n = M.shape[-1]
    S = M / (2.0 ** squarings)
    eye = jnp.eye(n, dtype=M.dtype)
    with jax.default_matmul_precision(precision):
        # Horner evaluation of sum_k S^k / k!
        E = eye + S / order
        for k in range(order - 1, 0, -1):
            E = eye + (S @ E) / k
        for _ in range(squarings):
            E = E @ E
    return E


def _continuous_affine(f, q, ur):
    """Continuous linearization qdot ~= Jq q + Ju ur + ct at (q, ur)
    (the reference's inner `linearize(dyn, q, ur)`,
    `src/decoupled_lat_long.jl:172,182`)."""
    Jq = jax.jacfwd(f, argnums=0)(q, ur)
    Ju = jax.jacfwd(f, argnums=1)(q, ur)
    ct = f(q, ur) - Jq @ q - Ju @ ur
    return Jq, Ju, ct


def linearize_affine_zoh(f, q, ur, dt, n_keep: int):
    """Continuous-linearize then exactly ZOH-discretize (the decoupled
    controller's double linearization, `src/decoupled_lat_long.jl:172-178`)."""
    n = q.shape[-1]
    m = ur.shape[-1]
    Jq, Ju, ct = _continuous_affine(f, q, ur)
    M = jnp.zeros((n + m + 1, n + m + 1), dtype=q.dtype)
    M = M.at[:n, :n].set(Jq)
    M = M.at[:n, n:n + m].set(Ju)
    M = M.at[:n, -1].set(ct)
    E = expm_fixed(M * dt)
    A = E[:n, :n]
    B_full = E[:n, n:n + m]
    c = E[:n, -1] + B_full[:, n_keep:] @ ur[n_keep:]
    return A, B_full[:, :n_keep], c


def linearize_affine_foh(f, q, ur0, urf, dt, n_keep: int):
    """Continuous-linearize then exactly FOH-discretize
    (`src/decoupled_lat_long.jl:182-189`).

    Augmented state z = [q; u; v; 1] with udot = v (the ramp slope,
    v = (urf-ur0)/dt) and vdot = 0; reading off the blocks of expm gives
    A = Phi_qq, Bf = Phi_qv/dt, B0 = Phi_qu - Phi_qv/dt, c = Phi_q1.
    """
    n = q.shape[-1]
    m = ur0.shape[-1]
    Jq, Ju, ct = _continuous_affine(f, q, ur0)
    dim = n + 2 * m + 1
    M = jnp.zeros((dim, dim), dtype=q.dtype)
    M = M.at[:n, :n].set(Jq)
    M = M.at[:n, n:n + m].set(Ju)
    M = M.at[:n, -1].set(ct)
    M = M.at[n:n + m, n + m:n + 2 * m].set(jnp.eye(m, dtype=q.dtype))
    E = expm_fixed(M * dt)
    A = E[:n, :n]
    Phi_qu = E[:n, n:n + m]
    Phi_qv = E[:n, n + m:n + 2 * m]
    B0_full = Phi_qu - Phi_qv / dt
    Bf_full = Phi_qv / dt
    c = (E[:n, -1] + B0_full[:, n_keep:] @ ur0[n_keep:]
         + Bf_full[:, n_keep:] @ urf[n_keep:])
    return A, B0_full[:, :n_keep], Bf_full[:, :n_keep], c


def linearize_affine_horizon(f, qs, urs, urs_next, dts, n_keep: int):
    """Fused exact affine linearization of a whole horizon in one batched
    expm call.

    qs (T, n), urs (T, m): nominal state/input per stage; urs_next (T, m)
    the next-knot inputs (used by FOH stages); dts (T,); foh_mask (T,) in
    `urs_next`'s construction decides hold order implicitly: ZOH stages are
    embedded in the same (n + 2m + 1) augmentation with a zero ramp block,
    for which exp() provably leaves Phi_qv = 0, so the shared extraction
    B0 = Phi_qu - Phi_qv/dt, Bf = Phi_qv/dt degenerates to the ZOH model
    with Bf = 0.  One (T, n+2m+1, n+2m+1) expm replaces two smaller vmapped
    chains — half the batched-matmul dispatches on TPU.

    Returns (A (T,n,n), B0 (T,n,k), Bf (T,n,k), c (T,n)); `foh` stages are
    those where urs_next differs — the caller selects which stage uses Bf.
    """
    n = qs.shape[-1]
    m = urs.shape[-1]
    T = qs.shape[0]

    Jq = jax.vmap(jax.jacfwd(f, argnums=0))(qs, urs)
    Ju = jax.vmap(jax.jacfwd(f, argnums=1))(qs, urs)
    f0 = jax.vmap(f)(qs, urs)
    ct = (f0 - jnp.einsum("tij,tj->ti", Jq, qs)
          - jnp.einsum("tij,tj->ti", Ju, urs))

    dim = n + 2 * m + 1
    M = jnp.zeros((T, dim, dim), qs.dtype)
    M = M.at[:, :n, :n].set(Jq)
    M = M.at[:, :n, n:n + m].set(Ju)
    M = M.at[:, :n, -1].set(ct)
    return M, dim


def extract_affine_horizon(E, dts, urs, urs_next, n: int, m: int,
                           n_keep: int):
    """Extract (A, B0, Bf, c) blocks from the batched expm result."""
    A = E[:, :n, :n]
    Phi_qu = E[:, :n, n:n + m]
    Phi_qv = E[:, :n, n + m:n + 2 * m]
    Bf_full = Phi_qv / dts[:, None, None]
    B0_full = Phi_qu - Bf_full
    c = (E[:, :n, -1]
         + jnp.einsum("tij,tj->ti", B0_full[:, :, n_keep:],
                      urs[:, n_keep:])
         + jnp.einsum("tij,tj->ti", Bf_full[:, :, n_keep:],
                      urs_next[:, n_keep:]))
    return A, B0_full[:, :, :n_keep], Bf_full[:, :, :n_keep], c


def linearize_horizon_fused(f, qs, urs, dts, S: int, n_keep: int,
                            squarings: int = 8, order: int = 8,
                            precision: str = "highest"):
    """ZOH for stages [0, S), FOH for [S, T): one fused expm.

    urs has N = T+1 rows (inputs at every knot); FOH stages ramp
    urs[t] -> urs[t+1]; ZOH stages hold urs[t] (ramp block zeroed, for
    which Phi_qv is exactly 0, so the shared extraction degenerates to
    the ZOH model with Bf = 0).  One (T, n+2m+1, ...) expm chain replaces
    the two per-hold-order vmapped chains — the single largest batched-
    matmul-dispatch reduction on the QP assembly hot path (the split
    chains were ~57 ms at B=2048 on v5e; see profiling.py).
    """
    T = dts.shape[0]
    n = qs.shape[-1]
    m = urs.shape[-1]
    Jq = jax.vmap(jax.jacfwd(f, argnums=0))(qs[:T], urs[:T])
    Ju = jax.vmap(jax.jacfwd(f, argnums=1))(qs[:T], urs[:T])
    f0 = jax.vmap(f)(qs[:T], urs[:T])
    ct = (f0 - jnp.einsum("tij,tj->ti", Jq, qs[:T])
          - jnp.einsum("tij,tj->ti", Ju, urs[:T]))
    foh = (jnp.arange(T) >= S).astype(qs.dtype)
    d3 = dts[:, None, None]
    A, Phi_qu, Phi_qv, zcol = _vanloan_stages(
        Jq * d3, Ju * d3, (ct * dts[:, None])[..., None], foh * dts,
        squarings, order, precision)
    Bf_full = Phi_qv / d3
    B0_full = Phi_qu - Bf_full
    urs_next = urs[1:]
    c = (zcol[..., 0]
         + jnp.einsum("tij,tj->ti", B0_full[:, :, n_keep:],
                      urs[:T, n_keep:])
         + jnp.einsum("tij,tj->ti", Bf_full[:, :, n_keep:],
                      urs_next[:, n_keep:]))
    return A, B0_full[:, :, :n_keep], Bf_full[:, :, :n_keep], c


def _expm_chain_kernel(squarings: int, order: int, m_ref, out_ref):
    """Whole scaling-and-squaring chain on a VMEM-resident block of
    packed stage matrices ((TILE,) G, D, D).  Leading dims merge into
    ONE batch dim (Mosaic's matmul supports at most one)."""
    blk = m_ref[:]
    shape = blk.shape
    D = shape[-1]
    S = blk.reshape((-1, D, D)) * (1.0 / 2.0 ** squarings)
    row = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 2)
    eye = (row == col).astype(S.dtype)
    dims = (((2,), (1,)), ((0,), (0,)))

    def mm(A, B):
        return jax.lax.dot_general(
            A, B, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    E = eye + S * (1.0 / order)
    for k in range(order - 1, 0, -1):
        E = eye + mm(S, E) * (1.0 / k)
    for _ in range(squarings):
        E = mm(E, E)
    out_ref[:] = E.reshape(shape)


def _expm_chain_batched(big_b, squarings: int, order: int, tile: int = 8):
    """Explicitly-tiled batched expm chain: TILE instances per grid step
    (a 1-instance grid step is ~2 us of MXU work against ~16 us of
    per-step overhead — the whole win of the in-VMEM chain drowns)."""
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    B, G, D = big_b.shape[0], big_b.shape[1], big_b.shape[-1]
    B_pad = -(-B // tile) * tile
    if B_pad != B:
        big_b = jnp.concatenate(
            [big_b, jnp.zeros((B_pad - B, G, D, D), big_b.dtype)])
    spec = pl.BlockSpec((tile, G, D, D), lambda i: (i, 0, 0, 0),
                        **vmem_kw)
    out = pl.pallas_call(
        _ft.partial(_expm_chain_kernel, squarings, order),
        grid=(B_pad // tile,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, G, D, D), big_b.dtype),
    )(big_b)
    return out[:B]


def _expm_lane_kernel(squarings: int, order: int, d: int, m_ref, out_ref):
    """Lane-batched expm chain: instances on the 128-lane axis.

    The stage matrices are TINY (19x19) — on the MXU each matmul of the
    chain is one underutilized tile plus fixed per-op overhead, and the
    block-diagonal packing still measured ~30 ms at B=2048.  With the
    BATCH on lanes, each 19x19 matmul is 19 broadcast multiply-accumulate
    VPU ops over (T, d, d, 128) blocks: ~2.5 G MACs total at B=2048 =
    ~2 ms of VPU time.  Block layout (T, d, d, LANES)."""
    S = m_ref[:] * (1.0 / 2.0 ** squarings)        # (T, d, d, L)
    row = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, S.shape, 2)
    eye = (row == col).astype(S.dtype)

    def mm(A, B):
        # C[t,a,b,L] = sum_c A[t,a,c,L] * B[t,c,b,L]
        acc = A[:, :, 0:1, :] * B[:, 0:1, :, :]
        for c in range(1, d):
            acc = acc + A[:, :, c:c + 1, :] * B[:, c:c + 1, :, :]
        return acc

    E = eye + S * (1.0 / order)
    for k in range(order - 1, 0, -1):
        E = eye + mm(S, E) * (1.0 / k)
    for _ in range(squarings):
        E = mm(E, E)
    out_ref[:] = E


def _expm_lane_batched(M_b, squarings: int, order: int, lanes: int = 128):
    """M_b (B, T, d, d) -> expm per stage, instances mapped onto lanes."""
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    B, T, d = M_b.shape[0], M_b.shape[1], M_b.shape[-1]
    # chunk the batch so each pallas result stays well under the scoped
    # VMEM budget (XLA places custom-call results in VMEM when they fit).
    # chunk MUST be a lane multiple: the grid dimension chunk//lanes
    # truncates, and a ragged tail would leave its lanes unwritten.
    chunk = -(-max(lanes, min(1024, B)) // lanes) * lanes
    B_pad = -(-B // chunk) * chunk
    Mt = jnp.moveaxis(M_b, 0, -1)                   # (T, d, d, B)
    if B_pad != B:
        Mt = jnp.concatenate(
            [Mt, jnp.zeros((T, d, d, B_pad - B), Mt.dtype)], axis=-1)
    # block over stages too: the chain's live temporaries are ~4x the
    # block size, so a whole-horizon block at 128 lanes blows the scoped
    # VMEM budget
    T_blk = T
    for cand in (5, 4, 3, 2, 1):
        if T % cand == 0 and cand * d * d * lanes * 4 * 8 < 24 * 2 ** 20:
            T_blk = cand
            break
    spec = pl.BlockSpec((T_blk, d, d, lanes), lambda t, i: (t, 0, 0, i),
                        **vmem_kw)

    def run_chunk(Mc):
        return pl.pallas_call(
            _ft.partial(_expm_lane_kernel, squarings, order, d),
            grid=(T // T_blk, chunk // lanes),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T, d, d, chunk), Mt.dtype),
        )(Mc)

    n_chunks = B_pad // chunk
    if n_chunks == 1:
        out = run_chunk(Mt)
    else:
        chunks = jnp.stack(
            [Mt[..., i * chunk:(i + 1) * chunk]
             for i in range(n_chunks)])
        out_c = jax.lax.map(run_chunk, chunks)
        out = jnp.concatenate(list(out_c), axis=-1)
    return jnp.moveaxis(out[..., :B], -1, 0)        # (B, T, d, d)


def _make_expm_chain_pallas(squarings: int, order: int):
    """custom_vmap wrapper: the single-instance Pallas chain whose vmap
    rule dispatches to the explicitly-tiled batched kernel.

    The MPC step vmaps per-instance pre-solve code; without this rule,
    vmapping the pallas_call maps instances onto the grid with block
    size 1 and per-grid-step overhead dominates (measured ~33 ms at
    B=2048 vs ~6 ms tiled).  The XLA chain materializes every
    Horner/squaring intermediate to HBM — ~15 GB at B=2048, ~43 ms —
    so the in-VMEM chain (one HBM read + write) is the win; HIGHEST
    (6-pass fp32) matmul precision throughout.
    """
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    @jax.custom_batching.custom_vmap
    def expm_chain(big):
        G, D = big.shape[0], big.shape[-1]
        spec = pl.BlockSpec((G, D, D), lambda: (0, 0, 0), **vmem_kw)
        return pl.pallas_call(
            _ft.partial(_expm_chain_kernel, squarings, order),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((G, D, D), big.dtype),
        )(big)

    @expm_chain.def_vmap
    def _expm_chain_vmap(axis_size, in_batched, big_b):
        out = _expm_chain_batched(big_b, squarings, order)
        return out, True

    return expm_chain


@functools.lru_cache(maxsize=None)
def _expm_chain_pallas_cached(squarings: int, order: int):
    return _make_expm_chain_pallas(squarings, order)


def _expm_chain_pallas(big, squarings: int, order: int):
    return _expm_chain_pallas_cached(squarings, order)(big)


@functools.lru_cache(maxsize=None)
def _expm_stages_cached(squarings: int, order: int, precision: str):
    impl = lambda M: _expm_stage_packed_impl(M, squarings, order,
                                             precision)

    @jax.custom_batching.custom_vmap
    def expm_stages(M):
        return impl(M)

    @expm_stages.def_vmap
    def _rule(axis_size, in_batched, M_b):
        # batched callers (the vmapped MPC pre-solve) route to the
        # lane-batched kernel on TPU — per-instance dispatch of tiny
        # matmul chains is overhead-bound either way it's expressed
        if jax.devices()[0].platform == "tpu" and M_b.shape[1] > 1:
            return _expm_lane_batched(M_b, squarings, order), True
        return jax.vmap(impl)(M_b), True

    return expm_stages


def _expm_stage_packed(M, squarings: int, order: int, precision: str):
    return _expm_stages_cached(int(squarings), int(order),
                               str(precision))(M)


def _expm_stage_packed_impl(M, squarings: int, order: int, precision: str):
    """expm of a (T, d, d) stack via block-diagonal packing.

    A d=19 stage matrix uses <2.3% of a 128x128 MXU pass; packing
    k = 128//d stages into one (k*d, k*d) block-diagonal matrix makes each
    matmul of the scaling-and-squaring chain k stages wide (~6x fewer MXU
    dispatches for the coupled horizon's T=15 chain).  Exact: products and
    the identity preserve block-diagonal structure, so the result blocks
    equal the per-stage expm; dummy zero blocks exponentiate to I and are
    discarded.
    """
    T, d = M.shape[0], M.shape[-1]
    k = max(1, 128 // d)
    if k == 1 or T <= 1:
        return expm_fixed(M, squarings=squarings, order=order,
                          precision=precision)
    G = -(-T // k)                                   # ceil
    pad = G * k - T
    Mp = jnp.concatenate(
        [M, jnp.zeros((pad, d, d), M.dtype)]) if pad else M
    # The packed matrix is padded to the full 128x128 MXU tile: k*d=114
    # is not sublane-aligned and every matmul of the chain would pay a
    # relayout; the trailing zero block exponentiates to I and is never
    # extracted.
    D = 128
    big = jnp.zeros((G, D, D), M.dtype)
    Mg = Mp.reshape(G, k, d, d)
    for j in range(k):
        big = big.at[:, j * d:(j + 1) * d, j * d:(j + 1) * d].set(Mg[:, j])
    if jax.devices()[0].platform == "tpu":
        Eb = _expm_chain_pallas(big, squarings=squarings, order=order)
    else:
        Eb = expm_fixed(big, squarings=squarings, order=order,
                        precision=precision)
    Es = [Eb[:, j * d:(j + 1) * d, j * d:(j + 1) * d] for j in range(k)]
    E = jnp.stack(Es, axis=1).reshape(G * k, d, d)
    return E[:T]


# ---------------------------------------------------------------------------
# Structured (Van Loan) expm for the horizon augmentation
# ---------------------------------------------------------------------------
#
# The fused-horizon stage matrix is block upper triangular,
#
#     M dt = [[ P, Cu, 0, cc ],        P  = Jq dt   (n x n)
#             [ 0,  0, rI, 0  ],        Cu = Ju dt   (n x m)
#             [ 0,  0,  0, 0  ],        cc = c  dt   (n x 1)
#             [ 0,  0,  0, 0  ]]        r  = foh dt  (scalar)
#
# with a NILPOTENT lower-right block (the FOH ramp injection K, K^2 = 0).
# exp(M dt) therefore needs only the n x n chain and its action on the
# (2m+1) augmentation columns:
#
#     e11 = sum_j P^j / j!                     (the state transition)
#     e12 = U C + W C K,  U = sum P^i/(i+1)!,  W = sum P^i/(i+2)!
#     squaring: e12' = e11 e12 + e12 + r_cur * shift(e12), r_cur *= 2
#
# Tracked as three column groups X (u), Y (ramp), z (affine), this replaces
# the dense (n+2m+1)^2 chain (17x17 for the decoupled model) with n x n and
# n x m MACs — ~20x fewer flops AND it never materializes the (B, T, 17, 17)
# mostly-zero augmented operand (284 MB at B=8192) that dominated the
# jacobian phase of the decoupled assembly (scripts/exp_assemble_phases.py).

def _vanloan_lane_kernel(squarings: int, order: int, n: int, m: int,
                         p_ref, cu_ref, cc_ref, r_ref,
                         a_ref, x_ref, y_ref, z_ref):
    import math as _math

    s = 1.0 / 2.0 ** squarings
    P = p_ref[:] * s                               # (T, n, n, L)
    Cu = cu_ref[:] * s                             # (T, n, m, L)
    cc = cc_ref[:] * s                             # (T, n, 1, L)
    r = r_ref[:][:, None, None, :] * s             # (T, 1, 1, L)

    row = jax.lax.broadcasted_iota(jnp.int32, P.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, P.shape, 2)
    eye = (row == col).astype(P.dtype)

    def mm(A, B):
        # C[t,a,b,L] = sum_c A[t,a,c,L] * B[t,c,b,L]
        acc = A[:, :, 0:1, :] * B[:, 0:1, :, :]
        for c in range(1, A.shape[2]):
            acc = acc + A[:, :, c:c + 1, :] * B[:, c:c + 1, :, :]
        return acc

    # phi-function Taylor sums, truncated to match the dense order-`order`
    # polynomial exactly: e11 keeps P^j, j<=order; U keeps j<=order-1
    # (from M^j's P^{j-1} C term); W keeps j<=order-2 (P^{j-2} C K term)
    Pj = eye
    e11 = eye
    U = eye
    W = eye * 0.5
    for j in range(1, order + 1):
        Pj = mm(Pj, P)
        e11 = e11 + Pj * (1.0 / _math.factorial(j))
        if j <= order - 1:
            U = U + Pj * (1.0 / _math.factorial(j + 1))
        if j <= order - 2:
            W = W + Pj * (1.0 / _math.factorial(j + 2))

    X = mm(U, Cu)                                  # u columns
    Y = r * mm(W, Cu)                              # ramp columns (C K term)
    z = mm(U, cc)                                  # affine column
    rcur = r
    for _ in range(squarings):
        Xn = mm(e11, X) + X
        Yn = mm(e11, Y) + Y + rcur * X
        zn = mm(e11, z) + z
        e11 = mm(e11, e11)
        X, Y, z = Xn, Yn, zn
        rcur = rcur * 2.0

    a_ref[:] = e11
    x_ref[:] = X
    y_ref[:] = Y
    z_ref[:] = z


def _vanloan_lane_batched(P0, Cu0, cc0, rr, squarings: int, order: int,
                          lanes: int = 128, interpret: bool = False):
    """Batched structured expm with instances on lanes.

    P0 (B, T, n, n), Cu0 (B, T, n, m), cc0 (B, T, n, 1), rr (B, T) ->
    (A, Phi_qu, Phi_qv, zcol) with shapes (B,T,n,n), (B,T,n,m),
    (B,T,n,m), (B,T,n,1)."""
    import functools as _ft

    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem_kw = {"memory_space": pltpu.VMEM}
    except (ImportError, NotImplementedError):
        vmem_kw = {}

    B, T, n = P0.shape[0], P0.shape[1], P0.shape[2]
    m = Cu0.shape[-1]
    chunk = -(-max(lanes, min(1024, B)) // lanes) * lanes
    B_pad = -(-B // chunk) * chunk
    Pt = jnp.moveaxis(P0, 0, -1)                   # (T, n, n, B)
    Cut = jnp.moveaxis(Cu0, 0, -1)
    cct = jnp.moveaxis(cc0, 0, -1)
    rt = jnp.moveaxis(rr, 0, -1)                   # (T, B)
    if B_pad != B:
        pad = B_pad - B
        Pt = jnp.concatenate(
            [Pt, jnp.zeros(Pt.shape[:-1] + (pad,), Pt.dtype)], axis=-1)
        Cut = jnp.concatenate(
            [Cut, jnp.zeros(Cut.shape[:-1] + (pad,), Cut.dtype)], axis=-1)
        cct = jnp.concatenate(
            [cct, jnp.zeros(cct.shape[:-1] + (pad,), cct.dtype)], axis=-1)
        rt = jnp.concatenate(
            [rt, jnp.zeros(rt.shape[:-1] + (pad,), rt.dtype)], axis=-1)

    # ~10 live (T_blk, n, max(n,m), L) temporaries in the chain
    T_blk = T
    for cand in (T, 15, 10, 6, 5, 3, 2, 1):
        if T % cand == 0 and 10 * cand * n * max(n, m + 1) * lanes * 4 \
                < 24 * 2 ** 20:
            T_blk = cand
            break

    def spec(w):
        return pl.BlockSpec((T_blk, n, w, lanes),
                            lambda t, i: (t, 0, 0, i), **vmem_kw)

    r_spec = pl.BlockSpec((T_blk, lanes), lambda t, i: (t, i), **vmem_kw)

    def run_chunk(args):
        Pc, Cuc, ccc, rc = args
        return pl.pallas_call(
            _ft.partial(_vanloan_lane_kernel, squarings, order, n, m),
            grid=(T // T_blk, chunk // lanes),
            in_specs=[spec(n), spec(m), spec(1), r_spec],
            out_specs=[spec(n), spec(m), spec(m), spec(1)],
            out_shape=[
                jax.ShapeDtypeStruct((T, n, n, chunk), Pt.dtype),
                jax.ShapeDtypeStruct((T, n, m, chunk), Pt.dtype),
                jax.ShapeDtypeStruct((T, n, m, chunk), Pt.dtype),
                jax.ShapeDtypeStruct((T, n, 1, chunk), Pt.dtype)],
            interpret=interpret,
        )(Pc, Cuc, ccc, rc)

    n_chunks = B_pad // chunk
    if n_chunks == 1:
        outs = run_chunk((Pt, Cut, cct, rt))
    else:
        stacked = tuple(
            jnp.stack([x[..., i * chunk:(i + 1) * chunk]
                       for i in range(n_chunks)])
            for x in (Pt, Cut, cct, rt))
        out_c = jax.lax.map(run_chunk, stacked)
        outs = [jnp.concatenate(list(o), axis=-1) for o in out_c]
    return tuple(jnp.moveaxis(o[..., :B], -1, 0) for o in outs)


@functools.lru_cache(maxsize=None)
def _vanloan_cached(squarings: int, order: int, precision: str):
    def impl(P0, Cu0, cc0, rr):
        T, n = P0.shape[0], P0.shape[1]
        m = Cu0.shape[-1]
        dim = n + 2 * m + 1
        M = jnp.zeros((T, dim, dim), P0.dtype)
        M = M.at[:, :n, :n].set(P0)
        M = M.at[:, :n, n:n + m].set(Cu0)
        M = M.at[:, :n, -1].set(cc0[..., 0])
        ramp = jnp.eye(m, dtype=P0.dtype)
        M = M.at[:, n:n + m, n + m:n + 2 * m].set(
            rr[:, None, None] * ramp)
        E = _expm_stage_packed(M, squarings=squarings, order=order,
                               precision=precision)
        return (E[:, :n, :n], E[:, :n, n:n + m],
                E[:, :n, n + m:n + 2 * m], E[:, :n, -1:])

    @jax.custom_batching.custom_vmap
    def vanloan(P0, Cu0, cc0, rr):
        return impl(P0, Cu0, cc0, rr)

    @vanloan.def_vmap
    def _rule(axis_size, in_batched, P0b, Cu0b, cc0b, rrb):
        if (all(in_batched) and P0b.ndim == 4 and P0b.shape[0] > 1
                and jax.devices()[0].platform == "tpu"):
            return (_vanloan_lane_batched(P0b, Cu0b, cc0b, rrb,
                                          squarings, order),
                    (True, True, True, True))
        in_axes = tuple(0 if b else None for b in in_batched)
        return (jax.vmap(impl, in_axes=in_axes)(P0b, Cu0b, cc0b, rrb),
                (True, True, True, True))

    return vanloan


def _vanloan_stages(P0, Cu0, cc0, rr, squarings: int, order: int,
                    precision: str):
    return _vanloan_cached(int(squarings), int(order),
                           str(precision))(P0, Cu0, cc0, rr)
