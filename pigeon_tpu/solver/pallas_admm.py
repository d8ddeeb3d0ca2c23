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

try:                                  # the TPU extension registers Mosaic
    from jax.experimental.pallas import tpu as pltpu  # lowerings; absent on
    _VMEM = pltpu.VMEM                # CPU-only installs (interpret mode
except (ImportError, NotImplementedError):            # works without it)
    pltpu = None
    _VMEM = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_iters: int, sigma: float, alpha: float, bf16: bool,
            Kinv_ref, A_ref, AT_ref, q_ref, l_ref, u_ref, rho_ref,
            x0_ref, z0_ref, y0_ref,
            x_out, z_out, y_out):
    """One grid step processes TILE instances resident in VMEM.

    All matvecs are expressed as v^T M with the matrix on the RHS
    (contracting its second-to-last dim, free dim a suffix) — the form
    Mosaic's tpu.matmul supports for batched vector x matrix.  K^-1 is
    symmetric, so rhs^T K^-1 == (K^-1 rhs)^T; the A^T product uses an
    explicitly materialized transpose.

    bf16=True: the matrices arrive as bfloat16 and the iterate vectors are
    rounded to bf16 at each dot input — ONE MXU pass per 128x128 tile
    instead of the six passes fp32 HIGHEST costs, measured ~6x faster.
    The iteration then converges to the fixed point of the bf16-perturbed
    operator (~4e-3 relative); callers run fp32 polish segments afterwards
    to reach the true tolerance (see solver/admm.py's precision ladder).
    """
    A = A_ref[:]          # (TILE, m, n)
    AT = AT_ref[:]        # (TILE, n, m)
    Kinv = Kinv_ref[:]    # (TILE, n, n), symmetric
    qv = q_ref[:]         # (TILE, 1, n) — vectors carried as [B, 1, K]
    lv = l_ref[:]
    uv = u_ref[:]
    rho = rho_ref[:]      # (TILE, 1, m)
    inv_rho = 1.0 / rho

    def vmat(v, M):
        # (TILE, 1, k) x (TILE, k, j) -> (TILE, 1, j)
        if bf16:
            # precision pinned to DEFAULT: an ambient
            # default_matmul_precision("highest") context (the solver sets
            # one) would otherwise request an fp32 contract on bf16
            # operands, which Mosaic rejects ("Bad lhs type").
            return jax.lax.dot_general(
                v.astype(jnp.bfloat16), M, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            v, M, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def body(_, carry):
        x, z, y = carry
        w = rho * z - y                                   # (TILE, m)
        rhs = sigma * x - qv + vmat(w, A)                 # A^T w
        xt = vmat(rhs, Kinv)                              # K^-1 rhs (sym)
        zt = vmat(xt, AT)                                 # A xt
        x_n = alpha * xt + (1.0 - alpha) * x
        z_mix = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(z_mix + y * inv_rho, lv, uv)
        y_n = y + rho * (z_mix - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, n_iters, body, (x0_ref[:], z0_ref[:], y0_ref[:]))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@functools.partial(jax.jit, static_argnames=("n_iters", "sigma", "alpha",
                                             "tile", "interpret", "bf16"))
def admm_iterations(Kinv, A, q, l, u, rho, x0, z0, y0,
                    n_iters: int, sigma: float, alpha: float,
                    tile: int = 1, interpret: bool = False,
                    bf16: bool = False):
    """Run `n_iters` ADMM iterations for a batch of QPs entirely in VMEM.

    Inputs are the *scaled* problem quantities (post-Ruiz), batched on the
    leading axis.  Returns updated (x, z, y).

    interpret=True runs the kernel in Pallas interpret mode (CPU test
    path asserting bit-level agreement with the XLA backend).
    bf16=True rounds the matrices (and dot inputs) to bfloat16 — the fast
    bulk phase of the solver's precision ladder.
    """
    B, m, n = A.shape
    n_pad = _round_up(n, 128)
    m_pad = _round_up(m, 128)
    B_pad = _round_up(B, tile)
    f32 = jnp.float32
    mat_dtype = jnp.bfloat16 if bf16 else f32

    def pad(arr, shape, fill=0.0, dtype=f32):
        out = jnp.full(shape, fill, dtype)
        sl = tuple(slice(0, s) for s in arr.shape)
        return out.at[sl].set(arr.astype(dtype))

    Kp = pad(Kinv, (B_pad, n_pad, n_pad), dtype=mat_dtype)
    # identity on the padded diagonal keeps padded x coords stable
    diag_idx = jnp.arange(n, n_pad)
    Kp = Kp.at[:, diag_idx, diag_idx].set(1.0)
    Ap = pad(A, (B_pad, m_pad, n_pad), dtype=mat_dtype)
    ATp = jnp.swapaxes(Ap, -1, -2).copy()
    vec = lambda a: a[:, None, :]
    qp_ = vec(pad(q, (B_pad, n_pad)))
    lp = vec(pad(l, (B_pad, m_pad)))
    up = vec(pad(u, (B_pad, m_pad)))
    rp = vec(pad(rho, (B_pad, m_pad), fill=1.0))
    xp = vec(pad(x0, (B_pad, n_pad)))
    zp = vec(pad(z0, (B_pad, m_pad)))
    yp = vec(pad(y0, (B_pad, m_pad)))

    grid = (B_pad // tile,)

    def bspec(*dims):
        kw = {} if _VMEM is None else {"memory_space": _VMEM}
        return pl.BlockSpec((tile,) + dims,
                            lambda i: (i,) + (0,) * len(dims), **kw)

    out = pl.pallas_call(
        functools.partial(_kernel, n_iters, float(sigma), float(alpha),
                          bool(bf16)),
        grid=grid,
        in_specs=[
            bspec(n_pad, n_pad), bspec(m_pad, n_pad), bspec(n_pad, m_pad),
            bspec(1, n_pad),
            bspec(1, m_pad), bspec(1, m_pad), bspec(1, m_pad),
            bspec(1, n_pad), bspec(1, m_pad), bspec(1, m_pad),
        ],
        out_specs=(bspec(1, n_pad), bspec(1, m_pad), bspec(1, m_pad)),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, 1, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
        ),
        interpret=interpret,
    )(Kp, Ap, ATp, qp_, lp, up, rp, xp, zp, yp)
    x, z, y = out
    return (x[:B, 0, :n].astype(A.dtype), z[:B, 0, :m].astype(A.dtype),
            y[:B, 0, :m].astype(A.dtype))
