"""Pallas TPU kernel: in-VMEM Ruiz equilibration.

The XLA path of `admm._ruiz` re-reads |A| from HBM for every row/col
max-reduction — 2 reductions x `iters` sweeps + the final scaled-matrix
materialization (~9 passes over the (B, m, n) batch = ~4 GB of HBM traffic
at B=2048, measured 35 ms).  This kernel loads each instance's A into VMEM
once, runs all sweeps as VPU max-reductions on the resident tile, and
writes the scaled matrix back once: HBM traffic drops to one read + one
write (~2.5 ms).

Mirrors `admm._ruiz` (modified Ruiz + cost scaling, OSQP semantics)
exactly; the CPU test path runs interpret mode against the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pigeon_tpu.compile import tpu_jit

try:
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except (ImportError, NotImplementedError):
    pltpu = None
    _VMEM = None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(iters: int, n: int, m: int,
            A_ref, P_ref, q_ref, l_ref, u_ref,
            Ab_out, Pb_out, qb_out, lb_out, ub_out, D_out, E_out, c_out):
    """TILE instances resident in VMEM.  Vectors are (TILE, 1, k); A is
    (TILE, m_pad, n_pad).  Padded rows/cols are zero; col/row masks keep
    them out of the scalings (their D/E stay 1)."""
    A = A_ref[:]
    absA = jnp.abs(A)
    absP = jnp.abs(P_ref[:])                    # (TILE, 1, n_pad)
    absq = jnp.abs(q_ref[:])
    n_pad = A.shape[-1]
    m_pad = A.shape[-2]
    col_live = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2)
                < n)                            # (1, 1, n_pad)
    row_live = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, m_pad), 2)
                < m)
    inv_n = 1.0 / float(n)

    D = jnp.ones_like(absP)
    E = jnp.ones((A.shape[0], 1, m_pad), jnp.float32)
    c = jnp.ones((A.shape[0], 1, 1), jnp.float32)
    eps = 1e-12

    for _ in range(iters):
        Ps = absP * D * D * c
        # row/col maxima of E|A|D without materializing the product as an
        # (m, n) intermediate in HBM — everything is VMEM-resident
        colmax = jnp.max(absA * jnp.swapaxes(E, -1, -2), axis=-2,
                         keepdims=True)          # (TILE, 1, n_pad)
        col_x = jnp.maximum(Ps, colmax * D)
        rowmax = jnp.max(absA * D, axis=-1, keepdims=True)  # (TILE, m, 1)
        col_y = jnp.swapaxes(rowmax, -1, -2) * E
        # zero-norm live rows/cols stay unscaled too (OSQP convention):
        # the eps floor alone would grow their scale 1e6x per sweep and
        # overflow to inf (e.g. inactive all-zero HJI rows)
        D = jnp.where(col_live & (col_x > eps),
                      D / jnp.sqrt(jnp.maximum(col_x, eps)), D)
        E = jnp.where(row_live & (col_y > eps),
                      E / jnp.sqrt(jnp.maximum(col_y, eps)), E)
        Ps = absP * D * D * c
        qs = c * D * absq
        g = jnp.maximum(
            jnp.sum(jnp.where(col_live, Ps, 0.0), axis=-1,
                    keepdims=True) * inv_n,
            jnp.max(qs, axis=-1, keepdims=True))
        c = c / jnp.maximum(g, 1.0)

    Ab_out[:] = (jnp.swapaxes(E, -1, -2) * A) * D
    Pb_out[:] = P_ref[:] * D * D * c
    qb_out[:] = c * D * q_ref[:]
    lb_out[:] = E * l_ref[:]
    ub_out[:] = E * u_ref[:]
    D_out[:] = D
    E_out[:] = E
    c_out[:] = jnp.broadcast_to(c, c_out.shape)


@functools.partial(tpu_jit, static_argnames=("iters", "tile", "interpret"))
def ruiz_batched(P_diag, q, A, l, u, iters: int = 4, tile: int = 4,
                 interpret: bool = False):
    """Batched Ruiz equilibration, one VMEM round trip per instance.

    Returns (Pb, qb, Ab, lb, ub, D, E, c) — identical semantics to
    `jax.vmap(lambda qp: admm._ruiz(qp, iters))`.
    """
    B, m, n = A.shape
    n_pad = _round_up(n, 128)
    m_pad = _round_up(m, 128)
    B_pad = _round_up(B, tile)
    f32 = jnp.float32

    def pad(arr, shape, fill=0.0):
        out = jnp.full(shape, fill, f32)
        sl = tuple(slice(0, s) for s in arr.shape)
        return out.at[sl].set(arr.astype(f32))

    vec = lambda a: a[:, None, :]
    Ap = pad(A, (B_pad, m_pad, n_pad))
    Pp = vec(pad(P_diag, (B_pad, n_pad)))
    qp_ = vec(pad(q, (B_pad, n_pad)))
    lp = vec(pad(l, (B_pad, m_pad)))
    up = vec(pad(u, (B_pad, m_pad)))

    grid = (B_pad // tile,)

    def bspec(*dims):
        kw = {} if _VMEM is None else {"memory_space": _VMEM}
        return pl.BlockSpec((tile,) + dims,
                            lambda i: (i,) + (0,) * len(dims), **kw)

    out = pl.pallas_call(
        functools.partial(_kernel, int(iters), int(n), int(m)),
        grid=grid,
        in_specs=[bspec(m_pad, n_pad), bspec(1, n_pad), bspec(1, n_pad),
                  bspec(1, m_pad), bspec(1, m_pad)],
        out_specs=(bspec(m_pad, n_pad), bspec(1, n_pad), bspec(1, n_pad),
                   bspec(1, m_pad), bspec(1, m_pad), bspec(1, n_pad),
                   bspec(1, m_pad), bspec(1, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, m_pad, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, n_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, m_pad), f32),
            jax.ShapeDtypeStruct((B_pad, 1, 1), f32),
        ),
        # A is dead after the call; its buffer becomes the scaled output
        input_output_aliases={0: 0},
        interpret=interpret,
    )(Ap, Pp, qp_, lp, up)
    Ab, Pb, qb, lb, ub, D, E, c = out
    dt = A.dtype
    return (Pb[:B, 0, :n].astype(dt), qb[:B, 0, :n].astype(dt),
            Ab[:B, :m, :n].astype(dt), lb[:B, 0, :m].astype(dt),
            ub[:B, 0, :m].astype(dt), D[:B, 0, :n].astype(dt),
            E[:B, 0, :m].astype(dt), c[:B, 0, 0].astype(dt))
