"""Pallas ADMM iteration kernel vs the XLA reference body, in interpret
mode on CPU.

The kernel (`solver/pallas_admm.py`) is the TPU replacement for the OSQP
hot loop; a silent divergence from the XLA `fori_loop` body
(`solver/admm.py:_solve_qp.admm_iters`) would only surface as a perf-bench
quality regression, so this pins the two backends against each other over
random QPs, including the padded-coordinate fixed-point property (shapes
here are NOT multiples of the 128-lane tile, so the kernel's padding path
is exercised).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu.solver.pallas_admm import admm_iterations


def _xla_iters(Kinv, A, q, l, u, rho, x, z, y, n_iters, sigma, alpha):
    """The XLA backend's iteration body (solver/admm.py admm_iters),
    replicated verbatim for single-instance comparison."""
    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + A.T @ (rho * z - y)
        x_t = Kinv @ rhs
        z_t = A @ x_t
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_mix = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_mix + y / rho, l, u)
        y_n = y + rho * (z_mix - z_n)
        return x_n, z_n, y_n
    with jax.default_matmul_precision("highest"):
        return jax.lax.fori_loop(0, n_iters, body, (x, z, y))


def _random_qp(rng, n, m):
    """A well-conditioned random QP in the solver's scaled form."""
    P = jnp.asarray(rng.uniform(0.1, 2.0, n), jnp.float32)
    A = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    c = rng.standard_normal(m)
    w = rng.uniform(0.1, 1.0, m)
    l = jnp.asarray(c - w, jnp.float32)
    u = jnp.asarray(c + w, jnp.float32)
    rho = jnp.asarray(rng.uniform(0.05, 5.0, m), jnp.float32)
    sigma = 1e-6
    K = jnp.diag(P + sigma) + (A.T * rho[None, :]) @ A
    Kinv = jnp.linalg.inv(K.astype(jnp.float64)).astype(jnp.float32)
    Kinv = 0.5 * (Kinv + Kinv.T)
    return P, q, A, l, u, rho, Kinv, sigma


@pytest.mark.parametrize("n,m,iters", [(19, 37, 30), (193, 290, 50)])
def test_pallas_matches_xla_backend(n, m, iters):
    rng = np.random.default_rng(0)
    B = 3
    alpha, sigma = 1.6, 1e-6
    Kinvs, As, qs, ls, us, rhos = [], [], [], [], [], []
    x0s, z0s, y0s, Ps_list = [], [], [], []
    for b in range(B):
        P, q, A, l, u, rho, Kinv, _ = _random_qp(rng, n, m)
        Ps_list.append(P)
        Kinvs.append(Kinv); As.append(A); qs.append(q)
        ls.append(l); us.append(u); rhos.append(rho)
        x0s.append(jnp.asarray(rng.standard_normal(n), jnp.float32))
        z0s.append(jnp.asarray(rng.standard_normal(m), jnp.float32))
        y0s.append(jnp.asarray(rng.standard_normal(m), jnp.float32))
    stack = lambda xs: jnp.stack(xs)

    Ps = stack([d for d in Ps_list])
    scalings = (jnp.ones((B, n), jnp.float32), jnp.ones((B, m), jnp.float32),
                jnp.ones((B,), jnp.float32), Ps, stack(qs))
    xk, zk, yk, stats = admm_iterations(
        stack(Kinvs), stack(As), stack(qs), stack(ls), stack(us),
        stack(rhos), stack(x0s), stack(z0s), stack(y0s),
        iters, sigma, alpha, tile=1, interpret=True, scalings=scalings)

    for b in range(B):
        xr, zr, yr = _xla_iters(Kinvs[b], As[b], qs[b], ls[b], us[b],
                                rhos[b], x0s[b], z0s[b], y0s[b],
                                iters, sigma, alpha)
        # fp32 matmul association differences only; iterates are O(1)
        np.testing.assert_allclose(np.asarray(xk[b]), np.asarray(xr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(zk[b]), np.asarray(zr),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(yk[b]), np.asarray(yr),
                                   rtol=2e-4, atol=2e-4)
        # the kernel-emitted residual statistics match direct computation
        Ax = np.asarray(As[b] @ xr)
        Aty = np.asarray(As[b].T @ yr)
        Px = np.asarray(Ps_list[b]) * np.asarray(xr)
        ref_stats = [np.max(np.abs(Ax - np.asarray(zr))),
                     np.max(np.abs(Px + np.asarray(qs[b]) + Aty)),
                     np.max(np.abs(Ax)), np.max(np.abs(np.asarray(zr))),
                     np.max(np.abs(Px)), np.max(np.abs(Aty))]
        np.testing.assert_allclose(np.asarray(stats[b, :6]), ref_stats,
                                   rtol=2e-3, atol=2e-3)


def test_pallas_padded_fixed_point():
    """Padded coordinates must be exact fixed points: iterating a QP whose
    (x*, z*, y*) is already optimal-and-feasible at the real coordinates
    must not drift through the padding."""
    rng = np.random.default_rng(1)
    n, m = 5, 7
    P, q, A, l, u, rho, Kinv, sigma = _random_qp(rng, n, m)
    # manufacture an interior fixed point: x* solving unconstrained problem,
    # z* = A x* forced strictly inside [l, u], y* = 0
    x_star = jnp.linalg.solve(jnp.diag(P), -q).astype(jnp.float32)
    z_star = A @ x_star
    l2 = jnp.minimum(l, z_star - 1.0)
    u2 = jnp.maximum(u, z_star + 1.0)
    xk, zk, yk, _ = admm_iterations(
        Kinv[None], A[None], q[None], l2[None], u2[None], rho[None],
        x_star[None], z_star[None], jnp.zeros((1, m), jnp.float32),
        40, float(sigma), 1.6, tile=1, interpret=True)
    # (sigma-regularized) fixed point: stays put to fp32 tolerance
    np.testing.assert_allclose(np.asarray(xk[0]), np.asarray(x_star),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(yk[0]), 0.0, atol=1e-3)


def test_pallas_tile_batching():
    """tile > 1 must produce the same results as tile = 1."""
    rng = np.random.default_rng(2)
    n, m, B, iters = 11, 17, 6, 25
    data = [_random_qp(rng, n, m) for _ in range(B)]
    Kinv = jnp.stack([d[6] for d in data])
    A = jnp.stack([d[2] for d in data])
    q = jnp.stack([d[1] for d in data])
    l = jnp.stack([d[3] for d in data])
    u = jnp.stack([d[4] for d in data])
    rho = jnp.stack([d[5] for d in data])
    x0 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    out1 = admm_iterations(Kinv, A, q, l, u, rho, x0, z0, y0,
                           iters, 1e-6, 1.6, tile=1, interpret=True)
    out2 = admm_iterations(Kinv, A, q, l, u, rho, x0, z0, y0,
                           iters, 1e-6, 1.6, tile=2, interpret=True)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
