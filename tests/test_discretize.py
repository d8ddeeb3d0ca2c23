"""Tests for RK4 propagation and ZOH/FOH linearization, validated against
closed-form linear-system solutions (SURVEY.md §7 step 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn


def _affine_sys(rng, n=4, m=3):
    Jq = rng.standard_normal((n, n))
    Jq = Jq - 2.0 * np.eye(n)   # make it reasonably stable
    Ju = rng.standard_normal((n, m))
    ct = rng.standard_normal(n)
    def f(q, ur):
        return jnp.asarray(Jq) @ q + jnp.asarray(Ju) @ ur + jnp.asarray(ct)
    return f, Jq, Ju, ct


def test_expm_fixed_matches_scipy(rng):
    for scale in [0.1, 1.0, 5.0]:
        M = rng.standard_normal((8, 8)) * scale
        E = np.asarray(dz.expm_fixed(jnp.asarray(M)))
        np.testing.assert_allclose(E, scipy.linalg.expm(M), rtol=1e-9,
                                   atol=1e-9)


def test_affine_zoh_exact(rng):
    """Exact affine ZOH discretization equals the expm-based closed form."""
    f, Jq, Ju, ct = _affine_sys(rng)
    n, m = Jq.shape[0], Ju.shape[1]
    q = rng.standard_normal(n)
    ur = rng.standard_normal(m)
    dt = 0.2
    A, B, c = dz.linearize_affine_zoh(f, jnp.asarray(q), jnp.asarray(ur), dt,
                                      n_keep=m)
    Ad = scipy.linalg.expm(Jq * dt)
    # integral_0^dt expm(Jq tau) dtau  via augmented exponential
    Maug = np.zeros((n + 1, n + 1))
    Maug[:n, :n] = Jq
    Maug[:n, -1] = np.ones(n)
    # Phi = int expm: solve by the standard block trick with Ju columns
    M2 = np.zeros((n + m, n + m))
    M2[:n, :n] = Jq
    M2[:n, n:] = Ju
    E2 = scipy.linalg.expm(M2 * dt)
    Bd = E2[:n, n:]
    np.testing.assert_allclose(np.asarray(A), Ad, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(B), Bd, rtol=1e-8, atol=1e-10)
    # c must make the affine prediction match dense numerical integration
    qn = q.copy()
    K = 4000
    h = dt / K
    for _ in range(K):   # RK4 fine integration
        k1 = Jq @ qn + Ju @ ur + ct
        k2 = Jq @ (qn + h / 2 * k1) + Ju @ ur + ct
        k3 = Jq @ (qn + h / 2 * k2) + Ju @ ur + ct
        k4 = Jq @ (qn + h * k3) + Ju @ ur + ct
        qn = qn + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    pred = np.asarray(A) @ q + np.asarray(B) @ ur + np.asarray(c)
    np.testing.assert_allclose(pred, qn, rtol=1e-7, atol=1e-9)


def test_affine_foh_exact(rng):
    """Exact FOH: prediction matches dense integration of the ramped-input
    affine system."""
    f, Jq, Ju, ct = _affine_sys(rng)
    n, m = Jq.shape[0], Ju.shape[1]
    q = rng.standard_normal(n)
    ur0 = rng.standard_normal(m)
    urf = rng.standard_normal(m)
    dt = 0.2
    A, B0, Bf, c = dz.linearize_affine_foh(
        f, jnp.asarray(q), jnp.asarray(ur0), jnp.asarray(urf), dt, n_keep=m)
    qn = q.copy()
    K = 4000
    h = dt / K
    for k in range(K):
        def u_at(tau):
            return ur0 + (urf - ur0) * tau / dt
        t0 = k * h
        k1 = Jq @ qn + Ju @ u_at(t0) + ct
        k2 = Jq @ (qn + h / 2 * k1) + Ju @ u_at(t0 + h / 2) + ct
        k3 = Jq @ (qn + h / 2 * k2) + Ju @ u_at(t0 + h / 2) + ct
        k4 = Jq @ (qn + h * k3) + Ju @ u_at(t0 + h) + ct
        qn = qn + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    pred = (np.asarray(A) @ q + np.asarray(B0) @ ur0 + np.asarray(Bf) @ urf
            + np.asarray(c))
    np.testing.assert_allclose(pred, qn, rtol=1e-7, atol=1e-9)


def test_keep_dims_folding(rng):
    """With dropped inputs at their nominal values, the partial-kept model
    must predict exactly like the full-kept model."""
    f, Jq, Ju, ct = _affine_sys(rng, n=4, m=5)
    q = rng.standard_normal(4)
    ur = rng.standard_normal(5)
    dt = 0.1
    A2, B2, c2 = dz.linearize_affine_zoh(f, jnp.asarray(q), jnp.asarray(ur),
                                         dt, n_keep=2)
    A5, B5, c5 = dz.linearize_affine_zoh(f, jnp.asarray(q), jnp.asarray(ur),
                                         dt, n_keep=5)
    pred2 = np.asarray(A2) @ q + np.asarray(B2) @ ur[:2] + np.asarray(c2)
    pred5 = np.asarray(A5) @ q + np.asarray(B5) @ ur + np.asarray(c5)
    np.testing.assert_allclose(pred2, pred5, rtol=1e-10)
    # same for jacfwd ZOH and FOH paths
    Az, Bz, cz = dz.linearize_zoh(f, jnp.asarray(q), jnp.asarray(ur), dt, 2)
    predz = np.asarray(Az) @ q + np.asarray(Bz) @ ur[:2] + np.asarray(cz)
    Azf, Bzf, czf = dz.linearize_zoh(f, jnp.asarray(q), jnp.asarray(ur), dt, 5)
    predzf = np.asarray(Azf) @ q + np.asarray(Bzf) @ ur + np.asarray(czf)
    np.testing.assert_allclose(predz, predzf, rtol=1e-10)


def test_zoh_rk4_close_to_exact_for_linear(rng):
    """jacfwd-through-RK4 on a linear system approximates the exact
    discretization to O(dt^5)."""
    f, Jq, Ju, ct = _affine_sys(rng)
    q = rng.standard_normal(4)
    ur = rng.standard_normal(3)
    dt = 0.01
    A1, B1, c1 = dz.linearize_zoh(f, jnp.asarray(q), jnp.asarray(ur), dt, 3)
    A2, B2, c2 = dz.linearize_affine_zoh(f, jnp.asarray(q), jnp.asarray(ur),
                                         dt, 3)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-8)


def test_nonlinear_zoh_first_order_accuracy(x1):
    """The discrete linear model predicts perturbed vehicle rollouts to
    second order in the perturbation."""
    def f(q, ur):
        return dyn.vehicle_ode(x1, "tracking", q, ur[:2], ur[2:])

    q = jnp.array([0.0, 10.0, 0.1, 0.05, 0.02, -0.1])
    ur = jnp.array([0.02, 500.0, 10.0, 0.01, 0.0, 0.0])
    dt = 0.05
    A, B, c = dz.linearize_zoh(f, q, ur, dt, n_keep=2)
    base = dz.rk4_step(f, q, ur, dt)
    np.testing.assert_allclose(
        np.asarray(A @ q + B @ ur[:2] + c), np.asarray(base), rtol=1e-12)
    for eps in [1e-3, 1e-2]:
        dq = eps * jnp.array([0.1, 1.0, 0.3, 0.05, 0.01, 0.2])
        du = eps * jnp.array([0.01, 100.0])
        truth = dz.rk4_step(f, q + dq, ur.at[:2].add(du), dt)
        pred = A @ (q + dq) + B @ (ur[:2] + du) + c
        err = np.linalg.norm(np.asarray(pred - truth))
        assert err < 50.0 * eps ** 2, (eps, err)


def test_propagate_substeps(x1):
    """More substeps converge to the same flow."""
    def f(q, ur):
        return dyn.vehicle_ode(x1, "bicycle", q, ur[:2], ur[2:])
    q = jnp.array([0.0, 0.0, 0.1, 10.0, 0.1, 0.05])
    ur = jnp.array([0.02, 500.0, 0.0, 0.0, 0.0, 0.0])
    q1 = dz.propagate(f, q, ur, 0.01, substeps=1)
    q4 = dz.propagate(f, q, ur, 0.01, substeps=4)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q4), rtol=1e-5)


def test_fused_horizon_matches_per_stage(x1):
    """linearize_horizon_fused must reproduce the per-stage affine ZOH/FOH
    models exactly (ZOH stages embedded with a zero ramp block)."""
    def f(q, ur):
        return dyn.vehicle_ode(x1, "tracking", q, ur[:2], ur[2:])

    rng2 = np.random.default_rng(4)
    N, S = 6, 2
    T = N - 1
    qs = jnp.asarray(np.stack([
        [0.0, 8.0 + i * 0.3, 0.1 * rng2.standard_normal(), 0.05, 0.02, -0.1]
        for i in range(N)]))
    urs = jnp.asarray(np.stack([
        [0.02 + 0.01 * i, 300.0 + 50 * i, 8.0, 0.01, 0.0, 0.0]
        for i in range(N)]))
    dts = jnp.asarray([0.01, 0.01, 0.15, 0.2, 0.2])

    A, B0, Bf, c = dz.linearize_horizon_fused(f, qs, urs, dts, S, 2)
    for t in range(T):
        if t < S:
            Ar, Br, cr = dz.linearize_affine_zoh(f, qs[t], urs[t],
                                                 dts[t], 2)
            np.testing.assert_allclose(np.asarray(A[t]), np.asarray(Ar),
                                       rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(np.asarray(B0[t]), np.asarray(Br),
                                       rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(np.asarray(Bf[t]), 0.0, atol=1e-11)
            np.testing.assert_allclose(np.asarray(c[t]), np.asarray(cr),
                                       rtol=1e-8, atol=1e-9)
        else:
            Ar, B0r, Bfr, cr = dz.linearize_affine_foh(
                f, qs[t], urs[t], urs[t + 1], dts[t], 2)
            np.testing.assert_allclose(np.asarray(A[t]), np.asarray(Ar),
                                       rtol=1e-9, atol=1e-11)
            np.testing.assert_allclose(np.asarray(B0[t]), np.asarray(B0r),
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(Bf[t]), np.asarray(Bfr),
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(c[t]), np.asarray(cr),
                                       rtol=1e-8, atol=1e-9)


def test_fused_horizon_production_accuracy():
    """The hot-path setting (squarings=7, order=6, precision='high') must
    match the reference-grade per-stage linearization, including at the
    V_min=1 worst case where the tire-mode Jacobian entries reach
    ~190/s (||J*dt_long|| ~ 38)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pigeon_tpu import discretize as dz
    from pigeon_tpu import dynamics as dyn
    from pigeon_tpu.config import x1_params

    veh = x1_params()

    def f(q, ur):
        return dyn.vehicle_ode(veh, "tracking", q, ur[:2], ur[2:])

    S, T = 2, 5
    N = T + 1
    for Ux in (1.0, 6.0, 15.0):
        qs = jnp.asarray(np.broadcast_to(
            [0.0, Ux, 0.05, 0.02, 0.01, -0.1], (N, 6)).copy())
        urs = jnp.asarray(np.broadcast_to(
            [0.02, 300.0, Ux, 0.01, 0.0, 0.0], (N, 6)).copy())
        dts = jnp.asarray([0.01, 0.01, 0.2, 0.2, 0.2])
        A, B0, Bf, c = dz.linearize_horizon_fused(
            f, qs, urs, dts, S, 2, squarings=7, order=6, precision="high")
        Ar, B0r, Bfr, cr = jax.vmap(
            lambda q, u0, uf, h: dz.linearize_affine_foh(f, q, u0, uf, h,
                                                         2))(
            qs[S:T], urs[S:T], urs[S + 1:N], dts[S:T])
        np.testing.assert_allclose(np.asarray(A[S:]), np.asarray(Ar),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(B0[S:]), np.asarray(B0r),
                                   rtol=1e-7, atol=1e-8)
        np.testing.assert_allclose(np.asarray(c[S:]), np.asarray(cr),
                                   rtol=1e-7, atol=1e-8)
