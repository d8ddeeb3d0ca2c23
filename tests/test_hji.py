"""HJI safety-filter tests: 7-D multilinear interpolation, relative-state
geometry, optimal control/disturbance, and constraint linearization."""

import jax
import jax.numpy as jnp
import numpy as np

from pigeon_tpu import hji


def _linear_cache(a, knots=None):
    """Cache whose V is the linear function a.x (multilinear interp must be
    exact for multilinear functions)."""
    if knots is None:
        knots = [np.linspace(-2.0, 2.0, 4) for _ in range(7)]
    grids = np.meshgrid(*knots, indexing="ij")
    V = sum(ai * g for ai, g in zip(a, grids))
    G = np.broadcast_to(np.asarray(a, np.float32),
                        V.shape + (7,)).copy()
    return hji.make_cache(knots, V, G)


def test_interp_linear_exact(rng):
    a = rng.standard_normal(7)
    cache = _linear_cache(a)
    for _ in range(10):
        x = rng.uniform(-1.9, 1.9, 7)
        V, g = hji.interpolate(cache, jnp.asarray(x))
        np.testing.assert_allclose(float(V), float(a @ x), rtol=2e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(g), a, rtol=1e-5, atol=1e-6)


def test_interp_outside_grid_is_inf(rng):
    cache = _linear_cache(rng.standard_normal(7))
    x = np.zeros(7)
    x[3] = 5.0   # outside [-2, 2]
    V, g = hji.interpolate(cache, jnp.asarray(x))
    assert np.isinf(float(V))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_interp_at_knots(rng):
    a = rng.standard_normal(7)
    cache = _linear_cache(a)
    x = np.array([-2.0, 2.0, -2 / 3, 2 / 3, -2.0, 2.0, -2 / 3])
    V, _ = hji.interpolate(cache, jnp.asarray(x))
    np.testing.assert_allclose(float(V), float(a @ x), rtol=2e-5, atol=1e-5)


def test_relative_state_geometry():
    # ego at origin heading N (psi=0); human 5 m ahead (N), 1 m left (-E)
    ego = jnp.array([0.0, 0.0, 0.0, 10.0, 0.1, 0.02])
    them = jnp.array([-1.0, 5.0, 0.3, 7.0])
    x = np.asarray(hji.relative_state(ego, them))
    np.testing.assert_allclose(x[0], 5.0, atol=1e-12)   # longitudinal
    np.testing.assert_allclose(x[1], 1.0, atol=1e-12)   # lateral (left +)
    np.testing.assert_allclose(x[2:], [0.3, 10.0, 0.1, 7.0, 0.02],
                               atol=1e-12)
    # heading psi=pi/2 means ego moves in -E; human 5 m along -E
    ego = jnp.array([0.0, 0.0, np.pi / 2, 10.0, 0.0, 0.0])
    them = jnp.array([-5.0, 0.0, np.pi / 2, 7.0])
    x = np.asarray(hji.relative_state(ego, them))
    np.testing.assert_allclose(x[0], 5.0, atol=1e-12)
    np.testing.assert_allclose(x[1], 0.0, atol=1e-12)


def test_relative_dynamics_consistency(x1):
    """Matching speeds and zero relative offsets -> relative position
    rates follow the speed difference only."""
    x7 = jnp.array([0.0, 0.0, 0.0, 10.0, 0.0, 10.0, 0.0])
    uR = jnp.array([0.0, 366.0])    # roughly cancel drag
    uH = jnp.array([0.0, 0.0])
    xd = np.asarray(hji.relative_dynamics(x1, x7, uR, uH))
    np.testing.assert_allclose(xd[0], 0.0, atol=1e-9)   # dE_dot = V - Ux
    np.testing.assert_allclose(xd[1], 0.0, atol=1e-9)
    np.testing.assert_allclose(xd[2], 0.0, atol=1e-9)
    np.testing.assert_allclose(xd[5], 0.0, atol=1e-9)


def test_optimal_disturbance_interior(x1):
    """Interior case (desired Ax below the drive limit, |Ay| below the
    curvature limit): lateral follows the gradient direction, longitudinal
    saturates at the drive limit (reference src/HJI_computation.jl:127)."""
    x7 = jnp.array([5.0, 2.0, 0.1, 10.0, 0.0, 8.0, 0.0])
    V = 8.0
    g = jnp.zeros(7).at[2].set(0.08).at[5].set(0.1)
    uH = np.asarray(hji.optimal_disturbance(x1, x7, g, "min"))
    lam = np.array([0.1, 0.08 / V])     # (lam_Ax, lam_Ay)
    maxA = 0.9 * x1.mu * x1.G
    des = -lam / np.linalg.norm(lam) * maxA
    assert des[0] < x1.Fx_max / x1.m and abs(des[1]) < x1.kappa_max * V * V
    np.testing.assert_allclose(
        uH[1], min(x1.Fx_max / x1.m, x1.Px_max / x1.m / V), rtol=1e-6)
    np.testing.assert_allclose(uH[0] * V, des[1], rtol=1e-6)


def test_optimal_disturbance_drive_saturated(x1):
    """desired Ax above the drive limit: Ax clamps to maxAx and Ay is
    re-limited by the friction circle (reference branch :114-117)."""
    x7 = jnp.array([5.0, 2.0, 0.1, 10.0, 0.0, 8.0, 0.0])
    V = 8.0
    g = jnp.zeros(7).at[2].set(0.08).at[5].set(-0.1)
    uH = np.asarray(hji.optimal_disturbance(x1, x7, g, "min"))
    maxA = 0.9 * x1.mu * x1.G
    maxAx = min(x1.Fx_max / x1.m, x1.Px_max / x1.m / V)
    maxAy = min(x1.kappa_max * V * V, np.sqrt(maxA ** 2 - maxAx ** 2))
    np.testing.assert_allclose(uH[1], maxAx, rtol=1e-6)
    np.testing.assert_allclose(uH[0] * V, -maxAy, rtol=1e-6)


def test_optimal_disturbance_zero_gradient(x1):
    x7 = jnp.array([5.0, 2.0, 0.1, 10.0, 0.0, 8.0, 0.0])
    uH = np.asarray(hji.optimal_disturbance(x1, x7, jnp.zeros(7)))
    np.testing.assert_allclose(uH, 0.0)


def test_optimal_control_maximizes_hamiltonian(x1):
    rng = np.random.default_rng(0)
    x7 = jnp.array([3.0, 1.0, 0.2, 9.0, 0.3, 7.0, 0.1])
    g = jnp.asarray(rng.standard_normal(7))
    u = hji.optimal_control(x1, x7, g, "max")
    assert abs(float(u[0])) == x1.delta_max

    # the reference's line search maximizes the surrogate
    # A*Fx + B*Fyf + C*Fyr (src/HJI_computation.jl:140-152), not the full
    # Hamiltonian; check optimality of that surrogate over its own grid.
    from pigeon_tpu import dynamics as dyn
    A = float(g[3]) / x1.m
    B = float(g[4]) / x1.m + x1.a * float(g[6]) / x1.Izz
    C = float(g[4]) / x1.m - x1.b * float(g[6]) / x1.Izz

    def surrogate(Fx):
        Fxf, Fxr = dyn.longitudinal_split(x1, jnp.asarray(Fx))
        u3 = jnp.array([float(u[0]), float(Fxf), float(Fxr)])
        Fyf, Fyr = dyn.lateral_tire_forces(x1, x7[3], x7[4], x7[6], u3)
        return A * Fx + B * float(Fyf) + C * float(Fyr)

    h_opt = surrogate(float(u[1]))
    fracs = np.arange(50) / 49.0
    for Fx in fracs * x1.Fx_max + (1 - fracs) * x1.Fx_min:
        assert h_opt >= surrogate(float(Fx)) - 1e-9


def test_reachability_constraint_inactive(x1):
    cache = hji.inactive_cache()
    x7 = jnp.array([3.0, 1.0, 0.2, 9.0, 0.3, 7.0, 0.1])
    M, b, V, _ = hji.reachability_constraint(x1, cache, x7, 0.05)
    np.testing.assert_allclose(np.asarray(M), 0.0)
    np.testing.assert_allclose(float(b), 1.0)
    assert float(V) > 1e8


def test_reachability_constraint_active_linearization(x1):
    """With the synthetic cache and a close encounter, the half-plane must
    approximate the Hamiltonian near u_lin."""
    cache = hji.synthetic_cache(n_per_dim=5)
    x7 = jnp.array([2.0, 0.5, 0.0, 8.0, 0.0, 8.0, 0.0])   # ~2 m apart
    V, gradV = hji.interpolate(cache, x7)
    assert float(V) <= 0.05, f"scenario should be unsafe, V={float(V)}"
    u_lin = jnp.array([0.0, 0.0])
    M, b, _, _ = hji.reachability_constraint(x1, cache, x7, 0.05, u_lin)
    uH = hji.optimal_disturbance(x1, x7, gradV.astype(x7.dtype))
    for du in [jnp.array([0.01, 100.0]), jnp.array([-0.02, -500.0])]:
        H = float(jnp.dot(gradV.astype(x7.dtype),
                          hji.relative_dynamics(x1, x7, u_lin + du, uH)))
        approx = float(M @ (u_lin + du) + b)
        assert abs(H - approx) < 0.2 * (abs(H) + 1.0)


def test_interp_vmap_batch(rng):
    a = rng.standard_normal(7)
    cache = _linear_cache(a)
    xs = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 7)))
    V, g = jax.vmap(lambda x: hji.interpolate(cache, x))(xs)
    np.testing.assert_allclose(np.asarray(V), np.asarray(xs) @ a, rtol=1e-4,
                               atol=1e-5)


def test_hji_row_normalization_in_pre_solve(x1):
    """With hji_row_normalize (default), the HJI row entering the QP has
    unit norm in the normalized-u metric and a lower bound clamped to the
    achievable set (round-5 conditioning fix: raw rows are infeasible
    within the control box by up to 3 orders of magnitude at active
    states, collapsing ADMM convergence to 0.25 on active steps)."""
    import dataclasses
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.qp.coupled import u_normalization
    from tests.conftest import REFERENCE_PATHS

    cache = hji.synthetic_cache(n_per_dim=5)
    tube = trj.tube_from_world(f"{REFERENCE_PATHS}/skidpadoval.world",
                               pad_to=1024)
    cfg = M.x1_coupled_config(soft=True)
    # place the other car 2 m ahead of the ego on the path: V <= eps
    k = 200
    q0 = jnp.asarray([float(tube.E[k]), float(tube.N[k]),
                      float(tube.psi[k]), 8.0, 0.0, 0.0])
    psi = float(tube.psi[k])
    oc = jnp.asarray([float(tube.E[k]) - 2.0 * jnp.sin(psi),
                      float(tube.N[k]) + 2.0 * jnp.cos(psi),
                      psi + jnp.pi, 8.0])
    x_rel = hji.relative_state(q0, oc)
    V, _ = hji.interpolate(cache, x_rel)
    assert float(V) <= cfg.hji_eps, float(V)

    unorm = np.asarray(u_normalization(cfg.veh))
    carry = M.init_carry(cfg)
    u0 = jnp.zeros(3)
    for norm_on in (True, False):
        c = dataclasses.replace(cfg, hji_row_normalize=norm_on)
        qp, warm, aux = M._pre_solve(c, tube, cache, carry, q0, u0, oc,
                                     float(tube.t[k]))
        # the first HJI row of the soft QP (layout r_hji[0]) carries
        # M*unorm; lower bound -b
        from pigeon_tpu.qp.condensed import get_soft_layout
        L = get_soft_layout(c.hz, c.coupled.use_walls)
        row = np.asarray(qp.A)[L.r_hji[0]]
        cols = L.u[0]          # (delta, Fx) columns at knot 1
        rv = row[cols]
        lo = float(np.asarray(qp.l)[L.r_hji[0]])
        if norm_on:
            np.testing.assert_allclose(np.linalg.norm(rv), 1.0, rtol=1e-5)
            l1 = np.abs(rv).sum()
            assert lo <= 0.95 * l1 + 1e-6, (lo, l1)
        else:
            # raw row: same direction, arbitrary scale
            assert np.linalg.norm(rv) > 0
