"""Unit tests for the vehicle dynamics library (tire model, bicycle ODEs,
envelope, actuation, trim) against closed-form cases and cross-model
consistency — the test pyramid the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import dynamics as dyn


# ---------------------------------------------------------------------------
# Fiala tire model
# ---------------------------------------------------------------------------

def test_fiala_linear_regime(x1):
    """Small slip: Fy ~= -C_alpha * tan(alpha)."""
    Fz = 5000.0
    alpha = 1e-5
    Fy = dyn.fiala_tire_model(alpha, x1.Caf, x1.mu, 0.0, Fz)
    np.testing.assert_allclose(float(Fy), -x1.Caf * np.tan(alpha), rtol=1e-3)


def test_fiala_saturation(x1):
    """Large slip: |Fy| = mu*Fz (full slide), sign opposite to alpha."""
    Fz = 5000.0
    Fy = dyn.fiala_tire_model(0.5, x1.Caf, x1.mu, 0.0, Fz)
    np.testing.assert_allclose(float(Fy), -x1.mu * Fz, rtol=1e-12)
    Fy = dyn.fiala_tire_model(-0.5, x1.Caf, x1.mu, 0.0, Fz)
    np.testing.assert_allclose(float(Fy), x1.mu * Fz, rtol=1e-12)


def test_fiala_force_circle(x1):
    """|Fx| >= mu*Fz kills lateral capacity entirely."""
    Fz = 5000.0
    Fy = dyn.fiala_tire_model(0.05, x1.Caf, x1.mu, x1.mu * Fz * 1.01, Fz)
    assert float(Fy) == 0.0
    # Just inside the circle, capacity is sqrt((mu Fz)^2 - Fx^2)
    Fx = 0.99 * x1.mu * Fz
    cap = np.sqrt((x1.mu * Fz) ** 2 - Fx ** 2)
    Fy = dyn.fiala_tire_model(0.5, x1.Caf, x1.mu, Fx, Fz)
    np.testing.assert_allclose(float(Fy), -cap, rtol=1e-10)


@pytest.mark.parametrize("alpha", [-0.15, -0.01, 0.0, 0.003, 0.08])
@pytest.mark.parametrize("Fx", [0.0, 2000.0, -3000.0])
def test_fiala_inverse_roundtrip(x1, alpha, Fx):
    """inv_fiala(fiala(alpha)) == alpha within the non-sliding regime."""
    Fz = 5500.0
    Fy = dyn.fiala_tire_model(alpha, x1.Caf, x1.mu, Fx, Fz)
    Fy_max = np.sqrt((x1.mu * Fz) ** 2 - Fx ** 2)
    if abs(np.tan(alpha)) < 3 * Fy_max / x1.Caf:  # not sliding
        alpha_back = dyn.inv_fiala_tire_model(Fy, x1.Caf, x1.mu, Fx, Fz)
        np.testing.assert_allclose(float(alpha_back), alpha, atol=1e-9)


def test_fiala_zero_slip_no_nan(x1):
    """Degenerate Fy_max=0 (tire fully saturated longitudinally) must not
    produce NaN at zero slip."""
    Fz = 5000.0
    out = dyn.fiala_tire_model(0.0, x1.Caf, x1.mu, x1.mu * Fz, Fz)
    assert np.isfinite(float(out))


# ---------------------------------------------------------------------------
# Lateral force fixed point
# ---------------------------------------------------------------------------

def test_lateral_tire_forces_fixed_point(x1):
    """After the 3-sweep fixed point, Fyf must be (nearly) consistent with
    the weight transfer it induces."""
    Ux, Uy, r = 10.0, 0.3, 0.1
    u3 = jnp.array([0.05, 0.0, 800.0])
    Fyf, Fyr = dyn.lateral_tire_forces(x1, Ux, Uy, r, u3)
    delta, Fxf, Fxr = 0.05, 0.0, 800.0
    sd, cd = np.sin(delta), np.cos(delta)
    Fx = Fxf * cd - float(Fyf) * sd + Fxr
    Fzf = (x1.m * x1.G * x1.b - x1.h * Fx) / x1.L
    af = np.arctan2(Uy + x1.a * r, Ux) - delta
    Fyf_expect = dyn.fiala_tire_model(af, x1.Caf, x1.mu, Fxf, Fzf)
    np.testing.assert_allclose(float(Fyf), float(Fyf_expect), rtol=1e-4)
    assert np.isfinite(float(Fyr))


# ---------------------------------------------------------------------------
# Bicycle ODE variants
# ---------------------------------------------------------------------------

def test_bicycle_ode_straight(x1):
    """Straight rolling: position kinematics exact, drag decelerates."""
    q = jnp.array([0.0, 0.0, 0.0, 10.0, 0.0, 0.0])
    u = jnp.array([0.0, 0.0, 0.0])
    qd = np.asarray(dyn.bicycle_ode(x1, q, u))
    drag = -(x1.Cd0 + 10.0 * x1.Cd1)
    np.testing.assert_allclose(qd, [0.0, 10.0, 0.0, drag / x1.m, 0.0, 0.0],
                               atol=1e-12)


def test_bicycle_heading_convention(x1):
    """psi measured from N: at psi=pi/2 the car moves in -E
    (reference src/vehicle_dynamics.jl:127 comment)."""
    q = jnp.array([0.0, 0.0, np.pi / 2, 10.0, 0.0, 0.0])
    u = jnp.array([0.0, 0.0, 0.0])
    qd = np.asarray(dyn.bicycle_ode(x1, q, u))
    np.testing.assert_allclose(qd[0], -10.0, atol=1e-9)
    np.testing.assert_allclose(qd[1], 0.0, atol=1e-9)


def test_tracking_matches_bicycle_velocities(x1):
    """The (Ux, Uy, r) derivatives of the tracking model equal the world
    model's for identical body states/controls."""
    u3 = jnp.array([0.03, 0.0, 1000.0])
    qb = jnp.array([3.0, 4.0, 0.7, 12.0, 0.4, 0.12])
    qt = jnp.array([0.5, 12.0, 0.4, 0.12, 0.1, -0.2])
    p4 = jnp.array([11.0, 0.01, 0.0, 0.0])
    db = np.asarray(dyn.bicycle_ode(x1, qb, u3))
    dt_ = np.asarray(dyn.tracking_ode(x1, qt, u3, p4))
    np.testing.assert_allclose(dt_[1:4], db[3:6], rtol=1e-12)


def test_lateral_matches_tracking(x1):
    """Lateral model (Uy, r, dpsi, e) derivatives equal the tracking
    model's when Ux is supplied exogenously."""
    u3 = jnp.array([0.03, 0.0, 0.0])
    Ux = 9.0
    qt = jnp.array([0.0, Ux, 0.3, 0.1, 0.05, -0.1])
    q4 = jnp.array([0.3, 0.1, 0.05, -0.1])
    pt = jnp.array([8.0, 0.02, 0.0, 0.0])
    pl = jnp.array([Ux, 0.02, 0.0, 0.0])
    d6 = np.asarray(dyn.tracking_ode(x1, qt, u3, pt))
    d4 = np.asarray(dyn.lateral_ode(x1, q4, u3, pl))
    # Uy_dot, r_dot, e_dot identical; dpsi_dot differs by design: the
    # lateral model uses r - Ux*kappa (src/vehicle_dynamics.jl:220) while
    # the tracking model uses the along-path speed (:179).
    np.testing.assert_allclose(d4[[0, 1, 3]], d6[[2, 3, 5]], rtol=1e-12)
    np.testing.assert_allclose(d4[2], float(q4[1]) - 9.0 * 0.02, rtol=1e-12)


def test_odes_batched(x1):
    """All ODEs broadcast over leading batch axes."""
    B = 7
    q = jnp.ones((B, 6)) * jnp.array([0, 0, 0.1, 9.0, 0.1, 0.05])
    u = jnp.zeros((B, 3))
    out = dyn.bicycle_ode(x1, q, u)
    assert out.shape == (B, 6)
    vout = jax.vmap(lambda qq: dyn.bicycle_ode(x1, qq, u[0]))(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vout), rtol=1e-12)


# ---------------------------------------------------------------------------
# Stability envelope
# ---------------------------------------------------------------------------

def test_stable_limits_contains_origin(x1):
    lim = dyn.stable_limits(x1, 10.0, 0.0, 500.0)
    assert np.all(np.asarray(lim.G_veh) >= 0.0)
    assert float(lim.delta_min) < 0.0 < float(lim.delta_max)


def test_stable_limits_steady_state_cornering_inside(x1):
    """Gentle steady-state cornering (Uy, r) lies inside the envelope."""
    Ux, kappa = 10.0, 0.02
    r = Ux * kappa
    lim = dyn.stable_limits(x1, Ux, 0.0, 500.0)
    viol = np.asarray(lim.H_veh) @ np.array([0.0, r]) - np.asarray(lim.G_veh)
    assert np.all(viol < 0.0)


# ---------------------------------------------------------------------------
# Actuation split / limits
# ---------------------------------------------------------------------------

def test_longitudinal_split(x1):
    Fxf, Fxr = dyn.longitudinal_split(x1, jnp.asarray(1000.0))
    np.testing.assert_allclose([float(Fxf), float(Fxr)],
                               [1000 * x1.fwd_frac, 1000 * x1.rwd_frac])
    Fxf, Fxr = dyn.longitudinal_split(x1, jnp.asarray(-2000.0))
    np.testing.assert_allclose([float(Fxf), float(Fxr)],
                               [-2000 * x1.fwb_frac, -2000 * x1.rwb_frac])


def test_apply_control_limits(x1):
    u = jnp.array([1.0, 1e6])
    out = np.asarray(dyn.apply_control_limits(x1, u, 20.0))
    np.testing.assert_allclose(out[0], x1.delta_max)
    np.testing.assert_allclose(out[1], min(x1.Fx_max, x1.Px_max / 20.0))
    u = jnp.array([-1.0, -1e6])
    out = np.asarray(dyn.apply_control_limits(x1, u, 20.0))
    np.testing.assert_allclose(out[0], -x1.delta_max)
    np.testing.assert_allclose(out[1], x1.Fx_min)


def test_control_limits_power_clamp_no_gradient(x1):
    """The Px_max/Ux clamp must not leak dFx/dUx into linearizations
    (the reference's ForwardDiff.value escape,
    src/vehicle_dynamics.jl:295)."""
    def fx_of_ux(Ux):
        return dyn.apply_control_limits(x1, jnp.array([0.0, 5000.0]), Ux)[1]
    g = jax.grad(fx_of_ux)(18.0)   # power-limited region: 75e3/18 < 5000
    assert float(g) == 0.0


# ---------------------------------------------------------------------------
# Steady-state trim
# ---------------------------------------------------------------------------

def test_trim_straight_road(x1):
    est = dyn.steady_state_estimates(x1, 10.0, 0.0, 0.0)
    assert abs(float(est.beta)) < 1e-3
    assert abs(float(est.delta)) < 1e-3
    drag = x1.Cd0 + 10.0 * x1.Cd1
    np.testing.assert_allclose(float(est.Fxf + est.Fxr), drag, rtol=1e-6)
    np.testing.assert_allclose(float(est.Ux), 10.0, rtol=1e-9)


def test_trim_steady_cornering_is_equilibrium(x1):
    """Trim for steady cornering must nearly zero the (Uy, r) derivatives of
    the tracking model."""
    V, kappa = 10.0, 0.03
    est = dyn.steady_state_estimates(x1, V, 0.0, kappa, num_iters=8)
    q = jnp.array([0.0, float(est.Ux), float(est.Uy), float(est.r),
                   -float(est.beta), 0.0])
    u3 = jnp.array([float(est.delta), float(est.Fxf), float(est.Fxr)])
    p4 = jnp.array([V, kappa, 0.0, 0.0])
    qd = np.asarray(dyn.tracking_ode(x1, q, u3, p4))
    # Uy_dot and r_dot small compared to the centripetal accel scale
    assert abs(qd[2]) < 0.05 * V * V * kappa
    assert abs(qd[3]) < 0.05 * V * kappa * V * kappa + 0.05
    np.testing.assert_allclose(float(est.r), V * kappa, rtol=1e-9)


def test_trim_friction_prioritization(x1):
    """When requested accel exceeds the friction circle, radial is
    prioritized and A_tan shrinks."""
    V, kappa = 15.0, 0.035   # A_rad = 7.9 m/s^2, near the 9.02 limit
    est = dyn.steady_state_estimates(x1, V, 8.0, kappa)
    A_max = x1.mu * x1.G
    A_rad = V * V * kappa
    assert float(est.A) <= np.sqrt(A_max ** 2 - A_rad ** 2) + 0.2


def test_trim_batched(x1):
    V = jnp.array([5.0, 10.0, 15.0])
    est = dyn.steady_state_estimates(x1, V, 0.0, 0.01)
    assert est.delta.shape == (3,)
    assert np.all(np.isfinite(np.asarray(est.delta)))
