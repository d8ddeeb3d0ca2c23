"""Vehicle dynamics library: Fiala brush tire model, planar bicycle ODE
variants, Uy-r stability envelope, longitudinal actuation split/limits, and
the steady-state trim estimator.

Functional JAX reimplementation of the reference's `src/vehicle_dynamics.jl`
(behavior, not code).  All functions are pure, branch-free (jnp.where /
lax control flow), differentiable, and vmappable over arbitrary batch axes.

State/control conventions (all 1-D arrays, order matches the reference
FieldVectors):

- bicycle state  q6 = (E, N, psi, Ux, Uy, r)            `src/vehicle_dynamics.jl:95-102`
- tracking state q6t = (ds, Ux, Uy, r, dpsi, e)         `src/vehicle_dynamics.jl:143-150`
- lateral state  q4 = (Uy, r, dpsi, e)                  `src/vehicle_dynamics.jl:191-196`
- 3-control      u3 = (delta, Fxf, Fxr)                 `src/vehicle_dynamics.jl:1-5`
- 2-control      u2 = (delta, Fx)                       `src/vehicle_dynamics.jl:266-269`
- road params    p4: per model —
    bicycle:  (psi_r, kappa, theta, phi)                `src/vehicle_dynamics.jl:104-109`
    tracking: (V, kappa, theta, phi)                    `src/vehicle_dynamics.jl:152-157`
    lateral:  (Ux, kappa, theta, phi)                   `src/vehicle_dynamics.jl:198-203`
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pigeon_tpu.config import VehicleParams

_TINY = 1e-30


# ---------------------------------------------------------------------------
# Fiala brush tire model (reference: src/vehicle_dynamics.jl:35-62)
# ---------------------------------------------------------------------------

def _fiala(tan_alpha, Ca, Fy_max):
    """Lateral force from slip, cubic up to total slide
    (reference `_fialatiremodel`, src/vehicle_dynamics.jl:40-48)."""
    tan_slide = 3.0 * Fy_max / Ca
    ratio = jnp.abs(tan_alpha) / jnp.maximum(tan_slide, _TINY)
    cubic = -Ca * tan_alpha * (1.0 - ratio + ratio * ratio / 3.0)
    slide = -Fy_max * jnp.sign(tan_alpha)
    return jnp.where(ratio <= 1.0, cubic, slide)


def fiala_tire_model(alpha, Ca, mu, Fx, Fz):
    """Coupled-slip lateral tire force; friction circle limits Fy by
    sqrt((mu Fz)^2 - Fx^2) (reference `fialatiremodel`,
    src/vehicle_dynamics.jl:35-38)."""
    F_max = mu * Fz
    Fy_max = jnp.sqrt(jnp.maximum(F_max * F_max - Fx * Fx, 1e-9))
    val = _fiala(jnp.tan(alpha), Ca, Fy_max)
    return jnp.where(jnp.abs(Fx) >= F_max, 0.0, val)


def _inv_fiala(Fy, Ca, Fy_max, corrected: bool = True):
    """Inverse of `_fiala`: slip tan(alpha) producing lateral force Fy
    (reference `_invfialatiremodel`, src/vehicle_dynamics.jl:56-62).

    DELIBERATE DEVIATION (default, corrected=True): the reference's
    unsaturated branch returns the *normalized* slip
    u = tan(alpha)/tan(alpha_slide) while documenting (and using) it as
    tan(alpha) — it omits the `3*Fy_max/Ca` factor
    (src/vehicle_dynamics.jl:60).  With the factor restored (exact algebraic
    inverse: |Fy|/Fy_max = 1-(1-u)^3), `steady_state_estimates` produces a
    true equilibrium of the tracking dynamics (Uy_dot = r_dot = 0 at trim),
    which the reference's version does not; see
    tests/test_dynamics.py::test_trim_steady_cornering_is_equilibrium.

    corrected=False reproduces the reference formula verbatim (the parity
    harness's reference-faithful mode).
    """
    tan_slide = 3.0 * Fy_max / Ca
    sat = -tan_slide * jnp.sign(Fy)
    r = jnp.abs(Fy) / jnp.maximum(Fy_max, _TINY)
    u = -(1.0 + jnp.cbrt(r - 1.0)) * jnp.sign(Fy)
    scale = tan_slide if corrected else 1.0
    return jnp.where(jnp.abs(Fy) >= Fy_max, sat, u * scale)


def inv_fiala_tire_model(Fy, Ca, mu, Fx, Fz):
    """Slip angle alpha producing lateral force Fy under longitudinal load Fx
    (reference `invfialatiremodel`, src/vehicle_dynamics.jl:50-54)."""
    F_max = mu * Fz
    Fy_max = jnp.sqrt(jnp.maximum(F_max * F_max - Fx * Fx, 1e-9))
    return jnp.arctan(_inv_fiala(Fy, Ca, Fy_max))


# ---------------------------------------------------------------------------
# Lateral force fixed point w/ longitudinal weight transfer
# (reference: src/vehicle_dynamics.jl:64-87)
# ---------------------------------------------------------------------------

def lateral_tire_forces_slip(veh: VehicleParams, alpha_f, alpha_r, Fxf, Fxr,
                             s_delta, c_delta, num_iters: int = 3):
    """Fixed-point solve coupling the front axle normal load
    Fzf = (m G b - h Fx)/L with the tire model (3 iterations, matching the
    reference default)."""
    Fyf = jnp.zeros_like(Fxf)
    Fx = Fxf * c_delta - Fyf * s_delta + Fxr
    for _ in range(num_iters):
        Fzf = (veh.m * veh.G * veh.b - veh.h * Fx) / veh.L
        Fyf = fiala_tire_model(alpha_f, veh.Caf, veh.mu, Fxf, Fzf)
        Fx = Fxf * c_delta - Fyf * s_delta + Fxr
    Fzr = (veh.m * veh.G * veh.a + veh.h * Fx) / veh.L
    Fyr = fiala_tire_model(alpha_r, veh.Car, veh.mu, Fxr, Fzr)
    return Fyf, Fyr


def slip_angles(veh: VehicleParams, Ux, Uy, r, delta):
    """Front/rear slip angles (reference: src/vehicle_dynamics.jl:84-86)."""
    alpha_f = jnp.arctan2(Uy + veh.a * r, Ux) - delta
    alpha_r = jnp.arctan2(Uy - veh.b * r, Ux)
    return alpha_f, alpha_r


def lateral_tire_forces(veh: VehicleParams, Ux, Uy, r, u3, num_iters: int = 3):
    """Lateral forces from body velocities + 3-control
    (reference: src/vehicle_dynamics.jl:78-87)."""
    delta, Fxf, Fxr = u3[..., 0], u3[..., 1], u3[..., 2]
    s_delta, c_delta = jnp.sin(delta), jnp.cos(delta)
    alpha_f, alpha_r = slip_angles(veh, Ux, Uy, r, delta)
    return lateral_tire_forces_slip(veh, alpha_f, alpha_r, Fxf, Fxr,
                                    s_delta, c_delta, num_iters)


def _planar_forces(veh: VehicleParams, Ux, Uy, r, delta, Fxf, Fxr):
    """Shared force computation for all bicycle variants: returns the
    body-frame front-axle force components and the rear lateral force."""
    s_delta, c_delta = jnp.sin(delta), jnp.cos(delta)
    alpha_f, alpha_r = slip_angles(veh, Ux, Uy, r, delta)
    Fyf, Fyr = lateral_tire_forces_slip(veh, alpha_f, alpha_r, Fxf, Fxr,
                                        s_delta, c_delta)
    Fxf_body = Fxf * c_delta - Fyf * s_delta
    Fyf_body = Fyf * c_delta + Fxf * s_delta
    return Fxf_body, Fyf_body, Fyr


def _drag(veh: VehicleParams, Ux):
    return -veh.Cd0 - Ux * (veh.Cd1 + veh.Cd2 * Ux)


# ---------------------------------------------------------------------------
# Bicycle ODE right-hand sides (reference: src/vehicle_dynamics.jl:111-224)
# ---------------------------------------------------------------------------

def bicycle_ode(veh: VehicleParams, q6, u3, p4=None):
    """World-frame planar bicycle ODE (reference `BicycleModel` call,
    src/vehicle_dynamics.jl:111-134).  p4 (road geometry) is accepted for
    interface parity; grade terms are zero as in the reference."""
    E, N, psi, Ux, Uy, r = (q6[..., i] for i in range(6))
    delta, Fxf, Fxr = (u3[..., i] for i in range(3))
    s_psi, c_psi = jnp.sin(psi), jnp.cos(psi)
    Fxf_b, Fyf_b, Fyr = _planar_forces(veh, Ux, Uy, r, delta, Fxf, Fxr)
    Fx_drag = _drag(veh, Ux)
    return jnp.stack([
        -Ux * s_psi - Uy * c_psi,          # psi measured from N (ref :127)
        Ux * c_psi - Uy * s_psi,
        r,
        (Fxf_b + Fxr + Fx_drag) / veh.m + r * Uy,
        (Fyf_b + Fyr) / veh.m - r * Ux,
        (veh.a * Fyf_b - veh.b * Fyr) / veh.Izz,
    ], axis=-1)


def tracking_ode(veh: VehicleParams, q6t, u3, p4):
    """Error-coordinate tracking bicycle ODE (reference
    `TrackingBicycleModel` call, src/vehicle_dynamics.jl:159-182).
    p4 = (V, kappa, theta, phi)."""
    ds, Ux, Uy, r, dpsi, e = (q6t[..., i] for i in range(6))
    delta, Fxf, Fxr = (u3[..., i] for i in range(3))
    V, kappa = p4[..., 0], p4[..., 1]
    s_dpsi, c_dpsi = jnp.sin(dpsi), jnp.cos(dpsi)
    Fxf_b, Fyf_b, Fyr = _planar_forces(veh, Ux, Uy, r, delta, Fxf, Fxr)
    Fx_drag = _drag(veh, Ux)
    U_along = Ux * c_dpsi - Uy * s_dpsi
    return jnp.stack([
        U_along - V,
        (Fxf_b + Fxr + Fx_drag) / veh.m + r * Uy,
        (Fyf_b + Fyr) / veh.m - r * Ux,
        (veh.a * Fyf_b - veh.b * Fyr) / veh.Izz,
        r - U_along * kappa,
        Ux * s_dpsi + Uy * c_dpsi,
    ], axis=-1)


def lateral_ode(veh: VehicleParams, q4, u3, p4):
    """Lateral-only tracking ODE, Ux exogenous via p4[0] (reference
    `LateralTrackingBicycleModel` call, src/vehicle_dynamics.jl:205-223).
    p4 = (Ux, kappa, theta, phi)."""
    Uy, r, dpsi, e = (q4[..., i] for i in range(4))
    delta, Fxf, Fxr = (u3[..., i] for i in range(3))
    Ux, kappa = p4[..., 0], p4[..., 1]
    s_dpsi, c_dpsi = jnp.sin(dpsi), jnp.cos(dpsi)
    _, Fyf_b, Fyr = _planar_forces(veh, Ux, Uy, r, delta, Fxf, Fxr)
    return jnp.stack([
        (Fyf_b + Fyr) / veh.m - r * Ux,
        (veh.a * Fyf_b - veh.b * Fyr) / veh.Izz,
        r - Ux * kappa,
        Ux * s_dpsi + Uy * c_dpsi,
    ], axis=-1)


# ---------------------------------------------------------------------------
# Uy-r stability envelope (reference: src/vehicle_dynamics.jl:226-263)
# ---------------------------------------------------------------------------

class StableLimits(NamedTuple):
    delta_min: jnp.ndarray
    delta_max: jnp.ndarray
    H_veh: jnp.ndarray   # (..., 4, 2): half-planes H [Uy, r]^T <= G
    G_veh: jnp.ndarray   # (..., 4)


def stable_limits(veh: VehicleParams, Ux, Fxf, Fxr) -> StableLimits:
    """Safe-driving-envelope polytope in (Uy, r) + steering bounds, per
    Bobier's phase-portrait construction (reference `stable_limits`,
    src/vehicle_dynamics.jl:226-263)."""
    L, a, b, h, m, mu, Caf, Car, G = (veh.L, veh.a, veh.b, veh.h, veh.m,
                                      veh.mu, veh.Caf, veh.Car, veh.G)
    Fx = Fxf + Fxr
    Fzf = (m * G * b - h * Fx) / L
    Fzr = (m * G * a + h * Fx) / L
    Ff_max = mu * Fzf
    Fr_max = mu * Fzr
    Fyf_max = jnp.where(jnp.abs(Fxf) > Ff_max, 0.0,
                        jnp.sqrt(jnp.maximum(Ff_max * Ff_max - Fxf * Fxf, 0.0)))
    Fyr_max = jnp.where(jnp.abs(Fxr) > Fr_max, 0.0,
                        jnp.sqrt(jnp.maximum(Fr_max * Fr_max - Fxr * Fxr, 0.0)))
    tan_af_slide = 3.0 * Fyf_max / Caf
    tan_ar_slide = 3.0 * Fyr_max / Car
    af_slide = jnp.arctan(tan_af_slide)
    ar_slide = jnp.arctan(tan_ar_slide)

    Ux2 = Ux * Ux
    delta_max = jnp.arctan(L * (mu * G) / Ux2 - tan_ar_slide) + af_slide
    delta_min = jnp.arctan(L * (-mu * G) / Ux2 + tan_ar_slide) - af_slide
    rC = (mu * G) / Ux
    UyC = -Ux * tan_ar_slide + b * rC
    rD = Ux / L * (jnp.tan(af_slide + delta_max) - tan_ar_slide)
    UyD = Ux * tan_ar_slide + b * rD
    mCD = (rD - rC) / (UyD - UyC)
    rE = Ux / L * (jnp.tan(-af_slide + delta_min) + tan_ar_slide)
    UyE = -Ux * tan_ar_slide + b * rE
    rF = (-mu * G) / Ux
    UyF = Ux * tan_ar_slide + b * rF
    mEF = (rF - rE) / (UyF - UyE)

    one = jnp.ones_like(Ux)
    H = jnp.stack([
        jnp.stack([one / Ux, -b / Ux * one], axis=-1),
        jnp.stack([-one / Ux, b / Ux * one], axis=-1),
        jnp.stack([-mCD, one], axis=-1),
        jnp.stack([mEF, -one], axis=-1),
    ], axis=-2)
    Gv = jnp.stack([ar_slide, ar_slide, rC - UyC * mCD, -rF + UyF * mEF],
                   axis=-1)
    return StableLimits(delta_min, delta_max, H, Gv)


# ---------------------------------------------------------------------------
# Longitudinal actuation + control limits
# (reference: src/vehicle_dynamics.jl:272-298)
# ---------------------------------------------------------------------------

def longitudinal_split(veh: VehicleParams, Fx):
    """Split commanded Fx into (Fxf, Fxr) per drive/brake fractions
    (reference `longitudinal_tire_forces`, src/vehicle_dynamics.jl:279-282)."""
    drive = Fx > 0
    Fxf = Fx * jnp.where(drive, veh.fwd_frac, veh.fwb_frac)
    Fxr = Fx * jnp.where(drive, veh.rwd_frac, veh.rwb_frac)
    return Fxf, Fxr


def apply_control_limits(veh: VehicleParams, u2, Ux):
    """Clamp (delta, Fx) to steering / force / power limits (reference
    `apply_control_limits`, src/vehicle_dynamics.jl:293-298).

    `stop_gradient` on Ux reproduces the reference's `ForwardDiff.value`
    escape (src/vehicle_dynamics.jl:295): the power clamp must not
    contribute dFx/dUx terms to linearizations.
    """
    Ux = jax.lax.stop_gradient(Ux)
    delta = jnp.clip(u2[..., 0], -veh.delta_max, veh.delta_max)
    Fx = jnp.maximum(
        jnp.minimum(jnp.minimum(u2[..., 1], veh.Fx_max), veh.Px_max / Ux),
        veh.Fx_min)
    return jnp.stack([delta, Fx], axis=-1)


def expand_control(veh: VehicleParams, u2, Ux):
    """u2=(delta,Fx) -> limited u3=(delta,Fxf,Fxr): the `VehicleModel`
    control pipeline (reference: src/vehicle_dynamics.jl:300-313)."""
    u2l = apply_control_limits(veh, u2, Ux)
    Fxf, Fxr = longitudinal_split(veh, u2l[..., 1])
    return jnp.stack([u2l[..., 0], Fxf, Fxr], axis=-1)


def _get_Ux(model: str, q, p):
    """Ux source per bicycle variant (reference get_Ux,
    src/vehicle_dynamics.jl:307-309)."""
    if model == "bicycle":
        return q[..., 3]
    if model == "tracking":
        return q[..., 1]
    if model == "lateral":
        return p[..., 0]
    raise ValueError(model)


_ODES = {"bicycle": bicycle_ode, "tracking": tracking_ode, "lateral": lateral_ode}
STATE_DIM = {"bicycle": 6, "tracking": 6, "lateral": 4}


def vehicle_ode(veh: VehicleParams, model: str, q, u2, p4):
    """`VehicleModel` ODE: reduced 2-D control -> limits -> split -> bicycle
    variant RHS (reference: src/vehicle_dynamics.jl:300-316)."""
    Ux = _get_Ux(model, q, p4)
    u3 = expand_control(veh, u2, Ux)
    return _ODES[model](veh, q, u3, p4)


# ---------------------------------------------------------------------------
# Steady-state trim estimator (reference: src/vehicle_dynamics.jl:318-390)
# ---------------------------------------------------------------------------

class TrimEstimate(NamedTuple):
    beta: jnp.ndarray
    Ux: jnp.ndarray
    Uy: jnp.ndarray
    r: jnp.ndarray
    A: jnp.ndarray
    delta: jnp.ndarray
    Fxf: jnp.ndarray
    Fxr: jnp.ndarray


def steady_state_estimates(veh: VehicleParams, V, A_tan, kappa,
                           num_iters: int = 4, r=None, beta0=0.0,
                           delta0=0.0, Fyf0=0.0,
                           corrected_tire_inverse: bool = True
                           ) -> TrimEstimate:
    """Iterative trim solve for (beta, delta, Fxf, Fxr, A) tracking speed V,
    tangential accel A_tan and curvature kappa under friction-circle
    prioritization (radial first).  Seeds the MPC linearization nodes.

    Faithful functional transcription of the reference's fixed-point loop
    (src/vehicle_dynamics.jl:319-390); the loop is unrolled (num_iters is
    static, <=4) so XLA fuses it into straight-line vector code.

    corrected_tire_inverse=False uses the reference's `_invfialatiremodel`
    verbatim (see `_inv_fiala`) for the parity harness.
    """
    V = jnp.asarray(V, dtype=jnp.result_type(float))
    A_tan = jnp.broadcast_to(jnp.asarray(A_tan, V.dtype), V.shape)
    kappa = jnp.broadcast_to(jnp.asarray(kappa, V.dtype), V.shape)
    r = V * kappa if r is None else jnp.broadcast_to(jnp.asarray(r, V.dtype), V.shape)
    beta = jnp.broadcast_to(jnp.asarray(beta0, V.dtype), V.shape)
    delta = jnp.broadcast_to(jnp.asarray(delta0, V.dtype), V.shape)
    Fyf = jnp.broadcast_to(jnp.asarray(Fyf0, V.dtype), V.shape)

    L, a, b, h, m, Izz, mu, G = (veh.L, veh.a, veh.b, veh.h, veh.m, veh.Izz,
                                 veh.mu, veh.G)
    Caf, Car = veh.Caf, veh.Car
    fwd, rwd, fwb, rwb = veh.fwd_frac, veh.rwd_frac, veh.fwb_frac, veh.rwb_frac

    # Friction-circle prioritization of the nominal accelerations
    # (reference :329-340).
    A_rad = V * V * kappa
    A_max = mu * G
    A_mag = jnp.hypot(A_tan, A_rad)
    over = A_mag > A_max
    rad_over = jnp.abs(A_rad) > A_max
    A_rad_c = jnp.where(over & rad_over, A_max * jnp.sign(A_rad), A_rad)
    A_tan_c = jnp.where(
        over,
        jnp.where(rad_over, 0.0,
                  jnp.sqrt(jnp.maximum(A_max * A_max - A_rad * A_rad, 0.0))
                  * jnp.sign(A_tan)),
        A_tan)
    A_rad, A_tan = A_rad_c, A_tan_c
    r_dot = A_tan * kappa

    Ux = V
    Uy = jnp.zeros_like(V)
    Fxf = jnp.zeros_like(V)
    Fxr = jnp.zeros_like(V)
    tan_ar = jnp.zeros_like(V)

    for i in range(num_iters):
        s_beta, c_beta = jnp.sin(beta), jnp.cos(beta)
        s_delta, c_delta = jnp.sin(delta), jnp.cos(delta)
        Ux, Uy = V * c_beta, V * s_beta
        Fx_drag = -veh.Cd0 - Ux * (veh.Cd1 + veh.Cd2 * Ux)

        Ax = A_tan * c_beta - A_rad * s_beta
        Ay = A_tan * s_beta + A_rad * c_beta
        Fx = Ax * m - Fx_drag
        Fx = jnp.minimum(
            Fx,
            jnp.minimum(veh.Fx_max, veh.Px_max / Ux) * (rwd + fwd * c_delta)
            - Fyf * s_delta)
        Fzr = (m * G * a + h * Fx) / L
        Fzf = (m * G * b - h * Fx) / L
        Fr_max, Ff_max = mu * Fzr, mu * Fzf

        frac = jnp.where(Fx > 0, rwd / (rwd + fwd * c_delta),
                         rwb / (rwb + fwb * c_delta))
        Fxr = jnp.clip((Fx + Fyf * s_delta) * frac, -Fr_max, Fr_max)
        Fyr_max = jnp.sqrt(jnp.maximum(Fr_max * Fr_max - Fxr * Fxr, 0.0))
        Fyr = (Ay * m - r_dot * Izz / a) / (1.0 + b / a)
        Fyr = jnp.clip(Fyr, -Fyr_max, Fyr_max)
        tan_ar = _inv_fiala(Fyr, Car, Fyr_max, corrected_tire_inverse)

        Fxf_b = jnp.clip(Fx - Fxr, -Ff_max, Ff_max)
        Fyf_b_max = jnp.sqrt(jnp.maximum(Ff_max * Ff_max - Fxf_b * Fxf_b, 0.0))
        Fyf_b = jnp.clip((b * Fyr + r_dot * Izz) / a, -Fyf_b_max, Fyf_b_max)
        Fxf = Fxf_b * c_delta + Fyf_b * s_delta
        Fyf = Fyf_b * c_delta - Fxf_b * s_delta
        Fyf_max = jnp.sqrt(jnp.maximum(Ff_max * Ff_max - Fxf * Fxf, 0.0))
        alpha_f = jnp.arctan(_inv_fiala(Fyf, Caf, Fyf_max,
                                        corrected_tire_inverse))
        delta = jnp.arctan2(Uy + a * r, Ux) - alpha_f

        if i == num_iters - 1:
            # NOTE: the reference evaluates this with the trig of the
            # *pre-update* delta (sincos computed at loop top,
            # src/vehicle_dynamics.jl:346,377-381) — keep that behavior.
            Ax = (Fxf * c_delta - Fyf * s_delta + Fxr + Fx_drag) / m
            Ay = (Fyf * c_delta + Fxf * s_delta + Fyr) / m
            A_tan = Ax * c_beta + Ay * s_beta
        else:
            beta = jnp.arctan(tan_ar + b * r / Ux)

    s_beta, c_beta = jnp.sin(beta), jnp.cos(beta)
    return TrimEstimate(beta=beta, Ux=V * c_beta, Uy=V * s_beta, r=r,
                        A=A_tan, delta=delta, Fxf=Fxf, Fxr=Fxr)
