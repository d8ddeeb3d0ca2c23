"""Ground-truth validation of the HJI-VI level-set solver.

The 7-D vehicle game has no closed-form solution, so the solver core
(`hji_solve.solve_hji_vi` — shared verbatim by `solve_hji`) is validated
on the isotropic pursuit-evasion game, which does:

    relative state x in R^2,  dx/dt = d - u,  |u| <= u_max, |d| <= d_max
    l(x) = |x| - margin      (avoid set: separation below margin)

Optimal play is radial (u* = -u_max p/|p| for the maximizing evader,
d* = -d_max p/|p| for the minimizing pursuer), giving the Hamiltonian
H = (u_max - d_max) |p| and the exact finite-horizon value

    V_T(x) = max(|x| - max(d_max - u_max, 0) * T, 0) - margin

clipped below by -margin, and V_T = l for all T when u_max >= d_max
(the evader escapes; the VI freeze holds V at l).  This checks the
Hamiltonian sign conventions, the variational-inequality freeze, the
Lax-Friedrichs dissipation, and the CFL time integration — everything
except the 7-D vehicle dynamics themselves, which have their own unit
tests (tests/test_hji.py) against the reference's optimizer formulas
(/root/reference/src/HJI_computation.jl:90-131).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pigeon_tpu import hji_solve as HS

MARGIN = 1.0


def _pursuit_setup(n, u_max, d_max, half=8.0):
    knots = [np.linspace(-half, half, n)] * 2
    hs = [float(k[1] - k[0]) for k in knots]
    X = np.stack(np.meshgrid(*knots, indexing="ij"), axis=-1)
    l = jnp.asarray(np.hypot(X[..., 0], X[..., 1]) - MARGIN, jnp.float32)
    speed = d_max - u_max

    def flow(start0, gradV):
        # closed-form optimal play: f = (u_max - d_max) * p / |p|
        # (position-independent, so the axis-0 slab offset is unused)
        nrm = jnp.maximum(jnp.linalg.norm(gradV, axis=-1, keepdims=True),
                          1e-12)
        return -speed * gradV / nrm

    return l, hs, X, flow, speed


def _analytic(X, speed, T):
    r = np.hypot(X[..., 0], X[..., 1])
    return np.maximum(r - max(speed, 0.0) * T, 0.0) - MARGIN


def _interior(shape, band=6):
    m = np.zeros(shape, bool)
    m[band:-band, band:-band] = True
    return m


def test_evader_escapes_value_stays_at_target():
    """u_max >= d_max: H >= 0 everywhere, the VI freeze must hold V = l
    up to the scheme's dissipation leakage (< h/2 in the interior)."""
    l, hs, X, flow, _ = _pursuit_setup(81, u_max=2.0, d_max=1.0)
    V, deltas, _ = HS.solve_hji_vi(l, hs, flow, n_sweeps=120)
    inner = _interior(V.shape)
    err = np.abs(np.asarray(V) - np.asarray(l))[inner]
    assert err.max() < 1.0 * hs[0]
    assert err.mean() < 0.25 * hs[0]
    assert float(deltas[-1]) < 1e-2  # settles to a small cap/diss plateau


def test_pursuer_advantage_matches_analytic_transient():
    """d_max > u_max: compare against the exact time-dependent value at
    the pseudo-time reached by the sweeps (first-order LF scheme: O(h)
    error at the kink, tighter away from it)."""
    l, hs, X, flow, speed = _pursuit_setup(161, u_max=1.0, d_max=2.0)
    V, deltas, times = HS.solve_hji_vi(l, hs, flow, n_sweeps=200)
    T = float(times[-1])
    exact = _analytic(X, speed, T)
    inner = _interior(V.shape)
    err = np.abs(np.asarray(V) - exact)[inner]
    h = hs[0]
    assert err.max() < 4.0 * h          # kink-dominated worst case
    assert err.mean() < 1.0 * h   # front-smear dominated
    # the captured core must be identified exactly: V = -margin where the
    # pursuer can reach the evader within T
    core = np.hypot(X[..., 0], X[..., 1]) < speed * T - 3 * h
    if core.any():
        assert np.asarray(V)[core].max() < -MARGIN + 4.0 * h


def test_grid_refinement_converges_first_order():
    """Halving h must shrink the sup error vs the analytic solution
    (first-order monotone scheme); checked over a 3-level ladder at a
    FIXED pseudo-time horizon reached by every level."""
    errs, hsteps = [], []
    T_target = 1.2
    for n in (41, 81, 161):
        l, hs, X, flow, speed = _pursuit_setup(n, u_max=1.0, d_max=2.0)
        # run far more sweeps than needed; truncate at T_target
        V, _, times = HS.solve_hji_vi(l, hs, flow, n_sweeps=60
                                      if n == 41 else (120 if n == 81
                                                       else 240))
        t = np.asarray(times)
        k = int(np.searchsorted(t, T_target))
        assert k < len(t), "pseudo-time horizon not reached"
        # re-run truncated to exactly k+1 sweeps (scan returns only final V)
        Vk, _, tk = HS.solve_hji_vi(l, hs, flow, n_sweeps=k + 1)
        exact = _analytic(X, speed, float(tk[-1]))
        inner = _interior(V.shape, band=4)
        errs.append(np.abs(np.asarray(Vk) - exact)[inner].max())
        hsteps.append(hs[0])
    assert errs[1] < errs[0] and errs[2] < errs[1]
    # With local-LF dissipation (the default) the COARSE levels improve
    # the most (less smearing where |f| is small), which flattens the
    # empirical order even though every level got MORE accurate —
    # measured: local errs (0.249, 0.189, 0.132) vs global
    # (0.432, 0.289, 0.189) on this ladder.  Monotone decrease plus a
    # loose order floor is the meaningful pin.
    order = np.log(errs[0] / errs[2]) / np.log(hsteps[0] / hsteps[2])
    assert order > 0.3
    # and local LF must dominate global LF pointwise on the sup metric
    l, hs, X, flow, speed = _pursuit_setup(41, u_max=1.0, d_max=2.0)
    Vg, _, tg = HS.solve_hji_vi(l, hs, flow, n_sweeps=60, lf="global")
    Vl, _, tl = HS.solve_hji_vi(l, hs, flow, n_sweeps=60, lf="local")
    exact = _analytic(X, speed, float(tg[-1]))
    inner = _interior(Vg.shape, band=4)
    eg = np.abs(np.asarray(Vg) - exact)[inner].max()
    el = np.abs(np.asarray(Vl) - _analytic(X, speed, float(tl[-1])))[
        inner].max()
    assert el < eg


def test_vehicle_wrapper_still_consistent(x1):
    """The refactored solve_hji (now delegating to solve_hji_vi) keeps
    its contract: monotone decrease from l, floor at -margin."""
    cache, deltas, _ = HS.solve_hji(
        x1, shape=(7, 7, 5, 5, 3, 3, 3), n_sweeps=40, fx_samples=5)
    V = np.asarray(cache.V).reshape(cache.dims)
    knots = [np.asarray(k) for k in cache.knots]
    X = np.stack(np.meshgrid(*knots, indexing="ij"), axis=-1)
    l = np.hypot(X[..., 0], X[..., 1]) - 3.0
    assert np.all(V <= l + 1e-4)
    assert V.min() >= -3.0 - 1e-5
    assert np.all(np.isfinite(deltas))
