"""Tests for the on-device HJI value-function solver (the replacement for
the reference's downloaded BicycleCAvoid asset)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pigeon_tpu import hji as H
from pigeon_tpu import hji_solve as HS


@pytest.fixture(scope="module")
def solved(x1):
    # FINITE-horizon avoid value (T = 3 s): the infinite-horizon game
    # between equal-agility vehicles is pursuer-won (V collapses to the
    # floor everywhere — measured on the fully-converged proto cache),
    # so the shipped artifact freezes at the pseudo-time horizon.
    cache, deltas, times = HS.solve_hji(
        x1, shape=(11, 9, 7, 5, 5, 5, 5), n_sweeps=500, fx_samples=9,
        horizon_s=3.0)
    return cache, deltas, times


def test_hji_solver_reaches_horizon_and_freezes(solved):
    _, deltas, times = solved
    assert deltas[0] > 0.1
    assert np.all(np.isfinite(deltas))
    assert float(times[-1]) > 3.0          # horizon reached
    assert float(deltas[-1]) == 0.0        # updates frozen past it


def test_hji_finite_horizon_value_is_nondegenerate(solved):
    """The T=3s value function must keep a meaningful unsafe-set
    fraction — not the everywhere-unsafe infinite-horizon collapse."""
    cache, _, _ = solved
    V = np.asarray(cache.V)
    unsafe = float((V <= 0.05).mean())
    assert 0.005 < unsafe < 0.5
    assert float(np.percentile(V, 50)) > 1.0


def test_hji_value_bounded_and_below_target(solved, x1):
    cache, _, _ = solved
    V = np.asarray(cache.V).reshape(cache.dims)
    assert V.min() >= -3.0 - 1e-5       # floor: min l = -margin
    knots = [np.asarray(k) for k in cache.knots]
    X = np.stack(np.meshgrid(*knots, indexing="ij"), axis=-1)
    l = np.hypot(X[..., 0], X[..., 1]) - 3.0
    assert np.all(V <= l + 1e-3)


def test_hji_danger_ordering(solved):
    cache, _, _ = solved
    # nearly touching, head-on closing
    x_danger = jnp.asarray([3.5, 0.0, np.pi, 10.0, 0.0, 10.0, 0.0])
    # far ahead moving away (ego can always disengage)
    x_safe = jnp.asarray([18.0, 8.0, 0.0, 10.0, 0.0, 10.0, 0.0])
    Vd, gd = H.interpolate(cache, x_danger)
    Vs, _ = H.interpolate(cache, x_safe)
    assert float(Vd) < float(Vs)
    assert np.abs(np.asarray(gd)).max() > 1e-3


def test_hji_solved_cache_drives_filter(solved, x1):
    """The solved value function plugs into the least-restrictive
    constraint machinery: near the unsafe-set boundary (where the value
    gradient lives — deep inside the frozen V=-margin plateau it is zero,
    as in the reference) the constraint activates with a nonzero row."""
    cache, _, _ = solved
    # walk the head-on ray outward to find a state near the boundary with
    # a live gradient
    x_b, g_b = None, None
    for dE in np.linspace(3.0, 19.0, 33):
        x = jnp.asarray([dE, 0.3, np.pi, 8.0, 0.0, 8.0, 0.0])
        V, g = H.interpolate(cache, x)
        if np.abs(np.asarray(g)[[3, 4, 6]]).max() > 1e-3:
            x_b, g_b, V_b = x, g, V
            break
    assert x_b is not None, "no live-gradient state found on the ray"
    eps = float(V_b) + 0.5     # ensure the filter is active here
    M, b, Vc, _ = H.reachability_constraint(x1, cache, x_b, eps)
    assert float(Vc) == pytest.approx(float(V_b))
    assert np.all(np.isfinite(np.asarray(M)))
    assert np.abs(np.asarray(M)).max() > 0.0


def test_hji_cache_save_load_roundtrip(solved, tmp_path):
    cache, _, _ = solved
    p = str(tmp_path / "hji_cache.npz")
    HS.save_cache(p, cache)
    loaded = HS.load_cache(p)
    np.testing.assert_allclose(np.asarray(loaded.V), np.asarray(cache.V))
    x = jnp.asarray([5.0, 1.0, 1.0, 8.0, 0.0, 8.0, 0.0])
    V1, g1 = H.interpolate(cache, x)
    V2, g2 = H.interpolate(loaded, x)
    np.testing.assert_allclose(float(V1), float(V2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))
