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


def test_hji_sharded_matches_unsharded(x1):
    """The mesh-sharded solver (axis-0 shards + ppermute halo exchange)
    must reproduce the whole-grid sweep: same-sweep global CFL via pmax,
    identical update order (VERDICT r4 item 2's CI pin).

    The CFL/convergence traces are pinned tightly — they catch any halo
    or collective wiring error (a wrong neighbor row shifts dt and the
    deltas within one sweep).  The VALUES are pinned at physical
    tolerance, not bitwise: `optimal_control`'s Fx line-search argmax is
    discontinuous in its inputs, so 1-ulp fusion-order differences
    between the two compiled programs flip near-ties and locally switch
    the flow field (measured: max |dV| ~ 7e-3 after 8 sweeps with
    identical dt traces) — a property of the bang-bang flow, not of the
    sharding."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    shape = (16, 7, 5, 5, 3, 5, 3)
    kw = dict(shape=shape, n_sweeps=60, fx_samples=5, horizon_s=3.0)
    cache_u, d_u, t_u = HS.solve_hji(x1, **kw)
    cache_s, d_s, t_s = HS.solve_hji(x1, mesh=mesh, **kw)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_u),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_u),
                               rtol=1e-4, atol=1e-4)
    err = np.abs(np.asarray(cache_s.V) - np.asarray(cache_u.V))
    # noise floor of a single-cell argmax flip is ~|f|*dt: with the
    # round-5 scenario-covering box (dE +-48, dN +-32) corner flows reach
    # ~90 m/s at dt ~ 5e-3 -> ~0.45 m worst case on isolated cells; the
    # mean pins that flips stay isolated
    assert err.max() < 0.7, err.max()
    assert err.mean() < 2e-3, err.mean()


def test_hji_sharded_exact_on_smooth_flow():
    """On a flow with NO argmax discontinuity (the isotropic pursuit
    game), sharded and unsharded sweeps agree to fp32 roundoff — the
    exactness statement the 7-D test cannot make (see its docstring)."""
    import jax
    from jax.sharding import Mesh

    n = 80
    knots = [np.linspace(-8.0, 8.0, n), np.linspace(-8.0, 8.0, n + 1)]
    hs = [float(k[1] - k[0]) for k in knots]
    X = np.stack(np.meshgrid(*knots, indexing="ij"), axis=-1)
    l = jnp.asarray(np.hypot(X[..., 0], X[..., 1]) - 1.0, jnp.float32)

    def flow(start0, gradV):
        nrm = jnp.maximum(jnp.linalg.norm(gradV, axis=-1, keepdims=True),
                          1e-12)
        return -1.0 * gradV / nrm

    V_u, d_u, t_u = HS.solve_hji_vi(l, hs, flow, n_sweeps=80)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    V_s, d_s, t_s = HS.solve_hji_vi_sharded(l, hs, flow, 80, mesh)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_u),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(V_s), np.asarray(V_u),
                               rtol=0, atol=1e-5)


def test_hji_slab_chunked_matches_unchunked(x1):
    """The slab-chunked sweep (single-chip HBM bound) must compute the
    SAME sweep math as the whole-grid sweep.  The chunked CFL step is
    lagged one sweep (x0.9), which makes free-running pseudo-time paths
    diverge O(dt x |dV/dt|) — a first-order-scheme property, not an
    error — so the comparison pins both paths to a fixed dt well below
    either CFL bound: identical time grids, values equal to the
    argmax-flip noise floor (see the sharded test's docstring)."""
    shape = (12, 7, 5, 5, 3, 5, 3)
    kw = dict(shape=shape, fx_samples=5, horizon_s=1.5, dt_fixed=0.004,
              n_sweeps=100)
    cache_u, _, t_u = HS.solve_hji(x1, **kw)
    cache_c, _, t_c = HS.solve_hji(x1, slab_chunk=4, **kw)
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(t_u),
                               rtol=1e-6)
    err = np.abs(np.asarray(cache_u.V) - np.asarray(cache_c.V))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 1e-3, err.mean()


def test_hji_axis_order_invariance(x1):
    """Solving with the padding-optimal storage permutation
    (PROD_AXIS_ORDER) returns the SAME semantic cache as the identity
    order: same pseudo-time trace (fixed dt), values equal to the
    argmax-flip noise floor, identical knots.  Pins the grid<->semantic
    permutation plumbing the production solve relies on."""
    shape = (12, 7, 5, 5, 3, 5, 3)
    kw = dict(shape=shape, fx_samples=5, horizon_s=1.5, dt_fixed=0.004,
              n_sweeps=80)
    c_sem, _, t1 = HS.solve_hji(x1, **kw)
    c_rev, _, t2 = HS.solve_hji(x1, axis_order=HS.PROD_AXIS_ORDER, **kw)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-5)
    assert c_rev.dims == c_sem.dims == tuple(shape)
    for k_r, k_s in zip(c_rev.knots, c_sem.knots):
        np.testing.assert_array_equal(np.asarray(k_r), np.asarray(k_s))
    err = np.abs(np.asarray(c_rev.V) - np.asarray(c_sem.V))
    assert err.max() < 0.05, err.max()
    g_err = np.abs(np.asarray(c_rev.gradV) - np.asarray(c_sem.gradV))
    assert np.percentile(g_err, 99) < 0.1, np.percentile(g_err, 99)
