"""Tests for the trajectory engine: lookup semantics, path projection,
padding invariance, and the `.world` asset loader against the reference's
recorded X1 test paths (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import trajectory as trj
from tests.conftest import REFERENCE_PATHS


def test_straight_trajectory_eval_time():
    tube = trj.straight_trajectory(30.0, 5.0)
    node = trj.eval_time(tube, 2.0)
    np.testing.assert_allclose(float(node.s), 10.0)
    np.testing.assert_allclose(float(node.V), 5.0)
    np.testing.assert_allclose(float(node.E), 0.0)
    np.testing.assert_allclose(float(node.N), 10.0)
    np.testing.assert_allclose(float(node.A), 0.0)


def test_eval_time_extrapolates():
    """Beyond the last knot the constant-accel segment extrapolates, like
    the reference's clamped segment index (`src/trajectories.jl:48`)."""
    tube = trj.straight_trajectory(30.0, 5.0)
    node = trj.eval_time(tube, 7.0)   # t_end = 6
    np.testing.assert_allclose(float(node.s), 35.0)


def test_eval_arclength_with_accel():
    """Constant-accel time inversion: V 5->10 m/s over 2 s, s_end=15."""
    tube = trj.make_tube(t=[0.0, 2.0], s=[0.0, 15.0], V=[5.0, 10.0],
                         A=[2.5, 2.5], E=[0.0, 0.0], N=[0.0, 15.0],
                         psi=[0.0, 0.0], kappa=[0.0, 0.0])
    node = trj.eval_arclength(tube, 7.5)
    dt_expected = (np.sqrt(2 * 2.5 * 7.5 + 25.0) - 5.0) / 2.5
    np.testing.assert_allclose(float(node.t), dt_expected, rtol=1e-12)
    np.testing.assert_allclose(float(node.V), 5.0 + 2.5 * dt_expected,
                               rtol=1e-12)


def test_path_coordinates_straight():
    tube = trj.straight_trajectory(30.0, 5.0)
    s, e, t = trj.path_coordinates(tube, jnp.array([1.0, 10.0]))
    np.testing.assert_allclose(float(s), 10.0)
    np.testing.assert_allclose(float(e), -1.0)   # +E is right of the path
    np.testing.assert_allclose(float(t), 2.0)
    s, e, t = trj.path_coordinates(tube, jnp.array([-0.5, 20.0]))
    np.testing.assert_allclose(float(e), 0.5)


def test_padding_invariance():
    """A padded tube must produce identical lookups and projections."""
    kw = dict(t=[0.0, 1.0, 2.5], s=[0.0, 6.0, 15.0], V=[5.0, 7.0, 5.0],
              A=[2.0, -1.0, 0.0], E=[0.0, 1.0, 3.0], N=[0.0, 6.0, 14.0],
              psi=[0.1, 0.15, 0.2], kappa=[0.0, 0.01, 0.0])
    tube = trj.make_tube(**kw)
    padded = trj.make_tube(**kw, pad_to=64)
    for tq in [0.3, 1.7, 2.4]:
        a = trj.eval_time(tube, tq)
        b = trj.eval_time(padded, tq)
        for f in ("s", "V", "E", "N", "kappa"):
            np.testing.assert_allclose(float(getattr(a, f)),
                                       float(getattr(b, f)), rtol=1e-12)
    x = jnp.array([0.7, 5.0])
    np.testing.assert_allclose(
        [float(v) for v in trj.path_coordinates(tube, x)],
        [float(v) for v in trj.path_coordinates(padded, x)], rtol=1e-12)


def test_spatial_linear_extrapolation():
    """Line() extrapolation of spatial fields beyond the arclength range
    (`src/trajectories.jl:32-35`)."""
    tube = trj.make_tube(t=[0.0, 1.0], s=[0.0, 10.0], V=[10.0, 10.0],
                         A=[0.0, 0.0], E=[0.0, 10.0], N=[0.0, 0.0],
                         psi=[0.0, 0.0], kappa=[0.0, 0.0])
    node = trj.eval_arclength(tube, 12.0)
    np.testing.assert_allclose(float(node.E), 12.0, rtol=1e-12)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_PATHS),
                    reason="reference test paths not mounted")
def test_world_loader_curvy():
    tube = trj.tube_from_world(os.path.join(REFERENCE_PATHS, "curvy.world"))
    n = int(tube.n_valid)
    assert n > 100
    s = np.asarray(tube.s)[:n]
    t = np.asarray(tube.t)[:n]
    assert np.all(np.diff(s) > 0)
    assert np.all(np.diff(t) > 0)
    assert np.all(np.asarray(tube.V)[:n] > 0)
    # a point on the path projects with ~zero lateral error
    k = n // 2
    x = jnp.array([float(tube.E[k]), float(tube.N[k])])
    s_proj, e_proj, _ = trj.path_coordinates(tube, x)
    np.testing.assert_allclose(float(s_proj), float(tube.s[k]), atol=1e-6)
    assert abs(float(e_proj)) < 1e-6


@pytest.mark.skipif(not os.path.isdir(REFERENCE_PATHS),
                    reason="reference test paths not mounted")
def test_world_loader_all_paths():
    import glob
    files = glob.glob(os.path.join(REFERENCE_PATHS, "*.world"))
    assert len(files) == 8
    for f in files:
        tube = trj.tube_from_world(f, pad_to=4096)
        n = int(tube.n_valid)
        assert 2 <= n <= 4096, f
        assert np.all(np.isfinite(np.asarray(tube.E))), f


def test_lookup_jit_and_vmap():
    tube = trj.straight_trajectory(30.0, 5.0, pad_to=16)
    f = jax.jit(lambda tb, t: trj.eval_time(tb, t).s)
    np.testing.assert_allclose(float(f(tube, 2.0)), 10.0)
    xs = jnp.stack([jnp.array([1.0, 10.0]), jnp.array([0.0, 20.0])])
    s, e, t = jax.vmap(lambda x: trj.path_coordinates(tube, x))(xs)
    np.testing.assert_allclose(np.asarray(s), [10.0, 20.0])


@pytest.mark.skipif(not os.path.isdir(REFERENCE_PATHS),
                    reason="reference test paths not mounted")
def test_pathmsg_loader_matches_world():
    """The dependency-free ROS1 `path`-message parser reproduces the
    .world loader exactly on the recordings that ship in both formats
    (the reference deserializes the .msg files through PyCall + rospy,
    `test/load_test_paths.jl:1-16`)."""
    for name in ("vail", "curvy", "skidpadoval", "westpaddock"):
        a = trj.tube_from_pathmsg(
            os.path.join(REFERENCE_PATHS, f"{name}.msg"))
        b = trj.tube_from_world(
            os.path.join(REFERENCE_PATHS, f"{name}.world"))
        for f in ("t", "s", "V", "A", "E", "N", "psi", "kappa", "theta",
                  "edge_L", "edge_R"):
            np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                       np.asarray(getattr(b, f)),
                                       err_msg=f"{name}.{f}")


@pytest.mark.skipif(not os.path.isdir(REFERENCE_PATHS),
                    reason="reference test paths not mounted")
def test_pathmsg_variable_speed_closed_loop():
    """variable_speed.msg is the one test asset with no .world twin —
    load it and track it closed-loop (the SURVEY §4 fast-fixture role)."""
    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    tube = trj.tube_from_pathmsg(
        os.path.join(REFERENCE_PATHS, "variable_speed.msg"), pad_to=64)
    n = int(tube.n_valid)
    assert n == 28
    V = np.asarray(tube.V)[:n]
    assert V.min() > 4.0 and V.max() < 6.0 and V.std() > 0.05
    cfg = M.x1_coupled_config(soft=True)
    q0 = jnp.array([float(tube.E[0]), float(tube.N[0]),
                    float(tube.psi[0]), float(tube.V[0]), 0.0, 0.0])
    log = M.simulate(cfg, tube, H.inactive_cache(), q0, dt=0.01,
                     n_steps=120)
    e = np.abs(np.asarray(log.diag.e))
    assert np.all(np.isfinite(np.asarray(log.u)))
    assert e.max() < 0.5
    assert float(np.asarray(log.diag.converged).mean()) > 0.95
