"""Structured (Van Loan) expm for the horizon augmentation
(discretize._vanloan_lane_batched) vs the dense block chain — the TPU
fleet path's linearization kernel, checked in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu import discretize as dz
from pigeon_tpu import dynamics as dyn
from pigeon_tpu.config import x1_params


def _rand_inputs(B, T, n, m, seed=0, dt_scale=0.05):
    rng = np.random.default_rng(seed)
    P0 = jnp.asarray(rng.normal(size=(B, T, n, n)) * dt_scale,
                     jnp.float32)
    Cu0 = jnp.asarray(rng.normal(size=(B, T, n, m)) * dt_scale,
                      jnp.float32)
    cc0 = jnp.asarray(rng.normal(size=(B, T, n, 1)) * dt_scale,
                      jnp.float32)
    # mixed ZOH (0) / FOH (dt) ramp scalars
    rr = jnp.asarray(
        rng.uniform(0.0, 0.2, size=(B, T))
        * (rng.integers(0, 2, size=(B, T))), jnp.float32)
    return P0, Cu0, cc0, rr


@pytest.mark.parametrize("B,T,n,m", [
    (7, 5, 4, 6),      # decoupled shapes, ragged batch (lane padding)
    (130, 30, 4, 6),   # decoupled fleet shape across a lane block
    (5, 15, 6, 6),     # coupled condensed shapes
])
def test_vanloan_lane_matches_dense(B, T, n, m):
    P0, Cu0, cc0, rr = _rand_inputs(B, T, n, m)
    vl = dz._vanloan_cached(4, 6, "highest")
    # dense reference: the impl path (block-diag packed dense chain)
    ref = jax.vmap(lambda p, cu, cc, r: vl(p, cu, cc, r))(
        P0, Cu0, cc0, rr)
    out = dz._vanloan_lane_batched(P0, Cu0, cc0, rr, 4, 6,
                                   interpret=True)
    for o, rf in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rf),
                                   rtol=3e-5, atol=3e-6)


def test_vanloan_zoh_ramp_zero_gives_zero_phiqv():
    """rr = 0 (ZOH stages) must give exactly Phi_qv = 0 — the shared
    extraction relies on it (discretize.linearize_horizon_fused)."""
    P0, Cu0, cc0, _ = _rand_inputs(3, 4, 4, 6, seed=1)
    rr = jnp.zeros((3, 4), jnp.float32)
    out = dz._vanloan_lane_batched(P0, Cu0, cc0, rr, 4, 6,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(out[2]), 0.0)


def test_linearize_horizon_fused_matches_per_stage():
    """The rewired fused linearization still matches the per-stage exact
    ZOH/FOH discretizations on the real lateral vehicle model."""
    veh = x1_params()

    def f(q, ur):
        return dyn.vehicle_ode(veh, "lateral", q, ur[:2], ur[2:])

    T, S = 6, 2
    rng = np.random.default_rng(2)
    qs = jnp.asarray(
        np.stack([rng.uniform(-1, 1, T + 1), rng.uniform(-1, 1, T + 1),
                  rng.uniform(-0.2, 0.2, T + 1),
                  rng.uniform(-0.5, 0.5, T + 1)], axis=1), jnp.float64)
    urs = jnp.asarray(rng.uniform(-0.1, 0.1, (T + 1, 6)), jnp.float64)
    urs = urs.at[:, 2].set(rng.uniform(5.0, 8.0, T + 1))  # Ux > 0
    dts = jnp.asarray(rng.uniform(0.01, 0.2, T), jnp.float64)

    A, B0, Bf, c = dz.linearize_horizon_fused(
        f, qs, urs, dts, S, 1, squarings=8, order=8,
        precision="highest")
    for t in range(T):
        if t < S:
            At, Bt, ct_ = dz.linearize_affine_zoh(
                f, qs[t], urs[t], dts[t], 1)
            Bft = jnp.zeros_like(Bt)
        else:
            At, Bt, Bft, ct_ = dz.linearize_affine_foh(
                f, qs[t], urs[t], urs[t + 1], dts[t], 1)
        np.testing.assert_allclose(np.asarray(A[t]), np.asarray(At),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(B0[t]), np.asarray(Bt),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Bf[t]), np.asarray(Bft),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(c[t]), np.asarray(ct_),
                                   rtol=1e-8, atol=1e-9)
