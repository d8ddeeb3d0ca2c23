"""Lane-batched Pallas rollout kernel (qp/condensed.py
_rollout_lane_batched) vs the vmapped sequential unroll — exact on the
same fp32 inputs (interpret mode; the TPU dispatch is the vmap rule of
`rollout_affine`, exercised by the fleet bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigeon_tpu.qp import condensed as C


@pytest.mark.parametrize("B,T,d,w", [
    (7, 5, 4, 31),      # ragged batch (lane padding) + odd width
    (130, 30, 4, 31),   # decoupled shape, crosses one lane block
    (9, 15, 6, 31),     # coupled condensed shape
    (4, 3, 2, 8),       # exact w_blk multiple
])
def test_lane_rollout_matches_unroll(B, T, d, w):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, T, d, d)) * 0.4, jnp.float32)
    E = jnp.asarray(rng.normal(size=(B, T, d, w)), jnp.float32)
    ref = jax.vmap(C.rollout_affine_unroll)(A, E)
    out = C._rollout_lane_batched(A, E, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_rollout_affine_batched_dispatch_cpu():
    """Under vmap on CPU the custom_vmap rule falls back to the vmapped
    impl — results identical to calling the impl directly."""
    rng = np.random.default_rng(1)
    B, T, d, w = 5, 6, 4, 9
    A = jnp.asarray(rng.normal(size=(B, T, d, d)) * 0.4, jnp.float32)
    E = jnp.asarray(rng.normal(size=(B, T, d, w)), jnp.float32)
    out = jax.jit(jax.vmap(C.rollout_affine))(A, E)
    ref = jax.vmap(C.rollout_affine_unroll)(A, E)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
