"""Small math utilities (reference: `src/math.jl:1-9` and
`DifferentialDynamicsModels.adiff/mod2piF`)."""

from __future__ import annotations

import jax.numpy as jnp


def cumtrapz(y, x, x0=0.0):
    """Cumulative trapezoid integral of y dx (reference: `src/math.jl:1`)."""
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    inc = jnp.diff(x) * (y[:-1] + y[1:]) / 2.0
    return jnp.concatenate([jnp.zeros((1,), inc.dtype), jnp.cumsum(inc)]) + x0


def invcumtrapz(y, x, x0=0.0):
    """Cumulative integral of dx/y — e.g. reconstruct time from speed-vs-
    arclength (reference: `src/math.jl:2`, used for `/des_path` ingest at
    `src/ros_integration.jl:13-16`)."""
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    inc = 2.0 * jnp.diff(x) / (y[:-1] + y[1:])
    return jnp.concatenate([jnp.zeros((1,), inc.dtype), jnp.cumsum(inc)]) + x0


def segment_distance2(p0, p1, x):
    """Squared distance from point(s) x to segment(s) [p0, p1].

    Vectorized form of the reference's `distance2` (`src/math.jl:4-9`):
    p0, p1, x have shape (..., 2); broadcasting applies.
    Returns (d2, lam) where lam in [0,1] is the projection parameter.
    """
    v = p1 - p0
    w = x - p0
    vv = jnp.sum(v * v, axis=-1)
    lam = jnp.clip(jnp.sum(v * w, axis=-1) / jnp.where(vv > 0, vv, 1.0), 0.0, 1.0)
    p = p0 + lam[..., None] * v
    d = p - x
    return jnp.sum(d * d, axis=-1), lam


def adiff(a, b):
    """Angular difference a - b wrapped to (-pi, pi]
    (reference: `DifferentialDynamicsModels.adiff`, imported at
    `src/Pigeon.jl:20`)."""
    d = a - b
    return d - 2.0 * jnp.pi * jnp.round(d / (2.0 * jnp.pi))


def cross2(v, w):
    """2-D cross product z-component (used for the sign of the lateral path
    error, reference `src/trajectories.jl:84`)."""
    return v[..., 0] * w[..., 1] - v[..., 1] * w[..., 0]
