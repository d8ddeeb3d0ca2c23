"""Trajectory representation: nominal trajectory "tube" arrays with
time-indexed and arclength-indexed lookup, world-position path projection,
and a `.world` YAML asset loader.

Functional JAX reimplementation of the reference's `src/trajectories.jl`
plus the `.world` path-asset conversion that the reference does through ROS
(`src/ros_integration.jl:13-16`, `test/path/world2pathmsg.py`).

A `TrajectoryTube` is a pytree of fixed-length (optionally padded) arrays —
the batched, on-device analog of the reference's struct-of-Vectors
(`src/trajectories.jl:8-44`).  `n_valid` marks the live prefix so tubes of
different lengths can share one compiled program / batch axis.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from pigeon_tpu.math_utils import cross2, invcumtrapz, segment_distance2


import dataclasses as _dc

import jax


@jax.tree_util.register_dataclass
@_dc.dataclass(frozen=True)
class LookupIndex:
    """Uniform-grid acceleration index for one knot vector: O(1) segment
    lookup replacing the binary search.

    table[j] is the segment index of grid point lo + j*h; the true segment
    of a query x in cell j is at most `fixups` (static, computed at build)
    increments past table[floor((x - lo)/h)].  Exact — the fixup loop runs
    the worst-case count for the whole tube.  At fleet batch sizes this
    turns ~10 gather rounds of `searchsorted` per query into 1 + fixups."""

    table: jnp.ndarray    # (L_tab,) int32 segment index per uniform cell
    lo: jnp.ndarray       # () grid origin
    h: jnp.ndarray        # () grid step
    fixups: int = _dc.field(metadata=dict(static=True), default=1)


class TrajectoryTube(NamedTuple):
    """Columns mirror the reference's 12-field trajectory node
    (`src/trajectories.jl:1,8-21`)."""

    t: jnp.ndarray        # time (s)
    s: jnp.ndarray        # arclength (m)
    V: jnp.ndarray        # longitudinal speed (m/s)
    A: jnp.ndarray        # longitudinal accel (m/s^2)
    E: jnp.ndarray        # world E (m)
    N: jnp.ndarray        # world N (m)
    psi: jnp.ndarray      # heading (rad)
    kappa: jnp.ndarray    # curvature (1/m)
    theta: jnp.ndarray    # grade (rad)
    phi: jnp.ndarray      # bank (rad)
    edge_L: jnp.ndarray   # left lateral bound (m)
    edge_R: jnp.ndarray   # right lateral bound (m)
    n_valid: jnp.ndarray  # number of live knots (<= padded length)
    t_idx: "LookupIndex | None" = None   # acceleration index over t
    s_idx: "LookupIndex | None" = None   # acceleration index over s
    # (L, len(_PACKED_FIELDS)) row-major copy of the knot columns: one
    # interpolation gathers TWO contiguous ~44-byte rows instead of ~12
    # scattered 4-byte elements — the per-node lookups dominate the warm
    # node-seeding phase at fleet batch sizes (see eval_time/eval_arclength)
    packed: "jnp.ndarray | None" = None

    @property
    def length(self) -> int:
        """Padded array length (static)."""
        return self.t.shape[-1]


class TrajectoryNode(NamedTuple):
    """One interpolated sample (reference `TrajectoryNode`,
    `src/trajectories.jl:1-6`)."""

    t: jnp.ndarray
    s: jnp.ndarray
    V: jnp.ndarray
    A: jnp.ndarray
    E: jnp.ndarray
    N: jnp.ndarray
    psi: jnp.ndarray
    kappa: jnp.ndarray
    theta: jnp.ndarray
    phi: jnp.ndarray
    edge_L: jnp.ndarray
    edge_R: jnp.ndarray


_SPATIAL_FIELDS = ("E", "N", "psi", "kappa", "theta", "phi", "edge_L", "edge_R")

# column order of TrajectoryTube.packed (node A is the per-segment
# finite-difference accel, not the stored column — see _seg_accel)
_PACKED_FIELDS = ("t", "s", "V") + _SPATIAL_FIELDS
_PCOL = {name: k for k, name in enumerate(_PACKED_FIELDS)}


def make_tube(t, s, V, A, E, N, psi, kappa, theta=None, phi=None,
              edge_L=None, edge_R=None, pad_to: int | None = None
              ) -> TrajectoryTube:
    """Build a tube from columns, applying the reference's defaults
    (theta=phi=0, edge_L=+4, edge_R=-4; `src/trajectories.jl:39-44`) and
    optional right-padding to a static length."""
    t = np.asarray(t, dtype=np.float64)
    n = t.shape[0]
    cols = dict(t=t, s=s, V=V, A=A, E=E, N=N, psi=psi, kappa=kappa)
    cols["theta"] = np.zeros(n) if theta is None else theta
    cols["phi"] = np.zeros(n) if phi is None else phi
    cols["edge_L"] = np.full(n, 4.0) if edge_L is None else edge_L
    cols["edge_R"] = np.full(n, -4.0) if edge_R is None else edge_R
    cols = {k: np.asarray(v, dtype=np.float64) for k, v in cols.items()}
    for k, v in cols.items():
        if v.shape[0] != n:
            raise ValueError(f"column {k} length {v.shape[0]} != {n}")
    if pad_to is not None and pad_to > n:
        pad = pad_to - n
        for k in ("t", "s"):
            # keep padded knots strictly increasing so searchsorted stays sane
            step = np.arange(1, pad + 1) * max(1.0, cols[k][-1] - cols[k][0])
            cols[k] = np.concatenate([cols[k], cols[k][-1] + step])
        for k in cols:
            if k not in ("t", "s"):
                cols[k] = np.concatenate([cols[k], np.full(pad, cols[k][-1])])
    packed = np.stack([cols[k] for k in _PACKED_FIELDS], axis=-1)
    # tab_len = the (padded) tube length: a shape-static LookupIndex lets
    # every same-pad_to tube share one compiled control step (see
    # _build_lookup_index docstring)
    L_tab = cols["t"].shape[0]
    return TrajectoryTube(n_valid=jnp.asarray(n, jnp.int32),
                          t_idx=_build_lookup_index(cols["t"], n,
                                                    tab_len=L_tab),
                          s_idx=_build_lookup_index(cols["s"], n,
                                                    tab_len=L_tab),
                          packed=jnp.asarray(packed),
                          **{k: jnp.asarray(v) for k, v in cols.items()})


def _build_lookup_index(knots: np.ndarray, n_valid: int,
                        max_len: int = 8192,
                        tab_len: "int | None" = None) -> LookupIndex:
    """Host-side uniform acceleration index over the LIVE knot range.

    Without `tab_len`, the table length targets one live segment per cell
    (when `max_len` caps it, the worst-case fixup count is computed
    exactly).  With `tab_len` (make_tube passes the padded tube length),
    the table shape is STATIC across tubes — the `fixups` floor of 2 then
    makes the whole LookupIndex trace-stable, so swapping trajectories at
    runtime does NOT retrace the jitted control step (measured: the
    data-dependent table length forced a full ~3.5 s recompile of
    `mpc_step` on every `/des_path`//`/des_traj` ingest — a real-time
    hazard the reference's Parametron rewrite never had).  Tubes whose
    knot spacing genuinely needs more than 2 fixups at the capped table
    length keep their exact count (rare; costs one retrace)."""
    live = np.asarray(knots[:n_valid], np.float64)
    lo, hi = float(live[0]), float(live[-1])
    span = max(hi - lo, 1e-9)
    if tab_len is not None:
        L_tab = int(max(2, min(tab_len, max_len)))
    else:
        min_gap = float(np.min(np.diff(live))) if n_valid > 1 else span
        L_tab = int(min(max_len,
                        max(2, np.ceil(span / max(min_gap, 1e-9)))))
    h = span / L_tab
    grid = lo + h * np.arange(L_tab)
    table = np.clip(np.searchsorted(live, grid, side="right") - 1,
                    0, max(n_valid - 2, 0)).astype(np.int32)
    # worst-case segments a query in cell j can lie past table[j]
    ends = np.clip(np.searchsorted(live, grid + h, side="right") - 1,
                   0, max(n_valid - 2, 0)).astype(np.int32)
    fixups = int(np.max(ends - table)) if n_valid > 1 else 0
    return LookupIndex(table=jnp.asarray(table),
                       lo=jnp.asarray(lo), h=jnp.asarray(h),
                       fixups=max(2, fixups))


def straight_trajectory(length: float, vel: float, pad_to: int | None = None
                        ) -> TrajectoryTube:
    """Straight constant-speed trajectory along +N
    (reference `straight_trajectory`, `src/trajectories.jl:96-105`)."""
    return make_tube(t=[0.0, length / vel], s=[0.0, length], V=[vel, vel],
                     A=[0.0, 0.0], E=[0.0, 0.0], N=[0.0, length],
                     psi=[0.0, 0.0], kappa=[0.0, 0.0], pad_to=pad_to)


# ---------------------------------------------------------------------------
# Lookup
# ---------------------------------------------------------------------------

def _segment_index(knots, x, n_valid, idx: LookupIndex | None = None):
    """Index i of the live segment [knots[i], knots[i+1]] containing x,
    clamped to the valid range — the Julia
    `clamp(searchsortedfirst(...)-1, 1, len-1)` idiom
    (`src/trajectories.jl:48,56`), 0-based.

    With an acceleration index the binary search becomes one table gather
    plus `idx.fixups` compare-and-advance steps (exact; see LookupIndex).
    """
    if idx is not None:
        j = jnp.clip(((x - idx.lo) / idx.h).astype(jnp.int32), 0,
                     idx.table.shape[0] - 1)
        i = idx.table[j]
        for _ in range(idx.fixups):
            adv = (x >= knots[i + 1]).astype(i.dtype)
            i = jnp.minimum(i + adv, n_valid - 2)
        return i
    i = jnp.searchsorted(knots, x, side="left") - 1
    return jnp.clip(i, 0, n_valid - 2)


def _lerp_spatial(tube: TrajectoryTube, s, i=None, fields=_SPATIAL_FIELDS):
    """Linear interp of the spatial columns by arclength with linear
    extrapolation beyond the ends (the reference's Gridded(Linear) +
    Line() extrapolation, `src/trajectories.jl:32-35`).

    The selected spatial columns are gathered as ROWS of one stacked
    (L, len(fields)) matrix — two gathers total instead of two per field.
    `fields` prunes the gather width: TPU gathers cost ~per element, and
    the per-query row gathers dominate the warm node-seeding phase at
    fleet batch sizes.  Unselected fields return None.  `i` reuses a
    caller-computed segment index (eval_arclength already has it)."""
    out = {name: None for name in _SPATIAL_FIELDS}
    if not fields:
        return out
    if i is None:
        i = _segment_index(tube.s, s, tube.n_valid, tube.s_idx)
    s0, s1 = tube.s[i], tube.s[i + 1]
    lam = (s - s0) / (s1 - s0)   # deliberately unclamped -> Line() extrapolation
    cols = jnp.stack([getattr(tube, name) for name in fields],
                     axis=-1)                      # (L, n_fields)
    r0, r1 = cols[i], cols[i + 1]
    vals = r0 + lam[..., None] * (r1 - r0)
    out.update({name: vals[..., k] for k, name in enumerate(fields)})
    return out


def _seg_accel(tube: TrajectoryTube, i):
    """Per-segment accel from finite differences — "potentially different
    from traj.A[i]" (`src/trajectories.jl:49,57,85`)."""
    return (tube.V[i + 1] - tube.V[i]) / (tube.t[i + 1] - tube.t[i])


def _time_from_arc(tube: TrajectoryTube, i, ds, s):
    """Invert the constant-accel arc s(t) on segment i for dt
    (`src/trajectories.jl:59-63,86-90`)."""
    A = _seg_accel(tube, i)
    Vi = tube.V[i]
    disc = jnp.sqrt(jnp.maximum(2.0 * A * ds + Vi * Vi, 0.0))
    s_end = tube.s[tube.n_valid - 1]
    use_linear = (jnp.abs(A) < 1e-3) | (s > s_end)
    A_safe = jnp.where(jnp.abs(A) < 1e-3, 1.0, A)
    dt = jnp.where(use_linear, ds / Vi, (disc - Vi) / A_safe)
    return A, dt


def _packed_rows(tube: TrajectoryTube, i):
    """Gather knot rows i and i+1 of the packed column matrix: two
    contiguous row gathers replace ~12 scattered per-column gathers —
    the dominant cost of per-node lookups at fleet batch sizes."""
    return tube.packed[i], tube.packed[i + 1]


def _packed_spatial(r0, r1, lam, fields):
    """Linear interp of the spatial columns from packed rows.  lam is
    deliberately unclamped -> Line() extrapolation (the reference's
    Gridded(Linear) + Line(), `src/trajectories.jl:32-35`)."""
    vals = r0 + lam[..., None] * (r1 - r0)
    return {name: (vals[..., _PCOL[name]] if name in fields else None)
            for name in _SPATIAL_FIELDS}


def eval_time(tube: TrajectoryTube, t,
              fields=_SPATIAL_FIELDS) -> TrajectoryNode:
    """Sample the tube at time t: constant-accel interpolation between time
    knots, then spatial interp at the resulting arclength (the reference's
    `traj(t)` functor, `src/trajectories.jl:47-54`).  `fields` limits the
    spatial columns gathered (see `_lerp_spatial`)."""
    i = _segment_index(tube.t, t, tube.n_valid, tube.t_idx)
    if tube.packed is not None:
        r0, r1 = _packed_rows(tube, i)
        t0, s0, V0 = r0[..., 0], r0[..., 1], r0[..., 2]
        t1, s1, V1 = r1[..., 0], r1[..., 1], r1[..., 2]
        A = (V1 - V0) / (t1 - t0)
        dt = t - t0
        s = s0 + V0 * dt + A * dt * dt / 2.0
        V = V0 + A * dt
        # the time-knot segment IS the arclength-knot segment (same knot
        # sequence; s(t) is monotone within it), so the spatial interp
        # reuses i instead of re-searching the s knots.  The interp is
        # continuous across knots, so fp rounding at a boundary cannot
        # change the value beyond noise.
        sp = _packed_spatial(r0, r1, (s - s0) / (s1 - s0), fields)
        return TrajectoryNode(t=jnp.asarray(t), s=s, V=V, A=A, **sp)
    A = _seg_accel(tube, i)
    dt = t - tube.t[i]
    s = tube.s[i] + tube.V[i] * dt + A * dt * dt / 2.0
    V = tube.V[i] + A * dt
    sp = _lerp_spatial(tube, s, fields=fields)
    return TrajectoryNode(t=jnp.asarray(t), s=s, V=V, A=A, **sp)


def eval_arclength(tube: TrajectoryTube, s,
                   fields=_SPATIAL_FIELDS) -> TrajectoryNode:
    """Sample the tube at arclength s (the reference's `traj[s]` indexing,
    `src/trajectories.jl:55-68`).  `fields` limits the spatial columns
    gathered (see `_lerp_spatial`)."""
    i = _segment_index(tube.s, s, tube.n_valid, tube.s_idx)
    if tube.packed is not None:
        r0, r1 = _packed_rows(tube, i)
        t0, s0, V0 = r0[..., 0], r0[..., 1], r0[..., 2]
        t1, s1, V1 = r1[..., 0], r1[..., 1], r1[..., 2]
        ds = s - s0
        A = (V1 - V0) / (t1 - t0)
        disc = jnp.sqrt(jnp.maximum(2.0 * A * ds + V0 * V0, 0.0))
        s_end = tube.s[tube.n_valid - 1]
        use_linear = (jnp.abs(A) < 1e-3) | (s > s_end)
        A_safe = jnp.where(jnp.abs(A) < 1e-3, 1.0, A)
        dt = jnp.where(use_linear, ds / V0, (disc - V0) / A_safe)
        t = t0 + dt
        V = V0 + A * dt
        sp = _packed_spatial(r0, r1, ds / (s1 - s0), fields)
        return TrajectoryNode(t=t, s=jnp.asarray(s), V=V, A=A, **sp)
    ds = s - tube.s[i]
    A, dt = _time_from_arc(tube, i, ds, s)
    t = tube.t[i] + dt
    V = tube.V[i] + A * dt
    sp = _lerp_spatial(tube, s, i=i, fields=fields)
    return TrajectoryNode(t=t, s=jnp.asarray(s), V=V, A=A, **sp)


def path_coordinates(tube: TrajectoryTube, x):
    """Project world position x=(E,N) onto the path: returns (s, e, t) with
    signed lateral error e (left positive).

    The reference brute-force scans all segments
    (`path_coordinates`, `src/trajectories.jl:71-93`); here the scan is a
    vectorized masked argmin over the segment axis — embarrassingly
    parallel and fast on the VPU.
    """
    pts = jnp.stack([tube.E, tube.N], axis=-1)        # (L, 2)
    p0, p1 = pts[:-1], pts[1:]                        # (L-1, 2)
    d2, _ = segment_distance2(p0, p1, x[None, :])     # (L-1,)
    nseg = tube.t.shape[0] - 1
    seg_ids = jnp.arange(nseg)
    live = seg_ids < (tube.n_valid - 1)
    d2 = jnp.where(live, d2, jnp.inf)
    i = jnp.argmin(d2)
    d2min = d2[i]
    v = p1[i] - p0[i]
    w = x - p0[i]
    ds = jnp.sqrt(jnp.maximum(jnp.sum(w * w) - d2min, 0.0))
    s = tube.s[i] + ds
    e = jnp.sqrt(d2min) * jnp.sign(cross2(v, w))
    A, dt = _time_from_arc(tube, i, ds, s)
    t = tube.t[i] + dt
    return s, e, t


def end_time(tube: TrajectoryTube):
    """Final live time knot (the reference's `traj.t[end]`)."""
    return tube.t[tube.n_valid - 1]


# ---------------------------------------------------------------------------
# .world asset loader (replaces the reference's ROS .msg pipeline:
# test/path/world2pathmsg.py + src/ros_integration.jl:13-16)
# ---------------------------------------------------------------------------

def load_world_arrays(path: str) -> dict:
    """Parse a `.world` YAML file of comma-separated arrays (keys per
    `test/path/world2pathmsg.py:5-16`) into numpy arrays without needing a
    YAML/ROS stack."""
    out = {}
    with open(path) as f:
        text = f.read()
    for m in re.finditer(r"^(\w+):\s*(.*?)(?=^\w+:|\Z)", text,
                         re.MULTILINE | re.DOTALL):
        key, val = m.group(1), m.group(2).strip()
        if "," in val:
            out[key] = np.array([float(v) for v in val.split(",")])
        else:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val
    return out


def tube_from_world(path: str, pad_to: int | None = None) -> TrajectoryTube:
    """Load a recorded X1 `.world` test path as a TrajectoryTube.

    Field mapping and time reconstruction t = invcumtrapz(V, s) follow the
    reference's `/des_path` ingest (`src/ros_integration.jl:13-16`).
    """
    w = load_world_arrays(path)
    s = w["s_m"]
    V = w["UxDes_mps"]
    t = np.asarray(invcumtrapz(jnp.asarray(V), jnp.asarray(s)))
    return make_tube(
        t=t, s=s, V=V, A=w["AxDes_mps2"], E=w["posE_m"], N=w["posN_m"],
        psi=w["psi_rad"], kappa=w["k_1pm"], theta=w["grade_rad"], phi=None,
        edge_L=w.get("edgeL_m"), edge_R=w.get("edgeR_m"), pad_to=pad_to)


def tube_from_pathmsg(path: str, pad_to: int | None = None
                      ) -> TrajectoryTube:
    """Load a pre-serialized ROS1 `path` message (`test/path/*.msg`) as a
    TrajectoryTube — dependency-free (no ROS).

    The reference deserializes these through PyCall + rospy
    (`test/load_test_paths.jl:1-16`); the wire format is rospy's plain
    little-endian serialization of `safe_traffic_weaving/path`
    (`src/ros_integration.jl:4`): std_msgs/Header (uint32 seq, time
    stamp, string frame_id) followed by length-prefixed float64 arrays in
    declaration order — two unused leading arrays, then s_m, posE_m,
    posN_m, Psi_rad, k_1pm, grade_rad, edge_L_m, edge_R_m, Ux_des_mps,
    Ax_des_mps2 (layout established against the .world twins of the same
    recordings) — then isOpen.  Time is reconstructed with
    t = invcumtrapz(Ux, s) exactly like the reference's `/des_path`
    ingest (`src/ros_integration.jl:13-16`).  This covers
    `variable_speed.msg`, the one test asset with no `.world` twin.
    """
    import struct

    buf = open(path, "rb").read()
    off = 12                                   # seq + stamp
    (flen,) = struct.unpack_from("<I", buf, off)
    off += 4 + flen                            # frame_id
    arrays = []
    while off + 4 <= len(buf) and len(arrays) < 12:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        if n * 8 > len(buf) - off:
            raise ValueError(f"corrupt path msg {path!r}: array of {n} "
                             f"doubles past end of buffer")
        arrays.append(np.frombuffer(buf, "<f8", count=n, offset=off))
        off += 8 * n
    if len(arrays) != 12:
        raise ValueError(f"path msg {path!r}: expected 12 arrays, got "
                         f"{len(arrays)}")
    (s, E, N, psi, kappa, grade, edge_L, edge_R, Ux,
     Ax) = arrays[2:12]
    t = np.asarray(invcumtrapz(jnp.asarray(Ux), jnp.asarray(s)))
    return make_tube(t=t, s=s, V=Ux, A=Ax, E=E, N=N, psi=psi, kappa=kappa,
                     theta=grade, phi=None, edge_L=edge_L, edge_R=edge_R,
                     pad_to=pad_to)


def tube_from_trajmsg_bytes(buf: bytes, pad_to: "int | None" = None
                            ) -> "tuple[TrajectoryTube, float]":
    """Parse a serialized ROS1 `safe_traffic_weaving/VehicleTrajectory`
    message (the `/des_traj` topic) into a TrajectoryTube — the wire-level
    twin of the reference's timed-trajectory ingest
    (`src/ros_integration.jl:17-20,36-41`), dependency-free like
    `tube_from_pathmsg`.

    Wire format (rospy little-endian serialization): std_msgs/Header
    (uint32 seq, uint32 stamp.secs, uint32 stamp.nsecs, length-prefixed
    frame_id) followed by 12 length-prefixed float64 arrays in
    declaration order — t, s, V, A, E, N, heading, curvature, grade,
    bank, edge_L, edge_R (`src/ros_integration.jl:17-20`).

    Returns (tube, stamp_seconds): the reference sets the controller's
    time offset from `msg.header.stamp` (`:40`).
    """
    import struct

    (seq, secs, nsecs) = struct.unpack_from("<III", buf, 0)
    off = 12
    (flen,) = struct.unpack_from("<I", buf, off)
    off += 4 + flen                            # frame_id
    arrays = []
    while off + 4 <= len(buf) and len(arrays) < 12:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        if n * 8 > len(buf) - off:
            raise ValueError("corrupt VehicleTrajectory msg: array of "
                             f"{n} doubles past end of buffer")
        arrays.append(np.frombuffer(buf, "<f8", count=n, offset=off))
        off += 8 * n
    if len(arrays) != 12:
        raise ValueError("VehicleTrajectory msg: expected 12 arrays, "
                         f"got {len(arrays)}")
    t, s, V, A, E, N, psi, kappa, grade, bank, edge_L, edge_R = arrays
    tube = make_tube(t=t, s=s, V=V, A=A, E=E, N=N, psi=psi, kappa=kappa,
                     theta=grade, phi=bank, edge_L=edge_L, edge_R=edge_R,
                     pad_to=pad_to)
    return tube, secs + nsecs * 1e-9


def serialize_trajmsg(t, s, V, A, E, N, psi, kappa, grade, bank, edge_L,
                      edge_R, stamp: float = 0.0, seq: int = 0,
                      frame_id: str = "") -> bytes:
    """Serialize a VehicleTrajectory to the ROS1 wire format (the inverse
    of `tube_from_trajmsg_bytes`; used by tests and by in-process planner
    stand-ins — no test asset of this type ships with the reference)."""
    import struct

    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    fid = frame_id.encode()
    out = [struct.pack("<III", seq, secs, nsecs),
           struct.pack("<I", len(fid)), fid]
    for arr in (t, s, V, A, E, N, psi, kappa, grade, bank, edge_L,
                edge_R):
        a = np.asarray(arr, "<f8")
        out.append(struct.pack("<I", a.size))
        out.append(a.tobytes())
    return b"".join(out)
