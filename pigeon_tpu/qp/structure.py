"""Dense QP assembly scaffolding.

The reference builds its QP once through Parametron `Variable`/`Parameter`
object graphs and then rewrites parameter memory in place each control step
(`src/coupled_lat_long.jl:197-313`, SURVEY.md §1 "Parametron").  The
functional TPU analog: the *sparsity pattern* is decided at trace time from
static horizon shapes, and every step simply recomputes the value arrays —
XLA turns the scatter of stage blocks into a fused constant-layout update.

`QPLayout` plans variable/constraint indices with numpy at trace time;
`assemble` scatters traced value arrays into the dense (m, n) constraint
matrix.  Dense is deliberate at MPC sizes (n~200, m~300): one batched
Cholesky of the reduced KKT maps onto the MXU better than sparse scalar
code ever would on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pigeon_tpu.solver.admm import QPData

INF = jnp.inf


class QPLayout:
    """Static index bookkeeping for one QP formulation.

    Variables and constraint rows are allocated once (Python ints /
    numpy index arrays); the traced assembly only touches values.
    """

    def __init__(self):
        self.n = 0
        self.m = 0
        self._triplets = []        # (row_idx ndarray, col_idx ndarray) pairs
        self._finalized = False

    # -- variables ---------------------------------------------------------
    def add_vars(self, shape) -> np.ndarray:
        """Allocate a block of variables; returns index array of `shape`."""
        size = int(np.prod(shape))
        idx = np.arange(self.n, self.n + size).reshape(shape)
        self.n += size
        return idx

    # -- constraints -------------------------------------------------------
    def add_rows(self, count: int) -> np.ndarray:
        idx = np.arange(self.m, self.m + count)
        self.m += count
        return idx

    def entry(self, rows: np.ndarray, cols: np.ndarray):
        """Register nonzero positions (broadcast rows/cols together).
        Returns the slot id; values are supplied at assembly in the same
        order."""
        rows_b, cols_b = np.broadcast_arrays(rows, cols)
        self._triplets.append((rows_b.ravel(), cols_b.ravel()))
        return len(self._triplets) - 1

    def finalize(self):
        self._row_cat = np.concatenate([r for r, _ in self._triplets])
        self._col_cat = np.concatenate([c for _, c in self._triplets])
        self._sizes = [r.size for r, _ in self._triplets]
        self._finalized = True

    # -- assembly ----------------------------------------------------------
    def assemble_A(self, values: list) -> jnp.ndarray:
        """values[i] must match the shape registered by the i-th entry()."""
        assert self._finalized
        flat = []
        for v, size in zip(values, self._sizes):
            v = jnp.asarray(v)
            assert v.size == size, (v.shape, size)
            flat.append(v.ravel())
        vals = jnp.concatenate(flat)
        A = jnp.zeros((self.m, self.n), vals.dtype)
        return A.at[self._row_cat, self._col_cat].add(vals)
