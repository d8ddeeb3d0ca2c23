"""A/B: sequential block-Cholesky stage scan vs log-N block cyclic
reduction for the block-tridiagonal KKT inverse, across horizon lengths.

The live configs (nb=16/31) are short enough that the O(nb) scan is fine;
this measures where the crossover sits so the SURVEY §5 horizon-parallel
obligation ships with a recorded justification for the default
(factor_method="banded") and a working long-horizon path ("banded_cr").

Synthetic SPD block-tridiagonal systems (bw=13, the coupled stage width),
single instance (the latency-critical case: this is depth-bound, which is
exactly what cyclic reduction fixes).  Usage:

    python scripts/exp_cr_ab.py            # TPU
    JAX_PLATFORMS=cpu python scripts/exp_cr_ab.py
"""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp  # noqa: E402

from pigeon_tpu.solver import banded  # noqa: E402

BW = 13


def make_system(nb, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(nb, BW, BW)).astype(np.float32) * 0.3
    L[0] = 0.0
    Ds = rng.normal(size=(nb, BW, BW)).astype(np.float32)
    D = (Ds + np.swapaxes(Ds, -1, -2)) / 2 + (2.0 * BW) * np.eye(
        BW, dtype=np.float32)[None]
    F = np.eye(nb * BW, dtype=np.float32).reshape(nb, BW, nb * BW)
    return jnp.asarray(D), jnp.asarray(L), jnp.asarray(F)


def scan_solve(D, L, F):
    """The O(nb)-depth baseline: Cholesky stage scan + fwd substitution +
    W'W (the factor_inv_banded "scan" path on the same raw system)."""
    Linvs, Ss_unused = banded._chol_factor_impl(D, L)

    # recompute S_t = L_t Linv_{t-1}^T inside the substitution
    def fwd(y_prev, inp):
        Linv, Lt, It, Linv_prev = inp
        S = Lt @ jnp.swapaxes(Linv_prev, -1, -2)
        y = Linv @ (It - S @ y_prev)
        return y, y

    nb, bw = D.shape[0], D.shape[-1]
    Linv_prev = jnp.concatenate(
        [jnp.zeros((1, bw, bw), D.dtype), Linvs[:-1]])
    with jax.default_matmul_precision("highest"):
        _, ys = jax.lax.scan(fwd, jnp.zeros((bw, F.shape[-1]), D.dtype),
                             (Linvs, L, F, Linv_prev))
        W = ys.reshape(nb * bw, -1)
        return W.T @ W


def timeit(fn, args, iters=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts) * 1e3)


def main():
    platform = jax.devices()[0].platform
    # measure the tunnel/dispatch floor to report device-meaningful deltas
    f_id = jax.jit(lambda x: x + 1.0)
    _, floor_ms = timeit(f_id, (jnp.zeros((8, 128), jnp.float32),))
    rows = []
    for nb in (16, 31, 64, 128, 256):
        D, L, F = make_system(nb)
        scan_j = jax.jit(scan_solve)
        cr_j = jax.jit(
            lambda D, L, F: banded.solve_block_tridiag_cr(D, L, F))
        Kinv_s, t_scan = timeit(scan_j, (D, L, F))
        X_cr, t_cr = timeit(cr_j, (D, L, F))
        # CR solves K X = I directly; scan path forms K^-1 = W'W
        err = float(jnp.max(jnp.abs(
            X_cr.reshape(nb * BW, nb * BW) - Kinv_s)))
        rows.append({
            "nb": nb, "bw": BW,
            "scan_ms": round(t_scan, 3), "cr_ms": round(t_cr, 3),
            "scan_minus_floor_ms": round(t_scan - floor_ms, 3),
            "cr_minus_floor_ms": round(t_cr - floor_ms, 3),
            "speedup": round((t_scan - floor_ms) / max(t_cr - floor_ms,
                                                       1e-6), 2),
            "max_abs_diff": err,
        })
        print(json.dumps(rows[-1]), flush=True)
    out = {"metric": "kkt_factor_scan_vs_cyclic_reduction",
           "platform": platform, "call_floor_ms": round(floor_ms, 3),
           "rows": rows}
    with open("/root/repo/CR_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
