"""Data-parallel scaling measurement over a virtual CPU device mesh.

Weak scaling: fixed per-device scenario batch, mesh grown 1 -> 8 devices,
throughput and efficiency reported per mesh size.

CAVEAT (stated up front, also in the README): the virtual devices of
`--xla_force_host_platform_device_count` share this host's physical
cores, so wall-clock cannot speed up with mesh size — this measures the
OVERHEAD the sharding machinery adds (partitioning, collectives for the
psum'd metrics), i.e. a LOWER bound on multi-host efficiency from the
software side.  Real >=85%-efficiency validation needs >=2 physical
hosts (`jax.distributed`; wiring demonstrated by
tests/test_distributed.py), which this environment does not provide.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/scaling_bench.py --per-device 32 --steps 10
"""

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mesh-sizes", type=int, nargs="*",
                    default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pigeon_tpu import hji as H
    from pigeon_tpu import mpc as M
    from pigeon_tpu import trajectory as trj
    from pigeon_tpu.config import SolverOptions
    from pigeon_tpu.compile import tpu_jit
    from pigeon_tpu.parallel.shard import (make_mesh_2d, make_sharded_step,
                                           shard_batch_dp)

    cfg = dataclasses.replace(M.x1_coupled_config(), solver=SolverOptions(
        max_iter=100, check_every=50, backend="xla",
        factor_method="banded", scaling_iters=4))
    tube = trj.tube_from_world(
        "/root/reference/test/path/skidpadoval.world", pad_to=1024)
    cache = H.inactive_cache()
    dtype = jnp.float32

    results = []
    per_dev_rate_1 = None
    for nd in args.mesh_sizes:
        if nd > len(jax.devices()):
            break
        B = args.per_device * nd
        rng = np.random.default_rng(0)
        k0 = rng.integers(0, 900, B)
        q0 = jnp.asarray(np.stack(
            [np.asarray(tube.E)[k0], np.asarray(tube.N)[k0],
             np.asarray(tube.psi)[k0], np.full(B, 6.0), np.zeros(B),
             np.zeros(B)], axis=1), dtype)
        ts = jnp.asarray(np.asarray(tube.t)[k0], dtype)
        u0 = jnp.zeros((B, 3), dtype)
        oc = jnp.broadcast_to(jnp.asarray([1e4, 1e4, 0, 0], dtype), (B, 4))
        carry = M.init_carry(cfg, dtype=dtype)
        cb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                          carry)

        mesh = make_mesh_2d(nd, tp=1)
        step = make_sharded_step(cfg, tube, cache, mesh)
        cb, q0, u0, oc, ts = shard_batch_dp((cb, q0, u0, oc, ts), mesh)
        with mesh:
            f = tpu_jit(step)
            cb, u3, diag, metrics = f(cb, q0, u0, oc, ts)
            jax.block_until_ready(u3)
            lat = []
            for i in range(args.steps):
                t0 = time.perf_counter()
                cb, u3, diag, metrics = f(cb, q0, u0, oc, ts + 0.01 * i)
                jax.block_until_ready(u3)
                lat.append(time.perf_counter() - t0)
        p50 = float(np.median(lat))
        rate = B / p50
        per_dev_rate = rate / nd
        if per_dev_rate_1 is None:
            per_dev_rate_1 = per_dev_rate
        eff = per_dev_rate / per_dev_rate_1
        results.append({"devices": nd, "batch": B,
                        "step_p50_ms": round(p50 * 1e3, 2),
                        "solves_per_s": round(rate, 1),
                        "per_device_rate": round(per_dev_rate, 1),
                        "weak_scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
