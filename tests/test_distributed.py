"""Multi-process (2-host-analog) distributed test over the CPU backend.

Launches two OS processes that join a `jax.distributed` cluster (the DCN
topology analog: one CPU device per process), build a global 2-device
mesh, and run a shard_map'd psum plus the tensor-parallel banded
factorization across the process boundary.  This is the wiring a real
multi-host TPU deployment uses (`jax.distributed.initialize` + the same
mesh/shard_map code as `parallel/shard.py`); on TPU pods the collectives
ride ICI/DCN instead of the CPU transport.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "1")
import jax
jax.config.update("jax_num_cpu_devices", 1)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
import functools
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

devs = jax.devices()
assert len(devs) == 2, devs
mesh = Mesh(np.asarray(devs), ("tp",))

# 1) cross-process psum
@functools.partial(shard_map, mesh=mesh, in_specs=P("tp"), out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), "tp")

x = jnp.arange(8.0)
xs = jax.device_put(x, NamedSharding(mesh, P("tp")))
t = float(jax.jit(total)(xs))
assert abs(t - 28.0) < 1e-6, t

# 2) tensor-parallel banded factorization across the process boundary
from pigeon_tpu.config import HorizonParams
from pigeon_tpu.solver.banded import coupled_stage_plan, factor_inv_banded
hz = HorizonParams(N_short=2, N_long=3)
slots, n, bw, nb = coupled_stage_plan(hz, False)
rng = np.random.default_rng(0)
from pigeon_tpu.qp import coupled as qc
L = qc.get_layout(hz, False)
m = L.m
Pb = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
Ab = jnp.asarray(rng.standard_normal((m, n)) * 0.3, jnp.float32)
rho = jnp.ones((m,), jnp.float32)

@functools.partial(shard_map, mesh=mesh,
                   in_specs=(P(), P(), P()), out_specs=P(),
                   check_rep=False)
def factor_tp(Pb, Ab, rho):
    return factor_inv_banded(Pb, Ab, rho, 1e-6, slots, n, bw, nb,
                             tp_axis="tp")

Kinv_tp = jax.jit(factor_tp)(Pb, Ab, rho)
Kinv_ref = factor_inv_banded(Pb, Ab, rho, 1e-6, slots, n, bw, nb)
err = float(jnp.max(jnp.abs(Kinv_tp - Kinv_ref)))
assert err < 1e-5, err
print(f"proc {proc_id} OK psum={t} tp_factor_err={err:.2e}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("PIGEON_SKIP_DISTRIBUTED") == "1",
                    reason="explicitly disabled")
def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("XLA_FLAGS", None)       # one device per process
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
