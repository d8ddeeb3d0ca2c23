"""Test configuration: run everything on a virtual 8-device CPU mesh with
x64 enabled (the CPU-parity mode; SURVEY.md §4 "multi-host tests on CPU
meshes").

This environment registers a remote-TPU ("axon") PJRT plugin from a
sitecustomize at interpreter start; initializing it takes minutes over the
tunnel and is useless for unit tests, so we drop its backend factory before
any backend is instantiated and force an 8-device CPU platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize anyway)

try:  # deregister the axon plugin backend factory if present
    from jax._src import xla_bridge as _xb

    # Pop ONLY the axon plugin: removing "tpu" from the factory table also
    # removes it from the known-platform list, which breaks later
    # `jax.experimental.pallas` imports (checkify registers a tpu lowering
    # rule unconditionally).  JAX_PLATFORMS=cpu already prevents any tpu
    # backend initialization.
    for _k in list(getattr(_xb, "_backend_factories", {})):
        if "axon" in _k:
            _xb._backend_factories.pop(_k, None)
except Exception:  # pragma: no cover - best effort
    pass

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATHS = "/root/reference/test/path"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches at each module boundary.

    A full-suite run accumulates ~170 tests' jitted executables in one
    process; past ~150 the XLA CPU backend_compile segfaults
    (reproducibly, position-stable, and absent when the same module runs
    alone).  Clearing per module keeps the process small and the suite
    runnable in ONE pytest invocation."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def x1():
    from pigeon_tpu.config import x1_params
    return x1_params()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
