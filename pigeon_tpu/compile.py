"""TPU compile-option plumbing.

`tpu_jit` is `jax.jit` plus the XLA compiler options the framework's hot
programs need on TPU backends.  Today that is one option:

- ``xla_tpu_scoped_vmem_limit_kib``: the Pallas ADMM iteration kernel
  (`solver/pallas_admm.py`) keeps ~9 MB of double-buffered operand blocks
  in VMEM at ``pallas_tile=4``, and XLA additionally places the custom
  call's whole-batch result tuple (x, z, y, stats = ~8 MB at B=2048) in
  scoped VMEM so the next solver segment reads it without an HBM round
  trip.  Together they exceed XLA's default 16 MiB scoped-VMEM budget and
  the compile fails with a scoped-vmem OOM.  The chip has 128 MiB of
  VMEM; raising the scoped budget to 32 MiB admits the placement XLA
  wants.

The options are applied only when the default backend is a TPU — other
backends reject unknown TPU flags.
"""

from __future__ import annotations

import functools

import jax

SCOPED_VMEM_KIB = 32768

_TPU_COMPILER_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB,
}


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def tpu_jit(fn=None, /, **jit_kwargs):
    """``jax.jit`` with the framework's TPU compiler options applied.

    Usable as ``tpu_jit(f)`` or ``@tpu_jit(static_argnames=...)``.  Only
    OUTERMOST jits control compilation (inner jits are inlined), so wrap
    the entry-point step functions — bench loops, runtime steps — and the
    directly-callable kernel wrappers (``admm_iterations``).

    Backend detection is deferred to the first call: decorating at module
    import must not initialize the JAX backend (jax.devices() can block on
    the remote-TPU tunnel, and tests select their platform after import).
    """
    if fn is None:
        return lambda f: tpu_jit(f, **jit_kwargs)

    jitted = {}

    def _top_level() -> bool:
        # compiler_options are only legal on TOP-LEVEL jits; nested jits
        # are inlined into their parent (which carries the options).
        try:
            from jax._src.core import trace_state_clean
            return trace_state_clean()
        except Exception:
            return True

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = "top" if (_top_level() and _on_tpu()) else "plain"
        if key not in jitted:
            kw = dict(jit_kwargs)
            if key == "top":
                kw.setdefault("compiler_options", _TPU_COMPILER_OPTIONS)
            jitted[key] = jax.jit(fn, **kw)
        return jitted[key](*args, **kwargs)

    return wrapper
