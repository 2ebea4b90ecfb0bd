"""Persistent XLA compilation cache.

The fused 4-field kernels compile in seconds on CPU but take minutes
through the remote-TPU tunnel (the all-D3Q27 parity variant ~10 min at
256^3), and the reference-parity companion bench runs in a fresh
subprocess every time (benchmark.py).  A repo-local persistent cache
makes every re-run — probes, bench re-measures, the driver's end-of-round
`bench.py` — reuse the serialized executables instead of recompiling.

Off by default nowhere: call `enable()` from every perf-bearing entry
point (bench, CLI run, scripts).  EKPNP_COMPILE_CACHE overrides the
location; "0" disables.
"""
from __future__ import annotations

import os


def enable() -> None:
    d = os.environ.get("EKPNP_COMPILE_CACHE")
    if d == "0":
        return
    if not d:
        d = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # old jax or read-only FS: run uncached
        import sys

        print(f"# ekpnp: compile cache at {d!r} unavailable ({e!r}); "
              "expect long recompiles", file=sys.stderr)
