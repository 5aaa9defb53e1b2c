"""Persistent XLA executable cache for every entry point.

swin_b@512^2 step programs take minutes to compile (longer through a
remote-compile tunnel); the persistent cache turns process restarts into
deserialization loads. Two hard-won constraints (PERF.md round-2 compile
notes):

  * The knobs must go through ``jax.config`` — the axon platform plugin
    auto-imports jax at interpreter startup, so env vars set in user code
    are read too late.
  * The remote-compile path under-reports compile times, so the
    min-compile-time threshold must be 0 (the default 1s silently skips
    every write) and the entry-size floor disabled.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None,
                            cpu: bool = False) -> str | None:
    """Enable the JAX persistent compilation cache; returns the dir used.

    Resolution order: explicit arg > $JAX_COMPILATION_CACHE_DIR >
    ~/.cache/fmc_uia_tpu/jax_cache. Failures are non-fatal (the cache is
    an optimization only).

    By default the cache only engages on non-CPU backends: the win is the
    minutes-long TPU compiles, while on CPU the XLA AOT loader logs loud
    machine-feature-mismatch errors on every reload (and tiny CPU test
    programs compile in seconds anyway). Pass ``cpu=True`` (or set
    $FMC_JAX_CACHE_CPU=1) to cache CPU executables too.
    """
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "fmc_uia_tpu", "jax_cache"))
    try:
        import jax

        if (jax.default_backend() == "cpu" and not cpu
                and not os.environ.get("FMC_JAX_CACHE_CPU")):
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:
        return None
