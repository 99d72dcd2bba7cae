"""Persistent XLA compilation cache.

The jitted solve graphs are large (full trust-region loop with exact
derivative assembly); first compiles are expensive.  The persistent cache
makes every repeat run (tests, bench, MPC restarts) start hot.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("IDTO_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = path or os.environ.get(
        "IDTO_COMPILE_CACHE", os.path.expanduser("~/.cache/idto_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Zero thresholds: persist every jitted computation.  The dominant
        # suite cost is XLA compiles of the full solve graphs (30-120 s on
        # this 2-core host); sub-second entries are cheap to store and the
        # solver dispatches many mid-size helper jits that individually sit
        # under a 1 s threshold.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
