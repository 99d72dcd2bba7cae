"""Persistent XLA compilation cache.

The jitted solve graphs are large (full trust-region loop with exact
derivative assembly); first compiles are expensive.  The persistent cache
makes every repeat run (tests, bench, MPC restarts) start hot.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _machine_key() -> str:
    """Fingerprint of the host that makes cache entries machine-specific.

    XLA:CPU ahead-of-time entries are compiled for the *build host's* CPU
    features; loading them on a different machine fails per-entry (observed
    in the round-3 multichip dryrun: cpu_aot_loader errors spamming the log
    while every large graph recompiled anyway).  Keying the cache directory
    by CPU model + feature flags + jax version means cross-machine runs
    miss cleanly instead of failing entry-by-entry."""
    parts = [platform.machine(), platform.processor()]
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags") and key not in seen:
                    seen.add(key)  # one core is enough; all cores identical
                    parts.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    try:
        import jax
        parts.append(jax.__version__)
    except Exception:
        pass
    # The active platform is part of the key: a remote-TPU (axon) process
    # compiles its host-side XLA:CPU executables with different compile
    # options (prefer-no-scatter/gather) than a pure-CPU process, and
    # XLA:CPU bakes those options into the AOT entry's "machine features"
    # -- so entries written under one platform fail (with per-entry
    # cpu_aot_loader errors) when loaded under the other.  Splitting the
    # directories makes each platform's cache self-consistent.
    plat = ""
    try:
        import jax
        # The config value (set via jax.config.update("jax_platforms", ...))
        # wins over the env var, mirroring jax's own resolution order; no
        # backend initialization happens here.
        plat = jax.config.jax_platforms or ""
    except Exception:
        pass
    parts.append(plat or os.environ.get("JAX_PLATFORMS", ""))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    if os.environ.get("IDTO_NO_COMPILE_CACHE"):
        return
    import jax

    base = path or os.environ.get(
        "IDTO_COMPILE_CACHE", os.path.expanduser("~/.cache/idto_tpu_xla")
    )
    cache_dir = os.path.join(base, _machine_key())
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
    try:
        # Do NOT persist XLA-level sub-caches: XLA:CPU AOT kernel entries
        # record compile OPTIONS (prefer-no-scatter/gather) as machine
        # features, so the loader rejects them with per-entry errors even
        # on the machine that compiled them -- observed spamming the
        # round-3 driver dryrun log.  The JAX-level executable cache is
        # what saves the 30-120 s solve compiles; losing the XLA kernel
        # sub-cache costs little.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass
