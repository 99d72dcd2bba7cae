"""Timing-methodology calibration for the current backend.

Times a chain of large matmuls whose FLOP count is known, three ways:
  1. dispatch only (no sync)            -- must be ~0 if async works
  2. block_until_ready                  -- the method benchmarks rely on
  3. block + host read-back of 1 scalar -- forces a real device round-trip

If (2) reports a rate above the chip's physical peak, block_until_ready
does not actually synchronize on this platform and every benchmark using
it is invalid; (3) is then the trustworthy (slightly latency-padded)
method.  Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
CHAIN = 8
FLOPS = 2 * N * N * N * CHAIN


def main():
    from idto_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]

    @jax.jit
    def chain(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return y

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, N), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1), (N, N), jnp.bfloat16)

    out = jax.block_until_ready(chain(x, w))  # compile

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(x, w)
    t_dispatch = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(chain(x, w))
    t_block = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(2):  # full-buffer read-back is tunnel-bandwidth bound
        out = chain(x, w)
        _ = np.asarray(out[0, 0])
    t_readback = (time.perf_counter() - t0) / 2

    from idto_tpu.utils import timing

    rtt = timing.measure_rtt()
    t0 = time.perf_counter()
    for _ in range(reps):
        timing.sync(chain(x, w))
    t_sync = (time.perf_counter() - t0) / reps - rtt

    res = {
        "rtt_ms": round(rtt * 1e3, 3),
        "sync_ms": round(t_sync * 1e3, 3),
        "sync_tflops": round(FLOPS / max(t_sync, 1e-9) / 1e12, 1),
        "device": dev.device_kind,
        "backend": jax.default_backend(),
        "flops_per_call": FLOPS,
        "dispatch_ms": round(t_dispatch * 1e3, 3),
        "block_ms": round(t_block * 1e3, 3),
        "readback_ms": round(t_readback * 1e3, 3),
        "block_tflops": round(FLOPS / t_block / 1e12, 1),
        "readback_tflops": round(FLOPS / t_readback / 1e12, 1),
        "block_is_trustworthy": FLOPS / t_block / 1e12 < 1000.0,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
