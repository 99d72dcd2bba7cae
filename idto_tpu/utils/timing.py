"""Benchmark timing that actually synchronizes with the device.

On the experimental remote-TPU platform this machine uses,
``jax.block_until_ready`` returns before device execution completes:
calibration (scripts/calibrate_timing.py) measured a 1.1-TFLOP matmul
chain "finishing" in 0.07 ms -- an implied 15,600 TFLOP/s, ~80x the
chip's physical bf16 peak -- so any wall-clock timed with
block_until_ready is measuring dispatch, not compute.  (This invalidated
every round-2 benchmark artifact; see BENCH_r02 vs BENCH_r03.)

The helpers here force a genuine round-trip by reading back ONE scalar
that data-depends on the computation's output:

  * :func:`sync` -- barrier on a result pytree (4-byte transfer).
  * :func:`measure_rtt` -- the fixed per-round-trip latency floor, so
    callers can subtract it or amortize over chained calls.
  * :func:`time_fn` -- median per-call seconds with per-call sync.
  * :func:`time_throughput` -- N chained calls, one final sync: the right
    measure for batched throughput (amortizes the tunnel RTT).
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _probe(leaf):
    # A separate tiny jitted program whose input is the result leaf: its
    # (4-byte) output cannot be read back until the producer has actually
    # executed.  jit-cached per input shape/dtype.
    return _probe_jit(leaf)


@jax.jit
def _probe_jit(leaf):
    flat = jnp.ravel(leaf)[:1]
    return jnp.sum(flat).astype(jnp.float32)


@jax.jit
def _probe_all_jit(leaves):
    # One executable consuming a scalar from EVERY leaf: the read-back
    # cannot complete until all producing dispatches have executed, so this
    # is a valid barrier even for pytrees assembled from several
    # independent dispatches (e.g. host-side chunk concatenation).
    return sum(
        jnp.sum(jnp.ravel(l)[:1]).astype(jnp.float32) for l in leaves
    )


def sync(out) -> float:
    """Block until ``out`` (any pytree of arrays) is actually computed.

    Probes a reduction over ALL leaves, so it is a correct barrier even
    when the leaves come from independent dispatches."""
    leaves = jax.tree.leaves(out)
    if len(leaves) == 1:
        return float(_probe(leaves[0]))
    return float(_probe_all_jit(leaves))


def measure_rtt(reps: int = 20) -> float:
    """Median seconds of one trivial dispatch + scalar read-back."""
    a = jnp.float32(0.0)
    sync(a + 1.0)  # warm the probe executable
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(a + 1.0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_fn(
    fn: Callable,
    inputs: Sequence[tuple],
    reps: int = 10,
    rtt: float | None = None,
) -> float:
    """Median per-call seconds of ``fn`` with a real sync per call.

    ``inputs`` is a list of argument tuples cycled through (pre-staged on
    device).  If ``rtt`` is given it is subtracted (clamped at 0).
    """
    sync(fn(*inputs[0]))  # compile + warm
    ts = []
    for r in range(reps):
        args = inputs[r % len(inputs)]
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    return max(t - (rtt or 0.0), 0.0)


def time_throughput(
    fn: Callable,
    inputs: Sequence[tuple],
    calls: int = 10,
) -> float:
    """Seconds per call over ``calls`` back-to-back dispatches with ONE
    final sync -- the steady-state pipelined throughput measure."""
    out = fn(*inputs[0])
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for r in range(calls):
        out = fn(*inputs[r % len(inputs)])
    sync(out)
    return (time.perf_counter() - t0) / calls
