"""Host-side per-iteration wall-clock capture for device-resident solves.

The reference measures each trust-region/linesearch iteration's wall time
inline (trajectory_optimizer.cc:2567-2568) and stores it in
``TrajectoryOptimizerStats::iteration_times``.  Our solve loop runs as one
jitted ``lax.while_loop``, so the host can't time iterations directly;
instead, when ``SolverParameters.record_iteration_times`` is on, the loop
body fires an ordered ``jax.debug.callback`` to :func:`mark` at the point
the reference takes its timestamp.  After the (blocking) solve returns,
:func:`collect` converts the marks into per-iteration durations.

Single-scenario solves only: under vmap the callback fires once per
*batched* iteration, which would misattribute times.

Usage (see ``api.TrajectoryOptimizer.Solve`` / ``examples/run.py``)::

    itimer.reset()
    sol, stats, warm = jitted_solve(...)   # blocks on host read-back
    stats = attach_iteration_times(stats)  # stats_io helper
"""
from __future__ import annotations

import time
from typing import List, Optional

_marks: List[float] = []
_t0: Optional[float] = None


def reset() -> None:
    """Start a capture window: clear marks, timestamp the solve start.

    Drains pending debug-callback deliveries first so late marks from an
    earlier (e.g. warm-up) solve cannot land inside the new window."""
    global _t0
    import jax

    jax.effects_barrier()
    _marks.clear()
    _t0 = time.perf_counter()


def mark() -> None:
    """Record one end-of-iteration timestamp (called from the device loop
    via jax.debug.callback, ordered)."""
    _marks.append(time.perf_counter())


def collect() -> List[float]:
    """Per-iteration durations in seconds since the last reset().

    Durations are successive differences of the marks, with the first
    iteration measured from reset().  Empty if reset() was never called or
    no iterations ran.

    Transport-latency floor: every duration includes one ordered-callback
    round-trip (host<->device; ~30 ms on the remote-TPU tunnel, see
    utils/timing.py), and the first also includes host dispatch of the
    whole jitted call.  The values upper-bound iteration compute -- they
    are NOT comparable to the reference's in-process iteration_times when
    the RTT dominates.
    """
    if _t0 is None or not _marks:
        return []
    ts = [_t0] + _marks
    return [ts[i + 1] - ts[i] for i in range(len(ts) - 1)]
