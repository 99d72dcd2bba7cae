"""Cold-compile cost of the benchmark's executables (VERDICT r4 item 4).

Round 4 measured 545-717 s per cheetah solve executable on a cold host --
the common cause behind both red driver gates (bench rc=1 investigation
cost, multichip rc=124).  This script records, with the persistent cache
DISABLED, the trace/lower time and backend-compile time of:

  * the batch-1 native solve (bench.py's latency executable),
  * the CHUNK=256 native solve (bench.py's throughput executable),

on the active backend (TPU under axon; CPU with JAX_PLATFORMS=cpu), then
re-runs the batch-1 compile WITH the persistent cache enabled twice to
demonstrate a cache hit (second compile must be >10x faster).  Writes
BENCH_COMPILE.json at the repo root.

Cross-machine transfer is handled by construction, not by transfer: the
cache directory is keyed by (CPU model+flags, jax version, platform)
(idto_tpu/utils/cache.py:_machine_key), so a different host misses cleanly
instead of failing entry-by-entry (the round-3/4 cpu_aot_loader spam), and
the multichip dryrun never loads a cache at all.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    os.environ["IDTO_NO_COMPILE_CACHE"] = "1"  # cold by default
    import jax
    import jax.numpy as jnp

    from idto_tpu.examples.registry import load_example
    from idto_tpu.optimizer.problem import LinearSolverType
    from idto_tpu.parallel.batching import broadcast_problem, solve_batch

    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    params = params.replace(max_iterations=1, check_convergence=False)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        params = params.replace(linear_solver=LinearSolverType.CYCLIC_REDUCTION)

    def step(m, p, prm, qg):
        sol, stats, warm = solve_batch(m, p, prm, qg)
        return sol.q, stats.cost[:, 0], stats.rho[:, 0]

    results = {
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "rows": [],
    }

    def measure(B, tag):
        probs = broadcast_problem(prob, B)
        qgs = jnp.broadcast_to(q_guess, (B,) + q_guess.shape)
        t0 = time.monotonic()
        lowered = jax.jit(step).lower(model, probs, params, qgs)
        t1 = time.monotonic()
        lowered.compile()
        t2 = time.monotonic()
        row = {
            "executable": tag,
            "batch": B,
            "trace_s": round(t1 - t0, 1),
            "compile_s": round(t2 - t1, 1),
            "total_s": round(t2 - t0, 1),
        }
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
        return row

    measure(1, "bench_latency_batch1")
    measure(256, "bench_throughput_chunk256")

    # Warm-cache demonstration: same executable, fresh process-level jit
    # cache, persistent cache enabled.  First call populates, second hits.
    del os.environ["IDTO_NO_COMPILE_CACHE"]
    from idto_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for attempt in ("populate", "hit"):
        jax.clear_caches()
        probs = broadcast_problem(prob, 1)
        qgs = jnp.broadcast_to(q_guess, (1,) + q_guess.shape)
        t0 = time.monotonic()
        jax.jit(step).lower(model, probs, params, qgs).compile()
        dt = time.monotonic() - t0
        results[f"warm_cache_{attempt}_s"] = round(dt, 1)
        print(json.dumps({f"warm_cache_{attempt}_s": round(dt, 1)}), flush=True)

    cold = results["rows"][0]["total_s"]
    results["target_s"] = 180.0
    results["meets_target"] = all(r["total_s"] < 180.0 for r in results["rows"])
    results["cache_speedup_x"] = round(
        max(results["warm_cache_populate_s"], 1e-9)
        / max(results["warm_cache_hit_s"], 1e-9), 1
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_COMPILE.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out} (cold batch1 {cold}s, meets_target={results['meets_target']})")


if __name__ == "__main__":
    main()
