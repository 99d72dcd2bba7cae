"""Per-phase device-time breakdown of one mini-cheetah GN iteration.

Answers "where does the time go" for the headline benchmark: times each
phase of the trust-region iteration (exact-jacfwd partials, Hessian
assembly + factorization, the penta-diagonal Newton solve, the
rollout/merit evaluation, and the dogleg composition) separately, at
several scenario batch sizes, on whatever backend is active (TPU under
axon; CPU with --platform cpu).

Methodology: every measurement jits the phase as a function of the inputs,
pre-materializes R distinct input sets on device (defeating any
constant-folding), blocks on EVERY call's output, and reports the median
of R timings.  Writes BENCH_PHASES.json at the repo root.

Usage: python scripts/bench_phases.py [--batches 1,256,1024] [--reps 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_RTT = [0.0]


def time_fn(fn, inputs, reps):
    """Median seconds per call with a REAL device sync (block_until_ready
    does not synchronize on the remote-TPU platform -- see
    idto_tpu/utils/timing.py); the measured round-trip floor is
    subtracted."""
    from idto_tpu.utils import timing

    return timing.time_fn(fn, inputs, reps=reps, rtt=_RTT[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default=None)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--native-only", action="store_true",
                    help="skip the vmapped-AoS rows (each costs a ~700 s "
                         "remote compile cold); time only the batch-native "
                         "SoA path the headline bench runs")
    ap.add_argument("--trace-dir", default=None,
                    help="also dump a jax.profiler trace of the full step "
                         "at the largest batch")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from idto_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from idto_tpu.examples.registry import load_example
    from idto_tpu.ops import penta
    from idto_tpu.optimizer import trajectory
    from idto_tpu.optimizer.hessian import (
        gauss_newton_hessian,
        gradient_from_partials,
    )
    from idto_tpu.optimizer.partials import id_partials_for, nplus_stack
    from idto_tpu.optimizer.solver import _merit_at, _prepare, solve_trust_region

    on_tpu = jax.default_backend() != "cpu"
    if args.batches:
        batches = [int(b) for b in args.batches.split(",")]
    else:
        batches = [1, 64, 256, 1024, 4096] if on_tpu else [1, 8]

    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    params = params.replace(max_iterations=1, check_convergence=False)
    contact = params.contact

    key = jax.random.PRNGKey(0)
    n_inputs = min(args.reps, 4)  # distinct staged inputs to cycle through

    # --- per-phase single-scenario functions (vmapped over batch) ---
    def phase_partials(m, p, q):
        return id_partials_for(m, p, params, q)

    def phase_hessfact(m, p, parts, npl):
        H = gauss_newton_hessian(m, p, parts, npl)
        return penta.factorize(H)

    def phase_solve(factor, g):
        return penta.solve_factorized(factor, g)

    def phase_rollout(m, p, q):
        return _merit_at(m, p, params, q, jnp.zeros(0, dtype=q.dtype))

    def phase_prepare(m, p, q):
        pr = _prepare(m, p, params, q)
        return pr.p_newton, pr.cost

    def full_step(m, p, q):
        sol, stats, warm = solve_trust_region(m, p, params, q)
        return sol.q, stats.cost[0]

    from idto_tpu.utils import timing

    _RTT[0] = timing.measure_rtt()
    results = {
        "device": jax.devices()[0].device_kind,
        "rtt_ms": round(_RTT[0] * 1e3, 3),
        "note": (
            "per-phase device time of one mini-cheetah GN iteration, "
            "genuine-sync timing (idto_tpu/utils/timing.py), RTT-"
            "subtracted.  *_native rows are the batch-native SoA path "
            "(optimizer/batched.py + soa/): same algorithm and shapes as "
            "the vmapped AoS rows above them.  batch-1 rows sit below the "
            "tunnel-RTT measurement floor; batch>=256 rows carry the "
            "signal."
        ),
        "phases": [],
    }

    from idto_tpu.parallel.batching import broadcast_problem

    for B in batches:
        probs = broadcast_problem(prob, B)
        inputs_q = []
        for i in range(n_inputs):
            dq = 0.01 * jax.random.normal(
                jax.random.fold_in(key, i), (B, model.nq), q_guess.dtype
            )
            pi = probs.replace(q_init=probs.q_init + dq)
            qi = (jnp.broadcast_to(q_guess, (B,) + q_guess.shape)
                  + dq[:, None, :])
            inputs_q.append((pi, qi))

        def vm(fn3):
            return jax.jit(lambda p, q: jax.vmap(
                lambda pp, qq: fn3(model, pp, qq))(p, q))

        row = {"batch": B}

        if args.native_only:
            # Stage partials through the SoA path (pinned to the AoS form
            # by tests/test_soa.py) -- compiling the vmapped-AoS partials
            # just for staging would defeat the point of this mode.
            from idto_tpu.soa import partials as _soa_parts

            jt_parts = jax.jit(
                lambda p, q: _soa_parts.id_partials_batched(
                    model, p, params.contact, q
                )
            )
        else:
            jt_parts = vm(lambda m, p, q: phase_partials(m, p, q))
        if not args.native_only:
            # Full GN step and full _prepare.
            t = time_fn(vm(full_step), inputs_q, args.reps)
            row["full_step_ms"] = round(t * 1e3, 3)
            t = time_fn(vm(phase_prepare), inputs_q, args.reps)
            row["prepare_ms"] = round(t * 1e3, 3)

            # Partials.
            t = time_fn(jt_parts, inputs_q, args.reps)
            row["partials_ms"] = round(t * 1e3, 3)

        # Hessian + factorization (inputs: staged partials).  These rows
        # are shared: the batch-native path vmaps the same linear-algebra
        # tail (optimizer/batched.py:_prepare_batched).
        inputs_h = []
        for (pi, qi) in inputs_q:
            parts = jt_parts(pi, qi)
            npl = jax.jit(jax.vmap(lambda q: nplus_stack(model, q)))(qi)
            inputs_h.append((pi, parts, npl))
        jt_hess = jax.jit(lambda p, parts, npl: jax.vmap(
            lambda pp, pa, np_: phase_hessfact(model, pp, pa, np_)
        )(p, parts, npl))
        t = time_fn(jt_hess, inputs_h, args.reps)
        row["hessian_factorize_ms"] = round(t * 1e3, 3)

        # Penta solve (staged factorization + synthetic gradient).
        inputs_s = []
        for idx, (pi, parts, npl) in enumerate(inputs_h):
            fac = jt_hess(pi, parts, npl)
            g = jax.random.normal(
                jax.random.fold_in(key, 100 + idx),
                (B, prob.num_steps + 1, model.nq), q_guess.dtype,
            )
            inputs_s.append((fac, g))
        jt_solve = jax.jit(jax.vmap(phase_solve))
        t = time_fn(jt_solve, inputs_s, args.reps)
        row["penta_solve_ms"] = round(t * 1e3, 3)

        if not args.native_only:
            # Rollout / merit (cost at a trial point).
            jt_roll = vm(phase_rollout)
            t = time_fn(jt_roll, inputs_q, args.reps)
            row["rollout_ms"] = round(t * 1e3, 3)

        # --- batch-native SoA path (optimizer/batched.py): the scenario
        # axis rides the vector lanes instead of vmapped per-scenario
        # layouts.  *_native rows are directly comparable to the rows
        # above (same algorithm, same shapes).
        from idto_tpu.optimizer.batched import (
            can_solve_batched_native,
            solve_trust_region_batched,
        )
        from idto_tpu.soa import partials as soa_partials
        from idto_tpu.soa import rollout as soa_rollout

        if can_solve_batched_native(model, params):
            def full_native(p, q):
                sol, stats, warm = solve_trust_region_batched(
                    model, p, params, q
                )
                return sol.q, stats.cost[:, 0]

            t = time_fn(jax.jit(full_native), inputs_q, args.reps)
            row["full_step_native_ms"] = round(t * 1e3, 3)

            jt_parts_n = jax.jit(
                lambda p, q: soa_partials.id_partials_batched(
                    model, p, params.contact, q
                )
            )
            t = time_fn(jt_parts_n, inputs_q, args.reps)
            row["partials_native_ms"] = round(t * 1e3, 3)

            jt_roll_n = jax.jit(
                lambda p, q: soa_rollout.cost(model, p, params.contact, q)
            )
            t = time_fn(jt_roll_n, inputs_q, args.reps)
            row["rollout_native_ms"] = round(t * 1e3, 3)

        if "full_step_ms" in row:
            row["per_solve_us_full"] = round(
                row["full_step_ms"] / B * 1e3, 2
            )
        if "full_step_native_ms" in row:
            row["per_solve_us_native"] = round(
                row["full_step_native_ms"] / B * 1e3, 2
            )
        results["phases"].append(row)
        print(json.dumps(row), flush=True)
        # Write incrementally: a compile-bound sweep that dies at batch k
        # should still leave batches < k on disk.
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_PHASES.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        B = batches[-1]
        probs = broadcast_problem(prob, B)
        qi = jnp.broadcast_to(q_guess, (B,) + q_guess.shape)
        fn = jax.jit(lambda p, q: jax.vmap(
            lambda pp, qq: full_step(model, pp, qq))(p, q))
        timing.sync(fn(probs, qi))
        with jax.profiler.trace(args.trace_dir):
            timing.sync(fn(probs, qi))
        print(f"trace written to {args.trace_dir}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_PHASES.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
