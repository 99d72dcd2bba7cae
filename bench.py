"""Headline benchmark: mini cheetah (T=20, nq=19, nv=18) warm-started MPC
solves per second per chip, batched over scenarios.

Prints one JSON line:
  {"metric": "mini_cheetah_mpc_solves_per_s", "value": N,
   "unit": "solves/s", "vs_baseline": N / 60.0}

vs_baseline is measured against the reference's real-time replan budget of
60 solves/s (examples/mini_cheetah/mini_cheetah.yaml: controller_frequency
60, mpc_iters 1, 4 CPU threads) -- the rate the C++ implementation is tuned
to sustain per CPU.  Each "solve" here is the same unit of work: one
Gauss-Newton iteration (exact derivatives, penta-diagonal solve, dogleg,
trust-ratio rollout) from a warm start.
"""
from __future__ import annotations

import json
import time


def main():
    import jax

    from idto_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from idto_tpu.examples.registry import load_example
    from idto_tpu.optimizer.solver import solve_trust_region
    from idto_tpu.parallel.batching import broadcast_problem, solve_batch

    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    params = params.replace(max_iterations=1, check_convergence=False)

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 256 if on_tpu else 8

    probs = broadcast_problem(prob, batch)
    # Perturb initial states slightly so scenarios are distinct.
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (batch, model.nq), dtype=q_guess.dtype)
    probs = probs.replace(q_init=probs.q_init + dq)
    q_guesses = jnp.broadcast_to(q_guess, (batch,) + q_guess.shape) + dq[:, None, :]

    # N.B. model/probs/params are jit ARGUMENTS, not captured constants:
    # the TPU backend compiles captured device arrays pathologically slowly
    # and re-stages them per call.
    step = jax.jit(lambda m, p, prm, qg: solve_batch(m, p, prm, qg)[0].q)

    # Compile + warm up.
    out = jax.block_until_ready(step(model, probs, params, q_guesses))

    # Timed steady-state iterations (warm-started on the previous solution,
    # like the MPC loop).  Each call blocks: an MPC controller cannot act
    # on a solution that has not materialized, and under remote-dispatch
    # backends an async chain under-reports wall time.
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(step(model, probs, params, out))
    elapsed = time.perf_counter() - t0

    solves_per_s = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "mini_cheetah_mpc_solves_per_s",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 60.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
