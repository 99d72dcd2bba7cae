"""Experiment: where should the scenario-batch axis live on TPU?

The GN iteration's physics is (...,3)-shaped elementwise work; with the
batch axis leading (vmap in_axes=0) the minor dims are 3 / (3,3), which
wastes ~97% of the 8x128 VPU tile.  This times the partials phase and the
full step with (a) leading batch and (b) trailing batch (in_axes=-1 /
out_axes=-1, so the batch tends to land in the lane dimension).

Usage: python scripts/exp_batch_axis.py [--batch 256] [--reps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from idto_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from idto_tpu.examples.registry import load_example
    from idto_tpu.optimizer.partials import id_partials_for
    from idto_tpu.optimizer.solver import solve_trust_region
    from idto_tpu.utils import timing

    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    params = params.replace(max_iterations=1, check_convergence=False)

    B = args.batch
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (B, model.nq), q_guess.dtype)
    probs = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), prob
    ).replace(q_init=prob.q_init[None] + dq)
    qg = jnp.broadcast_to(q_guess, (B,) + q_guess.shape) + dq[:, None, :]

    rtt = timing.measure_rtt()
    out = {"batch": B, "rtt_ms": round(rtt * 1e3, 3)}

    def parts_one(p, q):
        return id_partials_for(model, p, params, q)

    def step_one(p, q):
        sol, stats, _ = solve_trust_region(model, p, params, q)
        return sol.q, stats.cost[0]

    # (a) leading batch axis
    f_lead = jax.jit(jax.vmap(parts_one, in_axes=0))
    t = timing.time_fn(f_lead, [(probs, qg)], reps=args.reps, rtt=rtt)
    out["partials_lead_ms"] = round(t * 1e3, 3)
    s_lead = jax.jit(jax.vmap(step_one, in_axes=0))
    t = timing.time_fn(s_lead, [(probs, qg)], reps=args.reps, rtt=rtt)
    out["step_lead_ms"] = round(t * 1e3, 3)

    # (b) trailing batch axis: transpose all batched leaves to (..., B)
    probs_t = jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, -1), probs
    )
    qg_t = jnp.moveaxis(qg, 0, -1)
    f_trail = jax.jit(jax.vmap(parts_one, in_axes=-1, out_axes=-1))
    t = timing.time_fn(f_trail, [(probs_t, qg_t)], reps=args.reps, rtt=rtt)
    out["partials_trail_ms"] = round(t * 1e3, 3)
    s_trail = jax.jit(jax.vmap(step_one, in_axes=-1, out_axes=-1))
    t = timing.time_fn(s_trail, [(probs_t, qg_t)], reps=args.reps, rtt=rtt)
    out["step_trail_ms"] = round(t * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
