"""Scenario batching and multi-chip sharding.

This is the capability layer the reference does not have (SURVEY.md section
2.6: the reference's only parallelism is OpenMP over timesteps).  Here:

  * ``solve_batch``: vmap the entire trust-region solve over a leading
    scenario axis (initial states, targets, even model parameters --
    anything that is a pytree leaf can be batched).  Each scenario carries
    its own trust radius and accept/reject path; the while_loop runs until
    every scenario converges or hits max_iterations (lock-step batching).
  * ``solve_batch_sharded``: shard the scenario axis across a device mesh
    with ``shard_map``; per-chip solves are independent (pure data
    parallelism over ICI -- no cross-chip traffic inside a solve), with a
    ``psum``'d scalar summary so hosts read O(1) data.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import ProblemDefinition, SolverParameters
from idto_tpu.optimizer.solver import solve_trust_region


def solve_batch(
    model: Model,
    probs: ProblemDefinition,
    params,
    q_guesses,
    native: Optional[bool] = None,
):
    """Batched solve: ``probs`` has a leading scenario axis on its array
    leaves (q_init, v_init, q_nom, v_nom, and optionally the weights);
    q_guesses is (B, T+1, nq).  Returns batched (Solution, Stats, WarmStart).

    ``native=None`` (default) auto-selects the batch-native SoA solve
    (optimizer/batched.py) whenever the configuration supports it -- same
    results, but the physics runs with the scenario axis on the TPU vector
    lanes instead of vmapped per-scenario layouts.  ``native=False`` forces
    the vmapped per-scenario path (the reference implementation the native
    path is pinned against)."""
    from idto_tpu.optimizer.batched import (
        can_solve_batched_native,
        solve_trust_region_batched,
    )

    if native is None:
        native = can_solve_batched_native(model, params)
    if native:
        return solve_trust_region_batched(model, probs, params, q_guesses)
    return jax.vmap(
        lambda prob, qg: solve_trust_region(model, prob, params, qg)
    )(probs, q_guesses)


def broadcast_problem(prob: ProblemDefinition, batch: int) -> ProblemDefinition:
    """Tile a single problem across a scenario axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), prob
    )


def make_mesh(n_devices: Optional[int] = None, axis: str = "scenario") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def solve_batch_sharded(
    model: Model,
    probs: ProblemDefinition,
    params: SolverParameters,
    q_guesses,
    mesh: Mesh,
    axis: str = "scenario",
):
    """Data-parallel batched solve over a device mesh.

    The batch axis must divide the mesh size.  Returns the sharded batched
    solution plus a replicated scalar summary (mean final cost across all
    scenarios, reduced with psum over ICI).
    """
    from jax import shard_map

    n = mesh.shape[axis]

    def local_solve(probs_local, qg_local):
        sol, stats, warm = solve_batch(model, probs_local, params, qg_local)
        iters = jnp.maximum(stats.num_iters - 1, 0)
        final_cost = jnp.take_along_axis(
            stats.cost, iters[:, None], axis=1
        )[:, 0]
        local_sum = jnp.sum(final_cost)
        total = jax.lax.psum(local_sum, axis)
        count = jax.lax.psum(final_cost.shape[0], axis)
        return sol, stats, warm, total / count

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    return sharded(probs, q_guesses)
