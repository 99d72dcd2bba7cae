"""Multi-host (multi-process) scaling layer.

SURVEY.md section 2.6.3: the reference parallelizes with OpenMP threads
inside one box (no multi-machine story at all); the TPU-native design
scales the scenario axis across hosts instead: every host drives its local
chips, `jax.distributed` wires the processes into one global runtime, and
GSPMD inserts the cross-host collectives.  Layout rule (the
"How to Scale Your Model" recipe): mesh axes that carry heavy collectives
(the horizon/sequence axis of the distributed cyclic-reduction solve) map
to devices WITHIN a host (ICI); the scenario data-parallel axis -- whose
only collective is the psum of scalar cost summaries -- spans hosts (DCN),
where its tiny payload doesn't care about bandwidth.

Usage on each host of a pod slice:

    from idto_tpu.parallel import multihost
    multihost.initialize()                  # no-op single-process
    mesh = multihost.make_global_mesh(sp=4) # (scenario across hosts+chips,
                                            #  horizon within host)
    sol, stats, mean_cost = multihost.solve_batch_global(
        model, probs, params, q_guesses, mesh)

Everything degrades to the single-process path when only one process is
present, so the same code runs on 1 chip, 1 host, and N hosts.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax

SCENARIO_AXIS = "scenario"
HORIZON_AXIS = "horizon"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Wire this process into the global JAX runtime
    (``jax.distributed.initialize``).  Arguments default from the standard
    environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or cloud-TPU metadata when none are set).  Returns True
    if a multi-process runtime was initialized, False for the single-process
    no-op (no coordinator configured and no cloud metadata).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)

    if coordinator_address is None and num_processes is None:
        # On Cloud TPU, jax.distributed.initialize() can autodetect from
        # the metadata server; only attempt it when we are plausibly in a
        # MULTI-worker environment (TPU_WORKER_HOSTNAMES lists several
        # hosts), else no-op.  Autodetection failures degrade to
        # single-process rather than raising (a lone dev box often carries
        # stale TPU_* env).
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hosts.split(",") if h.strip()]) < 2:
            return False
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return False
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_global_mesh(sp: int = 1, devices=None) -> jax.sharding.Mesh:
    """A (scenario, horizon) mesh over ALL global devices.

    ``sp`` devices per horizon group (sequence parallelism for the
    distributed cyclic-reduction solve); the remaining factor is the
    scenario data-parallel axis.  jax.devices() orders devices
    process-major, so reshaping to (dp, sp) puts the sp axis over
    consecutive local devices (ICI) and lets dp span processes (DCN) --
    exactly the layout rule in the module docstring.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % sp == 0, f"{n} devices not divisible by sp={sp}"
    local = jax.local_device_count()
    if sp > 1:
        assert local % sp == 0 or sp % local == 0, (
            f"sp={sp} must nest within a host's {local} local devices "
            "(or span whole hosts) so CR halo exchanges ride ICI"
        )
    grid = np.asarray(devices).reshape(n // sp, sp)
    return jax.sharding.Mesh(grid, (SCENARIO_AXIS, HORIZON_AXIS))


def scenario_sharding(mesh: jax.sharding.Mesh):
    """NamedSharding placing a leading scenario axis over the mesh's
    scenario axis (arrays replicated along horizon)."""
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(SCENARIO_AXIS))


def shard_scenarios_from_local(mesh: jax.sharding.Mesh, pytree):
    """Build GLOBAL scenario-sharded arrays from per-process local data.

    Each process passes its LOCAL slice of the scenario batch (scenarios
    generated or loaded on that host); the result is a global jax.Array of
    batch = sum of local batches, sharded over the scenario mesh axis.
    Single-process: equivalent to device_put with the scenario sharding.
    """
    sharding = scenario_sharding(mesh)

    def make(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(make, pytree)


def solve_batch_global(model, probs, params, q_guesses, mesh):
    """Scenario-data-parallel solve over a (possibly multi-host) mesh.

    probs/q_guesses may be global jax.Arrays (from
    ``shard_scenarios_from_local``) or host-local numpy, in which case each
    host's arrays are treated as its local shard.  Returns (solution,
    stats, warm, mean_cost) with mean_cost psum-reduced across every
    scenario on every host.
    """
    from idto_tpu.parallel.batching import solve_batch_sharded

    if not isinstance(jax.tree.leaves(q_guesses)[0], jax.Array):
        probs = shard_scenarios_from_local(mesh, probs)
        q_guesses = shard_scenarios_from_local(mesh, q_guesses)
    return solve_batch_sharded(
        model, probs, params, q_guesses, mesh, axis=SCENARIO_AXIS
    )
