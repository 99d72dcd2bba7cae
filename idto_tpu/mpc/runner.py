"""Closed-loop MPC harness.

The analog of ``TrajOptExample::RunModelPredictiveControl``
(examples/example_base.cc:59-187): an initial full solve seeds the warm
start, then the loop alternates

    [solve at t_k]  ->  [simulate one replan period under the *previous*
                         trajectory]  ->  ...

The one-period lag mirrors the reference's DiscreteTimeDelay between the
controller and the interpolator (example_base.cc:113-126), which models
solver latency.  Both the MPC step and the simulation segment are jitted;
the python loop only orchestrates and collects timing.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.models.model import Model
from idto_tpu.mpc.controller import (
    MpcCarry,
    make_mpc_params,
    mpc_initialize,
    mpc_step,
)
from idto_tpu.mpc.simulator import simulate_segment


@dataclasses.dataclass
class MpcResult:
    num_solves: int
    mean_solve_time: float  # seconds per re-solve (after warmup)
    times: np.ndarray
    q_log: np.ndarray
    v_log: np.ndarray
    u_log: np.ndarray


def run_mpc(
    model: Model,
    cfg,
    prob,
    params,
    q_guess,
    sim_model: Model | None = None,
    sim_contact=None,
    on_replan=None,
) -> MpcResult:
    """Closed-loop MPC.  ``sim_model`` / ``sim_contact`` let the simulated
    plant differ from the one the optimizer plans with (the reference's
    CreatePlantModelForSimulation override, example_base.h:171 -- e.g.
    hydroelastic-contact sim vs point-contact optimizer), enabling
    model-mismatch robustness evaluation.  Both default to the optimizer's.
    The sim model must share the optimizer model's state/actuation layout.

    ``on_replan(t_now, q_plan)`` is called after every re-solve with the
    freshly planned knot trajectory (host numpy) -- the hook the live
    visualizer streams from (reference: the per-solve meshcat publishing
    in example_base.cc:81-82; see utils/liveview.LiveViewer).
    """
    sim_model = sim_model if sim_model is not None else model
    sim_contact = sim_contact if sim_contact is not None else params.contact
    assert (sim_model.nq, sim_model.nv, sim_model.nu) == (
        model.nq, model.nv, model.nu,
    ), "sim model must share the optimizer model's state/actuation layout"
    replan_period = 1.0 / cfg.controller_frequency
    h = cfg.sim_time_step
    substeps = max(1, int(round(replan_period / h)))
    num_replans = int(cfg.sim_time * cfg.controller_frequency)

    rel = np.asarray(
        cfg.q_nom_relative_to_q_init
        if cfg.q_nom_relative_to_q_init is not None
        else [False] * model.nq,
        dtype=np.float64,
    )
    Kp = jnp.asarray(np.asarray(cfg.Kp, dtype=np.float64))
    Kd = jnp.asarray(np.asarray(cfg.Kd, dtype=np.float64))

    mpc_params = make_mpc_params(params, cfg.mpc_iters)

    # Initial full solve (seeds the warm start).  model/prob/gains flow
    # through as jit arguments (captured device constants are pathological
    # on the TPU backend).
    carry, _ = jax.jit(mpc_initialize)(model, prob, params, q_guess)

    # The relative-shift mask stays a CONCRETE numpy constant (closed over,
    # not a jit arg): shift_nominal makes per-joint layout decisions with
    # it at trace time (quaternion-aware shifting).
    step_fn = jax.jit(
        lambda m, p, c, x0, t: mpc_step(m, p, mpc_params, rel, c, x0, t)
    )
    sim_fn = jax.jit(
        lambda m, stored, kp, kd, q0, v0, t: simulate_segment(
            m, sim_contact, h, substeps, stored, kp, kd, q0, v0, t,
            cfg.feed_forward,
        )
    )

    q = prob.q_init
    v = prob.v_init
    q_log, v_log, u_log, times = [], [], [], []
    solve_times = []

    for k in range(num_replans):
        t_now = k * replan_period
        x0 = jnp.concatenate([q, v])

        t0 = time.perf_counter()
        new_carry, sol = jax.block_until_ready(
            step_fn(model, prob, carry, x0, jnp.asarray(t_now))
        )
        solve_times.append(time.perf_counter() - t0)

        if on_replan is not None:
            on_replan(t_now, np.asarray(sol.q))

        # Simulate under the PREVIOUS stored trajectory (one-period delay),
        # on the SIMULATION plant (which may differ from the optimizer's).
        q, v, log = jax.block_until_ready(
            sim_fn(sim_model, carry.stored, Kp, Kd, q, v, jnp.asarray(t_now))
        )
        carry = new_carry

        q_log.append(np.asarray(log[0]))
        v_log.append(np.asarray(log[1]))
        u_log.append(np.asarray(log[2]))
        times.append(t_now + np.arange(1, substeps + 1) * h)

    # Drop the first (compile) timing when averaging.
    mean_t = float(np.mean(solve_times[1:])) if len(solve_times) > 1 else (
        float(solve_times[0])
    )
    return MpcResult(
        num_solves=num_replans,
        mean_solve_time=mean_t,
        times=np.concatenate(times) if times else np.zeros(0),
        q_log=np.concatenate(q_log) if q_log else np.zeros((0, model.nq)),
        v_log=np.concatenate(v_log) if v_log else np.zeros((0, model.nv)),
        u_log=np.concatenate(u_log) if u_log else np.zeros((0, model.nu)),
    )
