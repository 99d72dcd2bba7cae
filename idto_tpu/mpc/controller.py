"""Model-predictive controller: warm-started re-solves on device.

Functional analog of the reference's ``ModelPredictiveController`` LeafSystem
(examples/mpc_controller.cc:43-138).  One ``mpc_step`` call performs what
the reference's periodic UpdateAbstractState event does:

  1. resample the previous solution spline at shifted times as the new
     initial guess (UpdateInitialGuess, :87-97), pinning q_guess[0] = q0,
  2. shift the nominal trajectory for the DoFs marked
     ``q_nom_relative_to_q_init`` by (q0 - q_nom_old[0]) (:64-73),
  3. re-solve from the warm start with the carried trust-region radius,
  4. store the new solution spline stamped with the current time.

The whole step is one jitted function with a device-resident carry --
no host round trips inside the control loop.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from idto_tpu.mpc.trajectory_store import StoredTrajectory
from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import ProblemDefinition, SolverParameters
from idto_tpu.optimizer.solver import (
    Solution,
    WarmStart,
    solve_trust_region,
)
from idto_tpu.utils.structs import pytree_dataclass, static


@pytree_dataclass
class MpcCarry:
    """Everything persisted between re-solves (the reference's WarmStart
    object plus the stored trajectory and the shifted nominal)."""

    stored: StoredTrajectory = None
    Delta: Any = None
    q_nom: Any = None  # current (possibly shifted) nominal trajectory


def make_mpc_params(params: SolverParameters, mpc_iters: int) -> SolverParameters:
    """Per-solve iteration cap for real-time replanning (the reference's
    mpc_iters yaml knob, example_base.cc:119)."""
    return params.replace(
        max_iterations=mpc_iters, check_convergence=False
    )


def mpc_initialize(
    model: Model,
    prob: ProblemDefinition,
    params: SolverParameters,
    q_guess,
) -> tuple[MpcCarry, Solution]:
    """Initial full solve that seeds the warm start (the reference runs
    SolveTrajectoryOptimization first, example_base.cc:64-65)."""
    sol, stats, warm = solve_trust_region(model, prob, params, q_guess)
    stored = StoredTrajectory.from_solution(model, sol, 0.0, prob.dt)
    carry = MpcCarry(stored=stored, Delta=warm.Delta, q_nom=prob.q_nom)
    return carry, sol


def mpc_step(
    model: Model,
    prob: ProblemDefinition,
    mpc_params: SolverParameters,
    q_nom_relative,  # (nq,) 0/1 mask
    carry: MpcCarry,
    x0,  # (nq + nv,) current state estimate
    t_now,
) -> tuple[MpcCarry, Solution]:
    T = prob.num_steps
    nq = model.nq
    q0 = x0[:nq]
    v0 = x0[nq:]

    # 1. Warm-start guess: resample the stored spline at shifted times.
    times = t_now + jnp.arange(T + 1, dtype=x0.dtype) * prob.dt
    q_guess = jax.vmap(lambda t: carry.stored.sample_state(t)[0])(times)
    q_guess = q_guess.at[0].set(q0)

    # 2. Shift the nominal trajectory for relative DoFs.
    sel = jnp.asarray(q_nom_relative, dtype=x0.dtype)
    q_nom_new = carry.q_nom + sel * (q0 - carry.q_nom[0])

    # 3. Re-solve from the warm start (ResetInitialConditions +
    #    SolveFromWarmStart, mpc_controller.cc:76-79).
    prob_now = prob.replace(q_init=q0, v_init=v0, q_nom=q_nom_new)
    sol, stats, warm = solve_trust_region(
        model, prob_now, mpc_params, q_guess, Delta0=carry.Delta
    )

    # 4. Store the solution spline.
    stored = StoredTrajectory.from_solution(model, sol, t_now, prob.dt)
    new_carry = MpcCarry(stored=stored, Delta=warm.Delta, q_nom=q_nom_new)
    return new_carry, sol
