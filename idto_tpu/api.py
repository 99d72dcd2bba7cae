"""Object-oriented convenience API mirroring the reference's ``pyidto``
python bindings (python_bindings/trajectory_optimizer_py.cc:30-68):
``TrajectoryOptimizer`` with Solve / CreateWarmStart / SolveFromWarmStart /
ResetInitialConditions / UpdateNominalTrajectory, and a mutable
``WarmStart`` exposing q, Delta, dq, dqH.

The functional core (idto_tpu.optimizer.solver) stays pure; this wrapper
adds the stateful surface users of the reference bindings expect, while
keeping a persistent jit cache across re-solves.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import ProblemDefinition, SolverParameters
from idto_tpu.optimizer import solver as _solver


class WarmStart:
    """Mutable warm-start handle (reference: python_bindings WarmStart with
    set_q / get_q / Delta / dq / dqH)."""

    def __init__(self, q, Delta):
        self.q = jnp.asarray(q)
        self.Delta = float(Delta)
        # Populated after each solve: the final dogleg step and the final
        # (unscaled) Newton step (reference exposes both live,
        # python_bindings/trajectory_optimizer_py.cc:61-68).
        self.dq = np.zeros_like(np.asarray(q))
        self.dqH = np.zeros_like(np.asarray(q))

    def set_q(self, q):
        self.q = jnp.asarray(q)

    def get_q(self):
        return np.asarray(self.q)


class TrajectoryOptimizer:
    def __init__(
        self,
        model: Model,
        prob: ProblemDefinition,
        params: Optional[SolverParameters] = None,
    ):
        self.model = model
        self._prob = prob
        self._params = params or SolverParameters()
        # model/prob/params flow through as jit arguments (captured device
        # constants are pathological on the TPU backend).
        self._solve_jit = jax.jit(
            lambda m, p, prm, qg, d0: _solver.solve_trust_region(
                m, p, prm, qg, Delta0=d0
            )
        )

    # -- reference-parity accessors --
    @property
    def prob(self) -> ProblemDefinition:
        return self._prob

    @property
    def params(self) -> SolverParameters:
        return self._params

    def time_step(self) -> float:
        return self._prob.dt

    def num_steps(self) -> int:
        return self._prob.num_steps

    # -- solving --
    def Solve(self, q_guess):
        """Solve from scratch; q_guess is (T+1, nq) (or a list of rows)."""
        q_guess = jnp.asarray(np.asarray(q_guess))
        if self._params.method.value == "linesearch":
            from idto_tpu.optimizer.linesearch import solve_linesearch

            sol, stats, _ = jax.jit(solve_linesearch)(
                self.model, self._prob, self._params, q_guess
            )
            return sol, stats
        sol, stats, _ = self._solve_jit(
            self.model, self._prob, self._params, q_guess,
            jnp.asarray(self._params.Delta0),
        )
        return sol, stats

    def CreateWarmStart(self, q_guess) -> WarmStart:
        return WarmStart(np.asarray(q_guess), self._params.Delta0)

    def SolveFromWarmStart(self, warm_start: WarmStart):
        sol, stats, ws = self._solve_jit(
            self.model, self._prob, self._params, warm_start.q,
            jnp.asarray(warm_start.Delta),
        )
        warm_start.q = ws.q
        warm_start.Delta = float(ws.Delta)
        warm_start.dq = np.asarray(ws.dq)
        warm_start.dqH = np.asarray(ws.dqH)
        return sol, stats

    def ResetInitialConditions(self, q0, v0) -> None:
        self._prob = self._prob.replace(
            q_init=jnp.asarray(np.asarray(q0)),
            v_init=jnp.asarray(np.asarray(v0)),
        )

    def UpdateNominalTrajectory(self, q_nom, v_nom) -> None:
        self._prob = self._prob.replace(
            q_nom=jnp.asarray(np.asarray(q_nom)),
            v_nom=jnp.asarray(np.asarray(v_nom)),
        )
