"""Problem definition and solver parameters.

Mirrors the reference's ``ProblemDefinition`` (optimizer/problem_definition.h)
and ``SolverParameters`` (optimizer/solver_parameters.h) surfaces, as pytree /
static config dataclasses.  Cost weights are stored as diagonal vectors (all
reference YAML configs define diagonal weights); full-matrix weights can be
expressed by pre-rotating q if ever needed.
"""
from __future__ import annotations

import enum
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from idto_tpu.contact.force import ContactParams
from idto_tpu.utils.structs import pytree_dataclass, static


@pytree_dataclass
class ProblemDefinition:
    """Everything that defines the optimization problem.

    Shapes: q_init (nq,), v_init (nv,), q_nom (T+1, nq), v_nom (T+1, nv),
    Qq/Qf_q (nq,), Qv/Qf_v/R (nv,).
    ``num_steps`` (T) and ``dt`` are static.
    """

    num_steps: int = static(default=0)
    dt: float = static(default=0.05)
    q_init: Any = None
    v_init: Any = None
    q_nom: Any = None
    v_nom: Any = None
    Qq: Any = None
    Qv: Any = None
    R: Any = None
    Qf_q: Any = None
    Qf_v: Any = None


class SolverMethod(enum.Enum):
    TRUST_REGION = "trust_region"
    LINESEARCH = "linesearch"


class LinesearchMethod(enum.Enum):
    ARMIJO = "armijo"
    BACKTRACKING = "backtracking"


class ScalingMethod(enum.Enum):
    SQRT = "sqrt"
    ADAPTIVE_SQRT = "adaptive_sqrt"
    DOUBLE_SQRT = "double_sqrt"
    ADAPTIVE_DOUBLE_SQRT = "adaptive_double_sqrt"


class GradientsMethod(enum.Enum):
    """How d(tau)/dq partials are computed (reference:
    solver_parameters.h:24-36).  AUTODIFF (exact, vmapped jacfwd) is this
    build's default -- the reference defaults to forward differences only
    because Drake autodiff re-traces the whole plant."""

    AUTODIFF = "autodiff"
    FORWARD_DIFFERENCES = "forward_differences"
    CENTRAL_DIFFERENCES = "central_differences"
    CENTRAL_DIFFERENCES4 = "central_differences4"


class LinearSolverType(enum.Enum):
    PENTA_LU = "pentadiagonal_lu"
    DENSE_LDLT = "dense_ldlt"
    # TPU-native log-depth block cyclic reduction (no reference analog; the
    # reference's only sparse solver is the serial Thomas sweep).
    CYCLIC_REDUCTION = "cyclic_reduction"


@pytree_dataclass
class ConvergenceTolerances:
    """Reference: optimizer/convergence_criteria_tolerances.h (defaults 0)."""

    rel_cost_reduction: float = static(default=0.0)
    abs_cost_reduction: float = static(default=0.0)
    rel_gradient_along_dq: float = static(default=0.0)
    abs_gradient_along_dq: float = static(default=0.0)
    rel_state_change: float = static(default=0.0)
    abs_state_change: float = static(default=0.0)


@pytree_dataclass
class SolverParameters:
    """Static solver configuration (jit-time constants).

    Defaults match the reference's solver_parameters.h:64-167.
    """

    method: SolverMethod = static(default=SolverMethod.TRUST_REGION)
    linesearch_method: LinesearchMethod = static(default=LinesearchMethod.ARMIJO)
    max_iterations: int = static(default=100)
    max_linesearch_iterations: int = static(default=50)
    linear_solver: LinearSolverType = static(default=LinearSolverType.PENTA_LU)
    gradients_method: GradientsMethod = static(default=GradientsMethod.AUTODIFF)
    normalize_quaternions: bool = static(default=False)
    exact_hessian: bool = static(default=False)
    scaling: bool = static(default=True)
    scaling_method: ScalingMethod = static(default=ScalingMethod.DOUBLE_SQRT)
    equality_constraints: bool = static(default=True)
    Delta0: float = static(default=1e-1)
    Delta_max: float = static(default=1e5)
    check_convergence: bool = static(default=False)
    tolerances: ConvergenceTolerances = static(
        default_factory=ConvergenceTolerances
    )
    contact: ContactParams = static(default_factory=ContactParams)
    verbose: bool = static(default=False)
    # Cross-check every sparse penta-diagonal solve against a dense LU solve
    # and print the relative error (reference: debug_compare_against_dense,
    # solver_parameters.h + trajectory_optimizer.cc:2142-2150).  Debug only:
    # densifies the Hessian each iteration.
    debug_compare_against_dense: bool = static(default=False)
    # Pallas fast path for LinearSolverType.CYCLIC_REDUCTION: None = auto
    # (enabled on TPU in f32), True/False = force.  The pure-JAX cyclic
    # reduction is used otherwise.
    cr_use_pallas: Optional[bool] = static(default=None)
    # Capture per-iteration wall times via an ordered host callback so
    # Stats.time / the solver_stats.csv `time` column can be populated
    # (reference: TrajectoryOptimizerStats::iteration_times).  Single-
    # scenario solves only; leave off for batched/vmapped solves.
    record_iteration_times: bool = static(default=False)


def linear_interp_nominal(
    q_start: np.ndarray, q_end: np.ndarray, num_steps: int
) -> np.ndarray:
    """Linear interpolation used for nominal trajectories and initial guesses
    (reference: example_base.cc:223-232, MakeLinearInterpolation)."""
    alphas = np.linspace(0.0, 1.0, num_steps + 1)[:, None]
    return (1 - alphas) * np.asarray(q_start)[None, :] + alphas * np.asarray(
        q_end
    )[None, :]
