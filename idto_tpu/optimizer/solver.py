"""Gauss-Newton trust-region trajectory optimizer.

Functionally equivalent to the reference's
``TrajectoryOptimizer<double>::SolveFromWarmStart``
(trajectory_optimizer.cc:2449-2651) with the same dogleg geometry
(:2108-2202), trust-ratio rule (:1979-2035), diagonal scaling (:1225-1255),
equality constraints on unactuated DoFs (:1267-1443), and convergence
criteria (:2653-2689) -- but expressed as one jitted ``lax.while_loop``:

  * the entire solve (derivatives, penta-diagonal solve, dogleg, accept /
    reject, radius update) runs on device with no host round-trips,
  * cost/gradient/Hessian are recomputed only on accepted steps via
    ``lax.cond`` (the analog of the reference's lazy cache),
  * everything vmaps over a leading scenario axis for batched solves.
"""
from __future__ import annotations

import enum
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from idto_tpu.models.kinematics import normalize_quaternions
from idto_tpu.models.model import Model
from idto_tpu.ops import cyclic_reduction, penta
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.hessian import (
    gauss_newton_hessian,
    gradient_from_partials,
)
from idto_tpu.optimizer.partials import id_partials_for, nplus_stack
from idto_tpu.optimizer.problem import (
    ProblemDefinition,
    ScalingMethod,
    SolverMethod,
    SolverParameters,
)
from idto_tpu.utils.structs import pytree_dataclass


class SolverFlag(enum.IntEnum):
    """reference: trajectory_optimizer_solution.h:16-21"""

    SUCCESS = 0
    LINESEARCH_MAX_ITERS = 1
    FACTORIZATION_FAILED = 2
    MAX_ITERATIONS = 3


class ConvergenceReason(enum.IntEnum):
    """Bitmask; reference: trajectory_optimizer_solution.h:25-31"""

    NO_CRITERIA = 0
    COST_REDUCTION = 1
    GRADIENT = 2
    STATE_CHANGE = 4


@pytree_dataclass
class Solution:
    q: Any = None  # (T+1, nq)
    v: Any = None  # (T+1, nv)
    tau: Any = None  # (T, nv)


@pytree_dataclass
class Stats:
    """Per-iteration statistics (reference: TrajectoryOptimizerStats,
    trajectory_optimizer_solution.h:57-185).  Fixed-shape arrays of length
    max_iterations; entries past `num_iters` are NaN/zero."""

    num_iters: Any = None
    cost: Any = None
    delta: Any = None
    rho: Any = None
    q_norm: Any = None
    dq_norm: Any = None
    dqH_norm: Any = None
    grad_norm: Any = None
    dL_dq: Any = None
    h_norm: Any = None
    merit: Any = None
    # Reference parity columns (trajectory_optimizer_solution.h:57-185):
    # per-iteration wall time (host-measured via the ordered iteration-mark
    # callback when params.record_iteration_times is on -- see
    # optimizer/itimer.py -- NaN otherwise), linesearch iterations (0 in
    # trust-region mode, per the reference's push_data call), and the
    # linesearch step parameter alpha (NaN in trust-region mode).
    time: Any = None
    ls_iters: Any = None
    alpha: Any = None
    solver_flag: Any = None
    convergence_reason: Any = None


@pytree_dataclass
class WarmStart:
    """Device-resident carry between MPC re-solves (reference:
    optimizer/warm_start.h:23-76 persists the state and the trust radius).
    ``dq``/``dqH`` hold the final accepted dogleg step and the final
    (physical, unscaled) Newton step, matching the introspection fields the
    reference's python bindings expose
    (python_bindings/trajectory_optimizer_py.cc:61-68)."""

    q: Any = None
    Delta: Any = None
    dq: Any = None
    dqH: Any = None


class _Prepared(NamedTuple):
    """Quantities valid at the current iterate (recomputed on accept only)."""

    cost: Any
    merit: Any
    D: Any  # (T+1, nq) scale factors
    g_merit: Any  # (T+1, nq) scaled merit gradient g~ (+ J~^T lambda)
    H: Any  # PentaBands, scaled
    factor: Any  # PentaFactorization of H
    p_newton: Any  # -H~^{-1} g~  (scaled coordinates)
    p_cauchy: Any  # -(g~^T g~ / g~^T H~ g~) g~
    h: Any  # (n_h,) constraint violations (or zeros(0))
    lam: Any  # (n_h,) Lagrange multipliers
    fact_ok: Any  # scalar bool: factorization succeeded and step is finite
    solve_ok: Any  # scalar bool: Newton solve met the residual acceptance


def _unactuated(model: Model):
    return model.unactuated_vdofs


def _constraint_jacobian_dense(model, prob, partials, unact, dtype):
    """J = dh/dq as a dense (T*n_un, T+1, nq) array.

    h stacks tau_t[unactuated] for t = 0..T-1; its rows are rows of the
    tri-diagonal dtau/dq blocks (reference: trajectory_optimizer.cc:
    1292-1334).
    """
    T = prob.num_steps
    nq = model.nq
    n_un = len(unact)
    u = jnp.array(unact, dtype=jnp.int32)
    dm = partials.dtau_dqm[:, u, :]  # (T, n_un, nq)
    dt_ = partials.dtau_dqt[:, u, :]
    dp = partials.dtau_dqp[:, u, :]
    J = jnp.zeros((T, n_un, T + 1, nq), dtype=dtype)
    t_idx = jnp.arange(T)
    # dtau_t/dq_{t-1} -> column block t-1 (zero block for t=0 handled by
    # dtau_dqm[0] == 0; scatter to column 0 is harmless since dm[0] = 0...
    # but avoid aliasing with the t=0 column block: clip and rely on dm[0]=0).
    J = J.at[t_idx, :, jnp.maximum(t_idx - 1, 0), :].add(dm)
    J = J.at[t_idx, :, t_idx, :].add(dt_)
    J = J.at[t_idx, :, t_idx + 1, :].add(dp)
    # q_0 is not a decision variable: zero its column block.
    J = J.at[:, :, 0, :].set(0.0)
    return J.reshape(T * n_un, T + 1, nq)


def _use_dense(params: SolverParameters) -> bool:
    """Static: route the linear algebra through a dense factorization
    (reference: SolverParameters::linear_solver == kDenseLdlt,
    solver_parameters.h:67-72, and the exact-Hessian testing path,
    trajectory_optimizer.cc:1465-1499 -- the exact Hessian is not
    penta-diagonal, so it forces the dense solver)."""
    from idto_tpu.optimizer.problem import LinearSolverType

    return params.exact_hessian or (
        params.linear_solver == LinearSolverType.DENSE_LDLT
    )


def _use_cr(params: SolverParameters) -> bool:
    """Static: route the sparse solve through log-depth block cyclic
    reduction instead of the sequential scan-Thomas sweep."""
    from idto_tpu.optimizer.problem import LinearSolverType

    return (not _use_dense(params)) and (
        params.linear_solver == LinearSolverType.CYCLIC_REDUCTION
    )


def _use_pallas(params: SolverParameters, dtype, n_rows=None) -> bool:
    """Static: use the FULLY-fused Pallas cyclic-reduction kernel (every
    level VMEM-resident).  Auto policy (measured crossover,
    BENCH_LINSOLVE.json, k=19 f32 on TPU v5e): batched solves at T<=40 run
    3-4x faster than scan-Thomas in the fused kernel; past 64 packed
    super-rows (T ~ 126) the working set outgrows VMEM, so the HYBRID path
    takes over (_hybrid_tail_rows: XLA levels down to 64 super-rows, one
    fused kernel for the deep tail).  `params.cr_use_pallas` forces."""
    if not _use_cr(params):
        return False
    if params.cr_use_pallas is not None:
        return params.cr_use_pallas
    if n_rows is not None:
        m = (n_rows + 1) // 2  # packed super-rows (ops/cyclic_reduction)
        mpow = 1 << max(m - 1, 0).bit_length()
        if mpow > 64:
            return False
    return jax.default_backend() == "tpu" and dtype == jnp.float32


def _hybrid_tail_rows(params: SolverParameters, dtype) -> int:
    """Static: tail size for the hybrid CR factorization on long horizons
    (ops/cyclic_reduction.factorize(tail_rows=...)).  The deep levels of
    the reduction are tiny and launch-latency-bound; fusing everything at
    or below 64 super-rows into one Pallas launch removes ~log2(64) = 6
    levels of HBM round-trips while the wide levels stay in XLA where
    bandwidth dominates anyway.  1 disables the tail (pure-XLA CR).

    Round-5 measurement (BENCH_LINSOLVE.json): the fused tail is 7.5x
    scan-Thomas at T=640 batch 1 (2.29 vs 17.3 ms) -- but this solver
    path runs VMAPPED over scenarios, and under vmap the Pallas batching
    rule keeps the whole-batch operands VMEM-resident: at 64 super-rows x
    batch 64 that is 3 x 23.6 MB of bands against a 16 MB VMEM, a
    measured compile-time OOM ("Ran out of memory in memory space vmem",
    T=160/640 batch-64 rows).  The full fused kernel (mpow <= 64, every
    reference horizon) is proven to batch 4096; past it the auto policy
    stays pure-XLA CR, and `cr_use_pallas=True` force-enables the tail
    for unvmapped long-horizon solves."""
    if params.cr_use_pallas is False:
        return 1
    if params.cr_use_pallas is True:
        return 64
    return 1  # mpow <= 64 systems take the full fused kernel upstream


def _sparse_factorize(params, Hs):
    """For the Pallas path the 'factorization' is the band matrix itself:
    the kernel fuses reduction + application per launch (reusing a
    factorization across launches would round-trip every level through
    HBM, which is exactly what the fused kernel avoids)."""
    if _use_pallas(params, Hs.C.dtype, Hs.n):
        return Hs
    if _use_cr(params):
        return cyclic_reduction.factorize(
            Hs, tail_rows=_hybrid_tail_rows(params, Hs.C.dtype)
        )
    return penta.factorize(Hs)


def _lin_solve(params, factor, rhs):
    """Solve H x = rhs; `factor` is a PentaFactorization, CRFactorization,
    PentaBands (Pallas path), or dense LU factor depending on the (static)
    solver choice.  rhs/result: (n, k)."""
    if _use_dense(params):
        # Partial-pivot LU rather than Cholesky: the exact (autodiff)
        # Hessian can be indefinite away from a minimum (the reference's
        # kDenseLdlt path uses Eigen LDLT with an explicit success check);
        # under jit a Cholesky of an indefinite matrix silently yields NaNs.
        x = jax.scipy.linalg.lu_solve(factor, rhs.reshape(-1))
        return x.reshape(rhs.shape)
    if _use_pallas(params, rhs.dtype, rhs.shape[-2]):
        from idto_tpu.ops import cr_pallas

        return cr_pallas.solve_many(factor, rhs[None])[0]
    if _use_cr(params):
        return cyclic_reduction.solve_factorized(factor, rhs)
    return penta.solve_factorized(factor, rhs)


def _lin_solve_many(params, factor, rhs_stack):
    """Solve H X = rhs for a stack (R, n, k) of right-hand sides.  The
    Pallas path amortizes one fused factorization over all R columns in a
    single kernel launch (used by the equality-constraint Schur solve,
    reference: trajectory_optimizer.cc:1371-1396)."""
    if _use_pallas(params, rhs_stack.dtype, rhs_stack.shape[-2]):
        from idto_tpu.ops import cr_pallas

        return cr_pallas.solve_many(factor, rhs_stack)
    return jax.vmap(lambda r: _lin_solve(params, factor, r))(rhs_stack)


def _lin_matvec(params, H, x):
    if _use_dense(params):
        return (H @ x.reshape(-1)).reshape(x.shape)
    return penta.matvec(H, x)


def _exact_hessian_dense(model, prob, params, q):
    """Exact (autodiff) Hessian of the cost, dense, with the q_0 block
    pinned to identity (reference: CalcExactHessian,
    trajectory_optimizer.cc:1465-1499; testing only)."""
    contact = params.contact
    nq = model.nq

    def cost_flat(qf):
        return trajectory.cost(
            model, prob, contact, qf.reshape(prob.num_steps + 1, nq)
        )

    Hd = jax.hessian(cost_flat)(q.reshape(-1))
    Hd = Hd.at[:nq, :].set(0.0).at[:, :nq].set(0.0)
    Hd = Hd.at[:nq, :nq].set(jnp.eye(nq, dtype=q.dtype))
    return Hd


def _scale_factors_from_diag(diag, method: ScalingMethod, D_prev):
    """D from the Hessian diagonal (reference: CalcScaleFactors,
    trajectory_optimizer.cc:1225-1255).  Adaptive variants (More 1983)
    take the running minimum against the previous iteration's D, which is
    carried in the solve loop state (seeded with ones, so the first
    iteration coincides with the non-adaptive rule)."""
    safe = jnp.maximum(diag, 1e-30)
    if method in (ScalingMethod.SQRT, ScalingMethod.ADAPTIVE_SQRT):
        d = 1.0 / jnp.sqrt(safe)
    else:
        d = 1.0 / jnp.sqrt(jnp.sqrt(safe))
    if method in (ScalingMethod.ADAPTIVE_SQRT,
                  ScalingMethod.ADAPTIVE_DOUBLE_SQRT):
        return jnp.minimum(D_prev, d)
    return jnp.minimum(1.0, d)


def _prepare(model, prob, params: SolverParameters, q, D_prev=None) -> _Prepared:
    """Compute every iterate-dependent quantity the trust-region step needs.

    v/tau are computed once and shared by the cost, the constraint
    violations, and the gradient; the gradient is assembled from the same
    dtau/dq partials as the Hessian (reference CalcGradient/CalcHessian
    share EvalInverseDynamicsPartials the same way)."""
    contact = params.contact
    v = trajectory.velocities(model, prob, q)
    a = trajectory.accelerations(prob, v)
    tau = jax.vmap(
        lambda qn, vn, an: trajectory.step_tau(model, contact, qn, vn, an)
    )(q[1:], v[1:], a)
    cost = trajectory.cost(model, prob, contact, q, tau=tau, v=v)

    parts = id_partials_for(model, prob, params, q)
    nplus = nplus_stack(model, q)
    return _prepare_from_physics(
        model, prob, params, q, D_prev, cost, v, tau, parts, nplus
    )


def _prepare_from_physics(
    model, prob, params: SolverParameters, q, D_prev, cost, v, tau, parts,
    nplus,
) -> _Prepared:
    """The linear-algebra tail of :func:`_prepare`: gradient/Hessian
    assembly, scaling, factorization, constraint Schur solve, and the
    Newton/Cauchy steps, from already-evaluated physics quantities.  Split
    out so the batch-native solve (optimizer/batched.py) can feed SoA
    rollouts/partials in and vmap only this cheap tail."""
    g = gradient_from_partials(model, prob, parts, nplus, q, v, tau)

    if D_prev is None:
        D_prev = jnp.ones_like(q)

    if _use_dense(params):
        # Dense path: exact AD Hessian (testing) or the GN Hessian
        # densified (reference kDenseLdlt debug fallback).
        if params.exact_hessian:
            Hd = _exact_hessian_dense(model, prob, params, q)
        else:
            Hd = penta.to_dense(
                gauss_newton_hessian(model, prob, parts, nplus)
            )
        diag = jnp.diagonal(Hd).reshape(q.shape)
        if params.scaling:
            D = _scale_factors_from_diag(diag, params.scaling_method, D_prev)
            Df = D.reshape(-1)
            Hs = Df[:, None] * Hd * Df[None, :]
            gs = D * g
        else:
            D = jnp.ones_like(g)
            Hs = Hd
            gs = g
        factor = jax.scipy.linalg.lu_factor(Hs)
    else:
        H = gauss_newton_hessian(model, prob, parts, nplus)
        if params.scaling:
            D = _scale_factors_from_diag(
                penta.extract_diagonal(H), params.scaling_method, D_prev
            )
            Hs = penta.scale_by_diagonal(H, D)
            gs = D * g
        else:
            D = jnp.ones_like(g)
            Hs = H
            gs = g
        factor = _sparse_factorize(params, Hs)

    unact = _unactuated(model)
    n_h = prob.num_steps * len(unact)
    if params.equality_constraints and n_h > 0:
        h = tau[:, jnp.array(unact, dtype=jnp.int32)].reshape(-1)
        J = _constraint_jacobian_dense(model, prob, parts, unact, q.dtype)
        Js = J * D[None, :, :]  # J~ = J D
        # Lagrange multipliers: (J~ H~^-1 J~^T) lam = h - J~ H~^-1 g~
        # (reference: trajectory_optimizer.cc:1371-1396).  All n_h + 1
        # solves share one factorization (single fused launch on the
        # Pallas path).
        sols = _lin_solve_many(
            params, factor, jnp.concatenate([gs[None], Js], axis=0)
        )
        Hinv_g, Hinv_JT = sols[0], sols[1:]
        S = jnp.einsum("anq,bnq->ab", Js, Hinv_JT)
        rhs = h - jnp.einsum("anq,nq->a", Js, Hinv_g)
        lam = jnp.linalg.solve(S, rhs)
        g_merit = gs + jnp.einsum("anq,a->nq", Js, lam)
        merit = cost + h @ lam
    else:
        h = jnp.zeros(0, dtype=q.dtype)
        lam = jnp.zeros(0, dtype=q.dtype)
        g_merit = gs
        merit = cost

    p_newton = -_lin_solve(params, factor, g_merit)
    if params.debug_compare_against_dense and not _use_dense(params):
        # Reference: debug_compare_against_dense re-solves the scaled system
        # densely and reports the relative difference
        # (trajectory_optimizer.cc:2142-2150).
        Hd = penta.to_dense(Hs)
        x_dense = jnp.linalg.solve(Hd, -g_merit.reshape(-1)).reshape(
            g_merit.shape
        )
        err = jnp.linalg.norm(p_newton - x_dense) / jnp.maximum(
            jnp.linalg.norm(x_dense), jnp.finfo(x_dense.dtype).tiny
        )
        jax.debug.print(
            "[debug] sparse vs. dense solve relative error: {e:.3e}", e=err
        )
    Hg = _lin_matvec(params, Hs, g_merit)
    gg = jnp.sum(g_merit * g_merit)
    gHg = jnp.sum(g_merit * Hg)
    p_cauchy = -(gg / jnp.maximum(gHg, 1e-300)) * g_merit

    # ---- Newton-step acceptance + per-scenario containment ----
    # In reduced precision the log-depth CR solve can DEGRADE without its
    # factorization reporting failure: finite factors, finite step, but a
    # solution so wrong that the dogleg step blows the merit up to inf and
    # poisons the trust ratio (observed: f32/TPU, batch 4096, chained warm
    # starts -- one scenario's second solve returned rho = NaN and killed
    # the round-4 bench).  The reference can afford to abort the process on
    # a non-descent direction (trajectory_optimizer.cc:2528-2538); a
    # batched device solve cannot, so contain it per scenario: accept the
    # Newton step only if its residual is small relative to the gradient,
    # otherwise take the (always well-defined, descent) Cauchy step for
    # this iteration and report the degradation via `solve_ok` -> the
    # FACTORIZATION_FAILED solver flag.  Calibration of the acceptance
    # threshold against healthy f32 CR residuals on real cheetah/spinner
    # Hessians: scripts/bench_f32_accept.py (BENCH_F32_ACCEPT.json).
    res = _lin_matvec(params, Hs, p_newton) + g_merit
    rel_res = jnp.sqrt(jnp.sum(res * res)) / jnp.sqrt(
        jnp.maximum(gg, jnp.finfo(q.dtype).tiny)
    )
    # Catastrophe-only thresholds: a backward-stable banded solve has
    # rel_res ~ eps * cond(H~), so healthy f32 solves on the scaled
    # (cond ~1e4-1e6) Hessian legitimately reach ~1e-3..1e-1; the failure
    # being contained is orders of magnitude past 1 (it drove the merit to
    # inf).  f64 has ~9 extra digits of slack.
    rtol = 0.25 if q.dtype == jnp.float32 else 1e-6
    solve_ok = jnp.logical_and(
        jnp.all(jnp.isfinite(p_newton)), rel_res < rtol
    )
    p_newton = jnp.where(solve_ok, p_newton, p_cauchy)

    # Factorization-failure detection (reference: the per-block solver
    # success check in PentaDiagonalFactorization::Factorize,
    # penta_diagonal_solver.h:16-22, DRAKE_DEMANDed at the call sites).
    # A singular block yields inf/nan in the stored factors and/or in the
    # Newton step; both are checked so the dense-LU path (finite factors,
    # zero pivot) is covered too.  After the containment above p_newton is
    # the step actually taken (Newton or Cauchy fallback) -- if even that
    # is non-finite (gradient itself non-finite) the iterate is
    # unrecoverable and fact_ok terminates the scenario.
    if _use_dense(params) or _use_pallas(params, q.dtype, q.shape[0]):
        # Dense LU: finite factors even for singular inputs (zero pivot);
        # Pallas: the 'factor' is the band matrix itself.  Both are covered
        # by the Newton-step finiteness check below.
        fact_ok = jnp.asarray(True)
    elif _use_cr(params):
        fact_ok = cyclic_reduction.factorization_status(factor)
    else:
        fact_ok = penta.factorization_status(factor)
    fact_ok = jnp.logical_and(fact_ok, jnp.all(jnp.isfinite(p_newton)))

    return _Prepared(
        cost=cost,
        merit=merit,
        D=D,
        g_merit=g_merit,
        H=Hs,
        factor=factor,
        p_newton=p_newton,
        p_cauchy=p_cauchy,
        h=h,
        lam=lam,
        fact_ok=fact_ok,
        solve_ok=solve_ok,
    )


def _dogleg(prep: _Prepared, Delta):
    """Dogleg step (reference: CalcDoglegPoint,
    trajectory_optimizer.cc:2108-2202).  Returns (dq_scaled, dq,
    boundary_active); dq_scaled is in the scaled coordinates the quadratic
    model lives in, dq = D * dq_scaled is the physical update."""
    pU = prep.p_cauchy / Delta  # Delta-normalized, per the reference
    pH = prep.p_newton / Delta
    pU_norm = jnp.sqrt(jnp.sum(pU * pU))
    pH_norm = jnp.sqrt(jnp.sum(pH * pH))

    # Candidate 1: first leg hits the boundary.
    dq1 = (Delta / jnp.maximum(pU_norm, 1e-300)) * pU

    # Candidate 2: full Newton step inside the region.
    dq2 = pH * Delta

    # Candidate 3: second-leg / boundary intersection
    # (SolveDoglegQuadratic, :2037-2066).
    diff = pH - pU
    a = jnp.sum(diff * diff)
    b = 2.0 * jnp.sum(pU * diff)
    c = jnp.sum(pU * pU) - 1.0
    a_safe = jnp.maximum(a, 1e-300)
    det = jnp.maximum((b / a_safe) ** 2 - 4.0 * (c / a_safe), 0.0)
    s_quad = (-(b / a_safe) + jnp.sqrt(det)) / 2.0
    s_lin = -c / jnp.where(b == 0, 1.0, b)
    s = jnp.where(a < jnp.finfo(Delta.dtype).eps, s_lin, s_quad)
    dq3 = (pU + s * diff) * Delta

    first_leg = pU_norm >= 1.0
    newton_inside = pH_norm <= 1.0
    dq_scaled = jnp.where(
        first_leg, dq1, jnp.where(newton_inside, dq2, dq3)
    )
    boundary_active = jnp.logical_or(
        first_leg, jnp.logical_not(newton_inside)
    )
    return dq_scaled, prep.D * dq_scaled, boundary_active


def _merit_at(model, prob, params, q_try, lam):
    """(merit, cost) at q_try with frozen multipliers: phi = L + h^T lam_k
    (reference: CalcTrustRatio, trajectory_optimizer.cc:1988-2006)."""
    contact = params.contact
    unact = _unactuated(model)
    v = trajectory.velocities(model, prob, q_try)
    a = trajectory.accelerations(prob, v)
    tau = jax.vmap(
        lambda qn, vn, an: trajectory.step_tau(model, contact, qn, vn, an)
    )(q_try[1:], v[1:], a)
    cost = trajectory.cost(model, prob, contact, q_try, tau=tau, v=v)
    if params.equality_constraints and len(unact) > 0 and lam.shape[0] > 0:
        h = tau[:, jnp.array(unact, dtype=jnp.int32)].reshape(-1)
        return cost + h @ lam, cost
    return cost, cost


def _add_to_q(model, params, q, dq):
    q_new = q + dq
    if params.normalize_quaternions:
        q_new = normalize_quaternions(model, q_new)
    return q_new


class _LoopState(NamedTuple):
    k: Any
    q: Any
    Delta: Any
    prev_cost: Any
    reason: Any
    done: Any
    failed: Any  # factorization failure latch
    D: Any  # previous scale factors (adaptive scaling carry)
    dq_last: Any  # last dogleg step (physical coords) for WarmStart.dq
    dqH_last: Any  # last full Newton step (physical coords) for WarmStart.dqH
    stats: Stats


def _print_iter_row(k, cost, merit, Delta, rho, dq_norm, g_norm, h_norm):
    """Host-side verbose printer (reference: the per-iteration console table,
    trajectory_optimizer.cc:2486-2492 & 2570-2583 -- header reprinted every
    50 rows)."""
    k = int(k)
    if k % 50 == 0:
        print(
            f"{'iter':>5} | {'cost':>12} | {'merit':>12} | {'Delta':>9} | "
            f"{'rho':>9} | {'||dq||':>9} | {'||g||':>9} | {'||h||':>9}"
        )
        print("-" * 94)
    print(
        f"{k:>5} | {float(cost):>12.6g} | {float(merit):>12.6g} | "
        f"{float(Delta):>9.3g} | {float(rho):>9.3g} | "
        f"{float(dq_norm):>9.3g} | {float(g_norm):>9.3g} | "
        f"{float(h_norm):>9.3g}"
    )


def _empty_stats(max_iters, dtype):
    nan = jnp.full(max_iters, jnp.nan, dtype=dtype)
    return Stats(
        num_iters=jnp.zeros((), jnp.int32),
        cost=nan, delta=nan, rho=nan, q_norm=nan, dq_norm=nan,
        dqH_norm=nan, grad_norm=nan, dL_dq=nan, h_norm=nan, merit=nan,
        time=nan, alpha=nan,
        ls_iters=jnp.zeros(max_iters, jnp.int32),
        solver_flag=jnp.zeros((), jnp.int32),
        convergence_reason=jnp.zeros((), jnp.int32),
    )


def solve_trust_region(
    model: Model,
    prob: ProblemDefinition,
    params: SolverParameters,
    q_guess,
    Delta0=None,
):
    """Full trust-region solve from an initial guess.

    Returns (Solution, Stats, WarmStart).  jit-able; vmap over a leading
    batch axis for scenario parallelism.
    """
    dtype = q_guess.dtype
    Delta = jnp.asarray(
        params.Delta0 if Delta0 is None else Delta0, dtype=dtype
    )
    eta = 0.0  # acceptance threshold (reference :2476-2477)
    eps_guard = 10 * jnp.finfo(dtype).eps / prob.dt / prob.dt

    q0 = q_guess

    def cond(s: _LoopState):
        return jnp.logical_and(s.k < params.max_iterations, ~s.done)

    def body(s: _LoopState):
        # Derivatives are recomputed at the top of every iteration (a
        # rejected step recomputes unchanged quantities -- a small runtime
        # cost that keeps exactly ONE trace of the expensive derivative
        # graph in the compiled loop, unlike a lazy-cache formulation).
        prep = _prepare(model, prob, params, s.q, s.D)
        dq_scaled, dq, boundary_active = _dogleg(prep, s.Delta)

        # ---- trust ratio (reference: CalcTrustRatio) ----
        q_try = _add_to_q(model, params, s.q, dq)
        merit_try, cost_try = _merit_at(model, prob, params, q_try, prep.lam)
        Hdq = _lin_matvec(params, prep.H, dq_scaled)
        predicted = -jnp.sum(prep.g_merit * dq_scaled) - 0.5 * jnp.sum(
            dq_scaled * Hdq
        )
        actual = prep.merit - merit_try
        rho = jnp.where(
            jnp.logical_and(predicted < eps_guard, actual < eps_guard),
            0.5,
            actual / predicted,
        )
        # Non-finite trust ratio (inf merit at a degenerate trial point,
        # 0/0, ...): the step is unusable -- record a finite rho = -1 so
        # the step is rejected and the radius shrinks, instead of writing
        # NaN into the stats (reference noise guard:
        # trajectory_optimizer.cc:1979-2035; the reference additionally
        # aborts on a non-descent direction at :2528-2538, which a batched
        # device solve must survive instead).
        rho = jnp.where(jnp.isfinite(rho), rho, -1.0)

        # A failed factorization (singular/ill-conditioned Hessian block)
        # poisons dq; never take such a step, terminate, and surface
        # SolverFlag.FACTORIZATION_FAILED (reference DRAKE_DEMANDs here).
        accept = jnp.logical_and(rho > eta, prep.fact_ok)
        q_new = jnp.where(accept, q_try, s.q)

        # ---- statistics ----
        dq_norm = jnp.linalg.norm(dq)
        st = s.stats
        k = s.k
        st = st.replace(
            cost=st.cost.at[k].set(prep.cost),
            delta=st.delta.at[k].set(s.Delta),
            rho=st.rho.at[k].set(rho),
            q_norm=st.q_norm.at[k].set(jnp.linalg.norm(s.q)),
            dq_norm=st.dq_norm.at[k].set(dq_norm),
            dqH_norm=st.dqH_norm.at[k].set(jnp.linalg.norm(prep.p_newton)),
            grad_norm=st.grad_norm.at[k].set(jnp.linalg.norm(prep.g_merit)),
            dL_dq=st.dL_dq.at[k].set(
                jnp.sum(prep.g_merit * dq_scaled) / prep.cost
            ),
            h_norm=st.h_norm.at[k].set(
                jnp.linalg.norm(prep.h) if prep.h.shape[0] else 0.0
            ),
            merit=st.merit.at[k].set(prep.merit),
            # Trust-region mode: ls_iters = 0, alpha = NaN, exactly as the
            # reference records them (trajectory_optimizer.cc:2586-2598).
            # ls_iters is already 0 and alpha already NaN in _empty_stats.
        )
        if params.record_iteration_times:
            # Ordered host mark; itimer converts marks to per-iteration
            # durations (reference measures iter_time at the same point,
            # trajectory_optimizer.cc:2567-2568).  Single-scenario only --
            # under vmap the callback would fire once for the whole batch.
            from idto_tpu.optimizer import itimer

            jax.debug.callback(itimer.mark, ordered=True)

        if params.verbose:
            # Live console table (single-scenario solves; under vmap the
            # callback would receive batched scalars, so batched solves
            # should leave verbose off and print Stats post-hoc).
            jax.debug.callback(
                _print_iter_row,
                s.k, prep.cost, prep.merit, s.Delta, rho, dq_norm,
                jnp.linalg.norm(prep.g_merit),
                jnp.linalg.norm(prep.h) if prep.h.shape[0] else jnp.zeros((), dtype),
                ordered=True,
            )

        # ---- convergence (only on accepted steps; reference :2600-2611) ----
        reason = jnp.zeros((), jnp.int32)
        if params.check_convergence:
            tol = params.tolerances
            cost_new = jnp.where(accept, cost_try, prep.cost)
            crit_cost = jnp.abs(s.prev_cost - cost_new) < (
                tol.abs_cost_reduction + tol.rel_cost_reduction * cost_new
            )
            crit_grad = jnp.abs(jnp.sum(prep.g_merit * dq_scaled)) < (
                tol.abs_gradient_along_dq
                + tol.rel_gradient_along_dq * prep.cost
            )
            crit_state = dq_norm < (
                tol.abs_state_change
                + tol.rel_state_change * jnp.linalg.norm(s.q)
            )
            reason = jnp.where(accept, (
                crit_cost.astype(jnp.int32) * ConvergenceReason.COST_REDUCTION
                + crit_grad.astype(jnp.int32) * ConvergenceReason.GRADIENT
                + crit_state.astype(jnp.int32) * ConvergenceReason.STATE_CHANGE
            ), 0)
        done = jnp.logical_or(reason > 0, ~prep.fact_ok)

        # ---- trust region update (reference :2613-2622) ----
        Delta_new = jnp.where(
            rho < 0.25,
            s.Delta * 0.25,
            jnp.where(
                jnp.logical_and(rho > 0.75, boundary_active),
                jnp.minimum(2.0 * s.Delta, params.Delta_max),
                s.Delta,
            ),
        )
        Delta_new = jnp.where(done, s.Delta, Delta_new)

        prev_cost = jnp.where(accept, cost_try, prep.cost)
        return _LoopState(
            k=s.k + 1,
            q=q_new,
            Delta=Delta_new,
            prev_cost=prev_cost,
            reason=reason,
            done=done,
            # A degraded-but-contained Newton solve (Cauchy fallback taken,
            # prep.solve_ok False) is latched into the same flag: the solve
            # continues, but the caller learns the linear solver misbehaved.
            failed=jnp.logical_or(
                s.failed, jnp.logical_or(~prep.fact_ok, ~prep.solve_ok)
            ),
            D=prep.D,
            dq_last=dq,
            dqH_last=prep.D * prep.p_newton,
            stats=st,
        )

    # Seed every carry element (except the shared iteration counter) with a
    # dependence on q0.  Under vmap, jax batches while_loop by a fixed-point
    # over which carry elements are batched, RE-TRACING the (expensive) body
    # once per round; starting fully batched collapses that to one round.
    zb = jnp.sum(q0) * 0.0
    zb_i = zb.astype(jnp.int32)
    stats0 = _empty_stats(params.max_iterations, dtype)
    stats0 = jax.tree.map(lambda x: x + x.dtype.type(0) * zb.astype(x.dtype)
                          if jnp.issubdtype(x.dtype, jnp.floating) else x + zb_i.astype(x.dtype),
                          stats0)
    init = _LoopState(
        k=jnp.zeros((), jnp.int32),
        q=q0,
        Delta=Delta + zb,
        # NaN sentinel: the cost-reduction criterion cannot fire on the
        # first iteration (the reference uses the initial cost instead;
        # avoiding that saves a full cost trace before the loop).
        prev_cost=jnp.asarray(jnp.nan, dtype=dtype) + zb,
        reason=jnp.zeros((), jnp.int32) + zb_i,
        done=jnp.zeros((), bool) ^ (zb_i > 0),
        failed=jnp.zeros((), bool) ^ (zb_i > 0),
        D=jnp.ones_like(q0) + zb,
        dq_last=jnp.zeros_like(q0) + zb,
        dqH_last=jnp.zeros_like(q0) + zb,
        stats=stats0,
    )
    final = jax.lax.while_loop(cond, body, init)

    q = final.q
    contact = params.contact
    v = trajectory.velocities(model, prob, q)
    tau = trajectory.generalized_forces(model, prob, contact, q)
    flag = jnp.where(
        final.failed,
        jnp.int32(SolverFlag.FACTORIZATION_FAILED),
        jnp.where(
            final.reason > 0,
            jnp.int32(SolverFlag.SUCCESS),
            jnp.where(
                final.k >= params.max_iterations,
                jnp.int32(SolverFlag.MAX_ITERATIONS),
                jnp.int32(SolverFlag.SUCCESS),
            ),
        ),
    )
    stats = final.stats.replace(
        num_iters=final.k,
        solver_flag=flag,
        convergence_reason=final.reason,
    )
    solution = Solution(q=q, v=v, tau=tau)
    warm = WarmStart(
        q=q, Delta=final.Delta, dq=final.dq_last, dqH=final.dqH_last
    )
    return solution, stats, warm


def solve(model, prob, params, q_guess):
    """Reference ``TrajectoryOptimizer::Solve`` analog
    (trajectory_optimizer.cc:2213-2234): solve from a fresh trust region."""
    if params.method == SolverMethod.LINESEARCH:
        from idto_tpu.optimizer.linesearch import solve_linesearch

        return solve_linesearch(model, prob, params, q_guess)
    return solve_trust_region(model, prob, params, q_guess)


def solve_from_warm_start(model, prob, params, warm: WarmStart):
    """Reference ``SolveFromWarmStart`` (:2449): resume with the carried
    trust-region radius; q_0 of the carried trajectory must already be
    reset to the measured state (ResetInitialConditions analog)."""
    return solve_trust_region(model, prob, params, warm.q, Delta0=warm.Delta)
