"""Batch-native trust-region solve -- the TPU scenario-parallel fast path.

``parallel.batching.solve_batch`` originally vmapped the per-scenario
:func:`idto_tpu.optimizer.solver.solve_trust_region`.  Under vmap the
physics pipeline keeps its per-scenario array layouts -- spatial math with
trailing ``(3,)``/``(3, 3)`` axes -- which tile onto the TPU's (8, 128)
vector registers at ~2% lane utilization (see ``idto_tpu/soa/__init__``);
round 3 measured the resulting derivative phase at 93% of iteration time
and 0.04% MFU.

This module re-expresses the SAME algorithm (reference:
``TrajectoryOptimizer<double>::SolveFromWarmStart``,
trajectory_optimizer.cc:2449-2651) with the scenario axis native:

  * all physics -- rollouts, cost, the dtau/dq partials -- run through the
    SoA pipeline with one flat (scenarios x timesteps [x tangents])
    instance axis on the vector lanes (``idto_tpu/soa``),
  * the cheap linear-algebra tail (gradient/Hessian einsum assembly,
    scaling, banded factorization, dogleg) is vmapped from
    ``solver._prepare_from_physics`` -- einsums and scans batch well,
  * the ``lax.while_loop`` carries per-scenario (B,) scalars and masks
    carry updates with each scenario's own continue-predicate, which is
    exactly the batching rule jax applies to a vmapped while_loop -- so
    results match ``vmap(solve_trust_region)`` bit-for-bit in expectation
    and to tight tolerance in practice (pinned by tests/test_batched.py).

Semantics intentionally identical to the vmapped path; no new knobs.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idto_tpu.models.kinematics import normalize_quaternions
from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import (
    GradientsMethod,
    LinearSolverType,
    ProblemDefinition,
    SolverMethod,
    SolverParameters,
)
from idto_tpu.ops import penta
from idto_tpu.optimizer.solver import (
    ConvergenceReason,
    Solution,
    SolverFlag,
    Stats,
    WarmStart,
    _dogleg,
    _lin_matvec,
    _LoopState,
    _prepare_from_physics,
    _unactuated,
    _use_cr,
    _use_dense,
)
from idto_tpu.soa import contact as soa_contact
from idto_tpu.soa import partials as soa_partials
from idto_tpu.soa import rollout


def can_solve_batched_native(model: Model, params: SolverParameters) -> bool:
    """Static: the batch-native path covers this configuration.

    Falls back to ``vmap(solve_trust_region)`` for linesearch mode,
    finite-difference partials, dense/exact-Hessian debugging paths,
    host-callback features (verbose table, iteration timing -- both are
    per-scenario printers), and models whose contact-pair set has no SoA
    kernel yet."""
    return (
        soa_contact.supports_soa(model)
        and params.method == SolverMethod.TRUST_REGION
        and params.gradients_method == GradientsMethod.AUTODIFF
        and not _use_dense(params)
        and not params.verbose
        and not params.record_iteration_times
        and not params.debug_compare_against_dense
    )


def _bnorm(x):
    """Per-scenario L2 norm: (B, ...) -> (B,)."""
    return jnp.sqrt(jnp.sum(x * x, axis=tuple(range(1, x.ndim))))


def _bdot(x, y):
    return jnp.sum(x * y, axis=tuple(range(1, x.ndim)))


def _mask_tree(active, new, old):
    """Per-scenario select over a carry pytree (leaves lead with B)."""

    def sel(n, o):
        a = active.reshape(active.shape + (1,) * (n.ndim - 1))
        return jnp.where(a, n, o)

    return jax.tree.map(sel, new, old)


def _empty_stats_batched(B, max_iters, dtype):
    nan = jnp.full((B, max_iters), jnp.nan, dtype=dtype)
    return Stats(
        num_iters=jnp.zeros(B, jnp.int32),
        cost=nan, delta=nan, rho=nan, q_norm=nan, dq_norm=nan,
        dqH_norm=nan, grad_norm=nan, dL_dq=nan, h_norm=nan, merit=nan,
        time=nan, alpha=nan,
        ls_iters=jnp.zeros((B, max_iters), jnp.int32),
        solver_flag=jnp.zeros(B, jnp.int32),
        convergence_reason=jnp.zeros(B, jnp.int32),
    )


def _prepare_batched(model, probs, params, qs, D_prev):
    """Batch-native analog of ``solver._prepare``: SoA physics for the
    whole batch at once, vmapped linear-algebra tail."""
    contact = params.contact
    tau, v = rollout.generalized_forces(model, probs, contact, qs)
    cost = rollout.cost(model, probs, contact, qs, tau=tau, v=v)
    parts = soa_partials.id_partials_batched(model, probs, contact, qs)
    nplus = soa_partials.nplus_stack_batched(model, qs)
    return jax.vmap(
        lambda prob, q, D, c, vv, tt, pp, npl: _prepare_from_physics(
            model, prob, params, q, D, c, vv, tt, pp, npl
        )
    )(probs, qs, D_prev, cost, v, tau, parts, nplus)


def _merit_at_batched(model, probs, params, q_try, lam):
    """(merit, cost) at q_try with frozen multipliers, whole batch
    (reference: CalcTrustRatio, trajectory_optimizer.cc:1988-2006)."""
    contact = params.contact
    tau, v = rollout.generalized_forces(model, probs, contact, q_try)
    cost = rollout.cost(model, probs, contact, q_try, tau=tau, v=v)
    unact = _unactuated(model)
    if params.equality_constraints and len(unact) > 0 and lam.shape[-1] > 0:
        h = tau[:, :, jnp.array(unact, dtype=jnp.int32)].reshape(
            tau.shape[0], -1
        )
        return cost + jnp.sum(h * lam, axis=1), cost
    return cost, cost


def _rescue_degraded_solves(params: SolverParameters, prep):
    """Second-chance Newton solve for scenarios whose fast linear solve
    was rejected by the residual acceptance.

    The per-scenario containment in ``solver._prepare_from_physics``
    replaces a degraded Newton step with the Cauchy step -- safe, but it
    costs Newton quality exactly where it matters (f32 cyclic reduction
    degrades by orders of magnitude on contact-stiff converged iterates:
    measured rel_res O(10) where scan-Thomas stays ~1e-3 on the same
    scaled cheetah Hessian, BENCH_F32_ACCEPT.json).  Here the batch gets a
    scan-Thomas re-solve under a BATCH-LEVEL ``lax.cond``: zero device
    work in the common all-healthy case, one batched Thomas solve when any
    scenario degraded.  Scenarios whose re-solve passes the same residual
    acceptance get their Newton step (and ``solve_ok``) back; the rest
    keep the Cauchy fallback.  (The equality-constraint multipliers are
    not re-solved -- they perturb the merit gradient, not the step's
    well-posedness.)

    This batch-level conditional is only expressible on the batch-native
    path: under ``vmap(solve_trust_region)`` a ``lax.cond`` runs both
    branches for every scenario, which would pay the Thomas solve
    unconditionally and erase the fast solver's advantage.
    """
    if _use_dense(params) or not _use_cr(params):
        return prep  # scan-Thomas is already the primary solver
    dtype = prep.p_newton.dtype
    rtol = 0.25 if dtype == jnp.float32 else 1e-6
    B = prep.solve_ok.shape[0]
    tiny = jnp.finfo(dtype).tiny

    def resolve(_):
        x = jax.vmap(lambda H, g: -penta.solve(H, g))(prep.H, prep.g_merit)
        res = jax.vmap(penta.matvec)(prep.H, x) + prep.g_merit
        rel = _bnorm(res) / jnp.sqrt(
            jnp.maximum(_bdot(prep.g_merit, prep.g_merit), tiny)
        )
        finite = jnp.all(
            jnp.isfinite(x).reshape(B, -1), axis=1
        )
        return x, jnp.logical_and(finite, rel < rtol)

    def skip(_):
        return jnp.zeros_like(prep.p_newton), jnp.zeros(B, bool)

    x_t, ok_t = jax.lax.cond(
        jnp.any(~prep.solve_ok), resolve, skip, None
    )
    use_t = jnp.logical_and(~prep.solve_ok, ok_t)
    p_newton = jnp.where(use_t[:, None, None], x_t, prep.p_newton)
    return prep._replace(
        p_newton=p_newton,
        solve_ok=jnp.logical_or(prep.solve_ok, use_t),
    )


def solve_trust_region_batched(
    model: Model,
    probs: ProblemDefinition,
    params: SolverParameters,
    q_guesses,
    Delta0=None,
):
    """Batched trust-region solve: ``probs`` carries a leading scenario
    axis on its array leaves, q_guesses is (B, T+1, nq).  Returns batched
    (Solution, Stats, WarmStart) identical to
    ``vmap(solve_trust_region)``."""
    assert can_solve_batched_native(model, params), (
        "configuration not covered by the batch-native path; use "
        "parallel.batching.solve_batch(..., native=False)"
    )
    B, Tp1, nq = q_guesses.shape
    dtype = q_guesses.dtype
    K = params.max_iterations
    Delta = jnp.broadcast_to(
        jnp.asarray(
            params.Delta0 if Delta0 is None else Delta0, dtype=dtype
        ),
        (B,),
    )
    eta = 0.0  # acceptance threshold (reference :2476-2477)
    eps_guard = 10 * jnp.finfo(dtype).eps / probs.dt / probs.dt
    unact = _unactuated(model)
    n_h = probs.num_steps * len(unact)
    have_h = params.equality_constraints and n_h > 0

    def active_of(s: _LoopState):
        return jnp.logical_and(s.k < K, ~s.done)

    def cond(s: _LoopState):
        return jnp.any(active_of(s))

    def body(s: _LoopState):
        prep = _prepare_batched(model, probs, params, s.q, s.D)
        prep = _rescue_degraded_solves(params, prep)
        dq_scaled, dq, boundary_active = jax.vmap(_dogleg)(prep, s.Delta)

        # ---- trust ratio ----
        q_try = s.q + dq
        if params.normalize_quaternions:
            q_try = normalize_quaternions(model, q_try)
        merit_try, cost_try = _merit_at_batched(
            model, probs, params, q_try, prep.lam
        )
        Hdq = jax.vmap(lambda H, x: _lin_matvec(params, H, x))(
            prep.H, dq_scaled
        )
        predicted = -_bdot(prep.g_merit, dq_scaled) - 0.5 * _bdot(
            dq_scaled, Hdq
        )
        actual = prep.merit - merit_try
        rho = jnp.where(
            jnp.logical_and(predicted < eps_guard, actual < eps_guard),
            0.5,
            actual / predicted,
        )
        # Per-scenario containment of a non-finite trust ratio (degenerate
        # trial point / 0-0 quadratic model): finite rho = -1 rejects the
        # step and shrinks the radius instead of writing NaN into stats.
        # This is the batched analog of the reference's trust-ratio noise
        # guard + non-descent abort (trajectory_optimizer.cc:1979-2035,
        # :2528-2538) -- root cause of the round-4 bench failure (scenario
        # 3084/4096, f32 CR, chained warm starts).
        rho = jnp.where(jnp.isfinite(rho), rho, -1.0)
        accept = jnp.logical_and(rho > eta, prep.fact_ok)
        q_new = jnp.where(accept[:, None, None], q_try, s.q)

        # ---- statistics (one-hot row write at each scenario's own k) ----
        dq_norm = _bnorm(dq)
        onehot = jnp.arange(K)[None, :] == s.k[:, None]  # (B, K)

        def put(arr, val):
            return jnp.where(onehot, val[:, None].astype(arr.dtype), arr)

        h_norm = _bnorm(prep.h) if have_h else jnp.zeros(B, dtype)
        st = s.stats
        st = st.replace(
            cost=put(st.cost, prep.cost),
            delta=put(st.delta, s.Delta),
            rho=put(st.rho, rho),
            q_norm=put(st.q_norm, _bnorm(s.q)),
            dq_norm=put(st.dq_norm, dq_norm),
            dqH_norm=put(st.dqH_norm, _bnorm(prep.p_newton)),
            grad_norm=put(st.grad_norm, _bnorm(prep.g_merit)),
            dL_dq=put(st.dL_dq, _bdot(prep.g_merit, dq_scaled) / prep.cost),
            h_norm=put(st.h_norm, h_norm),
            merit=put(st.merit, prep.merit),
        )

        # ---- convergence (accepted steps only; reference :2600-2611) ----
        reason = jnp.zeros(B, jnp.int32)
        if params.check_convergence:
            tol = params.tolerances
            cost_new = jnp.where(accept, cost_try, prep.cost)
            crit_cost = jnp.abs(s.prev_cost - cost_new) < (
                tol.abs_cost_reduction + tol.rel_cost_reduction * cost_new
            )
            crit_grad = jnp.abs(_bdot(prep.g_merit, dq_scaled)) < (
                tol.abs_gradient_along_dq
                + tol.rel_gradient_along_dq * prep.cost
            )
            crit_state = dq_norm < (
                tol.abs_state_change
                + tol.rel_state_change * _bnorm(s.q)
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

        new = _LoopState(
            k=s.k + 1,
            q=q_new,
            Delta=Delta_new,
            prev_cost=jnp.where(accept, cost_try, prep.cost),
            reason=reason,
            done=done,
            # Latch degraded-but-contained Newton solves (per-scenario
            # Cauchy fallback, solver._prepare_from_physics) into the same
            # FACTORIZATION_FAILED reporting path as hard failures.
            failed=jnp.logical_or(
                s.failed, jnp.logical_or(~prep.fact_ok, ~prep.solve_ok)
            ),
            D=prep.D,
            dq_last=dq,
            dqH_last=prep.D * prep.p_newton,
            stats=st,
        )
        # Freeze finished scenarios: mask every carry update with each
        # scenario's own continue-predicate -- the identical rule jax's
        # while_loop batching applies under vmap, so the two paths agree.
        return _mask_tree(active_of(s), new, s)

    init = _LoopState(
        k=jnp.zeros(B, jnp.int32),
        q=q_guesses,
        Delta=Delta,
        # NaN sentinel: the cost-reduction criterion cannot fire on the
        # first iteration (matches solver.solve_trust_region).
        prev_cost=jnp.full(B, jnp.nan, dtype=dtype),
        reason=jnp.zeros(B, jnp.int32),
        done=jnp.zeros(B, bool),
        failed=jnp.zeros(B, bool),
        D=jnp.ones_like(q_guesses),
        dq_last=jnp.zeros_like(q_guesses),
        dqH_last=jnp.zeros_like(q_guesses),
        stats=_empty_stats_batched(B, K, dtype),
    )
    final = jax.lax.while_loop(cond, body, init)

    q = final.q
    contact = params.contact
    tau, v = rollout.generalized_forces(model, probs, contact, q)
    flag = jnp.where(
        final.failed,
        jnp.int32(SolverFlag.FACTORIZATION_FAILED),
        jnp.where(
            final.reason > 0,
            jnp.int32(SolverFlag.SUCCESS),
            jnp.where(
                final.k >= K,
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
