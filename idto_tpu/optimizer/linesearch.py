"""Full-Newton + linesearch solver (the reference's alternative method,
SolveWithLinesearch, trajectory_optimizer.cc:2244-2404, with the Armijo
(:1933-1977) and backtracking (:1853-1929) strategies).

Each iteration takes the full Gauss-Newton step dq = -H^{-1} g_merit and
backtracks along it.  The reference uses the *unscaled* Hessian on this
path; we do the same (scaling only affects the trust-region method).  With
equality constraints active the backtracking variant uses the exact-l1
merit L + mu |h|_1 with mu = 1e3 (:1860-1867).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from idto_tpu.models.kinematics import normalize_quaternions
from idto_tpu.ops import penta
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.hessian import gauss_newton_hessian
from idto_tpu.optimizer.partials import id_partials_for, nplus_stack
from idto_tpu.optimizer.problem import LinesearchMethod, SolverParameters
from idto_tpu.optimizer.solver import (
    Solution,
    SolverFlag,
    Stats,
    WarmStart,
    _empty_stats,
    _unactuated,
)

_C_ARMIJO = 1e-4
_RHO = 0.8
_MU_L1 = 1e3


def _constraint_l1(model, prob, contact, q, mu):
    if mu == 0.0:
        return 0.0
    unact = _unactuated(model)
    tau = trajectory.generalized_forces(model, prob, contact, q)
    h = tau[:, jnp.array(unact, dtype=jnp.int32)]
    return mu * jnp.sum(jnp.abs(h))


def _armijo(model, prob, params, q, dq, L, g, max_ls):
    """Armijo backtracking (reference :1933-1977): start at alpha = 1,
    multiply by rho until L(q + a dq) <= L + c a L'."""
    dt = prob.dt
    contact = params.contact
    L_prime = jnp.sum(g * dq)
    threshold = 10 * jnp.finfo(q.dtype).eps / dt / dt
    early = jnp.abs(L_prime) / jnp.abs(L) <= threshold

    def cost_at(alpha):
        q_try = q + alpha * dq
        if params.normalize_quaternions:
            q_try = normalize_quaternions(model, q_try)
        return trajectory.cost(model, prob, contact, q_try)

    def cond(carry):
        alpha, i, L_new = carry
        return jnp.logical_and(
            L_new > L + _C_ARMIJO * alpha * L_prime,
            i < max_ls,
        )

    def body(carry):
        alpha, i, _ = carry
        alpha = alpha * _RHO
        return alpha, i + 1, cost_at(alpha)

    a0 = jnp.asarray(1.0, q.dtype)
    alpha, iters, _ = jax.lax.while_loop(cond, body, (a0, 0, cost_at(a0)))
    # One ls evaluation was already done at alpha=1.
    iters = iters + 1
    alpha = jnp.where(early, 1.0, alpha)
    iters = jnp.where(early, 0, iters)
    return alpha, iters


def _backtracking(model, prob, params, q, dq, L, g, max_ls, mu):
    """Backtracking past Armijo until the cost rises (reference
    :1853-1929): locates a local minimum along the ray; exact-l1 merit when
    equality constraints are on."""
    contact = params.contact
    habs = _constraint_l1(model, prob, contact, q, mu)
    L_tot = L + habs
    L_prime = jnp.sum(g * dq) - habs
    threshold = jnp.sqrt(jnp.finfo(q.dtype).eps)
    early = jnp.abs(L_prime) / jnp.abs(L_tot) <= threshold

    def merit_at(alpha):
        q_try = q + alpha * dq
        if params.normalize_quaternions:
            q_try = normalize_quaternions(model, q_try)
        return trajectory.cost(model, prob, contact, q_try) + _constraint_l1(
            model, prob, contact, q_try, mu
        )

    def cond(carry):
        alpha, i, L_new, L_old, armijo_met = carry
        keep = jnp.logical_not(
            jnp.logical_and(armijo_met, L_new > L_old)
        )
        return jnp.logical_and(keep, i < max_ls)

    def body(carry):
        alpha, i, L_new, L_old, armijo_met = carry
        L_old = L_new
        alpha = alpha * _RHO
        L_new = merit_at(alpha)
        armijo_met = jnp.logical_or(
            armijo_met, L_new <= L_tot + _C_ARMIJO * alpha * L_prime
        )
        return alpha, i + 1, L_new, L_old, armijo_met

    a0 = jnp.asarray(1.0, q.dtype)
    L1 = merit_at(a0)
    alpha, iters, _, _, _ = jax.lax.while_loop(
        cond, body, (a0, 0, L1, L1, jnp.asarray(False))
    )
    # The accepted step is one rho back (reference returns alpha / rho).
    alpha = alpha / _RHO
    alpha = jnp.where(early, 1.0, alpha)
    iters = jnp.where(early, 0, iters)
    return alpha, iters


class _LsState(NamedTuple):
    k: jnp.ndarray
    q: jnp.ndarray
    failed: jnp.ndarray
    dq_last: jnp.ndarray  # last taken step (alpha * dq) for WarmStart.dq
    dqH_last: jnp.ndarray  # last full Newton step for WarmStart.dqH
    stats: Stats


def solve_linesearch(model, prob, params: SolverParameters, q_guess):
    """Reference SolveWithLinesearch analog; returns (Solution, Stats,
    WarmStart) with the same interface as the trust-region path."""
    contact = params.contact
    dtype = q_guess.dtype
    mu = _MU_L1 if (
        params.equality_constraints and len(_unactuated(model)) > 0
        and params.linesearch_method == LinesearchMethod.BACKTRACKING
    ) else 0.0

    unact = _unactuated(model)
    use_constraints = params.equality_constraints and len(unact) > 0

    def prepare(q):
        cost = trajectory.cost(model, prob, contact, q)
        g = trajectory.gradient(model, prob, contact, q)
        parts = id_partials_for(model, prob, params, q)
        npl = nplus_stack(model, q)
        H = gauss_newton_hessian(model, prob, parts, npl)
        if use_constraints:
            # Merit gradient g + J^T lambda via the same KKT multipliers as
            # the trust-region path (unscaled here).
            from idto_tpu.optimizer.solver import _constraint_jacobian_dense

            factor = penta.factorize(H)
            tau = trajectory.generalized_forces(model, prob, contact, q)
            h = tau[:, jnp.array(unact, dtype=jnp.int32)].reshape(-1)
            J = _constraint_jacobian_dense(model, prob, parts, unact, q.dtype)
            Hinv_JT = jax.vmap(lambda r: penta.solve_factorized(factor, r))(J)
            S = jnp.einsum("anq,bnq->ab", J, Hinv_JT)
            Hinv_g = penta.solve_factorized(factor, g)
            lam = jnp.linalg.solve(
                S, h - jnp.einsum("anq,nq->a", J, Hinv_g)
            )
            g = g + jnp.einsum("anq,a->nq", J, lam)
            dq = -penta.solve_factorized(factor, g)
        else:
            dq = -penta.solve(H, g)
        return cost, g, dq

    def cond(s: _LsState):
        return jnp.logical_and(s.k < params.max_iterations, ~s.failed)

    def body(s: _LsState):
        cost, g, dq = prepare(s.q)
        if params.linesearch_method == LinesearchMethod.BACKTRACKING:
            alpha, ls_iters = _backtracking(
                model, prob, params, s.q, dq, cost, g,
                params.max_linesearch_iterations, mu,
            )
        else:
            alpha, ls_iters = _armijo(
                model, prob, params, s.q, dq, cost, g,
                params.max_linesearch_iterations,
            )
        failed = ls_iters >= params.max_linesearch_iterations
        q_new = s.q + alpha * dq
        if params.normalize_quaternions:
            q_new = normalize_quaternions(model, q_new)

        st = s.stats
        k = s.k
        st = st.replace(
            cost=st.cost.at[k].set(cost),
            dq_norm=st.dq_norm.at[k].set(jnp.linalg.norm(dq)),
            dqH_norm=st.dqH_norm.at[k].set(jnp.linalg.norm(dq)),
            grad_norm=st.grad_norm.at[k].set(jnp.linalg.norm(g)),
            q_norm=st.q_norm.at[k].set(jnp.linalg.norm(s.q)),
            dL_dq=st.dL_dq.at[k].set(jnp.sum(g * dq) / cost),
            alpha=st.alpha.at[k].set(alpha),
            ls_iters=st.ls_iters.at[k].set(ls_iters),
            merit=st.merit.at[k].set(cost),
            # rho (trust ratio) stays NaN: not defined for linesearch mode
            # (the reference records NaN there too, push_data at :2369).
        )
        if params.record_iteration_times:
            from idto_tpu.optimizer import itimer

            jax.debug.callback(itimer.mark, ordered=True)
        return _LsState(
            k=k + 1, q=q_new, failed=failed,
            dq_last=alpha * dq, dqH_last=dq, stats=st,
        )

    init = _LsState(
        k=jnp.zeros((), jnp.int32),
        q=q_guess,
        failed=jnp.zeros((), bool),
        dq_last=jnp.zeros_like(q_guess),
        dqH_last=jnp.zeros_like(q_guess),
        stats=_empty_stats(params.max_iterations, dtype),
    )
    final = jax.lax.while_loop(cond, body, init)

    q = final.q
    v = trajectory.velocities(model, prob, q)
    tau = trajectory.generalized_forces(model, prob, contact, q)
    flag = jnp.where(
        final.failed,
        jnp.int32(SolverFlag.LINESEARCH_MAX_ITERS),
        jnp.int32(SolverFlag.SUCCESS),
    )
    stats = final.stats.replace(
        num_iters=final.k,
        solver_flag=flag,
        convergence_reason=jnp.zeros((), jnp.int32),
    )
    return (
        Solution(q=q, v=v, tau=tau),
        stats,
        WarmStart(
            q=q, Delta=jnp.asarray(params.Delta0, dtype),
            dq=final.dq_last, dqH=final.dqH_last,
        ),
    )
