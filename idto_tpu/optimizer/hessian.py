"""Gauss-Newton Hessian assembly as penta-diagonal bands.

Mirrors the reference's CalcHessian (trajectory_optimizer.cc:1093-1165)
block-for-block, but assembles all (T+1) blocks of each band at once with
batched einsums (MXU-friendly) instead of a loop over t.

Structure (lower bands; uppers by symmetry):
  C[t] = Qq' + dv_t/dq_t^T Qv' dv_t/dq_t
       + dtau_{t-1}/dq_t^T R' dtau_{t-1}/dq_t + dtau_t/dq_t^T R' dtau_t/dq_t
       + [t < T-1]  dtau_{t+1}/dq_t^T R' dtau_{t+1}/dq_t
                  + dv_{t+1}/dq_t^T Qv' dv_{t+1}/dq_t
       + [t == T-1] dv_T/dq_t^T Qf_v' dv_T/dq_t
  B[t+1] = H[t+1][t], A[t+2] = H[t+2][t]  (see code)
with C[0] = I pinning q_0, B[1] = A[2] = 0, and primed weights
Qq' = 2 dt Qq etc. (terminal weights unscaled by dt).
"""
from __future__ import annotations

import jax.numpy as jnp

# NOTE on assembly style: boundary terms are folded in with zero-padding
# and one-hot masks rather than scatter (.at[idx].add) updates.  Scatters
# at static indices miscompile on shard-boundary rows when the horizon
# axis is sharded with GSPMD (observed: a .at[T-2].add on a (T-1, nq)
# array sharded 8-ways corrupted every shard-boundary row); pad/mask adds
# are elementwise and partition trivially -- and avoid scatter lowering on
# TPU anyway.

from idto_tpu.models.model import Model
from idto_tpu.ops.penta import PentaBands, make_symmetric_from_lower
from idto_tpu.optimizer.partials import IdPartials
from idto_tpu.optimizer.problem import ProblemDefinition


def _wquad(J1, w, J2):
    """J1^T diag(w) J2, batched over the leading axis."""
    return jnp.einsum("nji,j,njk->nik", J1, w, J2)


def _wvec(J, w, r):
    """J^T diag(w) r, batched over the leading axis."""
    return jnp.einsum("nji,j,nj->ni", J, w, r)


def gradient_from_partials(
    model: Model,
    prob: ProblemDefinition,
    partials: IdPartials,
    nplus,  # (T+1, nv, nq)
    q,  # (T+1, nq)
    v,  # (T+1, nv)
    tau,  # (T, nv)
):
    """dL/dq assembled from the inverse-dynamics partials, mirroring the
    reference's CalcGradient (trajectory_optimizer.cc:1021-1081) term by
    term -- including its Gauss-Newton treatment of the velocity map
    (dv/dq = +-N^+/dt, dropping dN^+/dq for quaternion DoFs).  Sharing the
    partials with the Hessian makes the gradient nearly free.

    The first block is zero (q_0 fixed, reference :1042-1044).
    """
    T = prob.num_steps
    dt = prob.dt
    Qq = 2 * dt * prob.Qq
    Qv = 2 * dt * prob.Qv
    R = 2 * dt * prob.R
    Qf_q = 2 * prob.Qf_q
    Qf_v = 2 * prob.Qf_v

    dv_dqt = nplus / dt
    dm, dtt, dp = partials

    dq_err = q - prob.q_nom
    dv_err = v - prob.v_nom

    # Interior rows t = 1..T-1.
    g_mid = (
        Qq * dq_err[1:T]
        + _wvec(dv_dqt[1:T], Qv, dv_err[1:T])
        + _wvec(dp[0 : T - 1], R, tau[0 : T - 1])
        + _wvec(dtt[1:T], R, tau[1:T])
    )
    # dv_{t+1}/dq_t = -N^+(q_{t+1})/dt contributions for t = 1..T-2 (Qv)
    # and t = T-1 (terminal Qf_v); tau_{t+1} term for t < T-1.
    if T > 1:
        extra = _wvec(-dv_dqt[2:T], Qv, dv_err[2:T]) + _wvec(
            dm[2:T], R, tau[2:T]
        )
        term_last = _wvec(-dv_dqt[T : T + 1], Qf_v, dv_err[T : T + 1])
        g_mid = g_mid + jnp.concatenate([extra, term_last], axis=0)

    g_last = (
        Qf_q * dq_err[T]
        + _wvec(dv_dqt[T : T + 1], Qf_v, dv_err[T : T + 1])[0]
        + _wvec(dp[T - 1 : T], R, tau[T - 1 : T])[0]
    )
    zero = jnp.zeros_like(q[:1])
    return jnp.concatenate([zero, g_mid, g_last[None]], axis=0)


def gauss_newton_hessian(
    model: Model,
    prob: ProblemDefinition,
    partials: IdPartials,
    nplus,  # (T+1, nv, nq)
) -> PentaBands:
    T = prob.num_steps
    nq = model.nq
    dt = prob.dt
    dtype = nplus.dtype

    Qq = 2 * dt * prob.Qq
    Qv = 2 * dt * prob.Qv
    R = 2 * dt * prob.R
    Qf_q = 2 * prob.Qf_q
    Qf_v = 2 * prob.Qf_v

    # Velocity partials (Gauss-Newton approximation dv_t/dq_t = N^+/dt,
    # dv_t/dq_{t-1} = -N^+/dt; reference trajectory_optimizer.cc:962-973).
    dv_dqt = nplus / dt  # (T+1, nv, nq)
    dm, dtt, dp = partials  # (T, nv, nq) each

    # ---- diagonal band C -------------------------------------------------
    # Blocks for t = 1..T-1 assembled vectorized, then boundary rows fixed.
    # Index helpers: for array x over tau steps (len T), x[t] is step t.
    C_mid = (
        jnp.eye(nq, dtype=dtype) * 0.0
        + jnp.diag(Qq).astype(dtype)[None]
        + _wquad(dv_dqt[1:T], Qv, dv_dqt[1:T])
        + _wquad(dp[0 : T - 1], R, dp[0 : T - 1])
        + _wquad(dtt[1:T], R, dtt[1:T])
    )
    # dv_{t+1}/dq_t = -N^+(q_{t+1})/dt, for t = 1..T-1.
    dv_next_dqt = -dv_dqt[2 : T + 1]
    # Terms present only for t < T-1, plus the t = T-1 terminal-velocity
    # row, folded in as one concatenated row-aligned addend (see NOTE).
    if T > 1:
        C_extra = _wquad(dm[2:T], R, dm[2:T]) + _wquad(
            dv_next_dqt[: T - 2], Qv, dv_next_dqt[: T - 2]
        )
        C_term = _wquad(
            dv_next_dqt[T - 2 : T - 1], Qf_v, dv_next_dqt[T - 2 : T - 1]
        )
        C_mid = C_mid + jnp.concatenate([C_extra, C_term], axis=0)

    C_last = (
        jnp.diag(Qf_q).astype(dtype)
        + _wquad(dv_dqt[T : T + 1], Qf_v, dv_dqt[T : T + 1])[0]
        + _wquad(dp[T - 1 : T], R, dp[T - 1 : T])[0]
    )
    C = jnp.concatenate(
        [jnp.eye(nq, dtype=dtype)[None], C_mid, C_last[None]], axis=0
    )

    # ---- sub-diagonal band B (B[t+1] = H[t+1][t], t = 1..T-1) -----------
    # H[t+1][t] = dtau_t/dq_{t+1}^T R dtau_t/dq_t
    #           + [t<T-1] dtau_{t+1}/dq_{t+1}^T R dtau_{t+1}/dq_t
    #                   + dv_{t+1}/dq_{t+1}^T Qv dv_{t+1}/dq_t
    #           + [t==T-1] dv_T/dq_T^T Qf_v dv_T/dq_{T-1}
    B_mid = _wquad(dp[1:T], R, dtt[1:T])
    if T > 1:
        B_extra = _wquad(dtt[2:T], R, dm[2:T]) + _wquad(
            dv_dqt[2:T], Qv, -dv_dqt[2:T]
        )
        B_term = _wquad(dv_dqt[T : T + 1], Qf_v, -dv_dqt[T : T + 1])
        B_mid = B_mid + jnp.concatenate([B_extra, B_term], axis=0)
    B = jnp.concatenate(
        [jnp.zeros((2, nq, nq), dtype=dtype), B_mid], axis=0
    )

    # ---- sub-sub-diagonal band A (A[t+2] = H[t+2][t], t = 1..T-2) -------
    # H[t+2][t] = dtau_{t+1}/dq_{t+2}^T R dtau_{t+1}/dq_t
    A_mid = _wquad(dp[2:T], R, dm[2:T])
    A = jnp.concatenate(
        [jnp.zeros((3, nq, nq), dtype=dtype), A_mid], axis=0
    )

    return make_symmetric_from_lower(A, B, C)
