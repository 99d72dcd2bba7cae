"""Batch-native exact inverse-dynamics partials (SoA fast path).

Same chain-rule structure as optimizer/partials.id_partials (reference:
the analytic-tail trick of trajectory_optimizer.cc:552-561 generalized to
exact AD), evaluated for ALL scenarios and timesteps in one flat instance
axis n = B*T:

  * the only AD-through-FK pass is the nq-tangent linearization of
    step_tau in q_{t+1}; tangents are applied by vmap over the basis, so
    the tangent axis lands LEADING and the huge instance axis stays on the
    vector lanes (see soa/__init__ for why that is the whole ballgame),
  * v/a tangents ride a second linearization at fixed q (FK-free),
  * the q_t / q_{t-1} blocks assemble from M = dID/da, Cv = dID/dv and
    the velocity-map partials, with the t = 0 boundary handled by masks
    instead of a separate trace (dtau_dqm[0] = 0, v_0 = v_init const;
    reference boundary conventions inverse_dynamics_partials.h:21-85).

Pinned to optimizer/partials.id_partials by tests/test_soa.py.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from idto_tpu.models.model import Model
from idto_tpu.optimizer.partials import IdPartials
from idto_tpu.soa import contact as soa_contact
from idto_tpu.soa import kinematics as soa_kin


def _jac_rows(f_lin, dim, n, dtype):
    """Apply a linearized map to the full basis of R^dim: returns
    (dim_in, out..., n) -- tangent axis leading, instance axis untouched."""
    eye = jnp.eye(dim, dtype=dtype)

    def one(e):
        return f_lin(jnp.broadcast_to(e[:, None], (dim, n)))

    return jax.vmap(one)(eye)


def id_partials_batched(
    model: Model, prob, contact_params, qs
) -> IdPartials:
    """Exact partials for a batch of trajectories.

    qs: (B, T+1, nq).  Returns IdPartials of (B, T, nv, nq) arrays
    (dtau_dqm[:, 0] identically zero).  ``prob`` may carry batched
    (B, ...) leaves or unbatched ones; only dt / v_init / num_steps are
    read here.
    """
    B, Tp1, nq = qs.shape
    T = Tp1 - 1
    nv = model.nv
    n = B * T
    dtype = qs.dtype
    dt = prob.dt
    dt = jnp.asarray(dt, dtype=dtype).reshape(-1)[0]  # scalar even if batched

    # Flat instance axis: index (b, t) -> b * T + t, t = 0..T-1.  The
    # triplet for step t is (q_{t-1}, q_t, q_{t+1}); q_{t-1} at t = 0 is a
    # dummy copy of q_0 whose contributions are masked out below.
    qm = jnp.concatenate(
        [qs[:, :1], qs[:, 0 : T - 1]], axis=1
    ).reshape(n, nq).T
    qt = qs[:, 0:T].reshape(n, nq).T
    qp = qs[:, 1 : T + 1].reshape(n, nq).T

    t_idx = np.tile(np.arange(T), B)
    is_t0 = jnp.asarray(t_idx == 0)           # (n,)

    v_init = jnp.broadcast_to(
        jnp.asarray(prob.v_init, dtype=dtype).reshape(-1, nv)[:, None, :]
        if np.ndim(prob.v_init) > 1
        else jnp.asarray(prob.v_init, dtype=dtype)[None, None, :],
        (B, T, nv),
    ).reshape(n, nv).T                        # (nv, n)

    v_t_raw = soa_kin.qdot_to_v(model, qt, (qt - qm) / dt)
    v_t = jnp.where(is_t0[None, :], v_init, v_t_raw)
    v_p = soa_kin.qdot_to_v(model, qp, (qp - qt) / dt)
    a = (v_p - v_t) / dt

    # ---- Gq: the one AD-through-FK linearization (nq tangents) ----
    def tau_of_q(qq):
        return soa_contact.step_tau(model, contact_params, qq, v_p, a)

    _, lin_q = jax.linearize(tau_of_q, qp)
    Gq = _jac_rows(lin_q, nq, n, dtype)       # (nq, nv, n)
    Gq = jnp.swapaxes(Gq, 0, 1)               # (nv, nq, n)

    # ---- Cv, M: FK-free tangents at fixed q ----
    def tau_of_va(vv, aa):
        return soa_contact.step_tau(model, contact_params, qp, vv, aa)

    _, lin_va = jax.linearize(tau_of_va, v_p, a)
    zeros_v = jnp.zeros((nv, n), dtype=dtype)
    Cv = _jac_rows(lambda e: lin_va(e, zeros_v), nv, n, dtype)
    M = _jac_rows(lambda e: lin_va(zeros_v, e), nv, n, dtype)
    Cv = jnp.swapaxes(Cv, 0, 1)               # (nv, nv, n)
    M = jnp.swapaxes(M, 0, 1)

    # ---- velocity-map partials ----
    def vp_of_q(qq):
        return soa_kin.qdot_to_v(model, qq, (qq - qt) / dt)

    _, lin_vp = jax.linearize(vp_of_q, qp)
    Vp_p = jnp.swapaxes(_jac_rows(lin_vp, nq, n, dtype), 0, 1)  # (nv, nq, n)

    def vt_of_q(qq):
        return soa_kin.qdot_to_v(model, qq, (qq - qm) / dt)

    _, lin_vt = jax.linearize(vt_of_q, qt)
    Vt_t = jnp.swapaxes(_jac_rows(lin_vt, nq, n, dtype), 0, 1)
    Vt_t = jnp.where(is_t0[None, None, :], 0.0, Vt_t)  # v_0 = v_init const

    Npp = soa_kin.nplus_matrix(model, qp)     # (nv, nq, n)
    Npt = soa_kin.nplus_matrix(model, qt)

    # ---- assembly (same algebra as optimizer/partials.parts_mid) ----
    def mm(A, Bm):
        """(i, v, n) @ (v, q, n) -> (i, q, n)."""
        return jnp.einsum("ivn,vqn->iqn", A, Bm)

    CvM = Cv + M / dt
    dqp = Gq + mm(CvM, Vp_p)
    dqt = mm(CvM, -Npp / dt) - mm(M / dt, Vt_t)
    dqm = mm(M / dt, Npt / dt)
    dqm = jnp.where(is_t0[None, None, :], 0.0, dqm)

    def unflat(x):
        # (nv, nq, n) -> (B, T, nv, nq)
        return jnp.transpose(x.reshape(nv, nq, B, T), (2, 3, 0, 1))

    return IdPartials(unflat(dqm), unflat(dqt), unflat(dqp))


def nplus_stack_batched(model: Model, qs):
    """N^+ at every knot: qs (B, T+1, nq) -> (B, T+1, nv, nq)."""
    B, Tp1, nq = qs.shape
    Np = soa_kin.nplus_matrix(model, qs.reshape(B * Tp1, nq).T)
    return jnp.transpose(
        Np.reshape(model.nv, nq, B, Tp1), (2, 3, 0, 1)
    )
