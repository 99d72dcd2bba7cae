"""Batch-native trajectory rollouts (SoA fast path).

v(q), a(q), tau(q), L(q) for a (B, T+1, nq) stack of trajectories in one
flat-instance evaluation -- mirrors optimizer/trajectory.py (reference:
trajectory_optimizer.cc:136-245) and is pinned to it by tests/test_soa.py.
``prob`` leaves may be per-scenario batched (B, ...) or shared; broadcasts
handle both.
"""
from __future__ import annotations

import jax.numpy as jnp

from idto_tpu.models.model import Model
from idto_tpu.soa import contact as soa_contact
from idto_tpu.soa import kinematics as soa_kin


def _dt_scalar(prob, dtype):
    return jnp.asarray(prob.dt, dtype=dtype).reshape(-1)[0]


def velocities(model: Model, prob, qs):
    """v_t = N^+(q_t)(q_t - q_{t-1})/dt, v_0 = v_init: (B, T+1, nv)."""
    B, Tp1, nq = qs.shape
    T = Tp1 - 1
    dtype = qs.dtype
    dt = _dt_scalar(prob, dtype)
    q_prev = qs[:, :T].reshape(B * T, nq).T
    q_next = qs[:, 1:].reshape(B * T, nq).T
    v_rest = soa_kin.qdot_to_v(model, q_next, (q_next - q_prev) / dt)
    v_rest = jnp.transpose(
        v_rest.reshape(model.nv, B, T), (1, 2, 0)
    )  # (B, T, nv)
    v0 = jnp.broadcast_to(
        jnp.asarray(prob.v_init, dtype=dtype).reshape(-1, model.nv)[:, None],
        (B, 1, model.nv),
    )
    return jnp.concatenate([v0, v_rest], axis=1)


def generalized_forces(model: Model, prob, contact_params, qs, v=None):
    """tau: (B, T, nv); optionally reuses a precomputed v."""
    B, Tp1, nq = qs.shape
    T = Tp1 - 1
    nv = model.nv
    dtype = qs.dtype
    dt = _dt_scalar(prob, dtype)
    if v is None:
        v = velocities(model, prob, qs)
    a = (v[:, 1:] - v[:, :-1]) / dt          # (B, T, nv)
    q_next = qs[:, 1:].reshape(B * T, nq).T
    v_next = v[:, 1:].reshape(B * T, nv).T
    a_flat = a.reshape(B * T, nv).T
    tau = soa_contact.step_tau(
        model, contact_params, q_next, v_next, a_flat
    )
    return jnp.transpose(tau.reshape(nv, B, T), (1, 2, 0)), v


def cost(model: Model, prob, contact_params, qs, tau=None, v=None):
    """L(q): (B,).  Running cost over t = 0..T-1 (incl. the fixed t = 0
    term, as the reference does) plus terminal (trajectory_optimizer.cc:
    136-176)."""
    dtype = qs.dtype
    dt = _dt_scalar(prob, dtype)
    if tau is None or v is None:
        tau, v = generalized_forces(model, prob, contact_params, qs, v=v)

    q_nom = jnp.asarray(prob.q_nom, dtype=dtype)
    v_nom = jnp.asarray(prob.v_nom, dtype=dtype)
    dq = qs[:, :-1] - jnp.broadcast_to(
        q_nom if q_nom.ndim == 3 else q_nom[None], qs.shape
    )[:, :-1]
    dv = v[:, :-1] - jnp.broadcast_to(
        v_nom if v_nom.ndim == 3 else v_nom[None], v.shape
    )[:, :-1]

    def w(x):
        """Weight vector -> (B_or_1, 1, d) for running-term broadcasting."""
        x = jnp.asarray(x, dtype=dtype)
        return x[:, None, :] if x.ndim == 2 else x[None, None, :]

    running = (
        jnp.sum(dq * dq * w(prob.Qq), axis=(1, 2))
        + jnp.sum(dv * dv * w(prob.Qv), axis=(1, 2))
        + jnp.sum(tau * tau * w(prob.R), axis=(1, 2))
    ) * dt

    q_nomT = q_nom[..., -1, :]
    v_nomT = v_nom[..., -1, :]
    dqT = qs[:, -1] - q_nomT
    dvT = v[:, -1] - v_nomT

    def wT(x):
        x = jnp.asarray(x, dtype=dtype)
        return x if x.ndim == 2 else x[None]

    terminal = jnp.sum(dqT * dqT * wT(prob.Qf_q), axis=-1) + jnp.sum(
        dvT * dvT * wT(prob.Qf_v), axis=-1
    )
    return running + terminal
