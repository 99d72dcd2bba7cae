"""Trajectory-derived quantities: v(q), a(q), tau(q), cost(q).

The reference computes these lazily into a mutable cache
(trajectory_optimizer.cc:136-245, trajectory_optimizer_state.h); here they
are pure functions of the decision variables q -- a (T+1, nq) array -- that
jit recomputes as needed (XLA CSE shares work inside one jitted solve).

All per-step physics is vmapped over the horizon axis: this is the TPU
replacement for the reference's OpenMP-over-timesteps parallelism
(trajectory_optimizer.cc:214-217).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idto_tpu.contact.force import ContactParams, contact_wrenches
from idto_tpu.models.dynamics import inverse_dynamics
from idto_tpu.models.kinematics import qdot_to_v
from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import ProblemDefinition


def velocities(model: Model, prob: ProblemDefinition, q):
    """v_t = N^+(q_t) (q_t - q_{t-1}) / dt, v_0 = v_init
    (reference: trajectory_optimizer.cc:179-191)."""
    dq = (q[1:] - q[:-1]) / prob.dt
    v_rest = jax.vmap(lambda qq, qd: qdot_to_v(model, qq, qd))(q[1:], dq)
    return jnp.concatenate([prob.v_init[None, :], v_rest], axis=0)


def accelerations(prob: ProblemDefinition, v):
    """a_t = (v_{t+1} - v_t) / dt, t = 0..T-1
    (reference: trajectory_optimizer.cc:193-202)."""
    return (v[1:] - v[:-1]) / prob.dt


def step_tau(model: Model, contact: ContactParams, q_next, v_next, a):
    """tau_t = ID(q_{t+1}, v_{t+1}, a_t) - J^T gamma(q_{t+1}, v_{t+1}):
    inverse dynamics with all terms (incl. contact) implicit
    (reference: trajectory_optimizer.cc:204-245)."""
    wrenches = contact_wrenches(model, q_next, v_next, contact)
    return inverse_dynamics(model, q_next, v_next, a, wrenches)


def generalized_forces(model: Model, prob: ProblemDefinition, contact, q):
    """tau: (T, nv) for t = 0..T-1."""
    v = velocities(model, prob, q)
    a = accelerations(prob, v)
    return jax.vmap(lambda qn, vn, an: step_tau(model, contact, qn, vn, an))(
        q[1:], v[1:], a
    )


def cost(model: Model, prob: ProblemDefinition, contact, q, tau=None, v=None):
    """Total cost L(q) (reference: trajectory_optimizer.cc:136-176).

    Running cost over t = 0..T-1 (including the fixed t=0 term, as the
    reference does) plus terminal cost; weights are diagonal.
    """
    if v is None:
        v = velocities(model, prob, q)
    if tau is None:
        a = accelerations(prob, v)
        tau = jax.vmap(
            lambda qn, vn, an: step_tau(model, contact, qn, vn, an)
        )(q[1:], v[1:], a)

    dq = q[:-1] - prob.q_nom[:-1]
    dv = v[:-1] - prob.v_nom[:-1]
    running = (
        jnp.sum(dq * dq * prob.Qq)
        + jnp.sum(dv * dv * prob.Qv)
        + jnp.sum(tau * tau * prob.R)
    ) * prob.dt

    dqT = q[-1] - prob.q_nom[-1]
    dvT = v[-1] - prob.v_nom[-1]
    terminal = jnp.sum(dqT * dqT * prob.Qf_q) + jnp.sum(dvT * dvT * prob.Qf_v)
    return running + terminal


def gradient(model: Model, prob: ProblemDefinition, contact, q):
    """Exact dL/dq with the first block zeroed (q_0 is fixed;
    reference zeroes it at trajectory_optimizer.cc:1042-1044).

    N.B. unlike the reference (which drops the dN^+/dq term for quaternion
    DoFs, trajectory_optimizer.cc:962-973), this is the exact gradient via
    reverse-mode AD.
    """
    g = jax.grad(lambda qq: cost(model, prob, contact, qq))(q)
    return g.at[0].set(0.0)
