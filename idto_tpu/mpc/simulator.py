"""Forward simulator: semi-implicit Euler over the same JAX dynamics.

Replaces the reference's use of Drake's ``Simulator`` + discrete
MultibodyPlant for the closed-loop MPC evaluation
(example_base.cc:59-187).  The integrator is the standard semi-implicit
(symplectic) Euler scheme discrete plants use:

    v' = v + h * FD(q, v, u)        (forward dynamics with contact)
    q' = q + h * N(q) v'

One ``simulate_segment`` call advances a fixed number of substeps under a
stored control trajectory (PD-plus + feedforward), as a single
``lax.scan`` -- the whole segment stays on device.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idto_tpu.contact.force import ContactParams, contact_wrenches
from idto_tpu.models.dynamics import forward_dynamics
from idto_tpu.models.kinematics import normalize_quaternions, v_to_qdot
from idto_tpu.models.model import Model
from idto_tpu.mpc.pd import pd_plus_control
from idto_tpu.mpc.trajectory_store import StoredTrajectory


def sim_step(model: Model, contact: ContactParams, h: float, q, v, u):
    wrenches = contact_wrenches(model, q, v, contact)
    tau_applied = model.B @ u
    a = forward_dynamics(model, q, v, tau_applied, wrenches)
    v_new = v + h * a
    q_new = q + h * v_to_qdot(model, q, v_new)
    q_new = normalize_quaternions(model, q_new)
    return q_new, v_new


def simulate_segment(
    model: Model,
    contact: ContactParams,
    h: float,
    num_substeps: int,
    stored: StoredTrajectory,
    Kp,
    Kd,
    q0,
    v0,
    t_start,
    feed_forward: bool = True,
):
    """Advance (q0, v0) for num_substeps steps of size h, tracking the
    stored trajectory with the PD-plus controller."""

    def step(carry, i):
        q, v = carry
        t = t_start + i.astype(q.dtype) * h
        q_ref, v_ref = stored.sample_state(t)
        u_ff = stored.sample_control(t)
        u = pd_plus_control(
            model, Kp, Kd, q_ref, v_ref, u_ff, q, v, feed_forward
        )
        q, v = sim_step(model, contact, h, q, v, u)
        return (q, v), (q, v, u)

    (q, v), log = jax.lax.scan(
        step, (q0, v0), jnp.arange(num_substeps)
    )
    return q, v, log
