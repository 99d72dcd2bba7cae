"""SoA inverse dynamics (mirrors models/dynamics.py math exactly).

tau = M(q) a + C(q,v) v + g(q) + D v - J(q)^T f_ext, with accelerations
from a second jvp through the kinematics and the J^T action as the vjp of
the linear-in-v body velocity map -- identical AD structure to the AoS
implementation (which is pinned to the independent Euler-Lagrange oracle
in tests/test_parity.py), re-laid-out with the instance axis trailing.
Reference semantics: plant.CalcInverseDynamics +
CalcForceElementsContribution at trajectory_optimizer.cc:228-245.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idto_tpu.models.model import Model
from idto_tpu.soa import mat3
from idto_tpu.soa.kinematics import body_velocities, v_to_qdot


def body_accelerations(model: Model, q, v, a):
    """(R, p, w, pd, wd, pdd) with q (nq, N), v/a (nv, N)."""
    qdot = v_to_qdot(model, q, v)
    (R, p, w, pd), (_, _, wd, pdd) = jax.jvp(
        lambda qq, vv: body_velocities(model, qq, vv), (q, v), (qdot, a)
    )
    return R, p, w, pd, wd, pdd


def _inertial_minus_applied_wrenches(model: Model, q, v, a, external_wrenches):
    """Net wrench about each body origin in world: (torque (3, nl, N),
    force (3, nl, N))."""
    R, p, w, pd, wd, pdd = body_accelerations(model, q, v, a)
    dtype = q.dtype

    com = mat3.from_aos_vec(jnp.asarray(model.com, dtype=dtype))[..., None]
    r = mat3.mv(R, com)  # (3, nl, N)
    a_com = pdd + mat3.cross(wd, r) + mat3.cross(w, mat3.cross(w, r))

    m = jnp.asarray(model.mass, dtype=dtype)[None, :, None]  # (1, nl, 1)
    F = m * a_com
    grav = jnp.asarray(model.gravity, dtype=dtype)[:, None, None]
    gscale = jnp.asarray(model.grav_scale, dtype=dtype)[None, :, None]
    F_grav = m * gscale * grav

    I_b = mat3.from_aos_mat(jnp.asarray(model.inertia, dtype=dtype))[..., None]
    I_w = mat3.mul_t(mat3.mul(R, I_b), R)
    torque_com = mat3.mv(I_w, wd) + mat3.cross(w, mat3.mv(I_w, w))

    torque = torque_com + mat3.cross(r, F - F_grav)
    force = F - F_grav

    if external_wrenches is not None:
        ext_torque, ext_force = external_wrenches
        torque = torque - ext_torque
        force = force - ext_force
    return torque, force


def inverse_dynamics(
    model: Model,
    q,
    v,
    a,
    external_wrenches: Optional[tuple] = None,
):
    """Generalized forces tau (nv, N); external_wrenches is an optional
    pair of (3, nl, N) arrays (torques, forces) about body origins in
    world."""
    torque, force = _inertial_minus_applied_wrenches(
        model, q, v, a, external_wrenches
    )

    def vel_of_v(vv):
        _, _, w_, pd_ = body_velocities(model, q, vv)
        return w_, pd_

    _, vjp_fn = jax.vjp(vel_of_v, v)
    (tau,) = vjp_fn((torque, force))

    damping = jnp.asarray(model.damping, dtype=q.dtype)[:, None]
    return tau + damping * v
