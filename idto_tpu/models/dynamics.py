"""Inverse dynamics via AD-through-kinematics (world-frame Newton-Euler).

Replaces Drake's ``MultibodyPlant::CalcInverseDynamics`` +
``CalcForceElementsContribution`` used by the reference at
optimizer/trajectory_optimizer.cc:228-245.  Semantics:

    tau = ID(q, v, a, W_ext) = M(q) a + C(q,v) v + g(q) + D v - J(q)^T f_ext

i.e. the generalized force needed to produce acceleration ``a`` at state
(q, v) with external spatial wrenches ``W_ext`` applied to the bodies and
viscous joint damping D.

Design notes (TPU-first):
  * body accelerations come from a second ``jvp`` through
    :func:`kinematics.body_velocities` -- exact, no hand-derived Coriolis
    terms, and fully differentiable (the optimizer takes another jacfwd of
    this for dtau/dq, replacing the reference's OpenMP finite differences at
    trajectory_optimizer.cc:426-563),
  * the projection of world wrenches into generalized forces is the
    transpose-Jacobian action, obtained for free as the ``vjp`` of the
    (linear-in-v) body velocity map -- no explicit Jacobian assembly,
  * everything is dense small-matrix math that vmaps over time and scenario
    axes; there is no sequential sweep over the kinematic chain other than
    the (static, unrolled) FK loop.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from idto_tpu.models import mat3
from idto_tpu.models.kinematics import body_velocities, v_to_qdot
from idto_tpu.models.model import Model


def body_accelerations(model: Model, q, v, a):
    """World-frame kinematics up to accelerations.

    Returns (R, p, w, pd, wd, pdd): poses, angular/linear velocities, and
    angular/linear accelerations of each link frame origin, all in world.
    """
    qdot = v_to_qdot(model, q, v)
    primals = (q, v)
    tangents = (qdot, a)
    (R, p, w, pd), (_, _, wd, pdd) = jax.jvp(
        lambda qq, vv: body_velocities(model, qq, vv), primals, tangents
    )
    return R, p, w, pd, wd, pdd


def _inertial_minus_applied_wrenches(model: Model, q, v, a, external_wrenches):
    """Net wrench (about each body origin, in world) that the joints must
    supply: rate of change of momentum minus gravity minus external forces."""
    R, p, w, pd, wd, pdd = body_accelerations(model, q, v, a)

    # Center-of-mass offset in world, and com acceleration.
    r = mat3.mv(R, model.com)  # (nl, 3)
    a_com = (
        pdd
        + jnp.cross(wd, r)
        + jnp.cross(w, jnp.cross(w, r))
    )

    m = model.mass[:, None]
    F = m * a_com  # linear momentum rate
    # Per-link gravity scale supports Drake's set_gravity_enabled(instance,
    # false) used by the manipulation examples (e.g. kuka.cc, jaco.cc).
    F_grav = m * model.grav_scale[:, None] * model.gravity[None, :]

    # Rotational inertia about com in world: I_W = R I_B R^T.
    I_w = mat3.mul_t(mat3.mul(R, model.inertia), R)
    torque_com = mat3.mv(I_w, wd) + jnp.cross(w, mat3.mv(I_w, w))

    # Shift to body origin: wrench about origin from force at com.
    torque = torque_com + jnp.cross(r, F - F_grav)
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
    """Generalized forces tau (nv,) required for acceleration ``a``.

    ``external_wrenches`` is an optional pair of (nl, 3) arrays
    (torques, forces) about each body's frame origin, expressed in world --
    the shape produced by the contact module.
    """
    torque, force = _inertial_minus_applied_wrenches(
        model, q, v, a, external_wrenches
    )

    # Generalized force = J^T * wrench, via vjp of the linear-in-v velocity
    # map.  body_velocities returns (R, p, w, pd); only (w, pd) depend on v.
    def vel_of_v(vv):
        _, _, w_, pd_ = body_velocities(model, q, vv)
        return w_, pd_

    _, vjp_fn = jax.vjp(vel_of_v, v)
    (tau,) = vjp_fn((torque, force))

    # Viscous joint damping enters as an applied force -D v, so it adds +D v
    # to the required generalized force.
    tau = tau + model.damping * v
    return tau


def mass_matrix(model: Model, q):
    """M(q) = d(ID)/da at a = 0 (symmetric positive definite)."""
    z = jnp.zeros(model.nv, dtype=q.dtype)
    return jax.jacfwd(lambda aa: inverse_dynamics(model, q, z, aa))(z)


def bias_forces(model: Model, q, v, external_wrenches: Optional[tuple] = None):
    """h(q, v) = ID(q, v, 0): Coriolis + gravity + damping - external."""
    z = jnp.zeros(model.nv, dtype=q.dtype)
    return inverse_dynamics(model, q, v, z, external_wrenches)


def forward_dynamics(
    model: Model,
    q,
    v,
    tau_applied,
    external_wrenches: Optional[tuple] = None,
):
    """a = M(q)^{-1} (tau_applied - h(q, v)); used by the simulator."""
    M = mass_matrix(model, q)
    h = bias_forces(model, q, v, external_wrenches)
    return jnp.linalg.solve(M, tau_applied - h)
