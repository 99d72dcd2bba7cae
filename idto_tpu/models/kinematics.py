"""Forward kinematics and velocity maps.

The whole-body kinematics here are the foundation of the AD-first dynamics
design: body velocities and accelerations are obtained by pushing tangents
through :func:`forward_kinematics` with ``jax.jvp`` (see dynamics.py) instead
of hand-derived propagation rules.  The kinematic tree is small (< ~25
joints for every model in the reference suite), so the python loop below
unrolls statically into a short chain of 3x3 matmuls that XLA fuses; the
batch axes (time, scenarios) supply the TPU parallelism via vmap.

Replaces (behaviorally): Drake FK + ``MakeQDotToVelocityMap`` /
``MakeVelocityToQDotMap`` used by the reference at
optimizer/trajectory_optimizer.cc:1633-1661.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from idto_tpu.models.model import JointType, Model
from idto_tpu.models.rotations import (
    axis_angle_to_rot,
    quat_rate_matrix,
    quat_rate_pinv,
    quat_to_rot,
)


def joint_transform(jtype: JointType, axis, qj):
    """Pose (R_JC, p_JC) of the child link frame in the joint frame."""
    if jtype == JointType.FIXED:
        return jnp.eye(3, dtype=axis.dtype), jnp.zeros(3, dtype=axis.dtype)
    if jtype == JointType.REVOLUTE:
        return axis_angle_to_rot(axis, qj[0]), jnp.zeros(3, dtype=axis.dtype)
    if jtype == JointType.PRISMATIC:
        return jnp.eye(3, dtype=axis.dtype), axis * qj[0]
    if jtype == JointType.PLANAR:
        # q = [x, y, theta] in the aligned joint frame (z == rotation axis).
        R = axis_angle_to_rot(jnp.array([0.0, 0.0, 1.0], dtype=qj.dtype), qj[2])
        p = jnp.array([qj[0], qj[1], 0.0 * qj[0]])
        return R, p
    if jtype == JointType.FLOATING:
        # q = [qw, qx, qy, qz, x, y, z]
        return quat_to_rot(qj[:4]), qj[4:7]
    raise ValueError(f"unknown joint type {jtype}")


def forward_kinematics(model: Model, q):
    """World poses of every link: returns (R: (nl,3,3), p: (nl,3))."""
    Rs, ps = [], []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        qs = model.q_starts[j]
        qj = jax.lax.dynamic_slice_in_dim(q, qs, max(model.joint_nq(j), 1))
        R_jc, p_jc = joint_transform(jt, model.axis[j], qj)
        # Pose of joint frame in world.
        parent = model.joint_parents[j]
        if parent < 0:
            R_wp = jnp.eye(3, dtype=q.dtype)
            p_wp = jnp.zeros(3, dtype=q.dtype)
        else:
            R_wp, p_wp = Rs[parent], ps[parent]
        R_wj = R_wp @ model.R_pj[j]
        p_wj = p_wp + R_wp @ model.p_pj[j]
        Rs.append(R_wj @ R_jc)
        ps.append(p_wj + R_wj @ p_jc)
    return jnp.stack(Rs), jnp.stack(ps)


def v_to_qdot(model: Model, q, v):
    """qdot = N(q) v (block-diagonal per joint)."""
    out = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        if jt == JointType.FIXED:
            continue
        vs = model.v_starts[j]
        qs = model.q_starts[j]
        vj = jax.lax.dynamic_slice_in_dim(v, vs, model.joint_nv(j))
        if jt == JointType.FLOATING:
            quat = jax.lax.dynamic_slice_in_dim(q, qs, 4)
            out.append(quat_rate_matrix(quat) @ vj[:3])
            out.append(vj[3:])
        else:
            out.append(vj)
    return jnp.concatenate(out) if out else jnp.zeros(0, dtype=q.dtype)


def qdot_to_v(model: Model, q, qdot):
    """v = N^+(q) qdot.  This is the map the reference uses to derive
    velocities from configurations: v_t = N^+(q_t) (q_t - q_{t-1}) / dt
    (trajectory_optimizer.cc:179-191)."""
    out = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        if jt == JointType.FIXED:
            continue
        qs = model.q_starts[j]
        qdj = jax.lax.dynamic_slice_in_dim(qdot, qs, model.joint_nq(j))
        if jt == JointType.FLOATING:
            quat = jax.lax.dynamic_slice_in_dim(q, qs, 4)
            out.append(quat_rate_pinv(quat) @ qdj[:4])
            out.append(qdj[4:])
        else:
            out.append(qdj)
    return jnp.concatenate(out) if out else jnp.zeros(0, dtype=q.dtype)


def nplus_matrix(model: Model, q):
    """Materialized N^+(q): (nv, nq).  Used for the Gauss-Newton velocity
    partials dv/dq = +-N^+/dt (trajectory_optimizer.cc:962-973)."""
    return jax.jacfwd(lambda qd: qdot_to_v(model, q, qd))(
        jnp.zeros(model.nq, dtype=q.dtype)
    )


def normalize_quaternions(model: Model, q):
    """Renormalize the quaternion block of every floating joint
    (reference: NormalizeQuaternions, trajectory_optimizer.cc:2691-2707)."""
    for j in range(model.num_joints):
        if JointType(model.joint_types[j]) == JointType.FLOATING:
            qs = model.q_starts[j]
            quat = q[..., qs : qs + 4]
            norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
            q = q.at[..., qs : qs + 4].set(quat / norm)
    return q


def body_velocities(model: Model, q, v):
    """World-frame spatial velocities of every link.

    Returns (R, p, w, pd): rotation, origin position, angular velocity (in
    world), and origin linear velocity (in world) per link, computed by
    pushing qdot = N(q) v through forward kinematics with jvp.
    """
    qdot = v_to_qdot(model, q, v)
    (R, p), (Rd, pd) = jax.jvp(
        lambda qq: forward_kinematics(model, qq), (q,), (qdot,)
    )
    # w x R = Rdot  =>  w = vee(Rdot R^T); vectorized over links.
    W = jnp.einsum("nij,nkj->nik", Rd, R)
    w = 0.5 * jnp.stack(
        [
            W[:, 2, 1] - W[:, 1, 2],
            W[:, 0, 2] - W[:, 2, 0],
            W[:, 1, 0] - W[:, 0, 1],
        ],
        axis=-1,
    )
    return R, p, w, pd
