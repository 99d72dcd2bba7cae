"""Forward kinematics and velocity maps -- level-scheduled and batched.

TPU-first design notes: a naive tree recursion emits O(num_joints) tiny
3x3 ops, which multiplies badly under the AD nesting the optimizer wraps
around it (jvp^2 for accelerations, vjp for generalized forces, jacfwd for
dtau/dq).  Instead:

  * all joint-local transforms are computed in one *batched* op per joint
    TYPE (model.type_groups), e.g. all 12 cheetah revolute joints in a
    single batched axis-angle evaluation,
  * world poses propagate level by level through the tree
    (model.levels): each level is one batched gather + compose, so the
    sequential chain is O(tree depth), not O(num joints).

The whole-body kinematics remain the foundation of the AD-first dynamics:
velocities and accelerations are obtained by pushing tangents through
:func:`forward_kinematics` with ``jax.jvp`` (see dynamics.py).

Replaces (behaviorally): Drake FK + ``MakeQDotToVelocityMap`` /
``MakeVelocityToQDotMap`` used by the reference at
optimizer/trajectory_optimizer.cc:1633-1661.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from idto_tpu.models import mat3
from idto_tpu.models.model import JointType, Model
from idto_tpu.models.rotations import (
    quat_rate_matrix,
    quat_rate_pinv,
    quat_to_rot,
)


def _batched_axis_angle(axes, angles):
    """(n,3) axes, (n,) angles -> (n,3,3) rotations (Rodrigues)."""
    c = jnp.cos(angles)[:, None, None]
    s = jnp.sin(angles)[:, None, None]
    zeros = jnp.zeros_like(axes[:, 0])
    K = jnp.stack(
        [
            jnp.stack([zeros, -axes[:, 2], axes[:, 1]], axis=-1),
            jnp.stack([axes[:, 2], zeros, -axes[:, 0]], axis=-1),
            jnp.stack([-axes[:, 1], axes[:, 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=axes.dtype)[None]
    return eye + s * K + (1.0 - c) * mat3.mul(K, K)


def _local_transforms(model: Model, q):
    """Child-frame pose in the PARENT LINK frame for every joint:
    X_PC(q_j) = X_PJ * X_J(q_j).  Returns ((nj,3,3), (nj,3))."""
    nj = model.num_joints
    dtype = q.dtype
    R_j = jnp.tile(jnp.eye(3, dtype=dtype), (nj, 1, 1))
    p_j = jnp.zeros((nj, 3), dtype=dtype)

    for jtype, js in model.type_groups:
        jt = JointType(jtype)
        idx = np.asarray(js)
        if jt == JointType.FIXED:
            continue
        qs = np.asarray([model.q_starts[j] for j in js])
        if jt == JointType.REVOLUTE:
            angles = q[qs]
            R_j = R_j.at[idx].set(
                _batched_axis_angle(model.axis[idx].astype(dtype), angles)
            )
        elif jt == JointType.PRISMATIC:
            disp = q[qs]
            p_j = p_j.at[idx].set(
                model.axis[idx].astype(dtype) * disp[:, None]
            )
        elif jt == JointType.PLANAR:
            # q = [x, y, theta] in the aligned joint frame (z == axis).
            xy = jnp.stack([q[qs], q[qs + 1]], axis=-1)
            theta = q[qs + 2]
            zaxis = jnp.tile(
                jnp.array([0.0, 0.0, 1.0], dtype=dtype), (len(js), 1)
            )
            R_j = R_j.at[idx].set(_batched_axis_angle(zaxis, theta))
            p_j = p_j.at[idx].set(
                jnp.concatenate([xy, jnp.zeros_like(theta)[:, None]], axis=-1)
            )
        elif jt == JointType.FLOATING:
            # q = [qw, qx, qy, qz, x, y, z]
            quats = jnp.stack([q[qs + i] for i in range(4)], axis=-1)
            pos = jnp.stack([q[qs + 4 + i] for i in range(3)], axis=-1)
            R_j = R_j.at[idx].set(jax.vmap(quat_to_rot)(quats))
            p_j = p_j.at[idx].set(pos)
        else:
            raise ValueError(f"unknown joint type {jt}")

    # Compose with the fixed joint frame: R_pc = R_pj R_j, p_pc = p_pj + R_pj p_j.
    R_pj = model.R_pj.astype(dtype)
    R_pc = mat3.mul(R_pj, R_j)
    p_pc = model.p_pj.astype(dtype) + mat3.mv(R_pj, p_j)
    return R_pc, p_pc


def forward_kinematics(model: Model, q):
    """World poses of every link: returns (R: (nl,3,3), p: (nl,3))."""
    nl = model.num_links
    dtype = q.dtype
    R_pc, p_pc = _local_transforms(model, q)

    R = jnp.tile(jnp.eye(3, dtype=dtype), (nl, 1, 1))
    p = jnp.zeros((nl, 3), dtype=dtype)
    for d, level in enumerate(model.levels):
        idx = np.asarray(level)
        parents = np.asarray([model.joint_parents[j] for j in level])
        if d == 0:
            # Roots: parent is the world frame.
            R = R.at[idx].set(R_pc[idx])
            p = p.at[idx].set(p_pc[idx])
        else:
            R_par = R[parents]
            p_par = p[parents]
            R = R.at[idx].set(mat3.mul(R_par, R_pc[idx]))
            p = p.at[idx].set(p_par + mat3.mv(R_par, p_pc[idx]))
    return R, p


def _floating_joints(model: Model):
    return [
        j
        for j in range(model.num_joints)
        if JointType(model.joint_types[j]) == JointType.FLOATING
    ]


def v_to_qdot(model: Model, q, v):
    """qdot = N(q) v.  For every joint type except floating the map is the
    identity on the joint's coordinates (and the global orderings of q and
    v coincide), so only quaternion blocks need work."""
    floats = _floating_joints(model)
    if not floats:
        return v
    # Build by segments: copy v, inserting the quaternion-rate rows.
    segs = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        nvj = model.joint_nv(j)
        if jt == JointType.FLOATING:
            quat = jax.lax.dynamic_slice_in_dim(q, model.q_starts[j], 4)
            w = jax.lax.dynamic_slice_in_dim(v, model.v_starts[j], 3)
            segs.append(quat_rate_matrix(quat) @ w)
            segs.append(
                jax.lax.dynamic_slice_in_dim(v, model.v_starts[j] + 3, 3)
            )
        elif nvj > 0:
            segs.append(
                jax.lax.dynamic_slice_in_dim(v, model.v_starts[j], nvj)
            )
    return jnp.concatenate(segs)


def qdot_to_v(model: Model, q, qdot):
    """v = N^+(q) qdot.  This is the map the reference uses to derive
    velocities from configurations: v_t = N^+(q_t) (q_t - q_{t-1}) / dt
    (trajectory_optimizer.cc:179-191)."""
    floats = _floating_joints(model)
    if not floats:
        return qdot
    segs = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        nqj = model.joint_nq(j)
        if jt == JointType.FLOATING:
            quat = jax.lax.dynamic_slice_in_dim(q, model.q_starts[j], 4)
            qd4 = jax.lax.dynamic_slice_in_dim(qdot, model.q_starts[j], 4)
            segs.append(quat_rate_pinv(quat) @ qd4)
            segs.append(
                jax.lax.dynamic_slice_in_dim(qdot, model.q_starts[j] + 4, 3)
            )
        elif nqj > 0:
            segs.append(
                jax.lax.dynamic_slice_in_dim(qdot, model.q_starts[j], nqj)
            )
    return jnp.concatenate(segs)


def nplus_matrix(model: Model, q):
    """Materialized N^+(q): (nv, nq).  Identity except for quaternion
    blocks.  Used for the Gauss-Newton velocity partials dv/dq = +-N^+/dt
    (trajectory_optimizer.cc:962-973)."""
    floats = _floating_joints(model)
    dtype = q.dtype
    if not floats:
        return jnp.eye(model.nv, model.nq, dtype=dtype)
    Np = jnp.zeros((model.nv, model.nq), dtype=dtype)
    # Identity for all non-floating coordinates.
    rows, cols = [], []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        if jt == JointType.FLOATING:
            continue
        for i in range(model.joint_nv(j)):
            rows.append(model.v_starts[j] + i)
            cols.append(model.q_starts[j] + i)
    if rows:
        Np = Np.at[jnp.array(rows), jnp.array(cols)].set(1.0)
    for j in floats:
        qs, vs = model.q_starts[j], model.v_starts[j]
        quat = jax.lax.dynamic_slice_in_dim(q, qs, 4)
        Np = jax.lax.dynamic_update_slice(
            Np, quat_rate_pinv(quat).astype(dtype), (vs, qs)
        )
        Np = jax.lax.dynamic_update_slice(
            Np, jnp.eye(3, dtype=dtype), (vs + 3, qs + 4)
        )
    return Np


def normalize_quaternions(model: Model, q):
    """Renormalize the quaternion block of every floating joint
    (reference: NormalizeQuaternions, trajectory_optimizer.cc:2691-2707)."""
    for j in _floating_joints(model):
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
    W = mat3.mul_t(Rd, R)
    w = 0.5 * jnp.stack(
        [
            W[:, 2, 1] - W[:, 1, 2],
            W[:, 0, 2] - W[:, 2, 0],
            W[:, 1, 0] - W[:, 0, 1],
        ],
        axis=-1,
    )
    return R, p, w, pd
