"""SoA forward kinematics and velocity maps (mirrors models/kinematics).

All functions take/return component-leading arrays with a flat trailing
instance axis N (see soa/__init__ for the layout contract).  Two
structural differences from the AoS implementation, both TPU-motivated:

  * scatter-free level propagation: links are processed in level order and
    CONCATENATED, then un-permuted with one static gather -- the AoS
    version scatters into the link axis per level (``.at[idx].set``),
    which lowers to real scatters over the huge batch,
  * per-joint-type batching identical to AoS (one batched evaluation per
    joint TYPE), but the type-group results are also concatenated + one
    static gather instead of scattered.

Reference behavior being reproduced: Drake FK + MakeQDotToVelocityMap /
MakeVelocityToQDotMap as used at trajectory_optimizer.cc:179-191 and
:1633-1661 (via the AoS implementation, which the parity suite pins to
hand-derived oracles).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from idto_tpu.models.model import JointType, Model
from idto_tpu.models.rotations import quat_rate_matrix, quat_to_rot
from idto_tpu.soa import mat3


def _skew(axes):
    """(g, 3) axes (possibly traced -- model.axis is a pytree leaf and the
    model may be a jit argument) -> (3, 3, g) skew matrices."""
    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]
    zero = jnp.zeros_like(ax)
    return jnp.stack([
        jnp.stack([zero, -az, ay], axis=0),
        jnp.stack([az, zero, -ax], axis=0),
        jnp.stack([-ay, ax, zero], axis=0),
    ], axis=0)


def _axis_angle(axes, angles):
    """(g, 3) axes (traced or numpy), (g, N) angles -> (3, 3, g, N)."""
    dtype = angles.dtype
    K = _skew(jnp.asarray(axes, dtype=dtype))[..., None]  # (3,3,g,1)
    KK = mat3.mul(K, K)
    c = jnp.cos(angles)[None, None]  # (1, 1, g, N)
    s = jnp.sin(angles)[None, None]
    eye = jnp.eye(3, dtype=dtype)[:, :, None, None]
    return eye + s * K + (1.0 - c) * KK


def local_transforms(model: Model, q):
    """Child pose in the parent link frame per joint: q (nq, N) ->
    (R_pc (3, 3, nj, N), p_pc (3, nj, N))."""
    nj = model.num_joints
    dtype = q.dtype
    N = q.shape[-1]

    order = []
    R_parts, p_parts = [], []
    for jtype, js in model.type_groups:
        jt = JointType(jtype)
        g = len(js)
        order.extend(js)
        qs = np.asarray([model.q_starts[j] for j in js])
        if jt == JointType.FIXED:
            R_g = jnp.broadcast_to(
                jnp.eye(3, dtype=dtype)[:, :, None, None], (3, 3, g, N)
            )
            p_g = jnp.zeros((3, g, N), dtype=dtype)
        elif jt == JointType.REVOLUTE:
            angles = q[qs]  # (g, N)
            R_g = _axis_angle(jnp.asarray(model.axis)[np.asarray(js)], angles)
            p_g = jnp.zeros((3, g, N), dtype=dtype)
        elif jt == JointType.PRISMATIC:
            disp = q[qs]  # (g, N)
            ax = jnp.asarray(
                model.axis, dtype=dtype
            )[np.asarray(js)].T[:, :, None]  # (3, g, 1)
            R_g = jnp.broadcast_to(
                jnp.eye(3, dtype=dtype)[:, :, None, None], (3, 3, g, N)
            )
            p_g = ax * disp[None]
        elif jt == JointType.PLANAR:
            # q = [x, y, theta] in the aligned joint frame (z == axis).
            xy = jnp.stack([q[qs], q[qs + 1]], axis=0)  # (2, g, N)
            theta = q[qs + 2]
            zaxes = np.tile(np.array([0.0, 0.0, 1.0]), (g, 1))
            R_g = _axis_angle(zaxes, theta)
            p_g = jnp.concatenate(
                [xy, jnp.zeros((1, g, N), dtype=dtype)], axis=0
            )
        elif jt == JointType.FLOATING:
            # q = [qw, qx, qy, qz, x, y, z]
            quats = jnp.stack([q[qs + i] for i in range(4)], axis=0)
            pos = jnp.stack([q[qs + 4 + i] for i in range(3)], axis=0)
            R_g = quat_to_rot(quats)  # component-leading by construction
            p_g = pos
        else:
            raise ValueError(f"unknown joint type {jt}")
        R_parts.append(R_g)
        p_parts.append(p_g)

    inv = np.empty(nj, dtype=np.int64)
    inv[np.asarray(order)] = np.arange(nj)
    R_j = jnp.concatenate(R_parts, axis=2)[:, :, inv, :]
    p_j = jnp.concatenate(p_parts, axis=1)[:, inv, :]

    # Compose with the fixed joint frame.
    R_pj = mat3.from_aos_mat(jnp.asarray(model.R_pj, dtype=dtype))[..., None]
    p_pj = mat3.from_aos_vec(jnp.asarray(model.p_pj, dtype=dtype))[..., None]
    R_pc = mat3.mul(R_pj, R_j)
    p_pc = p_pj + mat3.mv(R_pj, p_j)
    return R_pc, p_pc


def forward_kinematics(model: Model, q):
    """World link poses: q (nq, N) -> (R (3, 3, nl, N), p (3, nl, N))."""
    nl = model.num_links
    R_pc, p_pc = local_transforms(model, q)

    order = [j for level in model.levels for j in level]
    pos = {j: i for i, j in enumerate(order)}
    R_acc, p_acc = [], []
    for d, level in enumerate(model.levels):
        idx = np.asarray(level)
        R_loc = R_pc[:, :, idx, :]
        p_loc = p_pc[:, idx, :]
        if d == 0:
            R_lvl, p_lvl = R_loc, p_loc
        else:
            ppos = np.asarray([pos[model.joint_parents[j]] for j in level])
            R_prev = jnp.concatenate(R_acc, axis=2)
            p_prev = jnp.concatenate(p_acc, axis=1)
            R_par = R_prev[:, :, ppos, :]
            p_par = p_prev[:, ppos, :]
            R_lvl = mat3.mul(R_par, R_loc)
            p_lvl = p_par + mat3.mv(R_par, p_loc)
        R_acc.append(R_lvl)
        p_acc.append(p_lvl)

    inv = np.empty(nl, dtype=np.int64)
    inv[np.asarray(order)] = np.arange(nl)
    R = jnp.concatenate(R_acc, axis=2)[:, :, inv, :]
    p = jnp.concatenate(p_acc, axis=1)[:, inv, :]
    return R, p


def _quat_rate_pinv(quat):
    """Component-leading N_quat^+: (4, N) -> (3, 4, N).  rotations.
    quat_rate_pinv uses ``.T``, which reverses ALL axes and is only
    correct for unbatched (4,) input; here only the matrix axes swap."""
    import jax.numpy as jnp

    return 4.0 * jnp.swapaxes(quat_rate_matrix(quat), 0, 1)


def _floating_joints(model: Model):
    return [
        j
        for j in range(model.num_joints)
        if JointType(model.joint_types[j]) == JointType.FLOATING
    ]


def v_to_qdot(model: Model, q, v):
    """qdot = N(q) v with (nq, N) / (nv, N) operands."""
    if not _floating_joints(model):
        return v
    segs = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        nvj = model.joint_nv(j)
        qs, vs = model.q_starts[j], model.v_starts[j]
        if jt == JointType.FLOATING:
            quat = q[qs : qs + 4]          # (4, N)
            w = v[vs : vs + 3]             # (3, N)
            Nq = quat_rate_matrix(quat)    # (4, 3, N)
            segs.append(sum(Nq[:, k] * w[k][None] for k in range(3)))
            segs.append(v[vs + 3 : vs + 6])
        elif nvj > 0:
            segs.append(v[vs : vs + nvj])
    return jnp.concatenate(segs, axis=0)


def qdot_to_v(model: Model, q, qdot):
    """v = N^+(q) qdot with (nq, N) operands."""
    if not _floating_joints(model):
        return qdot
    segs = []
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        nqj = model.joint_nq(j)
        qs = model.q_starts[j]
        if jt == JointType.FLOATING:
            quat = q[qs : qs + 4]
            qd4 = qdot[qs : qs + 4]
            Npi = _quat_rate_pinv(quat)    # (3, 4, N)
            segs.append(sum(Npi[:, k] * qd4[k][None] for k in range(4)))
            segs.append(qdot[qs + 4 : qs + 7])
        elif nqj > 0:
            segs.append(qdot[qs : qs + nqj])
    return jnp.concatenate(segs, axis=0)


def nplus_matrix(model: Model, q):
    """Materialized N^+(q): (nv, nq, N).  Identity except quaternion
    blocks (reference: dv/dq = +-N^+/dt, trajectory_optimizer.cc:962-973)."""
    dtype = q.dtype
    N = q.shape[-1]
    floats = _floating_joints(model)
    base = np.zeros((model.nv, model.nq))
    for j in range(model.num_joints):
        jt = JointType(model.joint_types[j])
        if jt == JointType.FLOATING:
            # Translational identity block; quaternion block filled below.
            for i in range(3):
                base[model.v_starts[j] + 3 + i, model.q_starts[j] + 4 + i] = 1.0
        else:
            for i in range(model.joint_nv(j)):
                base[model.v_starts[j] + i, model.q_starts[j] + i] = 1.0
    Np = jnp.broadcast_to(
        jnp.asarray(base, dtype=dtype)[:, :, None], (model.nv, model.nq, N)
    )
    for j in floats:
        qs, vs = model.q_starts[j], model.v_starts[j]
        quat = q[qs : qs + 4]
        blk = _quat_rate_pinv(quat).astype(dtype)  # (3, 4, N)
        Np = jax.lax.dynamic_update_slice(Np, blk, (vs, qs, 0))
    return Np


def body_velocities(model: Model, q, v):
    """World spatial velocities per link: returns (R, p, w, pd) with
    R (3,3,nl,N), p/w/pd (3,nl,N) -- qdot pushed through FK with jvp."""
    qdot = v_to_qdot(model, q, v)
    (R, p), (Rd, pd) = jax.jvp(
        lambda qq: forward_kinematics(model, qq), (q,), (qdot,)
    )
    W = mat3.mul_t(Rd, R)
    w = 0.5 * jnp.stack(
        [W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]], axis=0
    )
    return R, p, w, pd
