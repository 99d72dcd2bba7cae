"""Quaternion / rotation utilities.

Conventions (match Drake's, which the reference inherits via MultibodyPlant):
  * quaternions are [w, x, y, z] (scalar first), Hamilton product,
  * ``quat_to_rot(q)`` returns R such that ``p_world = R @ p_body``,
  * floating-base generalized velocity is ``[w_WB_W, v_WB_W]`` -- angular
    velocity of the body in world, expressed in world, then translational
    velocity of the body origin in world.

All functions are elementwise-jax and differentiable; batched via vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3-vector -> skew-symmetric matrix such that skew(v) @ u == cross(v, u)."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array(
        [
            [zero, -z, y],
            [z, zero, -x],
            [-y, x, zero],
        ]
    )


def unskew(m):
    """Inverse of skew (assumes m is skew-symmetric; averages for robustness)."""
    return 0.5 * jnp.array(
        [m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]]
    )


def quat_mul(a, b):
    """Hamilton product a*b, scalar-first."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_conj(q):
    return jnp.array([q[0], -q[1], -q[2], -q[3]])


def quat_to_rot(q):
    """Rotation matrix from (not-necessarily-normalized) quaternion.

    Uses the homogeneous form divided by |q|^2 so that the map is smooth in
    the raw quaternion coordinates (the optimizer treats quaternion entries
    as unconstrained decision variables and renormalizes between steps, like
    the reference's NormalizeQuaternions at trajectory_optimizer.cc:2691-2707).
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    return jnp.array(
        [
            [
                1 - s * (y * y + z * z),
                s * (x * y - z * w),
                s * (x * z + y * w),
            ],
            [
                s * (x * y + z * w),
                1 - s * (x * x + z * z),
                s * (y * z - x * w),
            ],
            [
                s * (x * z - y * w),
                s * (y * z + x * w),
                1 - s * (x * x + y * y),
            ],
        ]
    )


def rot_to_quat(R):
    """Quaternion (scalar first, w >= 0) from a rotation matrix.

    Uses the branch-free Shepperd-style construction with jnp.where so it is
    safe under vmap (no data-dependent python control flow).
    """
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    # Four candidate constructions; pick the numerically best.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - R[0, 0] + R[1, 1] - R[2, 2], 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - R[0, 0] - R[1, 1] + R[2, 2], 1e-12)) / 2.0
    case0 = jnp.array(
        [
            qw,
            (R[2, 1] - R[1, 2]) / (4 * qw),
            (R[0, 2] - R[2, 0]) / (4 * qw),
            (R[1, 0] - R[0, 1]) / (4 * qw),
        ]
    )
    case1 = jnp.array(
        [
            (R[2, 1] - R[1, 2]) / (4 * qx),
            qx,
            (R[0, 1] + R[1, 0]) / (4 * qx),
            (R[0, 2] + R[2, 0]) / (4 * qx),
        ]
    )
    case2 = jnp.array(
        [
            (R[0, 2] - R[2, 0]) / (4 * qy),
            (R[0, 1] + R[1, 0]) / (4 * qy),
            qy,
            (R[1, 2] + R[2, 1]) / (4 * qy),
        ]
    )
    case3 = jnp.array(
        [
            (R[1, 0] - R[0, 1]) / (4 * qz),
            (R[0, 2] + R[2, 0]) / (4 * qz),
            (R[1, 2] + R[2, 1]) / (4 * qz),
            qz,
        ]
    )
    mags = jnp.array([qw, qx, qy, qz])
    best = jnp.argmax(mags)
    q = jnp.where(
        best == 0,
        case0,
        jnp.where(best == 1, case1, jnp.where(best == 2, case2, case3)),
    )
    return q * jnp.sign(jnp.where(q[0] == 0, 1.0, q[0]))


def axis_angle_to_rot(axis, angle):
    """Rodrigues formula; ``axis`` must be unit length."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    K = skew(axis)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def rpy_to_rot(rpy):
    """URDF-style roll-pitch-yaw (extrinsic x-y-z) to rotation matrix.

    R = Rz(yaw) @ Ry(pitch) @ Rx(roll), matching Drake's RollPitchYaw.
    """
    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def quat_rate_matrix(q):
    """N_quat(q): maps world-frame angular velocity w to qdot = N_quat @ w.

    From Rdot = skew(w) R and q = [w,x,y,z]:  qdot = 0.5 * [0, w] (x) q.
    """
    w, x, y, z = q[0], q[1], q[2], q[3]
    return 0.5 * jnp.array(
        [
            [-x, -y, -z],
            [w, z, -y],
            [-z, w, x],
            [y, -x, w],
        ]
    )


def quat_rate_pinv(q):
    """N_quat^+(q): maps qdot -> world angular velocity w (left pseudo-inverse).

    For unit q, N_quat^T N_quat = I/4, so the pseudo-inverse is 4 N_quat^T.
    This mirrors Drake's MapQDotToVelocity used by the reference at
    trajectory_optimizer.cc:1633-1647.
    """
    return 4.0 * quat_rate_matrix(q).T


def normalize_quat(q):
    return q / jnp.linalg.norm(q)


def rpy_to_rot_np(rpy):
    """Numpy rpy->R for model-build time (URDF parsing must not dispatch
    eager device ops -- each one is a host<->device round trip)."""
    import numpy as np

    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def make_frame_from_z(u):
    """Deterministic orthonormal frame [v, w, u] with given unit z-axis u.

    Matches Drake's RotationMatrix::MakeFromOneUnitVector construction used
    by its URDF planar-joint parsing: take the basis vector e_m with the
    smallest |u_m|, Gram-Schmidt it against u to get the x-axis, then
    y = u x x.  Static (numpy-friendly) -- used at model-build time only.
    """
    import numpy as np

    u = np.asarray(u, dtype=np.float64)
    u = u / np.linalg.norm(u)
    m = int(np.argmin(np.abs(u)))
    e = np.zeros(3)
    e[m] = 1.0
    v = e - (e @ u) * u
    v = v / np.linalg.norm(v)
    w = np.cross(u, v)
    return np.stack([v, w, u], axis=1)  # columns are x, y, z axes
