"""Differentiable signed distances for primitive collision pairs.

Behavioral replacement for Drake's
``QueryObject::ComputeSignedDistancePairwiseClosestPoints`` as consumed by
the reference's contact model (optimizer/trajectory_optimizer.cc:273-385).
Differences, by design:

  * the candidate pair set is enumerated statically at model build time
    (jit needs static shapes) instead of per-query with a distance
    threshold; the force law itself decays to ~0 beyond the smoothing
    length so distant pairs simply contribute nothing,
  * every distance is smooth almost everywhere and safe to differentiate
    (guarded norms), which is what lets the optimizer take exact jacfwd
    derivatives of contact forces instead of the reference's finite
    differences.

Each pair function returns ``(phi, nhat, p_a, p_b)`` where ``phi`` is the
signed distance, ``nhat`` is the world-frame unit normal pointing *from
geometry A toward geometry B* (the reference's ``-nhat_BA_W``), and
``p_a`` / ``p_b`` are the world-frame witness points on each surface.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from idto_tpu.models import mat3
from idto_tpu.models.model import GeomType

_EPS = 1e-12


def _safe_norm(x, axis=-1):
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + _EPS)


def _point_box_distance(p, half):
    """Signed distance from point ``p`` to a box with half-extents ``half``
    (box frame), plus the outward unit normal at the closest surface point
    and the closest point itself."""
    q = jnp.abs(p) - half
    outside = jnp.maximum(q, 0.0)
    dist_out = _safe_norm(outside)
    dist_in = jnp.minimum(jnp.max(q), 0.0)
    phi = jnp.where(jnp.max(q) > 0.0, dist_out, dist_in)

    # Closest point on (or inside-projected to) the surface.
    clamped = jnp.clip(p, -half, half)
    # Inside: push to the nearest face (one-hot select; dynamic-index
    # scatters are pathological on TPU).
    face = jnp.argmax(q)  # nearest face axis when inside
    onehot = (jnp.arange(3) == face).astype(p.dtype)
    pf = jnp.sum(onehot * p)
    sign = jnp.sign(jnp.where(pf == 0, 1.0, pf))
    inside_pt = clamped * (1 - onehot) + onehot * sign * half
    closest = jnp.where(jnp.max(q) > 0.0, clamped, inside_pt)

    # Outward normal: gradient direction outside, face normal inside.
    n_out = (p - clamped) / dist_out
    n_in = onehot * sign
    normal = jnp.where(jnp.max(q) > 0.0, n_out, n_in)
    return phi, normal, closest


def _point_capsule_distance(p, radius, half_len):
    """Signed distance from point to a z-aligned capsule (capsule frame)."""
    z = jnp.clip(p[2], -half_len, half_len)
    seg_pt = jnp.array([0.0, 0.0, 1.0], dtype=p.dtype) * z
    d = p - seg_pt
    dist = _safe_norm(d)
    phi = dist - radius
    normal = d / dist
    closest = seg_pt + normal * radius
    return phi, normal, closest


def _point_cylinder_distance(p, radius, half_len):
    """Signed distance from point to a z-aligned finite cylinder with flat
    caps (cylinder frame)."""
    rho = _safe_norm(p[:2])
    dr = rho - radius
    dz = jnp.abs(p[2]) - half_len
    d2 = jnp.stack([dr, dz])
    outside = jnp.maximum(d2, 0.0)
    phi = _safe_norm(outside) + jnp.minimum(jnp.maximum(dr, dz), 0.0)

    radial_dir = p[:2] / rho
    sz = jnp.sign(jnp.where(p[2] == 0, 1.0, p[2]))
    # Closest surface point & normal, case-split on the dominant face.
    # Outside barrel / cap / edge handled by clamping.
    rho_c = jnp.minimum(rho, radius)
    z_c = jnp.clip(p[2], -half_len, half_len)
    edge_pt = jnp.array(
        [radial_dir[0] * radius, radial_dir[1] * radius, 0.0], dtype=p.dtype
    ).at[2].set(jnp.clip(p[2], -half_len, half_len))
    cap_pt = jnp.array(
        [radial_dir[0] * rho_c, radial_dir[1] * rho_c, 0.0], dtype=p.dtype
    ).at[2].set(sz * half_len)
    is_outside = jnp.maximum(dr, dz) > 0.0
    out_pt = jnp.where(dr > 0.0, edge_pt, cap_pt)
    out_n = (p - out_pt) / jnp.where(
        is_outside, _safe_norm(p - out_pt), 1.0
    )
    # Inside: nearest of barrel vs caps.
    barrel_closer = -dr < -dz
    in_pt = jnp.where(barrel_closer, edge_pt, cap_pt)
    in_n = jnp.where(
        barrel_closer,
        jnp.array([radial_dir[0], radial_dir[1], 0.0], dtype=p.dtype),
        jnp.array([0.0, 0.0, 1.0], dtype=p.dtype) * sz,
    )
    closest = jnp.where(is_outside, out_pt, in_pt)
    normal = jnp.where(is_outside, out_n, in_n)
    _ = z_c
    return phi, normal, closest


def sphere_vs_point_shape(
    shape_type: GeomType, params_b, R_b, p_b, center_a, radius_a
):
    """Distance between a sphere (A) and a point-queryable shape (B).

    Everything in world frame; (R_b, p_b) is the shape pose.
    """
    # Sphere center in shape frame.
    c_local = mat3.tmv(R_b, center_a - p_b)
    if shape_type == GeomType.BOX:
        phi_pt, n_local, closest_local = _point_box_distance(
            c_local, params_b[:3]
        )
    elif shape_type == GeomType.CAPSULE:
        phi_pt, n_local, closest_local = _point_capsule_distance(
            c_local, params_b[0], params_b[1]
        )
    elif shape_type == GeomType.CYLINDER:
        phi_pt, n_local, closest_local = _point_cylinder_distance(
            c_local, params_b[0], params_b[1]
        )
    elif shape_type == GeomType.SPHERE:
        dist = _safe_norm(c_local)
        phi_pt = dist - params_b[0]
        n_local = c_local / dist
        closest_local = n_local * params_b[0]
    elif shape_type == GeomType.HALFSPACE:
        # Half-space occupies z <= 0 in its frame.
        phi_pt = c_local[2]
        n_local = jnp.array([0.0, 0.0, 1.0], dtype=c_local.dtype)
        closest_local = c_local.at[2].set(0.0)
    else:
        raise NotImplementedError(f"shape {shape_type}")

    phi = phi_pt - radius_a
    # n_local points from shape B toward the sphere A; flip for A->B.
    n_world = -mat3.mv(R_b, n_local)
    p_b_witness = mat3.mv(R_b, closest_local) + p_b
    p_a_witness = center_a + n_world * radius_a
    return phi, n_world, p_a_witness, p_b_witness


def signed_distance(
    type_a: GeomType,
    params_a,
    R_a,
    p_a,
    type_b: GeomType,
    params_b,
    R_b,
    p_b,
):
    """Signed distance between two primitive geometries (world frame).

    Static dispatch on the (type_a, type_b) pair; returns
    (phi, nhat_AB_W, witness_on_A_W, witness_on_B_W).
    """
    ta, tb = GeomType(type_a), GeomType(type_b)
    point_shapes = (
        GeomType.BOX,
        GeomType.CAPSULE,
        GeomType.CYLINDER,
        GeomType.SPHERE,
        GeomType.HALFSPACE,
    )
    if ta == GeomType.SPHERE and tb in point_shapes:
        return sphere_vs_point_shape(tb, params_b, R_b, p_b, p_a, params_a[0])
    if tb == GeomType.SPHERE and ta in point_shapes:
        phi, n, wa, wb = sphere_vs_point_shape(
            ta, params_a, R_a, p_a, p_b, params_b[0]
        )
        return phi, -n, wb, wa
    if ta == GeomType.BOX and tb == GeomType.BOX:
        return _box_vs_box(params_a, R_a, p_a, params_b, R_b, p_b)
    if ta == GeomType.CAPSULE and tb in (GeomType.BOX, GeomType.HALFSPACE):
        return _capsule_vs_shape(params_a, R_a, p_a, tb, params_b, R_b, p_b)
    if tb == GeomType.CAPSULE and ta in (GeomType.BOX, GeomType.HALFSPACE):
        phi, n, wa, wb = _capsule_vs_shape(
            params_b, R_b, p_b, ta, params_a, R_a, p_a
        )
        return phi, -n, wb, wa
    if ta == GeomType.CAPSULE and tb == GeomType.CAPSULE:
        return _capsule_vs_capsule(params_a, R_a, p_a, params_b, R_b, p_b)
    raise NotImplementedError(
        f"signed distance for pair ({ta.name}, {tb.name}) not implemented"
    )


def _box_vs_box(params_a, R_a, p_a, params_b, R_b, p_b):
    """Approximate box-box distance by sampling each box's 8 corners
    against the other box and taking the closest feature (both directions
    for symmetry).  Exact for vertex-face contact -- the dominant case in
    the reference suite (robot torso / cube resting on a large flat box) --
    and a smooth usable bound otherwise."""
    import itertools

    def corners(half):
        signs = jnp.array(
            list(itertools.product([-1.0, 1.0], repeat=3)), dtype=half.dtype
        )
        return signs * half  # (8, 3)

    def corners_vs_box(c_world, R_box, p_box, half, flip):
        """Vmapped: each world corner against a box; returns per-corner
        (phi, nhat_AB, witness_corner_side, witness_box_side)."""

        def one(c):
            c_local = mat3.tmv(R_box, c - p_box)
            phi, n_local, closest_local = _point_box_distance(c_local, half)
            n_w = mat3.mv(R_box, n_local)
            wbox = mat3.mv(R_box, closest_local) + p_box
            return phi, jnp.where(flip, -n_w, n_w), c, wbox

        return jax.vmap(one)(c_world)

    ca_world = mat3.mv(R_a, corners(params_a[:3])) + p_a
    phi_a, n_a, wc_a, wbox_a = corners_vs_box(
        ca_world, R_b, p_b, params_b[:3], True
    )
    i_a = jnp.argmin(phi_a)
    best = (phi_a[i_a], n_a[i_a], wc_a[i_a], wbox_a[i_a])

    cb_world = mat3.mv(R_b, corners(params_b[:3])) + p_b
    phi_b, n_b, wc_b, wbox_b = corners_vs_box(
        cb_world, R_a, p_a, params_a[:3], False
    )
    i_b = jnp.argmin(phi_b)
    cand = (phi_b[i_b], n_b[i_b], wbox_b[i_b], wc_b[i_b])
    pick = cand[0] < best[0]
    return tuple(jnp.where(pick, c, b) for c, b in zip(cand, best))


def _capsule_vs_capsule(params_a, R_a, p_a, params_b, R_b, p_b):
    """Capsule vs capsule: closest points between the two axis segments
    (clamped-projection algorithm, branch-free with safe divisions), then
    sphere-sphere between those points.  Needed by models with multiple
    capsule limbs (e.g. the punyoid's two arms)."""
    ra, ha = params_a[0], params_a[1]
    rb, hb = params_b[0], params_b[1]
    da = R_a[:, 2] * ha  # half-axis vectors
    db = R_b[:, 2] * hb
    r = p_a - p_b
    A = jnp.sum(da * da)
    B = jnp.sum(da * db)
    C = jnp.sum(db * db)
    D = jnp.sum(da * r)
    E = jnp.sum(db * r)
    denom = A * C - B * B
    # Segment params s, t in [-1, 1]: closest points p_a + s*da, p_b + t*db.
    s = jnp.clip(
        (B * E - C * D) / jnp.where(denom < 1e-12, 1.0, denom), -1.0, 1.0
    )
    t = jnp.clip((B * s + E) / jnp.where(C < 1e-12, 1.0, C), -1.0, 1.0)
    # Re-project s for the clamped t (one Gauss-Seidel pass is exact for
    # segment pairs).
    s = jnp.clip((B * t - D) / jnp.where(A < 1e-12, 1.0, A), -1.0, 1.0)
    ca = p_a + s * da
    cb = p_b + t * db
    d = _safe_norm(ca - cb)
    n_ab = (cb - ca) / d  # from A toward B
    phi = d - ra - rb
    wa = ca + n_ab * ra
    wb = cb - n_ab * rb
    return phi, n_ab, wa, wb


def _capsule_vs_shape(params_cap, R_c, p_c, shape_type, params_s, R_s, p_s):
    """Capsule (A) vs point-queryable shape (B): sample both capsule
    endpoints, take a smooth-min weighting of the closer one.

    Adequate for capsule feet/links resting on large flat geometry (the only
    capsule pairs in the reference suite).
    """
    radius, hl = params_cap[0], params_cap[1]
    axis_w = R_c[:, 2]
    ends = [p_c + hl * axis_w, p_c - hl * axis_w]
    results = [
        sphere_vs_point_shape(shape_type, params_s, R_s, p_s, e, radius)
        for e in ends
    ]
    phi0, phi1 = results[0][0], results[1][0]
    pick0 = phi0 <= phi1
    phi = jnp.where(pick0, phi0, phi1)
    n = jnp.where(pick0, results[0][1], results[1][1])
    wa = jnp.where(pick0, results[0][2], results[1][2])
    wb = jnp.where(pick0, results[0][3], results[1][3])
    return phi, n, wa, wb
