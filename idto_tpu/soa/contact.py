"""SoA contact: signed distances + the reference force law, instance axis
trailing.

Mirrors contact/force.py (force law of trajectory_optimizer.cc:247-386)
and the geometry/distance.py pair kernels needed by the example fleet:
sphere-vs-point-shape (sphere/box/capsule/cylinder/halfspace) and
box-vs-box (corners + 144 edge pairs).  Capsule pairs (punyo) are not
ported; ``supports_soa`` reports whether a model's pair set is covered so
the solver can fall back to the AoS path.

Layout: points/normals (3, ..., N); candidate/pair axes sit between the
component axis and N.  Conditions broadcast with [None] on the component
axis.
"""
from __future__ import annotations

import itertools

import numpy as np

import jax.numpy as jnp

from idto_tpu.models.model import GeomType, Model
from idto_tpu.soa import mat3
from idto_tpu.soa.kinematics import body_velocities

_EPS = 1e-12

_POINT_SHAPES = (
    GeomType.BOX,
    GeomType.CAPSULE,
    GeomType.CYLINDER,
    GeomType.SPHERE,
    GeomType.HALFSPACE,
)


def supports_soa(model: Model) -> bool:
    """Static: every candidate pair of the model has an SoA kernel."""
    g = model.geoms
    if g is None or not g.pairs:
        return True
    for (ia, ib) in g.pairs:
        ta, tb = GeomType(g.types[ia]), GeomType(g.types[ib])
        if ta == GeomType.SPHERE and tb in _POINT_SHAPES:
            continue
        if tb == GeomType.SPHERE and ta in _POINT_SHAPES:
            continue
        if ta == GeomType.BOX and tb == GeomType.BOX:
            continue
        return False
    return True


# -- point-to-shape distances (components axis 0, any trailing axes) --------


def _point_box(p, half):
    q = jnp.abs(p) - half
    qmax = jnp.maximum(jnp.maximum(q[0], q[1]), q[2])
    outside = jnp.maximum(q, 0.0)
    dist_out = mat3.norm(outside)
    phi = jnp.where(qmax > 0.0, dist_out, jnp.minimum(qmax, 0.0))
    clamped = jnp.clip(p, -half, half)
    face = jnp.argmax(q, axis=0)
    onehot = jnp.stack([(face == i) for i in range(3)], axis=0).astype(p.dtype)
    pf = mat3.dot(onehot, p)
    sign = jnp.sign(jnp.where(pf == 0.0, 1.0, pf))
    inside_pt = clamped * (1.0 - onehot) + onehot * (sign[None] * half)
    out = (qmax > 0.0)[None]
    closest = jnp.where(out, clamped, inside_pt)
    normal = jnp.where(out, (p - clamped) / dist_out[None], onehot * sign[None])
    return phi, normal, closest


def _point_capsule(p, radius, half_len):
    z = jnp.clip(p[2], -half_len, half_len)
    d = jnp.stack([p[0], p[1], p[2] - z], axis=0)
    dist = mat3.norm(d)
    phi = dist - radius
    normal = d / dist[None]
    seg = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=0)
    closest = seg + normal * radius[None]
    return phi, normal, closest


def _point_cylinder(p, radius, half_len):
    rho = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + _EPS)
    dr = rho - radius
    dz = jnp.abs(p[2]) - half_len
    out_r = jnp.maximum(dr, 0.0)
    out_z = jnp.maximum(dz, 0.0)
    phi = jnp.sqrt(out_r * out_r + out_z * out_z + _EPS) + jnp.minimum(
        jnp.maximum(dr, dz), 0.0
    )
    rdirx, rdiry = p[0] / rho, p[1] / rho
    sz = jnp.sign(jnp.where(p[2] == 0.0, 1.0, p[2]))
    zc = jnp.clip(p[2], -half_len, half_len)
    edge_pt = jnp.stack([rdirx * radius, rdiry * radius, zc], axis=0)
    rho_c = jnp.minimum(rho, radius)
    cap_pt = jnp.stack([rdirx * rho_c, rdiry * rho_c, sz * half_len], axis=0)
    is_out = (jnp.maximum(dr, dz) > 0.0)
    out_pt = jnp.where((dr > 0.0)[None], edge_pt, cap_pt)
    d_out = p - out_pt
    n_out = d_out / jnp.where(is_out, mat3.norm(d_out), 1.0)[None]
    barrel_closer = (-dr < -dz)[None]
    in_pt = jnp.where(barrel_closer, edge_pt, cap_pt)
    zero = jnp.zeros_like(rdirx)
    n_in = jnp.where(
        barrel_closer,
        jnp.stack([rdirx, rdiry, zero], axis=0),
        jnp.stack([zero, zero, sz], axis=0),
    )
    closest = jnp.where(is_out[None], out_pt, in_pt)
    normal = jnp.where(is_out[None], n_out, n_in)
    return phi, normal, closest


def sphere_vs_point_shape(shape_type, params_b, R_b, p_b, center_a, radius_a):
    """Sphere (A) vs point-queryable shape (B); world frame, components
    leading.  Returns (phi, nhat_AB, w_a, w_b)."""
    c_local = mat3.tmv(R_b, center_a - p_b)
    if shape_type == GeomType.BOX:
        phi_pt, n_l, cl = _point_box(c_local, params_b[:3])
    elif shape_type == GeomType.CAPSULE:
        phi_pt, n_l, cl = _point_capsule(c_local, params_b[0], params_b[1])
    elif shape_type == GeomType.CYLINDER:
        phi_pt, n_l, cl = _point_cylinder(c_local, params_b[0], params_b[1])
    elif shape_type == GeomType.SPHERE:
        dist = mat3.norm(c_local)
        phi_pt = dist - params_b[0]
        n_l = c_local / dist[None]
        cl = n_l * params_b[0][None]
    elif shape_type == GeomType.HALFSPACE:
        phi_pt = c_local[2]
        zero = jnp.zeros_like(c_local[2])
        n_l = jnp.stack([zero, zero, jnp.ones_like(c_local[2])], axis=0)
        cl = jnp.stack([c_local[0], c_local[1], zero], axis=0)
    else:  # pragma: no cover - guarded by supports_soa
        raise NotImplementedError(f"shape {shape_type}")
    phi = phi_pt - radius_a
    n_world = -mat3.mv(R_b, n_l)
    w_b = mat3.mv(R_b, cl) + p_b
    w_a = center_a + n_world * radius_a[None]
    return phi, n_world, w_a, w_b


# -- box vs box (mirrors geometry/distance._box_vs_box) ----------------------


def _box_candidates_np(dtype):
    signs = np.array(list(itertools.product([-1.0, 1.0], repeat=3)))
    faces = np.concatenate([np.eye(3), -np.eye(3)])
    return np.concatenate([signs, faces])  # (14, 3)


def _box_edges_np():
    edges = []
    for k in range(3):
        for s1, s2 in itertools.product([-1.0, 1.0], repeat=2):
            lo = [0.0, 0.0, 0.0]
            hi = [0.0, 0.0, 0.0]
            other = [i for i in range(3) if i != k]
            lo[k], hi[k] = -1.0, 1.0
            lo[other[0]] = hi[other[0]] = s1
            lo[other[1]] = hi[other[1]] = s2
            edges.append([lo, hi])
    return np.asarray(edges)  # (12, 2, 3)


def _argmin_select(phi, *fields):
    """argmin over axis 0 of phi (C, ...); one-hot-select each field --
    scalar fields (C, ...) or component-leading vector fields (3, C, ...),
    discriminated by rank (shape[0] alone is ambiguous when C == 3)."""
    i = jnp.argmin(phi, axis=0)  # (...)
    C = phi.shape[0]
    hot = jnp.stack([(i == c) for c in range(C)], axis=0).astype(phi.dtype)
    out = [jnp.sum(phi * hot, axis=0)]
    for f in fields:
        if f.ndim == phi.ndim + 1:
            out.append(jnp.sum(f * hot[None], axis=1))
        else:
            out.append(jnp.sum(f * hot, axis=0))
    return out


def _segment_segment(p1, q1, p2, q2):
    """Closest points between segments; all (3, ...)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = mat3.dot(d1, d1)
    e = mat3.dot(d2, d2)
    b = mat3.dot(d1, d2)
    c = mat3.dot(d1, r)
    f = mat3.dot(d2, r)
    denom = a * e - b * b
    s = jnp.clip((b * f - c * e) / jnp.where(denom < _EPS, 1.0, denom), 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.where(e < _EPS, 1.0, e), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.where(a < _EPS, 1.0, a), 0.0, 1.0)
    return p1 + s[None] * d1, p2 + t[None] * d2


def box_vs_box(params_a, R_a, p_a, params_b, R_b, p_b):
    """Box-box: 14 candidate points each way + 144 edge-edge pairs; same
    candidate set and tie-breaking as geometry/distance._box_vs_box."""
    dtype = R_a.dtype
    cand = jnp.asarray(_box_candidates_np(dtype), dtype=dtype)  # (14, 3)
    # (3, 14, ...) corner points in each box frame; params (k, ...) -> half
    # extents have shape (3, ...).
    half_a = params_a[:3]  # (3, P, 1)
    half_b = params_b[:3]
    # (3, 14, 1, 1) * (3, 1, P, 1) -> (3, 14, P, 1); the explicit rank-4
    # shape matters (leading-axis broadcasting right-aligns).
    ca = cand.T[:, :, None, None] * half_a[:, None]
    cb = cand.T[:, :, None, None] * half_b[:, None]

    def corners_vs_box(c_local_own, R_own, p_own, R_box, p_box, half, flip):
        c_world = mat3.mv(R_own[:, :, None], c_local_own) + p_own[:, None]
        c_in_box = mat3.tmv(R_box[:, :, None], c_world - p_box[:, None])
        phi, n_l, cl = _point_box(c_in_box, half[:, None])
        n_w = mat3.mv(R_box[:, :, None], n_l)
        wbox = mat3.mv(R_box[:, :, None], cl) + p_box[:, None]
        n_w = -n_w if flip else n_w
        return phi, n_w, c_world, wbox

    phi_a, n_a, wc_a, wb_a = corners_vs_box(ca, R_a, p_a, R_b, p_b, half_b, True)
    best = _argmin_select(phi_a, n_a, wc_a, wb_a)

    phi_b, n_b, wc_b, wb_b = corners_vs_box(cb, R_b, p_b, R_a, p_a, half_a, False)
    cand_b = _argmin_select(phi_b, n_b, wb_b, wc_b)
    pick = (cand_b[0] < best[0])
    best = [
        jnp.where(pick[None] if xa.ndim == pick.ndim + 1 else pick, xb, xa)
        for xa, xb in zip(best, cand_b)
    ]

    edges = jnp.asarray(_box_edges_np(), dtype=dtype)  # (12, 2, 3)
    # Endpoints in world: (3, 12, ...)
    def edge_world(which, R, p, half):
        # (3, 12, 1, 1) * (3, 1, P, 1) -> (3, 12, P, 1)
        pts = edges[:, which, :].T[:, :, None, None] * half[:, None]
        return mat3.mv(R[:, :, None], pts) + p[:, None]

    a0 = edge_world(0, R_a, p_a, half_a)
    a1 = edge_world(1, R_a, p_a, half_a)
    b0 = edge_world(0, R_b, p_b, half_b)
    b1 = edge_world(1, R_b, p_b, half_b)
    # Pair axis: (3, 12, 1, ...) x (3, 1, 12, ...) -> (3, 144, ...)
    sh_a = lambda x: x[:, :, None]
    sh_b = lambda x: x[:, None, :]
    caw, cbw = _segment_segment(sh_a(a0), sh_a(a1), sh_b(b0), sh_b(b1))
    d = mat3.norm(caw - cbw)  # (12, 12, ...)
    n_e = (cbw - caw) / d[None]

    def flat(x):
        if x.ndim == d.ndim + 1:  # vector field (3, 12, 12, ...)
            return x.reshape(x.shape[0], 144, *x.shape[3:])
        return x.reshape(144, *x.shape[2:])

    cand_e = _argmin_select(flat(d), flat(n_e), flat(caw), flat(cbw))
    pick_e = (cand_e[0] < best[0])
    return [
        jnp.where(pick_e[None] if xb.ndim == pick_e.ndim + 1 else pick_e,
                  xe, xb)
        for xb, xe in zip(best, cand_e)
    ]


# -- pair dispatch + force law ----------------------------------------------


def _pair_distance(ta, prm_a, Ra, pa, tb, prm_b, Rb, pb):
    ta, tb = GeomType(ta), GeomType(tb)
    if ta == GeomType.SPHERE and tb in _POINT_SHAPES:
        return sphere_vs_point_shape(tb, prm_b, Rb, pb, pa, prm_a[0])
    if tb == GeomType.SPHERE and ta in _POINT_SHAPES:
        phi, n, wa, wb = sphere_vs_point_shape(ta, prm_a, Ra, pa, pb, prm_b[0])
        return phi, -n, wb, wa
    if ta == GeomType.BOX and tb == GeomType.BOX:
        return box_vs_box(prm_a, Ra, pa, prm_b, Rb, pb)
    raise NotImplementedError(
        f"SoA pair ({ta.name}, {tb.name}); guard with supports_soa"
    )


def contact_wrenches(model: Model, q, v, params):
    """External contact wrenches: q (nq, N), v (nv, N) ->
    (torques (3, nl, N), forces (3, nl, N)).  Mirrors
    contact/force.contact_wrenches (reference force law
    trajectory_optimizer.cc:247-386)."""
    nl = model.num_links
    dtype = q.dtype
    N = q.shape[-1]
    geoms = model.geoms
    if geoms is None or not geoms.pairs:
        z = jnp.zeros((3, nl, N), dtype=dtype)
        return z, z

    R_l, p_l, w_l, pd_l = body_velocities(model, q, v)

    bodies = np.asarray(geoms.bodies)
    body_idx = np.maximum(bodies, 0)
    is_world = (bodies < 0)[None, :, None]  # (1, ng, 1)
    Rg_b = jnp.where(
        is_world[None], jnp.eye(3, dtype=dtype)[:, :, None, None],
        R_l[:, :, body_idx, :],
    )
    pg_b = jnp.where(is_world, 0.0, p_l[:, body_idx, :])
    geoms_R = mat3.from_aos_mat(jnp.asarray(geoms.R, dtype=dtype))[..., None]
    geoms_p = mat3.from_aos_vec(jnp.asarray(geoms.p, dtype=dtype))[..., None]
    Rg = mat3.mul(Rg_b, geoms_R)
    pg = pg_b + mat3.mv(Rg_b, geoms_p)
    w_g = jnp.where(is_world, 0.0, w_l[:, body_idx, :])
    pd_g = jnp.where(is_world, 0.0, pd_l[:, body_idx, :])
    pl_g = jnp.where(is_world, 0.0, p_l[:, body_idx, :])

    k = params.stiffness
    sigma = params.smoothing_factor
    vd = params.dissipation_velocity
    vs = params.stiction_velocity
    mu = params.friction_coefficient

    # Group pairs by type so each group is ONE batched evaluation.
    groups = {}
    for (ia, ib) in geoms.pairs:
        key = (geoms.types[ia], geoms.types[ib])
        groups.setdefault(key, []).append((ia, ib))

    torques = jnp.zeros((3, nl, N), dtype=dtype)
    forces = jnp.zeros((3, nl, N), dtype=dtype)
    gparams = jnp.asarray(geoms.params, dtype=dtype)  # (ng, k)

    for (ta, tb), pairs in groups.items():
        ia = np.array([p[0] for p in pairs])
        ib = np.array([p[1] for p in pairs])
        # Per-pair poses/params with a pair axis after the components:
        # R (3, 3, P, N), p (3, P, N), params (kparm, P, 1).
        Ra, Rb = Rg[:, :, ia, :], Rg[:, :, ib, :]
        pa, pb = pg[:, ia, :], pg[:, ib, :]
        prm_a = gparams[ia].T[:, :, None]
        prm_b = gparams[ib].T[:, :, None]

        phi, nhat, wa, wb = _pair_distance(
            ta, prm_a, Ra, pa, tb, prm_b, Rb, pb
        )
        p_c = 0.5 * (wa + wb)
        v_a = pd_g[:, ia, :] + mat3.cross(w_g[:, ia, :], p_c - pl_g[:, ia, :])
        v_b = pd_g[:, ib, :] + mat3.cross(w_g[:, ib, :], p_c - pl_g[:, ib, :])
        v_rel = v_b - v_a

        vn = mat3.dot(nhat, v_rel)  # (P, N)
        vt = v_rel - vn[None] * nhat

        s = vn / vd
        dissipation = jnp.where(
            s < 0.0, 1.0 - s,
            jnp.where(s < 2.0, (s - 2.0) ** 2 / 4.0, 0.0),
        )
        exponent = -phi / sigma
        fn_compliant = jnp.where(
            exponent >= 37.0,
            -k * phi,
            sigma * k * jnp.log1p(jnp.exp(jnp.minimum(exponent, 37.0))),
        )
        fn = fn_compliant * dissipation
        that = -vt / jnp.sqrt(vs * vs + mat3.dot(vt, vt))[None]
        f_on_b = nhat * fn[None] + mu * fn[None] * that
        tq_b = mat3.cross(p_c - pl_g[:, ib, :], f_on_b)
        tq_a = mat3.cross(p_c - pl_g[:, ia, :], -f_on_b)

        # Accumulate into links with a static 0/1 matrix (world rows drop).
        P = len(pairs)
        S_a = np.zeros((nl, P))
        S_b = np.zeros((nl, P))
        for pi in range(P):
            if bodies[ia[pi]] >= 0:
                S_a[bodies[ia[pi]], pi] = 1.0
            if bodies[ib[pi]] >= 0:
                S_b[bodies[ib[pi]], pi] = 1.0
        S_a = jnp.asarray(S_a, dtype=dtype)
        S_b = jnp.asarray(S_b, dtype=dtype)
        torques = torques + jnp.einsum("lp,cpn->cln", S_a, tq_a) \
            + jnp.einsum("lp,cpn->cln", S_b, tq_b)
        forces = forces + jnp.einsum("lp,cpn->cln", S_a, -f_on_b) \
            + jnp.einsum("lp,cpn->cln", S_b, f_on_b)

    return torques, forces


def step_tau(model: Model, contact_params, q_next, v_next, a):
    """tau_t = ID(q_{t+1}, v_{t+1}, a_t) with implicit contact
    (reference: trajectory_optimizer.cc:204-245); all operands SoA."""
    from idto_tpu.soa.dynamics import inverse_dynamics

    wrenches = contact_wrenches(model, q_next, v_next, contact_params)
    return inverse_dynamics(model, q_next, v_next, a, wrenches)
