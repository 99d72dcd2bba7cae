"""Smoothed compliant contact force model.

Exactly the force law of the reference
(optimizer/trajectory_optimizer.cc:247-386):

  * normal force  f_n = sigma * k * log(1 + exp(-phi / sigma))
    (softplus; force at a distance controlled by the smoothing factor),
  * Hunt-Crossley-like dissipation factor on the normal force:
    1 - s for s < 0, (s-2)^2/4 for 0 <= s < 2, 0 otherwise,
    with s = v_n / dissipation_velocity,
  * regularized friction f_t = -mu f_n v_t / sqrt(vs^2 + |v_t|^2),
  * equal/opposite spatial forces applied at the witness-point midpoint C.

The TPU-native difference is in the evaluation strategy, not the math: all
candidate pairs are evaluated unconditionally (static shapes, no geometry
broad-phase) and the result is vmapped over time/scenario axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.geometry.distance import signed_distance
from idto_tpu.models import mat3
from idto_tpu.models.kinematics import body_velocities
from idto_tpu.models.model import GeomType, Model
from idto_tpu.utils.structs import pytree_dataclass, static


@pytree_dataclass
class ContactParams:
    """Contact model knobs (reference: solver_parameters.h:120-127 and the
    YAML surface at examples/yaml_config.h)."""

    stiffness: float = 100.0  # k, N/m
    smoothing_factor: float = 0.01  # sigma, m
    dissipation_velocity: float = 0.1  # m/s
    stiction_velocity: float = 0.05  # vs, m/s
    friction_coefficient: float = 0.5  # mu


class ContactInfo(NamedTuple):
    phi: jnp.ndarray  # (np,) signed distances
    normal: jnp.ndarray  # (np, 3) A->B unit normals, world
    p_contact: jnp.ndarray  # (np, 3) contact midpoints, world
    force: jnp.ndarray  # (np, 3) force on body B at C, world


def _group_pairs(geoms):
    """Group candidate pairs by (type_a, type_b) so each group evaluates as
    ONE vmapped distance computation -- the trace stays O(#pair types), not
    O(#pairs), which keeps compile times flat as models grow."""
    groups = {}
    for (ia, ib) in geoms.pairs:
        key = (geoms.types[ia], geoms.types[ib])
        groups.setdefault(key, []).append((ia, ib))
    return groups


def contact_wrenches(
    model: Model,
    q,
    v,
    params: ContactParams,
    return_info: bool = False,
):
    """External wrenches from contact: ((nl,3) torques, (nl,3) forces) about
    each body origin in world, the shape inverse_dynamics expects."""
    nl = model.num_links
    dtype = q.dtype
    torques = jnp.zeros((nl, 3), dtype=dtype)
    forces = jnp.zeros((nl, 3), dtype=dtype)
    geoms = model.geoms
    if geoms is None or not geoms.pairs:
        empty = ContactInfo(
            jnp.zeros(0, dtype), jnp.zeros((0, 3), dtype),
            jnp.zeros((0, 3), dtype), jnp.zeros((0, 3), dtype),
        )
        return ((torques, forces), empty) if return_info else (torques, forces)

    R_l, p_l, w_l, pd_l = body_velocities(model, q, v)
    # Geometry world poses, computed as one gather + batched compose.
    bodies = np.asarray(geoms.bodies)
    body_idx = np.maximum(bodies, 0)
    is_world = (bodies < 0)[:, None]
    Rg_b = jnp.where(
        is_world[:, :, None], jnp.eye(3, dtype=dtype)[None], R_l[body_idx]
    )
    pg_b = jnp.where(is_world, 0.0, p_l[body_idx])
    Rg = mat3.mul(Rg_b, geoms.R.astype(dtype))
    pg = pg_b + mat3.mv(Rg_b, geoms.p.astype(dtype))
    # Body point-velocities of geometry-owning links (world rows zeroed).
    w_g = jnp.where(is_world, 0.0, w_l[body_idx])
    pd_g = jnp.where(is_world, 0.0, pd_l[body_idx])
    pl_g = jnp.where(is_world, 0.0, p_l[body_idx])

    k = params.stiffness
    sigma = params.smoothing_factor
    vd = params.dissipation_velocity
    vs = params.stiction_velocity
    mu = params.friction_coefficient

    all_phi, all_n, all_pc, all_f = [], [], [], []
    seg_ids, seg_torques, seg_forces = [], [], []

    for (ta, tb), pairs in _group_pairs(geoms).items():
        ia = np.array([p[0] for p in pairs])
        ib = np.array([p[1] for p in pairs])
        # CONVEX geometries carry their hull vertex set as the "params"
        # at the distance layer (geometry/distance.py contract).
        prms_a = (
            geoms.verts[ia] if ta == GeomType.CONVEX else geoms.params[ia]
        )
        prms_b = (
            geoms.verts[ib] if tb == GeomType.CONVEX else geoms.params[ib]
        )

        def pair_force(Ra, pa, prm_a, Rb, pb, prm_b,
                       wa_body, pda_body, pla_body,
                       wb_body, pdb_body, plb_body):
            phi, nhat, wa, wb = signed_distance(
                ta, prm_a, Ra, pa, tb, prm_b, Rb, pb
            )
            p_c = 0.5 * (wa + wb)
            v_a = pda_body + jnp.cross(wa_body, p_c - pla_body)
            v_b = pdb_body + jnp.cross(wb_body, p_c - plb_body)
            v_rel = v_b - v_a

            vn = nhat @ v_rel
            vt = v_rel - vn * nhat

            # Hunt-Crossley-like dissipation (piecewise C^1).
            s = vn / vd
            dissipation = jnp.where(
                s < 0.0,
                1.0 - s,
                jnp.where(s < 2.0, (s - 2.0) ** 2 / 4.0, 0.0),
            )
            # Softplus normal force with the reference's overflow guard
            # (exponent >= 37 -> linear limit -k*phi).
            exponent = -phi / sigma
            fn_compliant = jnp.where(
                exponent >= 37.0,
                -k * phi,
                sigma * k * jnp.log1p(jnp.exp(jnp.minimum(exponent, 37.0))),
            )
            fn = fn_compliant * dissipation
            # Regularized friction (algebraic sigmoid).
            that = -vt / jnp.sqrt(vs * vs + vt @ vt)
            f_on_b = nhat * fn + mu * fn * that
            tq_b = jnp.cross(p_c - plb_body, f_on_b)
            tq_a = jnp.cross(p_c - pla_body, -f_on_b)
            return phi, nhat, p_c, f_on_b, tq_a, tq_b

        phi, nhat, p_c, f_on_b, tq_a, tq_b = jax.vmap(pair_force)(
            Rg[ia], pg[ia], prms_a.astype(dtype),
            Rg[ib], pg[ib], prms_b.astype(dtype),
            w_g[ia], pd_g[ia], pl_g[ia],
            w_g[ib], pd_g[ib], pl_g[ib],
        )

        all_phi.append(phi)
        all_n.append(nhat)
        all_pc.append(p_c)
        all_f.append(f_on_b)
        # Scatter-add wrenches; world (-1) rows routed to a dump slot nl.
        ba = np.where(bodies[ia] < 0, nl, bodies[ia])
        bb = np.where(bodies[ib] < 0, nl, bodies[ib])
        seg_ids.append(np.concatenate([ba, bb]))
        seg_torques.append(jnp.concatenate([tq_a, tq_b], axis=0))
        seg_forces.append(jnp.concatenate([-f_on_b, f_on_b], axis=0))

    ids = jnp.asarray(np.concatenate(seg_ids))
    torques = jax.ops.segment_sum(
        jnp.concatenate(seg_torques, axis=0), ids, num_segments=nl + 1
    )[:nl]
    forces = jax.ops.segment_sum(
        jnp.concatenate(seg_forces, axis=0), ids, num_segments=nl + 1
    )[:nl]

    info = ContactInfo(
        jnp.concatenate(all_phi),
        jnp.concatenate(all_n, axis=0),
        jnp.concatenate(all_pc, axis=0),
        jnp.concatenate(all_f, axis=0),
    )
    return ((torques, forces), info) if return_info else (torques, forces)
