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

import jax.numpy as jnp

from idto_tpu.geometry.distance import signed_distance
from idto_tpu.models.kinematics import body_velocities
from idto_tpu.models.model import Model
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


def _geom_world_poses(model: Model, R_links, p_links):
    """World pose of every collision geometry (vectorized gather)."""
    geoms = model.geoms
    Rs, ps = [], []
    for g in range(geoms.num_geoms):
        b = geoms.bodies[g]
        if b < 0:
            Rw = jnp.eye(3, dtype=p_links.dtype)
            pw = jnp.zeros(3, dtype=p_links.dtype)
        else:
            Rw, pw = R_links[b], p_links[b]
        Rs.append(Rw @ geoms.R[g])
        ps.append(pw + Rw @ geoms.p[g])
    return Rs, ps


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
    Rg, pg = _geom_world_poses(model, R_l, p_l)

    k = params.stiffness
    sigma = params.smoothing_factor
    vd = params.dissipation_velocity
    vs = params.stiction_velocity
    mu = params.friction_coefficient

    infos = []
    for (ia, ib) in geoms.pairs:
        phi, nhat, wa, wb = signed_distance(
            geoms.types[ia], geoms.params[ia], Rg[ia], pg[ia],
            geoms.types[ib], geoms.params[ib], Rg[ib], pg[ib],
        )
        p_c = 0.5 * (wa + wb)

        body_a, body_b = geoms.bodies[ia], geoms.bodies[ib]

        def point_vel(body, pc):
            if body < 0:
                return jnp.zeros(3, dtype=dtype)
            return pd_l[body] + jnp.cross(w_l[body], pc - p_l[body])

        v_a = point_vel(body_a, p_c)
        v_b = point_vel(body_b, p_c)
        v_rel = v_b - v_a  # velocity of B relative to A at C

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
        f_t = mu * fn * that

        f_on_b = nhat * fn + f_t  # force on B at C, world

        # Accumulate wrenches about body origins.
        if body_b >= 0:
            torques = torques.at[body_b].add(
                jnp.cross(p_c - p_l[body_b], f_on_b)
            )
            forces = forces.at[body_b].add(f_on_b)
        if body_a >= 0:
            torques = torques.at[body_a].add(
                jnp.cross(p_c - p_l[body_a], -f_on_b)
            )
            forces = forces.at[body_a].add(-f_on_b)
        infos.append((phi, nhat, p_c, f_on_b))

    info = ContactInfo(
        jnp.stack([i[0] for i in infos]),
        jnp.stack([i[1] for i in infos]),
        jnp.stack([i[2] for i in infos]),
        jnp.stack([i[3] for i in infos]),
    )
    return ((torques, forces), info) if return_info else (torques, forces)
