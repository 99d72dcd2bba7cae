"""PD-plus tracking controller.

Analog of the reference's ``PdPlusController``
(examples/pd_plus_controller.cc:39-62):
    u = feed_forward * u_nom + Kp_q (q_nom - q) + Kd_v (v_nom - v)
with the gain matrices built as B_q^T diag(Kp) and B^T diag(Kd)
(example_base.cc:129-143), i.e. the per-dof YAML gains Kp (length nq) and
Kd (length nv) are projected onto the actuated coordinates.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from idto_tpu.models.model import Model


def actuation_q_matrix(model: Model) -> np.ndarray:
    """B_q: (nq, nu) selecting the actuated q coordinates (each actuator
    drives a single-dof joint)."""
    Bq = np.zeros((model.nq, model.nu))
    for a, j in enumerate(model.actuator_joints):
        Bq[model.q_starts[j], a] = 1.0
    return Bq


def pd_plus_control(
    model: Model, Kp, Kd, q_nom, v_nom, u_nom, q, v, feed_forward: bool = True
):
    Bq = jnp.asarray(actuation_q_matrix(model), dtype=q.dtype)
    B = model.B
    u = jnp.einsum("qu,q->u", Bq, jnp.asarray(Kp) * (q_nom - q))
    u = u + jnp.einsum("vu,v->u", B, jnp.asarray(Kd) * (v_nom - v))
    if feed_forward:
        u = u + u_nom
    return u
