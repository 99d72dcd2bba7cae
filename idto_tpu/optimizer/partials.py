"""Exact inverse-dynamics partials d(tau_t)/d(q_{t-1,t,t+1}).

Replaces the reference's finite-difference machinery
(CalcInverseDynamicsPartialsFiniteDiff, trajectory_optimizer.cc:426-563,
OpenMP over timesteps) with a single vmapped ``jax.jacfwd`` over the
step-local inverse dynamics: exact derivatives (the reference's autodiff
tier, trajectory_optimizer.cc:892-960), batched over the horizon on TPU.

tau_t depends on its configuration triplet through
    v_t     = N^+(q_t)   (q_t   - q_{t-1}) / dt      (v_0 = v_init, const)
    v_{t+1} = N^+(q_{t+1})(q_{t+1} - q_t) / dt
    a_t     = (v_{t+1} - v_t) / dt
    tau_t   = ID(q_{t+1}, v_{t+1}, a_t, contact(q_{t+1}, v_{t+1}))
making the time structure tri-diagonal (trajectory_optimizer.h:244-256).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from idto_tpu.models.kinematics import nplus_matrix, qdot_to_v
from idto_tpu.models.model import Model
from idto_tpu.optimizer.problem import ProblemDefinition
from idto_tpu.optimizer.trajectory import step_tau


class IdPartials(NamedTuple):
    """(T, nv, nq) arrays; dtau_dqm[0] is identically zero (q_{-1} does not
    exist; reference boundary convention inverse_dynamics_partials.h:21-85)."""

    dtau_dqm: jnp.ndarray
    dtau_dqt: jnp.ndarray
    dtau_dqp: jnp.ndarray


def id_partials(
    model: Model, prob: ProblemDefinition, contact, q
) -> IdPartials:
    """Exact partials via the explicit chain rule.

    Only the explicit q_{t+1}-dependence (FK, gravity, contact geometry)
    needs forward-mode AD through the kinematics tower; the v- and
    a-dependence is differentiated with FK-free tangents (ID is linear in
    a, and body velocities are linear in v), and the q_t / q_{t-1} blocks
    assemble analytically from M = dID/da and Cv = dID/dv -- the same
    structure the reference exploits in its "analytic tail"
    (trajectory_optimizer.cc:552-561, dtau_{t+1}/dq_t = M N^+ / dt^2).
    This cuts the heavy tangent axis from 3nq to nq, which is the
    difference between HBM-traffic-bound and compute-bound on TPU: every
    FK intermediate in the jacfwd graph carries the tangent axis.

    With w(q) := N^+(q) applied to a finite difference,
      dtau/dq_{t+1} = Gq + (Cv + M/dt) Vp_p
      dtau/dq_t     = (Cv + M/dt) Vp_t - (M/dt) Vt_t
      dtau/dq_{t-1} =              (M/dt) N^+(q_t)/dt
    where Gq = dID/dq_{t+1} at fixed (v, a), Vp_p = d v_{t+1}/d q_{t+1},
    Vp_t = -N^+(q_{t+1})/dt, Vt_t = d v_t/d q_t (the N^+ product-rule
    terms are only nonzero for quaternion blocks).
    """
    dt = prob.dt

    def step_blocks(qt, qp, v_t):
        """(M, Cv, Gq, Vp_p, Npp, Npt) at one step; v_t is the already-
        computed previous velocity (constant wrt this step's AD)."""
        v_p = qdot_to_v(model, qp, (qp - qt) / dt)
        a_t = (v_p - v_t) / dt
        # Explicit q-part: FK/gravity/contact-geometry tangents only
        # (v_p, a_t frozen) -- the ONLY jacfwd through the FK tower.
        Gq = jax.jacfwd(
            lambda qq: step_tau(model, contact, qq, v_p, a_t)
        )(qp)
        # v/a parts: tangents never enter FK (linear-in-v velocities,
        # linear-in-a wrenches), so these are cheap despite 2*nv tangents.
        Cv, M = jax.jacfwd(
            lambda vv, aa: step_tau(model, contact, qp, vv, aa),
            argnums=(0, 1),
        )(v_p, a_t)
        Vp_p = jax.jacfwd(
            lambda qq: qdot_to_v(model, qq, (qq - qt) / dt)
        )(qp)
        Npp = nplus_matrix(model, qp)
        Npt = nplus_matrix(model, qt)
        return M, Cv, Gq, Vp_p, Npp, Npt

    def parts_mid(qm, qt, qp):
        v_t = qdot_to_v(model, qt, (qt - qm) / dt)
        M, Cv, Gq, Vp_p, Npp, Npt = step_blocks(qt, qp, v_t)
        Vt_t = jax.jacfwd(
            lambda qq: qdot_to_v(model, qq, (qq - qm) / dt)
        )(qt)
        CvM = Cv + M / dt
        dqp = Gq + CvM @ Vp_p
        dqt = CvM @ (-Npp / dt) - (M / dt) @ Vt_t
        dqm = (M / dt) @ (Npt / dt)
        return dqm, dqt, dqp

    def parts_first(qt, qp):
        M, Cv, Gq, Vp_p, Npp, _ = step_blocks(qt, qp, prob.v_init)
        CvM = Cv + M / dt
        d0p = Gq + CvM @ Vp_p
        d0t = CvM @ (-Npp / dt)  # v_0 = v_init is constant
        return d0t, d0p

    # t = 0 (no q_{t-1} dependence).
    d0t, d0p = parts_first(q[0], q[1])

    # t = 1..T-1, vmapped over the horizon.
    if prob.num_steps > 1:
        dm, dt_, dp = jax.vmap(parts_mid)(q[:-2], q[1:-1], q[2:])
        dtau_dqm = jnp.concatenate([jnp.zeros_like(dm[:1]), dm], axis=0)
        dtau_dqt = jnp.concatenate([d0t[None], dt_], axis=0)
        dtau_dqp = jnp.concatenate([d0p[None], dp], axis=0)
    else:
        dtau_dqm = jnp.zeros_like(d0t)[None]
        dtau_dqt = d0t[None]
        dtau_dqp = d0p[None]
    return IdPartials(dtau_dqm, dtau_dqt, dtau_dqp)


def id_partials_full_jacfwd(
    model: Model, prob: ProblemDefinition, contact, q
) -> IdPartials:
    """Reference implementation: one jacfwd over the full (q_{t-1}, q_t,
    q_{t+1}) triplet (3nq tangents through the whole FK tower).  Kept as
    the correctness oracle for :func:`id_partials`; not used in the hot
    path."""
    dt = prob.dt

    def tau_mid(qm, qt, qp):
        v_t = qdot_to_v(model, qt, (qt - qm) / dt)
        v_p = qdot_to_v(model, qp, (qp - qt) / dt)
        a_t = (v_p - v_t) / dt
        return step_tau(model, contact, qp, v_p, a_t)

    def tau_first(qt, qp):
        v_p = qdot_to_v(model, qp, (qp - qt) / dt)
        a_t = (v_p - prob.v_init) / dt
        return step_tau(model, contact, qp, v_p, a_t)

    # t = 0 (no q_{t-1} dependence).
    d0t, d0p = jax.jacfwd(tau_first, argnums=(0, 1))(q[0], q[1])

    # t = 1..T-1, vmapped over the horizon.
    if prob.num_steps > 1:
        dm, dt_, dp = jax.vmap(jax.jacfwd(tau_mid, argnums=(0, 1, 2)))(
            q[:-2], q[1:-1], q[2:]
        )
        dtau_dqm = jnp.concatenate([jnp.zeros_like(dm[:1]), dm], axis=0)
        dtau_dqt = jnp.concatenate([d0t[None], dt_], axis=0)
        dtau_dqp = jnp.concatenate([d0p[None], dp], axis=0)
    else:
        dtau_dqm = jnp.zeros_like(d0t)[None]
        dtau_dqt = d0t[None]
        dtau_dqp = d0p[None]
    return IdPartials(dtau_dqm, dtau_dqt, dtau_dqp)


def nplus_stack(model: Model, q):
    """N^+(q_t) for every knot: (T+1, nv, nq)."""
    return jax.vmap(lambda qq: nplus_matrix(model, qq))(q)


# ---------------------------------------------------------------------------
# Finite-difference partials (reference: GradientsMethod kForwardDifferences /
# kCentralDifferences / kCentralDifferences4, solver_parameters.h:24-36,
# CalcInverseDynamicsPartialsFiniteDiff trajectory_optimizer.cc:426-885).
# Autodiff (id_partials above) is this build's default -- FD/CD exist for
# parity and as independent numerical cross-checks; they are vmapped over
# both the horizon and the perturbed coordinate, so unlike the reference's
# OpenMP loop they still batch onto the TPU.
# ---------------------------------------------------------------------------
def _fd_steps(x, eps_pow):
    """Perturbation sizes eps^pow * max(1, |x|), exactly representable
    (reference: trajectory_optimizer.cc:506-508)."""
    eps = jnp.finfo(x.dtype).eps
    h = eps**eps_pow * jnp.maximum(1.0, jnp.abs(x))
    return (x + h) - x


def _fd_jacs(f, args, argnums, order):
    """Finite-difference Jacobians of ``f(*args) -> (nv,)`` w.r.t. the
    selected args; returns a tuple of (nv, nq) arrays.

    order=1: forward differences with step eps^(1/2);
    order=2: 2nd-order central with step eps^(1/3);
    order=4: 4th-order central with step eps^(1/5)
    (step-size exponents per trajectory_optimizer.cc:700-704)."""
    pow_ = {1: 0.5, 2: 1.0 / 3.0, 4: 0.2}[order]
    f0 = f(*args) if order == 1 else None
    jacs = []
    for an in argnums:
        x = args[an]
        h = _fd_steps(x, pow_)

        def col(i, an=an, x=x, h=h):
            e = jnp.zeros_like(x).at[i].set(1.0)
            step = h * e

            def at(xx):
                new = list(args)
                new[an] = xx
                return f(*new)

            hi = jnp.sum(step)
            if order == 1:
                return (at(x + step) - f0) / hi
            if order == 2:
                return (at(x + step) - at(x - step)) / (2.0 * hi)
            return (
                -at(x + 2 * step)
                + 8.0 * at(x + step)
                - 8.0 * at(x - step)
                + at(x - 2 * step)
            ) / (12.0 * hi)

        J = jax.vmap(col)(jnp.arange(x.shape[0]))  # (nq, nv)
        jacs.append(J.T)
    return tuple(jacs)


def id_partials_fd(
    model: Model, prob: ProblemDefinition, contact, q, order: int = 1
) -> IdPartials:
    """IdPartials by finite differences (same tri-diagonal structure and
    boundary conventions as :func:`id_partials`)."""
    dt = prob.dt

    def tau_mid(qm, qt, qp):
        v_t = qdot_to_v(model, qt, (qt - qm) / dt)
        v_p = qdot_to_v(model, qp, (qp - qt) / dt)
        a_t = (v_p - v_t) / dt
        return step_tau(model, contact, qp, v_p, a_t)

    def tau_first(qt, qp):
        v_p = qdot_to_v(model, qp, (qp - qt) / dt)
        a_t = (v_p - prob.v_init) / dt
        return step_tau(model, contact, qp, v_p, a_t)

    d0t, d0p = _fd_jacs(tau_first, [q[0], q[1]], (0, 1), order)

    if prob.num_steps > 1:
        dm, dt_, dp = jax.vmap(
            lambda qm, qt, qp: _fd_jacs(tau_mid, [qm, qt, qp], (0, 1, 2), order)
        )(q[:-2], q[1:-1], q[2:])
        dtau_dqm = jnp.concatenate([jnp.zeros_like(dm[:1]), dm], axis=0)
        dtau_dqt = jnp.concatenate([d0t[None], dt_], axis=0)
        dtau_dqp = jnp.concatenate([d0p[None], dp], axis=0)
    else:
        dtau_dqm = jnp.zeros_like(d0t)[None]
        dtau_dqt = d0t[None]
        dtau_dqp = d0p[None]
    return IdPartials(dtau_dqm, dtau_dqt, dtau_dqp)


def id_partials_for(model, prob, params, q) -> IdPartials:
    """Dispatch on params.gradients_method (static)."""
    from idto_tpu.optimizer.problem import GradientsMethod

    gm = params.gradients_method
    if gm == GradientsMethod.FORWARD_DIFFERENCES:
        return id_partials_fd(model, prob, params.contact, q, order=1)
    if gm == GradientsMethod.CENTRAL_DIFFERENCES:
        return id_partials_fd(model, prob, params.contact, q, order=2)
    if gm == GradientsMethod.CENTRAL_DIFFERENCES4:
        return id_partials_fd(model, prob, params.contact, q, order=4)
    return id_partials(model, prob, params.contact, q)
