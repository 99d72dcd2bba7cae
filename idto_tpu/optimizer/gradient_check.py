"""Finite-difference gradient diagnostics.

The reference's default gradient method is forward differences with
central differences (2nd/4th order) and autodiff as alternatives
(reference: solver_parameters.h:24-36, CalcInverseDynamicsPartials*
trajectory_optimizer.cc:426-960, cross-checked by the
ContactGradientMethods test, trajectory_optimizer_test.cc:183-280 with
tolerance tiers 100*sqrt(eps) for FD and 10*sqrt(eps) for CD).

This framework computes gradients exactly (vmapped jacfwd), so FD/CD are
not solve options; they are *diagnostics* used the way the reference's
test suite uses them — independent oracles for the assembled analytic
gradient, including through the smoothed contact model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from idto_tpu.optimizer import trajectory


def _cost_fn(model, prob, contact):
    def f(q):
        return trajectory.cost(model, prob, contact, q)

    return f


def _perturbations(q, eps_pow):
    eps = jnp.finfo(q.dtype).eps
    # Step eps^pow * max(1, |q|), made exactly representable
    # (reference: trajectory_optimizer.cc:506-508).
    dq = eps**eps_pow * jnp.maximum(1.0, jnp.abs(q))
    return (q + dq) - q


def fd_gradient(model, prob, params, q):
    """Forward-difference dL/dq, (T+1, nq), with the q_0 block zeroed
    (q_0 is not a decision variable)."""
    f = _cost_fn(model, prob, params.contact)
    dq = _perturbations(q, 0.5)
    L0 = f(q)
    nvars = q.size

    def one(i):
        e = jnp.zeros(nvars, dtype=q.dtype).at[i].set(1.0).reshape(q.shape)
        step = (dq * e).sum()
        return (f(q + dq * e) - L0) / step

    g = jax.vmap(one)(jnp.arange(nvars)).reshape(q.shape)
    return g.at[0].set(0.0)


def cd_gradient(model, prob, params, q, order: int = 2):
    """Central-difference dL/dq (2nd or 4th order; reference
    kCentralDifferences / kCentralDifferences4,
    trajectory_optimizer.cc:565-885)."""
    f = _cost_fn(model, prob, params.contact)
    pow_ = 1.0 / 3.0 if order == 2 else 1.0 / 5.0
    dq = _perturbations(q, pow_)
    nvars = q.size

    def one(i):
        e = jnp.zeros(nvars, dtype=q.dtype).at[i].set(1.0).reshape(q.shape)
        h = (dq * e).sum()
        if order == 2:
            return (f(q + dq * e) - f(q - dq * e)) / (2.0 * h)
        return (
            -f(q + 2 * dq * e)
            + 8.0 * f(q + dq * e)
            - 8.0 * f(q - dq * e)
            + f(q - 2 * dq * e)
        ) / (12.0 * h)

    g = jax.vmap(one)(jnp.arange(nvars)).reshape(q.shape)
    return g.at[0].set(0.0)


def analytic_gradient(model, prob, params, q):
    """The solver's assembled gradient (shared-partials path used inside
    solve_trust_region), exposed for cross-checking."""
    from idto_tpu.optimizer.hessian import gradient_from_partials
    from idto_tpu.optimizer.partials import id_partials, nplus_stack

    contact = params.contact
    v = trajectory.velocities(model, prob, q)
    a = trajectory.accelerations(prob, v)
    tau = jax.vmap(
        lambda qn, vn, an: trajectory.step_tau(model, contact, qn, vn, an)
    )(q[1:], v[1:], a)
    parts = id_partials(model, prob, contact, q)
    nplus = nplus_stack(model, q)
    return gradient_from_partials(model, prob, parts, nplus, q, v, tau)
