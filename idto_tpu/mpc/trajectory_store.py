"""Stored trajectories with natural cubic spline interpolation.

Analog of the reference's ``StoredTrajectory`` (examples/mpc_controller.h:
43-61), which stores the MPC solution as
``PiecewisePolynomial::CubicWithContinuousSecondDerivatives`` splines of
q, v, and u (mpc_controller.cc:99-138).  Natural cubic splines are
reproduced exactly: knot second derivatives come from the standard
tridiagonal system with natural boundary conditions; evaluation outside
the knot range extrapolates with the boundary segment polynomial, matching
PiecewisePolynomial::value.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from idto_tpu.utils.structs import pytree_dataclass, static


def _natural_cubic_m(y, dt):
    """Second derivatives M (n, d) of the natural cubic spline through
    uniformly spaced knots y (n, d)."""
    n = y.shape[0]
    if n < 3:
        return jnp.zeros_like(y)
    # Tridiagonal system: M[0] = M[n-1] = 0;
    # M[i-1] + 4 M[i] + M[i+1] = 6 (y[i+1] - 2 y[i] + y[i-1]) / dt^2.
    A = (
        4.0 * jnp.eye(n - 2, dtype=y.dtype)
        + jnp.eye(n - 2, k=1, dtype=y.dtype)
        + jnp.eye(n - 2, k=-1, dtype=y.dtype)
    )
    rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2]) / dt**2
    M_inner = jnp.linalg.solve(A, rhs)
    return jnp.concatenate(
        [jnp.zeros_like(y[:1]), M_inner, jnp.zeros_like(y[:1])], axis=0
    )


@pytree_dataclass
class CubicSpline:
    dt: float = static(default=0.05)
    y: Any = None  # (n, d) knot values
    M: Any = None  # (n, d) knot second derivatives

    @classmethod
    def fit(cls, y, dt: float) -> "CubicSpline":
        return cls(dt=dt, y=y, M=_natural_cubic_m(y, dt))

    def value(self, t):
        """Evaluate at scalar time t (from the spline's local time 0);
        extrapolates with the boundary segment outside the range."""
        n = self.y.shape[0]
        dt = self.dt
        i = jnp.clip(jnp.floor(t / dt).astype(jnp.int32), 0, n - 2)
        tau = t - i.astype(self.y.dtype) * dt
        y0, y1 = self.y[i], self.y[i + 1]
        M0, M1 = self.M[i], self.M[i + 1]
        # Standard cubic-spline segment formula on [0, dt].
        a = (M1 - M0) / (6.0 * dt)
        b = M0 / 2.0
        c = (y1 - y0) / dt - dt * (2.0 * M0 + M1) / 6.0
        return y0 + tau * (c + tau * (b + tau * a))


@pytree_dataclass
class StoredTrajectory:
    """Device-resident MPC solution spline (q, v, u) with its start time."""

    start_time: Any = None
    q: CubicSpline = None
    v: CubicSpline = None
    u: CubicSpline = None

    @classmethod
    def from_solution(cls, model, solution, start_time, dt):
        """StoreOptimizerSolution analog (mpc_controller.cc:99-138):
        u knots are B^T tau with the last step repeated."""
        u_knots = jnp.einsum("vu,tv->tu", model.B, solution.tau)
        u_knots = jnp.concatenate([u_knots, u_knots[-1:]], axis=0)
        return cls(
            start_time=jnp.asarray(start_time, dtype=solution.q.dtype),
            q=CubicSpline.fit(solution.q, dt),
            v=CubicSpline.fit(solution.v, dt),
            u=CubicSpline.fit(u_knots, dt),
        )

    def sample_state(self, t):
        local = t - self.start_time
        return self.q.value(local), self.v.value(local)

    def sample_control(self, t):
        return self.u.value(t - self.start_time)
