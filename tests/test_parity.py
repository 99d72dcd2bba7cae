"""Numerical-parity oracles against the reference implementation.

Every test here pins this build's physics/optimizer conventions to ground
truth that does NOT come from the code under test:

  * the reference's own hand-derived pendulum formulas and committed golden
    q-data (optimizer/test/trajectory_optimizer_test.cc:848-1313),
  * analytic Euler-Lagrange dynamics computed from forward kinematics +
    energies only -- an independent derivation from the Newton-Euler/vjp
    route in models/dynamics.py -- including the floating-base (quaternion)
    velocity convention,
  * the reference's dogleg-geometry and trust-ratio unit tests
    (trajectory_optimizer_test.cc:285-433),
  * equality-constraint Jacobians cross-checked against autodiff of h(q)
    for the spinner and hopper (trajectory_optimizer_test.cc:1447-1636),
  * committed golden files (goldens/*.npz, produced by
    scripts/make_goldens.py) locking the mini-cheetah inverse dynamics and
    the spinner solve trajectory as regressions.

A silent convention mismatch (floating-base velocity ordering, damping
sign, N+ placement, q0-pinning) fails loudly here.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.contact.force import ContactParams
from idto_tpu.models import mat3
from idto_tpu.models.dynamics import inverse_dynamics, mass_matrix
from idto_tpu.models.kinematics import (
    body_velocities,
    nplus_matrix,
    qdot_to_v,
    v_to_qdot,
)
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.hessian import gradient_from_partials
from idto_tpu.optimizer.partials import id_partials, nplus_stack
from idto_tpu.optimizer.problem import ProblemDefinition, SolverParameters
from idto_tpu.optimizer.solver import (
    _constraint_jacobian_dense,
    _dogleg,
    _merit_at,
    _prepare,
)
from idto_tpu.ops import penta

from tests.test_dynamics import make_acrobot, make_pendulum

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")

# Drake Pendulum.urdf parameters (the reference tests load
# drake/examples/pendulum/Pendulum.urdf: point mass m at length l, viscous
# damping b; our tests.test_dynamics.make_pendulum matches them).
M_PEND, L_PEND, B_PEND = 1.0, 0.5, 0.1

# The reference's committed golden q-trajectory for the no-gravity pendulum
# tests (trajectory_optimizer_test.cc:887-898 and :1189-1200 -- "fake data
# very close to optimality").
Q_GOLDEN_NO_GRAVITY = np.array([
    0.0000000000000000000000000,
    0.0950285641187840757204697,
    0.2659896360172592788551071,
    0.4941147113506765831125733,
    0.7608818755930255584019051,
    1.0479359055822168311777887,
    1.3370090901260500704239575,
    1.6098424281109515732168802,
    1.8481068641834854648919872,
    2.0333242222438583368671061,
    2.1467874956452459578315484,
])


def make_pendulum_no_gravity():
    """Pendulum with the gravity vector zeroed (the reference calls
    mutable_gravity_field().set_gravity_vector(0) to make the system
    linear)."""
    from idto_tpu.models.model import JointType, ModelBuilder

    b = ModelBuilder(gravity=(0.0, 0.0, 0.0))
    b.add_link(
        "arm", "world", JointType.REVOLUTE, joint_name="theta",
        axis=(0.0, 1.0, 0.0), damping=B_PEND, mass=M_PEND,
        com=(0.0, 0.0, -L_PEND), inertia=np.zeros((3, 3)),
    )
    b.add_actuator("theta")
    return b.finalize()


def _toy_problem(model, T, dt, q_init, v_init, Qq, Qv, Qf_q, Qf_v, R,
                 q_nom, v_nom):
    nq, nv = model.nq, model.nv
    return ProblemDefinition(
        num_steps=T, dt=dt,
        q_init=jnp.asarray(np.broadcast_to(q_init, (nq,)).astype(float)),
        v_init=jnp.asarray(np.broadcast_to(v_init, (nv,)).astype(float)),
        q_nom=jnp.asarray(np.broadcast_to(q_nom, (T + 1, nq)).astype(float)),
        v_nom=jnp.asarray(np.broadcast_to(v_nom, (T + 1, nv)).astype(float)),
        Qq=jnp.asarray(np.broadcast_to(Qq, (nq,)).astype(float)),
        Qv=jnp.asarray(np.broadcast_to(Qv, (nv,)).astype(float)),
        R=jnp.asarray(np.broadcast_to(R, (nv,)).astype(float)),
        Qf_q=jnp.asarray(np.broadcast_to(Qf_q, (nq,)).astype(float)),
        Qf_v=jnp.asarray(np.broadcast_to(Qf_v, (nv,)).astype(float)),
    )


# ---------------------------------------------------------------------------
# Reference-derived pendulum goldens
# ---------------------------------------------------------------------------
class TestPendulumGoldens:
    def test_gradient_no_gravity(self):
        """CalcGradientPendulumNoGravity
        (trajectory_optimizer_test.cc:848-1056): assembled gradient vs
        autodiff of the cost, and dtau/dq vs the hand-derived linear-system
        formulas.  Exact-AD partials let us assert far tighter than the
        reference's sqrt(eps) FD tolerance."""
        T, dt = 10, 5e-2
        model = make_pendulum_no_gravity()
        prob = _toy_problem(
            model, T, dt, 0.0, 0.0, Qq=0.1, Qv=0.2, Qf_q=0.3, Qf_v=0.4,
            R=0.5, q_nom=np.pi, v_nom=-0.1,
        )
        contact = ContactParams()
        q = jnp.asarray(Q_GOLDEN_NO_GRAVITY[:, None])

        # Ground-truth gradient: autodiff of the total cost, with the q0
        # block zeroed (q0 is not a decision variable).
        g_gt = jax.grad(
            lambda qq: trajectory.cost(model, prob, contact, qq)
        )(q)
        g_gt = g_gt.at[0].set(0.0)

        parts = id_partials(model, prob, contact, q)
        npl = nplus_stack(model, q)
        v = trajectory.velocities(model, prob, q)
        a = trajectory.accelerations(prob, v)
        tau = jax.vmap(
            lambda qn, vn, an: trajectory.step_tau(model, contact, qn, vn, an)
        )(q[1:], v[1:], a)
        g = gradient_from_partials(model, prob, parts, npl, q, v, tau)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_gt), rtol=0, atol=1e-11
        )

        # Hand-derived partials of the linear system
        # m l^2 a + b v = tau (trajectory_optimizer_test.cc:938-963).
        ml2 = M_PEND * L_PEND * L_PEND
        dqp_gt = ml2 / dt / dt + B_PEND / dt
        dqt_gt = -2.0 * ml2 / dt / dt - B_PEND / dt
        dqm_gt = ml2 / dt / dt
        for t in range(1, T):
            np.testing.assert_allclose(
                float(parts.dtau_dqt[t, 0, 0]), dqt_gt, rtol=1e-12)
            np.testing.assert_allclose(
                float(parts.dtau_dqp[t, 0, 0]), dqp_gt, rtol=1e-12)
            if t >= 2:
                np.testing.assert_allclose(
                    float(parts.dtau_dqm[t, 0, 0]), dqm_gt, rtol=1e-12)

        # Mass matrix is constant = m l^2, and tau matches the analytic
        # model (same reference test, :978-1005).
        for t in (0, T // 2, T):
            Mq = mass_matrix(model, q[t])
            np.testing.assert_allclose(float(Mq[0, 0]), ml2, rtol=1e-14)
        tau_gt = ml2 * np.asarray(a)[:, 0] + B_PEND * np.asarray(v)[1:, 0]
        np.testing.assert_allclose(
            np.asarray(tau)[:, 0], tau_gt, rtol=0, atol=1e-12
        )

    def test_dtau_dq_with_gravity(self):
        """PendulumDtauDq (trajectory_optimizer_test.cc:1058-1154): partials
        vs the hand-derived formulas incl. the m g l cos(q_{t+1}) gravity
        stiffness."""
        T, dt = 5, 1e-2
        model = make_pendulum()
        prob = _toy_problem(
            model, T, dt, 0.0, 0.1, Qq=0, Qv=0, Qf_q=0, Qf_v=0, R=0,
            q_nom=0.0, v_nom=0.0,
        )
        contact = ContactParams()
        q = jnp.asarray(
            np.array([0.0] + [0.6 * t for t in range(1, T + 1)])[:, None]
        )
        parts = id_partials(model, prob, contact, q)

        ml2 = M_PEND * L_PEND * L_PEND
        g_grav = 9.81
        for t in range(1, T):
            dqp_gt = (ml2 / dt / dt + B_PEND / dt
                      + M_PEND * g_grav * L_PEND * np.cos(float(q[t + 1, 0])))
            dqt_gt = -2.0 * ml2 / dt / dt - B_PEND / dt
            np.testing.assert_allclose(
                float(parts.dtau_dqp[t, 0, 0]), dqp_gt, rtol=1e-12)
            np.testing.assert_allclose(
                float(parts.dtau_dqt[t, 0, 0]), dqt_gt, rtol=1e-12)
            if t >= 2:
                np.testing.assert_allclose(
                    float(parts.dtau_dqm[t, 0, 0]), ml2 / dt / dt,
                    rtol=1e-12)

    def test_cost_from_state_no_gravity(self):
        """CalcCostFromState (trajectory_optimizer_test.cc:1155-1246): total
        cost on the golden q-data vs the analytically-rolled-out value."""
        T, dt = 10, 5e-2
        model = make_pendulum_no_gravity()
        prob = _toy_problem(
            model, T, dt, 0.0, 0.0, Qq=0.0, Qv=0.1, Qf_q=10.0, Qf_v=1.0,
            R=1.0, q_nom=np.pi, v_nom=-0.1,
        )
        q = Q_GOLDEN_NO_GRAVITY
        L = float(trajectory.cost(
            model, prob, ContactParams(), jnp.asarray(q[:, None])
        ))

        # Analytic rollout of the linear pendulum (reference :1208-1243).
        ml2 = M_PEND * L_PEND * L_PEND
        L_gt, vt = 0.0, 0.0
        for t in range(T):
            qt = q[t]
            if t > 0:
                vt = (q[t] - q[t - 1]) / dt
            vp = (q[t + 1] - q[t]) / dt
            ut = ml2 * (vp - vt) / dt + B_PEND * vp
            L_gt += dt * (qt - np.pi) * 0.0 * (qt - np.pi)
            L_gt += dt * (vt + 0.1) * 0.1 * (vt + 0.1)
            L_gt += dt * ut * 1.0 * ut
        qT, vT = q[T], (q[T] - q[T - 1]) / dt
        L_gt += (qT - np.pi) * 10.0 * (qT - np.pi)
        L_gt += (vT + 0.1) * 1.0 * (vT + 0.1)
        np.testing.assert_allclose(L, L_gt, rtol=1e-13)

    def test_inverse_dynamics_analytic(self):
        """PendulumCalcInverseDynamics (trajectory_optimizer_test.cc:
        1314-1393): tau from the optimizer's trajectory pipeline vs
        m l^2 a + m g l sin(q_{t+1}) + b v_{t+1}."""
        T, dt = 5, 1e-2
        model = make_pendulum()
        prob = _toy_problem(
            model, T, dt, -0.2, -0.23, Qq=0, Qv=0, Qf_q=0, Qf_v=0, R=0,
            q_nom=0.0, v_nom=0.0,
        )
        q = jnp.asarray(
            np.array([-0.2 + dt * 0.1 * t * t for t in range(T + 1)])[:, None]
        )
        v = trajectory.velocities(model, prob, q)
        tau = trajectory.generalized_forces(
            model, prob, ContactParams(), q
        )
        ml2 = M_PEND * L_PEND * L_PEND
        vv = np.asarray(v)[:, 0]
        for t in range(T):
            a_t = (vv[t + 1] - vv[t]) / dt
            tau_gt = (ml2 * a_t
                      + M_PEND * 9.81 * L_PEND * np.sin(float(q[t + 1, 0]))
                      + B_PEND * vv[t + 1])
            np.testing.assert_allclose(
                float(tau[t, 0]), tau_gt, rtol=1e-12)

    def test_cost_acrobot_fake_data(self):
        """CalcCost (trajectory_optimizer_test.cc:1248-1313): cost from
        directly-supplied (q, v, tau) fake data vs the closed form
        T dt (2*0.1 + 2*0.2 + 2*0.5) + 2*0.3 + 2*0.4."""
        T, dt = 100, 1e-2
        model = make_acrobot()
        prob = _toy_problem(
            model, T, dt, (0.2, 0.1), (-0.1, 0.0), Qq=0.1, Qv=0.2,
            Qf_q=0.3, Qf_v=0.4, R=0.5, q_nom=(1.2, 1.1), v_nom=(-1.1, 1.0),
        )
        q = jnp.broadcast_to(jnp.array([0.2, 0.1]), (T + 1, 2))
        v = jnp.broadcast_to(jnp.array([-0.1, 0.0]), (T + 1, 2))
        tau = jnp.broadcast_to(jnp.array([-1.0, 1.0]), (T, 2))
        L = float(trajectory.cost(
            model, prob, ContactParams(), q, tau=tau, v=v
        ))
        L_gt = T * dt * (2 * 0.1 + 2 * 0.2 + 2 * 0.5) + 2 * 0.3 + 2 * 0.4
        np.testing.assert_allclose(L, L_gt, rtol=1e-13)

    def test_velocities_linear(self):
        """CalcVelocities (trajectory_optimizer_test.cc:1394-1446):
        v_t = (q_t - q_{t-1})/dt with v_0 = v_init."""
        T, dt = 5, 1e-2
        model = make_acrobot()
        v_init = (0.5 / dt, 1.5 / dt)
        prob = _toy_problem(
            model, T, dt, (0.1, 0.2), v_init, Qq=0, Qv=0, Qf_q=0, Qf_v=0,
            R=0, q_nom=0.0, v_nom=0.0,
        )
        q = jnp.asarray(np.stack(
            [[0.1 + 0.5 * t, 0.2 + 1.5 * t] for t in range(T + 1)]
        ))
        v = trajectory.velocities(model, prob, q)
        np.testing.assert_allclose(
            np.asarray(v),
            np.broadcast_to(np.asarray(v_init), (T + 1, 2)),
            rtol=1e-13,
        )


# ---------------------------------------------------------------------------
# Dogleg geometry and trust ratio (trajectory_optimizer_test.cc:285-433)
# ---------------------------------------------------------------------------
class TestDoglegGeometry:
    def _prep(self):
        T, dt = 2, 5e-2
        model = make_pendulum()
        prob = _toy_problem(
            model, T, dt, 0.0, 0.0, Qq=0.0, Qv=0.0, Qf_q=1.0, Qf_v=0.0,
            R=1.0, q_nom=0.0, v_nom=0.0,
        )
        params = SolverParameters(scaling=False)
        q = jnp.array([[0.0], [1.5], [1.5]])
        prep = _prepare(model, prob, params, q)
        return prep, dt

    def test_small_medium_large_trust_regions(self):
        """DoglegPoint: a small or medium Delta puts the dogleg point ON the
        boundary (||dq|| == Delta); a huge Delta contains the full Newton
        step; norms are monotone in Delta."""
        prep, dt = self._prep()
        tol = np.finfo(np.float64).eps / dt

        _, dq_small, on_small = _dogleg(prep, jnp.asarray(1e-3))
        assert bool(on_small)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(dq_small)), 1e-3, atol=tol)

        # Delta = 1.0 is hand-chosen by the reference to intersect the
        # second dogleg leg.
        _, dq_med, on_med = _dogleg(prep, jnp.asarray(1.0))
        assert bool(on_med)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(dq_med)), 1.0, atol=tol)

        _, dq_large, on_large = _dogleg(prep, jnp.asarray(1e3))
        assert not bool(on_large)

        n_s = float(jnp.linalg.norm(dq_small))
        n_m = float(jnp.linalg.norm(dq_med))
        n_l = float(jnp.linalg.norm(dq_large))
        assert n_l > n_m > n_s

    def test_newton_step_inside_equals_newton(self):
        """With the boundary inactive the dogleg point IS the Newton point."""
        prep, _ = self._prep()
        _, dq_large, _ = _dogleg(prep, jnp.asarray(1e3))
        np.testing.assert_allclose(
            np.asarray(dq_large), np.asarray(prep.D * prep.p_newton),
            rtol=1e-12,
        )


class TestTrustRatio:
    def test_ratio_is_one_for_quadratic_cost(self):
        """TrustRatio (trajectory_optimizer_test.cc:369-433): for the
        no-gravity pendulum the cost is exactly quadratic, so the quadratic
        model is exact and rho == 1."""
        T, dt = 5, 5e-2
        model = make_pendulum_no_gravity()
        prob = _toy_problem(
            model, T, dt, 0.1, 0.0, Qq=1.0, Qv=2.0, Qf_q=3.0, Qf_v=4.0,
            R=5.0, q_nom=np.pi, v_nom=-0.3,
        )
        params = SolverParameters(scaling=False)
        q = jnp.asarray(
            np.array([0.1 + 0.01 * t for t in range(T + 1)])[:, None]
        )
        prep = _prepare(model, prob, params, q)
        dq_scaled = prep.p_newton  # scaling off: D = 1
        dq = prep.D * dq_scaled
        merit_try, _ = _merit_at(model, prob, params, q + dq, prep.lam)
        Hdq = penta.matvec(prep.H, dq_scaled)
        predicted = (-jnp.sum(prep.g_merit * dq_scaled)
                     - 0.5 * jnp.sum(dq_scaled * Hdq))
        rho = float((prep.merit - merit_try) / predicted)
        np.testing.assert_allclose(
            rho, 1.0, atol=np.sqrt(np.finfo(np.float64).eps))


# ---------------------------------------------------------------------------
# Equality-constraint Jacobian vs autodiff of h(q)
# (trajectory_optimizer_test.cc:1447-1636)
# ---------------------------------------------------------------------------
class TestConstraintJacobianVsAutodiff:
    def _check(self, model, prob, contact, q):
        unact = model.unactuated_vdofs
        u = jnp.array(unact, dtype=jnp.int32)
        parts = id_partials(model, prob, contact, q)
        J = _constraint_jacobian_dense(model, prob, parts, unact, q.dtype)

        def h_of_q(qq):
            tau = trajectory.generalized_forces(model, prob, contact, qq)
            return tau[:, u].reshape(-1)

        J_ad = jax.jacrev(h_of_q)(q)
        # q0 is not a decision variable -- its column block is zeroed in J.
        J_ad = J_ad.at[:, 0, :].set(0.0)
        np.testing.assert_allclose(
            np.asarray(J), np.asarray(J_ad), rtol=0,
            atol=1e-9 * max(1.0, float(jnp.abs(J_ad).max())),
        )
        return J

    def test_spinner(self):
        from idto_tpu.examples.registry import get_example

        model = get_example("spinner").build().finalize()
        T, dt = 3, 0.05
        prob = _toy_problem(
            model, T, dt, (-0.1, 1.5, 0.0), 0.0,
            Qq=(0, 0, 0.1), Qv=(0, 0, 1.0), Qf_q=(0, 0, 10.0),
            Qf_v=(0, 0, 1.0), R=(1.0, 1.0, 10.0),
            q_nom=(-0.1, 1.5, 0.0), v_nom=0.0,
        )
        contact = SolverParameters().contact
        q = jnp.broadcast_to(prob.q_init, (T + 1, model.nq))
        assert len(model.unactuated_vdofs) == 1
        J = self._check(model, prob, contact, q)
        assert J.shape[0] == T

    @pytest.mark.slow
    def test_hopper(self):
        from idto_tpu.examples.registry import get_example

        model = get_example("hopper").build().finalize()
        T, dt = 5, 1e-2
        q0 = np.array([0.0, 0.6, 0.3, -0.5, 0.2])
        v0 = np.array([1.0, -0.2, 0.1, -0.3, 0.4])
        prob = _toy_problem(
            model, T, dt, q0, v0, Qq=0.1, Qv=0.2, Qf_q=0.3, Qf_v=0.4,
            R=0.01, q_nom=(0.5, 0.5, 0.3, -0.4, 0.1),
            v_nom=(0.01, 0.0, 0.2, 0.1, -0.1),
        )
        contact = SolverParameters().contact
        q = jnp.asarray(
            q0[None, :] + dt * v0[None, :] * np.arange(T + 1)[:, None]
        )
        assert len(model.unactuated_vdofs) == 3
        tau = trajectory.generalized_forces(model, prob, contact, q)
        h = tau[:, jnp.array(model.unactuated_vdofs)].reshape(-1)
        assert h.shape[0] == T * 3
        assert float(jnp.abs(h[0])) > 0.0
        self._check(model, prob, contact, q)


# ---------------------------------------------------------------------------
# Independent dynamics oracle: Euler-Lagrange from energies
# ---------------------------------------------------------------------------
def lagrangian_tau(model, q, v, a):
    """Generalized forces (conjugate to qdot) via Euler-Lagrange on energies
    computed from forward kinematics only.

    This is an independent derivation from models/dynamics.py (which uses
    Newton-Euler momentum balance + a vjp for J^T): here torques come from
    d/dt (dL/dqdot) - dL/dq with L = KE - PE assembled from link poses and
    velocities.  Excludes damping (an applied force, not part of L).

    Returns an (nq,) vector f satisfying f = N+^T tau (+ lambda * quat on
    quaternion rows, from the unit-norm constraint -- project before
    comparing).
    """
    qdot = v_to_qdot(model, q, v)
    _, qddot = jax.jvp(
        lambda qq, vv: v_to_qdot(model, qq, vv), (q, v), (qdot, a)
    )

    def lagrangian(qq, qd):
        vv = qdot_to_v(model, qq, qd)
        R, p, w, pd = body_velocities(model, qq, vv)
        r = mat3.mv(R, model.com)
        v_com = pd + jnp.cross(w, r)
        I_w = mat3.mul_t(mat3.mul(R, model.inertia), R)
        ke = (0.5 * jnp.sum(model.mass * jnp.sum(v_com * v_com, axis=-1))
              + 0.5 * jnp.sum(w * mat3.mv(I_w, w)))
        pe = -jnp.sum(
            model.mass * model.grav_scale * ((p + r) @ model.gravity)
        )
        return ke - pe

    p_fn = jax.grad(lagrangian, argnums=1)
    _, dp_dt = jax.jvp(p_fn, (q, qdot), (qdot, qddot))
    dL_dq = jax.grad(lagrangian, argnums=0)(q, qdot)
    return dp_dt - dL_dq


def _quat_dims(model):
    """Index arrays of quaternion q-dims, one (4,) per floating joint."""
    quads = []
    from idto_tpu.models.model import JointType

    for j, jt in enumerate(model.joint_types):
        if jt == JointType.FLOATING:
            start = int(model.q_starts[j])
            quads.append(np.arange(start, start + 4))
    return quads


class TestLagrangianDynamicsParity:
    """inverse_dynamics vs the Euler-Lagrange derivation, fixed tolerance
    1e-8 as demanded by the parity acceptance criterion."""

    def _compare(self, model, q, v, a):
        tau = inverse_dynamics(model, q, v, a)
        # Remove damping: EL covers conservative dynamics only.
        tau_cons = tau - model.damping * v
        f_el = lagrangian_tau(model, q, v, a)
        Np = nplus_matrix(model, q)  # (nv, nq)
        f_ne = Np.T @ tau_cons  # Newton-Euler route mapped to qdot space

        f_el = np.array(f_el, dtype=np.float64)  # force writable copies
        f_ne = np.array(f_ne, dtype=np.float64)
        # Project out the unit-norm constraint direction on quaternion rows
        # (the EL multiplier lives along quat).
        for dims in _quat_dims(model):
            e = np.asarray(q, dtype=np.float64)[dims]
            e = e / np.linalg.norm(e)
            f_el[dims] -= e * (e @ f_el[dims])
            f_ne[dims] -= e * (e @ f_ne[dims])
        scale = max(1.0, np.abs(f_ne).max())
        np.testing.assert_allclose(f_el, f_ne, rtol=0, atol=1e-8 * scale)

    def test_pendulum(self):
        model = make_pendulum()
        self._compare(model, jnp.array([0.7]), jnp.array([-0.3]),
                      jnp.array([1.1]))

    def test_acrobot(self):
        model = make_acrobot()
        self._compare(
            model, jnp.array([0.4, -0.9]), jnp.array([1.2, 0.3]),
            jnp.array([-0.5, 2.0]),
        )

    def test_hopper(self):
        from idto_tpu.examples.registry import get_example

        model = get_example("hopper").build().finalize()
        rng = np.random.RandomState(3)
        q = jnp.asarray(0.3 * rng.randn(model.nq))
        v = jnp.asarray(0.5 * rng.randn(model.nv))
        a = jnp.asarray(rng.randn(model.nv))
        self._compare(model, q, v, a)

    def test_mini_cheetah_floating_base(self):
        """The critical one: quaternion floating-base velocity conventions.
        A wrong N+ frame, angular-velocity frame, or v-ordering fails
        here."""
        from idto_tpu.examples.registry import get_example

        model = get_example("mini_cheetah").build().finalize()
        rng = np.random.RandomState(7)
        q = np.zeros(model.nq)
        quat = rng.randn(4)
        q[_quat_dims(model)[0]] = quat / np.linalg.norm(quat)
        q[4:7] = [0.1, -0.2, 0.35]  # base position
        q[7:] = 0.4 * rng.randn(model.nq - 7)
        v = jnp.asarray(0.6 * rng.randn(model.nv))
        a = jnp.asarray(1.5 * rng.randn(model.nv))
        self._compare(model, jnp.asarray(q), v, a)


# ---------------------------------------------------------------------------
# Committed golden regressions (goldens/*.npz from scripts/make_goldens.py)
# ---------------------------------------------------------------------------
class TestGoldenRegressions:
    def test_cheetah_inverse_dynamics_golden(self):
        """mini-cheetah tau for a recorded (q, v, a) pinned to 1e-10: any
        change to kinematic or dynamic conventions breaks this loudly."""
        path = os.path.join(GOLDEN_DIR, "cheetah_id.npz")
        assert os.path.exists(path), "run scripts/make_goldens.py"
        d = np.load(path)
        from idto_tpu.examples.registry import get_example

        model = get_example("mini_cheetah").build().finalize()
        tau = inverse_dynamics(
            model, jnp.asarray(d["q"]), jnp.asarray(d["v"]),
            jnp.asarray(d["a"]),
        )
        scale = max(1.0, np.abs(d["tau"]).max())
        np.testing.assert_allclose(
            np.asarray(tau), d["tau"], rtol=0, atol=1e-10 * scale
        )

    @pytest.mark.slow
    def test_spinner_solve_golden(self):
        """The spinner T=40 solve trajectory locked as a regression golden
        (solution q/v/tau and the per-iteration cost curve)."""
        path = os.path.join(GOLDEN_DIR, "spinner_T40.npz")
        assert os.path.exists(path), "run scripts/make_goldens.py"
        d = np.load(path)
        from idto_tpu.examples.registry import load_example
        from idto_tpu.optimizer.solver import solve

        model, cfg, prob, params, q_guess = load_example("spinner")
        params = params.replace(max_iterations=int(d["max_iterations"]))
        sol, stats, _ = jax.jit(solve)(model, prob, params, q_guess)
        np.testing.assert_allclose(
            np.asarray(sol.q), d["q"], rtol=0, atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(sol.tau), d["tau"], rtol=0, atol=1e-6)
        n = int(stats.num_iters)
        np.testing.assert_allclose(
            np.asarray(stats.cost)[:n], d["cost"][:n], rtol=1e-8)


# ---------------------------------------------------------------------------
# Scaling invariances of the constrained trust-region machinery
# ---------------------------------------------------------------------------
class TestEqualityConstraintsAndScaling:
    """Mirrors the reference's EqualityConstraintsAndScaling test
    (trajectory_optimizer_test.cc:1637-1753): on the hopper with the
    fake trajectory q[t] = q0 + t*dt*v0, diagonal scaling must leave the
    Lagrange multipliers, the merit function, and the trust ratio
    invariant, and the scaled merit gradient must equal D * (g + J^T lam).
    The reference checks these through its Eval* cache; here they pin the
    scaled Schur-complement solve in solver._prepare against the unscaled
    dense formula."""

    def _setup(self):
        from idto_tpu.examples.registry import get_example

        model = get_example("hopper").build().finalize()
        T, dt = 5, 1e-2
        q0 = np.array([0.0, 0.6, 0.3, -0.5, 0.2])
        v0 = np.array([1.0, -0.2, 0.1, -0.3, 0.4])
        prob = _toy_problem(
            model, T, dt, q0, v0, Qq=0.1, Qv=0.2, Qf_q=0.3, Qf_v=0.4,
            R=0.01, q_nom=(0.5, 0.5, 0.3, -0.4, 0.1),
            v_nom=(0.01, 0.0, 0.2, 0.1, -0.1),
        )
        q = jnp.asarray(
            q0[None, :] + dt * v0[None, :] * np.arange(T + 1)[:, None]
        )
        base = SolverParameters(equality_constraints=True, scaling=False)
        scaled = base.replace(scaling=True)
        return model, prob, q, base, scaled

    @pytest.mark.slow  # two _prepare compiles (scaled + unscaled)
    def test_multipliers_merit_gradient_invariant(self):
        model, prob, q, params_u, params_s = self._setup()
        prep_u = _prepare(model, prob, params_u, q)
        prep_s = _prepare(model, prob, params_s, q)

        # Lagrange multipliers: scaled Schur solve == unscaled == the
        # dense formula lam = (J H^-1 J^T)^-1 (h - J H^-1 g)
        # (reference :1722-1734).
        np.testing.assert_allclose(
            np.asarray(prep_u.lam), np.asarray(prep_s.lam),
            rtol=1e-9, err_msg="lambda must be scaling-invariant",
        )
        parts = id_partials(model, prob, params_u.contact, q)
        npl = nplus_stack(model, q)
        from idto_tpu.optimizer.hessian import gauss_newton_hessian

        Hd = penta.to_dense(gauss_newton_hessian(model, prob, parts, npl))
        g = gradient_from_partials(
            model, prob, parts, npl, q,
            trajectory.velocities(model, prob, q),
            trajectory.generalized_forces(model, prob, params_u.contact, q),
        ).reshape(-1)
        unact = model.unactuated_vdofs
        J = _constraint_jacobian_dense(
            model, prob, parts, unact, q.dtype
        ).reshape(prep_u.lam.shape[0], -1)
        Hinv_g = np.linalg.solve(np.asarray(Hd), np.asarray(g))
        Hinv_JT = np.linalg.solve(np.asarray(Hd), np.asarray(J).T)
        S = np.asarray(J) @ Hinv_JT
        lam_dense = np.linalg.solve(
            S, np.asarray(prep_u.h) - np.asarray(J) @ Hinv_g
        )
        np.testing.assert_allclose(
            np.asarray(prep_u.lam), lam_dense, rtol=1e-7,
            err_msg="lambda must match the dense Schur formula",
        )

        # Merit is scaling-invariant (reference :1737-1741).
        np.testing.assert_allclose(
            float(prep_u.merit), float(prep_s.merit), rtol=1e-12
        )
        # Scaled merit gradient: gm_scaled = D * gm (reference :1743-1748;
        # unscaled prep has D = 1 so prep_u.g_merit IS g + J^T lam).
        np.testing.assert_allclose(
            np.asarray(prep_s.D * prep_u.g_merit),
            np.asarray(prep_s.g_merit), rtol=1e-9, atol=1e-12,
        )

    @pytest.mark.slow  # two _prepare compiles (scaled + unscaled)
    def test_trust_ratio_invariant(self):
        """rho computed in scaled coordinates equals rho in physical
        coordinates for the same physical step (reference :1750-1762:
        'trust ratio should be the same with and without scaling')."""
        model, prob, q, params_u, params_s = self._setup()
        prep_u = _prepare(model, prob, params_u, q)
        prep_s = _prepare(model, prob, params_s, q)

        # The same PHYSICAL step in both coordinate systems: the unscaled
        # Newton step (D_u = 1 so p_newton is physical).
        dq = prep_u.p_newton
        dq_scaled = dq / prep_s.D

        def rho_of(prep, step_scaled):
            merit_try, _ = _merit_at(
                model, prob, params_u, q + prep.D * step_scaled, prep.lam
            )
            predicted = -float(
                jnp.sum(prep.g_merit * step_scaled)
                + 0.5 * jnp.sum(step_scaled * penta.matvec(
                    prep.H, step_scaled))
            )
            return (float(prep.merit) - float(merit_try)) / predicted

        rho_u = rho_of(prep_u, dq)
        rho_s = rho_of(prep_s, dq_scaled)
        assert rho_u > 0.6, f"degenerate test point (rho={rho_u})"
        np.testing.assert_allclose(rho_u, rho_s, rtol=1e-7)


# ---------------------------------------------------------------------------
# UpdateNominalTrajectory behavior through the pyidto-analog API
# ---------------------------------------------------------------------------
class TestUpdateNominalTrajectory:
    @pytest.mark.slow  # two full solves through the pyidto-analog API
    def test_pendulum_retarget(self):
        """Mirrors trajectory_optimizer_test.cc:1754-1827: solve the
        pendulum swing-up to q_nom = pi, then UpdateNominalTrajectory to
        -1.2 and re-solve from the same guess; each solve must reach its
        own target to 1e-3."""
        from idto_tpu.api import TrajectoryOptimizer

        T, dt = 20, 5e-2
        model = make_pendulum()
        prob = _toy_problem(
            model, T, dt, 0.1, 0.0, Qq=1.0, Qv=0.1, Qf_q=1000.0, Qf_v=1.0,
            R=0.01, q_nom=np.pi, v_nom=0.0,
        )
        params = SolverParameters(
            max_iterations=20, check_convergence=True,
            equality_constraints=False,
        )
        params = params.replace(
            tolerances=params.tolerances.replace(rel_cost_reduction=1e-5)
        )
        opt = TrajectoryOptimizer(model, prob, params)
        q_guess = np.broadcast_to(np.asarray([0.1]), (T + 1, 1))

        sol, stats = opt.Solve(q_guess)
        assert int(stats.solver_flag) == 0  # SUCCESS
        np.testing.assert_allclose(float(sol.q[T, 0]), np.pi, atol=1e-3)

        opt.UpdateNominalTrajectory(
            np.full((T + 1, 1), -1.2), np.zeros((T + 1, 1))
        )
        sol2, stats2 = opt.Solve(q_guess)
        assert int(stats2.solver_flag) == 0
        np.testing.assert_allclose(float(sol2.q[T, 0]), -1.2, atol=1e-3)
