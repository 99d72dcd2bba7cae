"""Multibody engine correctness oracles.

Mirrors the reference's strategy of checking inverse dynamics against
hand-derived formulas (optimizer/test/trajectory_optimizer_test.cc:1314-1393)
plus self-consistency checks (energy conservation, mass-matrix symmetry)
that the reference gets for free from Drake.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.models.dynamics import (
    bias_forces,
    forward_dynamics,
    inverse_dynamics,
    mass_matrix,
)
from idto_tpu.models.kinematics import (
    body_velocities,
    forward_kinematics,
    nplus_matrix,
    qdot_to_v,
    v_to_qdot,
)
from idto_tpu.models.model import JointType, ModelBuilder
from idto_tpu.models.rotations import normalize_quat, quat_to_rot


def make_pendulum(mass=1.0, length=0.5, damping=0.1):
    """Point-mass pendulum rotating about the world y-axis; hangs down at
    q=0, q=pi is upright (matching Drake's Pendulum.urdf conventions)."""
    b = ModelBuilder()
    b.add_link(
        "arm",
        "world",
        JointType.REVOLUTE,
        joint_name="theta",
        axis=(0.0, 1.0, 0.0),
        damping=damping,
        mass=mass,
        com=(0.0, 0.0, -length),
        inertia=np.zeros((3, 3)),
    )
    b.add_actuator("theta")
    return b.finalize()


def make_free_body(mass=2.0, inertia_diag=(0.1, 0.2, 0.3)):
    b = ModelBuilder()
    b.add_link(
        "body",
        "world",
        JointType.FLOATING,
        mass=mass,
        com=(0.0, 0.0, 0.0),
        inertia=np.diag(inertia_diag),
    )
    return b.finalize()


def make_acrobot():
    """Two-link acrobot about y axes, elbow actuated only (reference model
    models/acrobot/acrobot.urdf)."""
    b = ModelBuilder()
    b.add_link(
        "link1",
        "world",
        JointType.REVOLUTE,
        joint_name="shoulder",
        p_pj=(0.0, 0.15, 0.0),
        axis=(0.0, 1.0, 0.0),
        damping=0.1,
        mass=1.0,
        com=(0.0, 0.0, -0.5),
        inertia=np.diag([0.083, 0.083, 5e-7]),
    )
    b.add_link(
        "link2",
        "link1",
        JointType.REVOLUTE,
        joint_name="elbow",
        p_pj=(0.0, 0.15, -1.0),
        axis=(0.0, 1.0, 0.0),
        damping=0.1,
        mass=1.0,
        com=(0.0, 0.0, -1.0),
        inertia=np.diag([0.33, 0.33, 5e-7]),
    )
    b.add_actuator("elbow")
    return b.finalize()


class TestPendulum:
    def test_inverse_dynamics_analytic(self):
        m, l, d, g = 1.0, 0.5, 0.1, 9.81
        model = make_pendulum(m, l, d)
        for theta, thetadot, thetaddot in [
            (0.3, -0.5, 1.2),
            (2.0, 3.0, -0.7),
            (-1.0, 0.0, 0.0),
        ]:
            q = jnp.array([theta])
            v = jnp.array([thetadot])
            a = jnp.array([thetaddot])
            tau = inverse_dynamics(model, q, v, a)
            # Rotation about +y by theta moves the hanging mass so that the
            # gravity torque about +y is  m g l sin(theta).
            expected = m * l * l * thetaddot + d * thetadot + m * g * l * np.sin(
                theta
            )
            np.testing.assert_allclose(float(tau[0]), expected, rtol=1e-10)

    def test_mass_matrix(self):
        model = make_pendulum(1.0, 0.5)
        M = mass_matrix(model, jnp.array([0.7]))
        np.testing.assert_allclose(float(M[0, 0]), 0.25, rtol=1e-12)

    def test_forward_inverse_roundtrip(self):
        model = make_pendulum()
        q, v = jnp.array([0.4]), jnp.array([-0.3])
        a = jnp.array([1.7])
        tau = inverse_dynamics(model, q, v, a)
        a2 = forward_dynamics(model, q, v, tau)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-10)


class TestAcrobot:
    def test_mass_matrix_properties(self):
        model = make_acrobot()
        q = jnp.array([0.3, -1.1])
        M = np.asarray(mass_matrix(model, q))
        np.testing.assert_allclose(M, M.T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_energy_conservation(self):
        """Undamped acrobot: dE/dt == 0 along forward dynamics."""
        b = ModelBuilder()
        b.add_link(
            "link1", "world", JointType.REVOLUTE, axis=(0, 1, 0),
            mass=1.0, com=(0, 0, -0.5), inertia=np.diag([0.083, 0.083, 5e-7]),
        )
        b.add_link(
            "link2", "link1", JointType.REVOLUTE, p_pj=(0, 0.15, -1.0),
            axis=(0, 1, 0), mass=1.0, com=(0, 0, -1.0),
            inertia=np.diag([0.33, 0.33, 5e-7]),
        )
        model = b.finalize()

        def energy(q, v):
            M = mass_matrix(model, q)
            _, p = forward_kinematics(model, q)
            R, _ = forward_kinematics(model, q)
            com_world = p + jnp.einsum("nij,nj->ni", R, model.com)
            pe = -jnp.sum(model.mass * (com_world @ model.gravity))
            return 0.5 * v @ M @ v + pe

        q = jnp.array([0.3, 0.2])
        v = jnp.array([0.1, -0.4])
        # dE/dt = dE/dq qdot + dE/dv vdot should vanish with a = FD(q,v,0).
        a = forward_dynamics(model, q, v, jnp.zeros(2))
        gq, gv = jax.grad(energy, argnums=(0, 1))(q, v)
        qd = v_to_qdot(model, q, v)
        dE = float(gq @ qd + gv @ a)
        assert abs(dE) < 1e-9


class TestFloatingBase:
    def test_free_fall(self):
        model = make_free_body()
        q = jnp.array([1.0, 0.0, 0.0, 0.0, 0.5, -0.2, 2.0])
        v = jnp.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
        a = jnp.concatenate([jnp.zeros(3), model.gravity])
        tau = inverse_dynamics(model, q, v, a)
        np.testing.assert_allclose(np.asarray(tau), 0.0, atol=1e-10)

    def test_euler_equations(self):
        """Torque-free rigid body: I wd + w x (I w) = 0 defines wd."""
        model = make_free_body(inertia_diag=(0.1, 0.2, 0.3))
        quat = normalize_quat(jnp.array([0.9, 0.1, -0.3, 0.2]))
        q = jnp.concatenate([quat, jnp.array([0.0, 0.0, 0.0])])
        w_world = jnp.array([1.0, -2.0, 0.5])
        v = jnp.concatenate([w_world, jnp.zeros(3)])
        a = forward_dynamics(model, q, v, jnp.zeros(6))
        R = quat_to_rot(quat)
        I_w = R @ model.inertia[0] @ R.T
        wd_expected = jnp.linalg.solve(I_w, -jnp.cross(w_world, I_w @ w_world))
        np.testing.assert_allclose(
            np.asarray(a[:3]), np.asarray(wd_expected), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(a[3:]), np.asarray(model.gravity), atol=1e-9
        )

    def test_quaternion_rate_consistency(self):
        """v -> qdot -> v roundtrip and FD consistency of the rate map."""
        model = make_free_body()
        quat = normalize_quat(jnp.array([0.3, -0.5, 0.8, 0.1]))
        q = jnp.concatenate([quat, jnp.array([1.0, 2.0, 3.0])])
        v = jnp.array([0.3, -0.2, 0.9, 0.1, 0.2, 0.3])
        qd = v_to_qdot(model, q, v)
        v2 = qdot_to_v(model, q, qd)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-10)

        # Integrate q with qdot and check the resulting angular velocity via
        # finite differences of the rotation matrix.
        eps = 1e-7
        q2 = q + eps * qd
        R1 = np.asarray(quat_to_rot(q[:4]))
        R2 = np.asarray(quat_to_rot(normalize_quat(q2[:4])))
        W = (R2 - R1) / eps @ R1.T
        w_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
        np.testing.assert_allclose(w_fd, np.asarray(v[:3]), atol=1e-5)

    def test_nplus_matrix_shape(self):
        model = make_free_body()
        q = jnp.concatenate(
            [normalize_quat(jnp.array([1.0, 0.2, 0.1, -0.1])), jnp.zeros(3)]
        )
        Np = nplus_matrix(model, q)
        assert Np.shape == (6, 7)


class TestBodyVelocities:
    def test_against_finite_differences(self):
        model = make_acrobot()
        q = jnp.array([0.7, -0.3])
        v = jnp.array([0.5, 1.1])
        R, p, w, pd = body_velocities(model, q, v)
        eps = 1e-7
        qd = v_to_qdot(model, q, v)
        R2, p2 = forward_kinematics(model, q + eps * qd)
        pd_fd = (np.asarray(p2) - np.asarray(p)) / eps
        np.testing.assert_allclose(np.asarray(pd), pd_fd, atol=1e-5)
        for i in range(2):
            W = (np.asarray(R2[i]) - np.asarray(R[i])) / eps @ np.asarray(
                R[i]
            ).T
            w_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
            np.testing.assert_allclose(np.asarray(w[i]), w_fd, atol=1e-5)
