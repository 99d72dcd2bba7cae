"""Geometry signed-distance and contact-force tests.

Mirrors the reference's smoothed-contact expectations
(optimizer/trajectory_optimizer.cc:247-386) with analytic cases.
"""
import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.contact.force import ContactParams, contact_wrenches
from idto_tpu.geometry.distance import signed_distance
from idto_tpu.models.model import GeomType, JointType, ModelBuilder

I3 = jnp.eye(3)
Z3 = jnp.zeros(3)


def sd(ta, pa, Ra, xa, tb, pb, Rb, xb):
    return signed_distance(
        ta, jnp.asarray(pa, jnp.float64), Ra, jnp.asarray(xa, jnp.float64),
        tb, jnp.asarray(pb, jnp.float64), Rb, jnp.asarray(xb, jnp.float64),
    )


class TestSignedDistance:
    def test_sphere_sphere(self):
        phi, n, wa, wb = sd(
            GeomType.SPHERE, [0.5, 0, 0], I3, [0, 0, 0],
            GeomType.SPHERE, [0.25, 0, 0], I3, [2, 0, 0],
        )
        np.testing.assert_allclose(float(phi), 2 - 0.75, atol=1e-12)
        np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(wa), [0.5, 0, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(wb), [1.75, 0, 0], atol=1e-9)

    def test_sphere_box_face(self):
        # Box with half extents (1,1,1) at origin; sphere r=0.1 above top.
        phi, n, wa, wb = sd(
            GeomType.SPHERE, [0.1, 0, 0], I3, [0.2, 0.3, 1.5],
            GeomType.BOX, [1, 1, 1], I3, [0, 0, 0],
        )
        np.testing.assert_allclose(float(phi), 0.4, atol=1e-9)
        # Normal points from sphere (A) toward box (B): downward.
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(wb), [0.2, 0.3, 1.0], atol=1e-9)

    def test_sphere_box_penetrating(self):
        phi, n, _, _ = sd(
            GeomType.SPHERE, [0.2, 0, 0], I3, [0, 0, 1.1],
            GeomType.BOX, [1, 1, 1], I3, [0, 0, 0],
        )
        np.testing.assert_allclose(float(phi), -0.1, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)

    def test_sphere_center_inside_box(self):
        phi, n, _, _ = sd(
            GeomType.SPHERE, [0.2, 0, 0], I3, [0, 0, 0.9],
            GeomType.BOX, [1, 1, 1], I3, [0, 0, 0],
        )
        np.testing.assert_allclose(float(phi), -0.3, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)

    def test_sphere_capsule(self):
        # Capsule along z, r=0.1, hl=0.5; sphere r=0.2 beside the barrel.
        phi, n, _, _ = sd(
            GeomType.SPHERE, [0.2, 0, 0], I3, [1.0, 0, 0.3],
            GeomType.CAPSULE, [0.1, 0.5], I3, [0, 0, 0],
        )
        np.testing.assert_allclose(float(phi), 1.0 - 0.3, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [-1, 0, 0], atol=1e-6)

    def test_sphere_cylinder_cap(self):
        phi, n, _, wb = sd(
            GeomType.SPHERE, [0.1, 0, 0], I3, [0.2, 0, 1.0],
            GeomType.CYLINDER, [1.0, 0.5], I3, [0, 0, 0],
        )
        np.testing.assert_allclose(float(phi), 0.5 - 0.1, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(wb), [0.2, 0, 0.5], atol=1e-9)

    def test_gradient_matches_fd(self):
        """d(phi)/d(sphere center) must equal the normal direction."""

        def phi_of_center(c):
            phi, *_ = signed_distance(
                GeomType.SPHERE, jnp.array([0.1, 0, 0]), I3, c,
                GeomType.BOX, jnp.array([1.0, 1, 1]), I3, Z3,
            )
            return phi

        c0 = jnp.array([0.7, -0.4, 1.6])
        g = jax.grad(phi_of_center)(c0)
        eps = 1e-6
        for i in range(3):
            fp = phi_of_center(c0.at[i].add(eps))
            fm = phi_of_center(c0.at[i].add(-eps))
            np.testing.assert_allclose(
                float(g[i]), float((fp - fm) / (2 * eps)), atol=1e-6
            )


def ball_on_ground_model():
    """A free-floating ball above a large ground box (the hopper/cheetah
    ground registration pattern, examples/hopper/hopper.cc:43-49)."""
    b = ModelBuilder()
    b.add_link(
        "ball", "world", JointType.FLOATING,
        mass=1.0, com=(0, 0, 0), inertia=np.eye(3) * 0.004,
    )
    b.add_geometry("ball", GeomType.SPHERE, [0.1], name="ball_c")
    b.add_geometry(
        "world", GeomType.BOX, [12.5, 12.5, 5.0], p=(0, 0, -5.0),
        name="ground",
    )
    return b.finalize()


class TestContactForce:
    def test_resting_ball_force_balance(self):
        model = ball_on_ground_model()
        params = ContactParams(stiffness=1000.0, smoothing_factor=0.001)
        # At penetration phi, normal force ~= -k*phi (deep in linear regime).
        phi_target = -9.81 / 1000.0  # so that k*|phi| = m g
        q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 0.1 + phi_target])
        v = jnp.zeros(6)
        (torques, forces) = contact_wrenches(model, q, v, params)
        # Upward force on the ball close to its weight.
        assert abs(float(forces[0, 2]) - 9.81) / 9.81 < 0.01
        np.testing.assert_allclose(np.asarray(forces[0, :2]), 0.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(torques[0]), 0.0, atol=1e-9)

    def test_friction_opposes_sliding(self):
        model = ball_on_ground_model()
        params = ContactParams(stiffness=1000.0, smoothing_factor=0.001,
                               friction_coefficient=0.5)
        q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 0.09])
        v = jnp.zeros(6).at[3].set(1.0)  # sliding +x
        (_, forces) = contact_wrenches(model, q, v, params)
        assert float(forces[0, 0]) < 0.0  # friction pushes -x
        fn = float(forces[0, 2])
        ft = abs(float(forces[0, 0]))
        # |ft| <= mu * fn (regularization makes it slightly less).
        assert ft <= 0.5 * fn + 1e-9
        assert ft >= 0.4 * fn  # sliding at 1 m/s >> vs: near the mu*fn limit

    def test_dissipation_reduces_approach_force(self):
        model = ball_on_ground_model()
        params = ContactParams(stiffness=1000.0, smoothing_factor=0.001,
                               dissipation_velocity=0.1)
        q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 0.09])
        f_static = contact_wrenches(model, q, jnp.zeros(6), params)[1][0, 2]
        # Approaching (ball moving down): force increases (1 - s, s<0).
        v_down = jnp.zeros(6).at[5].set(-0.1)
        f_down = contact_wrenches(model, q, v_down, params)[1][0, 2]
        # Separating at 2*vd: force vanishes.
        v_up = jnp.zeros(6).at[5].set(0.25)
        f_up = contact_wrenches(model, q, v_up, params)[1][0, 2]
        assert float(f_down) > float(f_static) > float(f_up)
        np.testing.assert_allclose(float(f_up), 0.0, atol=1e-12)

    def test_no_force_far_away(self):
        model = ball_on_ground_model()
        params = ContactParams(stiffness=200.0, smoothing_factor=0.01)
        q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 1.0])
        (torques, forces) = contact_wrenches(model, q, jnp.zeros(6), params)
        np.testing.assert_allclose(np.asarray(forces), 0.0, atol=1e-8)

    def test_contact_differentiable(self):
        model = ball_on_ground_model()
        params = ContactParams(stiffness=1000.0, smoothing_factor=0.01)

        def fz(h):
            q = jnp.array([1.0, 0, 0, 0, 0.0, 0.0, 0.0]).at[6].set(h)
            return contact_wrenches(model, q, jnp.zeros(6), params)[1][0, 2]

        g = jax.grad(fz)(0.1)
        # d(fn)/dh ~ -k/2 at phi=0 (softplus slope at 0 is 1/2).
        np.testing.assert_allclose(float(g), -500.0, rtol=0.01)
