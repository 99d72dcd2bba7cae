"""Exact capsule-vs-shape (convex-SDF ternary search) and box-vs-box
(corners + 144 edge-edge pairs) distances -- analytic oracles for the
cases the round-1 samplers got wrong (barrel-on-edge, edge-edge boxes)."""
import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.geometry.distance import signed_distance
from idto_tpu.models.model import GeomType
from idto_tpu.models.rotations import rpy_to_rot_np

I3 = jnp.eye(3)


def sd(ta, pa, Ra, xa, tb, pb, Rb, xb):
    return signed_distance(
        ta, jnp.asarray(pa, jnp.float64), jnp.asarray(Ra, jnp.float64),
        jnp.asarray(xa, jnp.float64),
        tb, jnp.asarray(pb, jnp.float64), jnp.asarray(Rb, jnp.float64),
        jnp.asarray(xb, jnp.float64),
    )


class TestCapsuleExact:
    def test_barrel_on_box_edge(self):
        """Horizontal capsule (axis || x) whose BARREL mid-section hangs
        over a box's top edge: the closest point is at the middle of the
        barrel, NOT an endpoint -- the round-1 endpoint sampler got this
        wrong by construction."""
        # Box: half extents (1, 1, 1), top face at z=1, edge along x at
        # y=1.  Capsule axis along x at (0, 1.3, 1.4), r=0.1, hl=0.5:
        # closest approach is from the axis line to the edge line:
        # dy=0.3, dz=0.4 -> 0.5; phi = 0.5 - 0.1 = 0.4.
        Rx = rpy_to_rot_np([0.0, np.pi / 2, 0.0])  # capsule z-axis -> x
        phi, n, wa, wb = sd(
            GeomType.CAPSULE, [0.1, 0.5, 0], Rx, [0.0, 1.3, 1.4],
            GeomType.BOX, [1.0, 1.0, 1.0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), 0.4, atol=1e-6)
        # Witness on the box lies ON the top edge (y=z=1); with the axis
        # parallel to the edge the minimizer is any point of the overlap,
        # so only the x coordinate is free (within the barrel's span).
        wb = np.asarray(wb)
        np.testing.assert_allclose(wb[1:], [1.0, 1.0], atol=1e-5)
        assert abs(wb[0]) <= 0.5 + 1e-6

    def test_tilted_capsule_box_face(self):
        """Capsule tilted 30 deg over a box face: closest point is the
        LOW endpoint sphere; exact phi = gap of that endpoint."""
        ang = np.pi / 6
        R = rpy_to_rot_np([ang, 0.0, 0.0])
        hl, r = 0.5, 0.1
        center = np.array([0.0, 0.0, 1.0])
        low_end = center - hl * R[:, 2]
        expected = low_end[2] - r - 0.5  # box top at z=0.5
        phi, n, wa, wb = sd(
            GeomType.CAPSULE, [r, hl, 0], R, center,
            GeomType.BOX, [2.0, 2.0, 0.5], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), expected, atol=1e-6)

    def test_capsule_halfspace_matches_endpoint(self):
        """vs halfspace the minimum is at an endpoint (linear objective);
        exact result must equal the analytic endpoint distance."""
        ang = 0.4
        R = rpy_to_rot_np([ang, 0.0, 0.0])
        hl, r = 0.3, 0.05
        center = np.array([0.2, -0.1, 0.5])
        low = center[2] - hl * abs(R[2, 2]) - r
        phi, n, wa, wb = sd(
            GeomType.CAPSULE, [r, hl, 0], R, center,
            GeomType.HALFSPACE, [0, 0, 0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), low, atol=1e-6)

    def test_capsule_cylinder_barrel(self):
        """Vertical capsule beside a vertical cylinder: radial gap."""
        phi, n, wa, wb = sd(
            GeomType.CAPSULE, [0.1, 0.4, 0], I3, [1.0, 0.0, 0.0],
            GeomType.CYLINDER, [0.3, 0.5, 0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), 1.0 - 0.3 - 0.1, atol=1e-6)

    def test_envelope_gradient_matches_fd(self):
        """d(phi)/d(capsule position) through the ternary-searched argmin
        equals central finite differences (envelope theorem)."""
        Rx = jnp.asarray(rpy_to_rot_np([0.0, np.pi / 2, 0.0]))

        def phi_of(p):
            return signed_distance(
                GeomType.CAPSULE, jnp.asarray([0.1, 0.5, 0.0]), Rx, p,
                GeomType.BOX, jnp.asarray([1.0, 1.0, 1.0]), I3,
                jnp.zeros(3),
            )[0]

        p0 = jnp.asarray([0.15, 1.3, 1.4])
        g = jax.grad(phi_of)(p0)
        h = 1e-6
        for k in range(3):
            e = jnp.zeros(3).at[k].set(h)
            fd = (phi_of(p0 + e) - phi_of(p0 - e)) / (2 * h)
            np.testing.assert_allclose(float(g[k]), float(fd), atol=1e-4)


class TestBoxBoxExact:
    def test_edge_edge_crossed(self):
        """Two unit boxes rotated 45 deg about orthogonal axes so their
        closest features are EDGES (no vertex is closest): exact distance
        known analytically, corner sampling alone cannot produce it."""
        # Box A axis-aligned, top face z=0.5.  Box B rotated 45 deg about
        # x, lowest EDGE (along x) at z = c - sqrt(2)/2 for half=0.5.
        Rb = rpy_to_rot_np([np.pi / 4, 0.0, 0.0])
        c = 1.5
        expected = (c - np.sqrt(2) / 2) - 0.5
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.0],
            GeomType.BOX, [0.5, 0.5, 0.5], Rb, [0.0, 0.0, c],
        )
        # The closest pair is box B's bottom edge against box A's top
        # FACE -- a face-edge case; edge-edge candidates against A's top
        # edges + corner candidates bound it.  B's bottom edge runs along
        # x through y=0; A's top face spans it, so the exact distance is
        # the vertical gap.
        np.testing.assert_allclose(float(phi), expected, atol=1e-9)
        np.testing.assert_allclose(np.asarray(n)[2], 1.0, atol=1e-9)

    def test_true_edge_edge_skew(self):
        """Skew edge-edge: A's top-+y edge (along x) vs B's bottom edge
        along y.  Closest points are edge interiors."""
        # A: half (0.5, 0.5, 0.5) at origin; B rotated 45 deg about y and
        # then placed above so its lowest edge runs along y.
        Rb = rpy_to_rot_np([0.0, np.pi / 4, 0.0])
        c = np.array([0.0, 0.0, 1.5])
        expected = (1.5 - np.sqrt(2) / 2) - 0.5
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.0],
            GeomType.BOX, [0.5, 0.5, 0.5], Rb, c,
        )
        np.testing.assert_allclose(float(phi), expected, atol=1e-9)

    def test_vertex_vertex(self):
        """Diagonal corner-to-corner separation (vertex-vertex closest
        features, covered by clamped edge-edge endpoints)."""
        d = np.array([1.2, 1.3, 1.4])
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.0],
            GeomType.BOX, [0.5, 0.5, 0.5], I3, d,
        )
        corner_a = np.array([0.5, 0.5, 0.5])
        corner_b = d - 0.5
        expected = np.linalg.norm(corner_b - corner_a)
        np.testing.assert_allclose(float(phi), expected, atol=1e-9)

    def test_penetrating_vertex_face(self):
        """Shallow vertex-face penetration still reports negative phi."""
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.0],
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.95],
        )
        np.testing.assert_allclose(float(phi), -0.05, atol=1e-9)


class TestConvexPairs:
    """Round-4 pairs (VERDICT r3 Missing #3): box-halfspace,
    cylinder-halfspace, box-cylinder, cylinder-cylinder."""

    def test_box_halfspace_tilted(self):
        """Unit box tilted 45 deg about x above the z=0 plane: the deepest
        corner hangs sqrt(2)/2 below the center."""
        Ra = rpy_to_rot_np([np.pi / 4, 0.0, 0.0])
        c = 1.0
        expected = c - np.sqrt(2) / 2
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], Ra, [0.0, 0.0, c],
            GeomType.HALFSPACE, [0.0, 0.0, 0.0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), expected, atol=1e-12)
        np.testing.assert_allclose(np.asarray(n), [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(float(np.asarray(wa)[2]), expected,
                                   atol=1e-12)
        np.testing.assert_allclose(float(np.asarray(wb)[2]), 0.0, atol=1e-12)

    def test_box_halfspace_penetrating(self):
        phi, *_ = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.3],
            GeomType.HALFSPACE, [0.0, 0.0, 0.0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), -0.2, atol=1e-12)

    def test_cylinder_halfspace_tilted(self):
        """Cylinder (r=0.2, h=0.5) tilted 30 deg: deepest rim point at
        c_z - h cos(th) - r sin(th)."""
        th = np.pi / 6
        Ra = rpy_to_rot_np([th, 0.0, 0.0])
        c = 1.0
        expected = c - 0.5 * np.cos(th) - 0.2 * np.sin(th)
        phi, n, wa, wb = sd(
            GeomType.CYLINDER, [0.2, 0.5, 0.0], Ra, [0.0, 0.0, c],
            GeomType.HALFSPACE, [0.0, 0.0, 0.0], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), expected, atol=1e-12)

    def test_cylinder_halfspace_flat(self):
        """Upright cylinder: phi = center height - half length; holds on
        both sides of contact."""
        for c, want in ((1.0, 0.5), (0.4, -0.1)):
            phi, *_ = sd(
                GeomType.CYLINDER, [0.2, 0.5, 0.0], I3, [0.0, 0.0, c],
                GeomType.HALFSPACE, [0.0, 0.0, 0.0], I3, [0.0, 0.0, 0.0],
            )
            np.testing.assert_allclose(float(phi), want, atol=1e-12)

    def test_box_cylinder_axis_aligned(self):
        """Upright cylinder beside a box: radial gap is exact."""
        # Box half (0.5,0.5,0.5) at origin; cylinder r=0.3 h=0.5 at x=1.5.
        phi, n, wa, wb = sd(
            GeomType.BOX, [0.5, 0.5, 0.5], I3, [0.0, 0.0, 0.0],
            GeomType.CYLINDER, [0.3, 0.5, 0.0], I3, [1.5, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), 1.5 - 0.5 - 0.3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n)[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wa)[0], 0.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wb)[0], 1.2, atol=1e-5)

    def test_box_cylinder_cap_above(self):
        """Cylinder cap face above a box top face (parallel planes)."""
        phi, n, *_ = sd(
            GeomType.CYLINDER, [0.3, 0.5, 0.0], I3, [0.0, 0.0, 1.4],
            GeomType.BOX, [1.0, 1.0, 0.5], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), 1.4 - 0.5 - 0.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n)[2], -1.0, atol=1e-4)

    def test_box_cylinder_penetrating_cap(self):
        """Cap pressed into the box top: negative phi equals overlap."""
        phi, n, *_ = sd(
            GeomType.CYLINDER, [0.3, 0.5, 0.0], I3, [0.0, 0.0, 0.9],
            GeomType.BOX, [1.0, 1.0, 0.5], I3, [0.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), -0.1, atol=1e-9)

    def test_cylinder_cylinder_parallel(self):
        """Parallel upright cylinders: gap = center distance - radii."""
        phi, n, wa, wb = sd(
            GeomType.CYLINDER, [0.3, 0.5, 0.0], I3, [0.0, 0.0, 0.0],
            GeomType.CYLINDER, [0.2, 0.5, 0.0], I3, [1.0, 0.0, 0.0],
        )
        np.testing.assert_allclose(float(phi), 0.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(n)[0], 1.0, atol=1e-4)

    def test_cylinder_cylinder_crossed(self):
        """Crossed cylinders (one rotated 90 deg about x): the closest
        features are A's flat TOP CAP (z = 0.5) and B's lowest barrel
        line (z = 1 - r = 0.8) -- flat caps, so the gap is 0.3, NOT the
        capsule-style axis-axis distance minus radii."""
        Rb = rpy_to_rot_np([np.pi / 2, 0.0, 0.0])
        phi, *_ = sd(
            GeomType.CYLINDER, [0.2, 0.5, 0.0], I3, [0.0, 0.0, 0.0],
            GeomType.CYLINDER, [0.2, 0.5, 0.0], Rb, [0.0, 0.0, 1.0],
        )
        np.testing.assert_allclose(float(phi), 0.3, atol=1e-5)

    def test_gradients_match_fd(self):
        """Pose gradients through the alternating-projection witnesses and
        the halfspace support points match central finite differences
        (envelope theorem)."""
        cases = [
            (GeomType.BOX, jnp.asarray([0.5, 0.5, 0.5]),
             jnp.asarray(rpy_to_rot_np([0.3, 0.2, 0.1])),
             GeomType.CYLINDER, jnp.asarray([0.3, 0.5, 0.0]),
             jnp.asarray(rpy_to_rot_np([0.1, -0.2, 0.4])),
             jnp.asarray([1.4, 0.3, 0.2])),
            (GeomType.CYLINDER, jnp.asarray([0.2, 0.5, 0.0]),
             jnp.asarray(rpy_to_rot_np([0.5, 0.0, 0.0])),
             GeomType.CYLINDER, jnp.asarray([0.3, 0.4, 0.0]),
             jnp.asarray(rpy_to_rot_np([0.0, 0.6, 0.0])),
             jnp.asarray([1.1, 0.4, 0.3])),
            (GeomType.BOX, jnp.asarray([0.5, 0.4, 0.3]),
             jnp.asarray(rpy_to_rot_np([0.3, 0.2, 0.1])),
             GeomType.HALFSPACE, jnp.zeros(3),
             jnp.asarray(np.eye(3)), jnp.asarray([0.0, 0.0, -1.2])),
            (GeomType.CYLINDER, jnp.asarray([0.2, 0.5, 0.0]),
             jnp.asarray(rpy_to_rot_np([0.4, 0.3, 0.0])),
             GeomType.HALFSPACE, jnp.zeros(3),
             jnp.asarray(np.eye(3)), jnp.asarray([0.0, 0.0, -1.2])),
        ]
        for ta, pa, Ra, tb, pb, Rb, xb in cases:
            def phi_of(x):
                return signed_distance(
                    ta, pa, Ra, x, tb, pb, Rb, xb + x * 0.0
                )[0]

            x0 = jnp.zeros(3, jnp.float64) if tb != GeomType.HALFSPACE \
                else jnp.asarray([0.0, 0.0, 0.0], jnp.float64)
            g = jax.grad(phi_of)(x0)
            h = 1e-6
            for k in range(3):
                e = jnp.zeros(3, jnp.float64).at[k].set(h)
                fd = (phi_of(x0 + e) - phi_of(x0 - e)) / (2 * h)
                np.testing.assert_allclose(
                    float(g[k]), float(fd), atol=2e-4,
                    err_msg=f"pair ({ta}, {tb}) dof {k}",
                )
