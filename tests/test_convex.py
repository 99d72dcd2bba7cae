"""Convex-hull (mesh-fidelity) collision geometry.

Replaces the bounding-primitive approximation for mesh collision geometry
with support/projection queries on the convex hull of the mesh vertices
(VERDICT r4 Missing #3; reference: Drake/FCL exact mesh signed distances
consumed at trajectory_optimizer.cc:266-279).  The oracle throughout is
the analytic BOX geometry: the hull of a box's 8 corners IS the box, so
every convex query must reproduce the box answers.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idto_tpu.geometry.distance import (
    _point_hull_distance,
    _point_hull_projection,
    signed_distance,
)
from idto_tpu.models.mesh import convex_hull_vertices
from idto_tpu.models.model import GeomType


HALF = np.array([0.4, 0.3, 0.2])


def _box_corners(half=HALF):
    import itertools

    return np.array(
        [s * half for s in itertools.product([-1.0, 1.0], repeat=3)]
    )


def _box_params(half=HALF):
    return jnp.asarray(np.concatenate([half]))


EYE = jnp.eye(3)
ZERO = jnp.zeros(3)


class TestPointHull:
    @pytest.mark.parametrize("p", [
        [1.0, 0.0, 0.0],          # face
        [0.6, 0.5, 0.0],          # edge region
        [0.9, 0.8, 0.7],          # vertex region
        [0.0, 0.0, 1.5],          # far face
    ])
    def test_outside_matches_box(self, p):
        from idto_tpu.geometry.distance import _point_box_distance

        verts = jnp.asarray(_box_corners())
        p = jnp.asarray(p)
        phi_h, n_h, c_h = _point_hull_distance(verts, p)
        phi_b, n_b, c_b = _point_box_distance(p, jnp.asarray(HALF))
        np.testing.assert_allclose(float(phi_h), float(phi_b), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(n_h), np.asarray(n_b), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(c_h), np.asarray(c_b), atol=1e-5
        )

    def test_inside_depth(self):
        verts = jnp.asarray(_box_corners())
        p = jnp.asarray([0.35, 0.0, 0.0])  # 0.05 under the +x face
        phi, n, c = _point_hull_distance(verts, p)
        # Sampled support planes: depth within a few percent of exact.
        assert -0.06 < float(phi) < -0.04, float(phi)
        assert float(jnp.dot(n, jnp.asarray([1.0, 0.0, 0.0]))) > 0.95

    def test_projection_feasible(self):
        """The Frank-Wolfe projection stays a convex combination."""
        verts = jnp.asarray(_box_corners())
        for p in ([2.0, 2.0, 2.0], [0.1, 0.05, 0.0], [-3.0, 0.2, 0.1]):
            x = np.asarray(_point_hull_projection(verts, jnp.asarray(p)))
            assert (np.abs(x) <= HALF + 1e-5).all(), (p, x)

    def test_gradient_flows(self):
        verts = jnp.asarray(_box_corners())

        def phi_of(p):
            return _point_hull_distance(verts, p)[0]

        g = jax.grad(phi_of)(jnp.asarray([1.0, 0.2, 0.1]))
        assert np.isfinite(np.asarray(g)).all()
        # Outside, grad phi is the outward unit normal.
        np.testing.assert_allclose(float(jnp.linalg.norm(g)), 1.0, atol=1e-4)


class TestPairs:
    def test_sphere_vs_convex_matches_sphere_vs_box(self):
        verts = jnp.asarray(_box_corners())
        center = jnp.asarray([1.0, 0.5, 0.3])
        r = jnp.asarray([0.2, 0.0, 0.0])
        phi_c, n_c, wa_c, wb_c = signed_distance(
            GeomType.SPHERE, r, EYE, center, GeomType.CONVEX, verts, EYE, ZERO
        )
        phi_b, n_b, wa_b, wb_b = signed_distance(
            GeomType.SPHERE, r, EYE, center,
            GeomType.BOX, _box_params(), EYE, ZERO,
        )
        np.testing.assert_allclose(float(phi_c), float(phi_b), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(n_c), np.asarray(n_b), atol=1e-4
        )

    def test_convex_vs_halfspace(self):
        """Exact: the deepest corner sets the distance."""
        verts = jnp.asarray(_box_corners())
        p_hull = jnp.asarray([0.0, 0.0, 0.15])  # box center 15 cm up
        phi, n, wa, wb = signed_distance(
            GeomType.CONVEX, verts, EYE, p_hull,
            GeomType.HALFSPACE, jnp.zeros(3), EYE, ZERO,
        )
        np.testing.assert_allclose(float(phi), 0.15 - 0.2, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(n), [0.0, 0.0, -1.0], atol=1e-9
        )

    def test_convex_vs_box_separated(self):
        verts = jnp.asarray(_box_corners())
        p_hull = jnp.asarray([1.5, 0.0, 0.0])
        phi, n, wa, wb = signed_distance(
            GeomType.CONVEX, verts, EYE, p_hull,
            GeomType.BOX, _box_params(), EYE, ZERO,
        )
        # Gap between face x=1.5-0.4=1.1 and face x=0.4 -> 0.7.
        np.testing.assert_allclose(float(phi), 0.7, atol=1e-3)
        np.testing.assert_allclose(np.asarray(n), [-1, 0, 0], atol=1e-3)

    def test_convex_vs_box_penetrating(self):
        verts = jnp.asarray(_box_corners())
        p_hull = jnp.asarray([0.75, 0.0, 0.0])  # 0.05 overlap in x
        phi, n, wa, wb = signed_distance(
            GeomType.CONVEX, verts, EYE, p_hull,
            GeomType.BOX, _box_params(), EYE, ZERO,
        )
        assert -0.08 < float(phi) < -0.02, float(phi)

    def test_capsule_vs_convex(self):
        verts = jnp.asarray(_box_corners())
        # z-aligned capsule (r=0.1, hl=0.3) centered 1 m above the hull.
        cap = jnp.asarray([0.1, 0.3, 0.0])
        phi, n, wa, wb = signed_distance(
            GeomType.CAPSULE, cap, EYE, jnp.asarray([0.0, 0.0, 1.0]),
            GeomType.CONVEX, verts, EYE, ZERO,
        )
        # Gap: 1.0 - 0.3 (capsule reach) - 0.1 (radius) - 0.2 (box top).
        np.testing.assert_allclose(float(phi), 0.4, atol=1e-3)


class TestHullExtraction:
    def test_support_preserved(self):
        """Decimation keeps every sampled support within tolerance."""
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3)) * [0.2, 0.1, 0.05]
        hull = convex_hull_vertices(pts, max_verts=48)
        assert 4 <= hull.shape[0] <= 48
        from idto_tpu.models.mesh import _fibonacci_directions

        dirs = _fibonacci_directions(128)
        h_full = (dirs @ pts.T).max(axis=1)
        h_hull = (dirs @ hull.T).max(axis=1)
        # Inner approximation, close to the full support.
        assert (h_hull <= h_full + 1e-12).all()
        assert (h_full - h_hull).max() < 0.02

    def test_hull_points_are_input_points(self):
        pts = _box_corners()
        hull = convex_hull_vertices(pts, max_verts=16)
        assert hull.shape == (8, 3)
        # Every corner is support-extreme, so all 8 survive.
        assert {tuple(v) for v in hull} == {tuple(v) for v in pts}


class TestEndToEnd:
    def _mesh_urdf(self, tmp_path):
        corners = _box_corners(np.array([0.1, 0.1, 0.02]))
        (tmp_path / "pad.obj").write_text(
            "\n".join(f"v {x} {y} {z}" for x, y, z in corners)
        )
        urdf = """<robot name="r">
  <link name="pad">
    <inertial><mass value="1"/>
      <inertia ixx="1e-3" iyy="1e-3" izz="1e-3" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <geometry><mesh filename="pad.obj"/></geometry>
    </collision>
  </link>
</robot>"""
        p = tmp_path / "r.urdf"
        p.write_text(urdf)
        return p

    def test_urdf_mesh_loads_as_convex(self, tmp_path, monkeypatch):
        from idto_tpu.models.urdf import parse_urdf_file

        monkeypatch.delenv("IDTO_MESH_COLLISION", raising=False)
        m = parse_urdf_file(
            self._mesh_urdf(tmp_path), floating_base=True
        ).finalize()
        assert tuple(m.geoms.types) == (int(GeomType.CONVEX),)
        assert m.geoms.verts.shape == (1, 8, 3)

    def test_primitive_mode_still_available(self, tmp_path, monkeypatch):
        from idto_tpu.models.urdf import parse_urdf_file

        monkeypatch.setenv("IDTO_MESH_COLLISION", "primitive")
        m = parse_urdf_file(
            self._mesh_urdf(tmp_path), floating_base=True
        ).finalize()
        assert tuple(m.geoms.types) != (int(GeomType.CONVEX),)
        assert m.geoms.verts is None

    def test_contact_force_parity_vs_primitive(self, tmp_path):
        """A thin-pad hull resting near the ground: the convex-hull and
        the (box-fitted) primitive contact forces agree, because the hull
        of a box mesh IS the box (the parity delta VERDICT r4 item 8 asks
        to document is zero for polytopes and grows with curvature)."""
        from idto_tpu.contact.force import ContactParams, contact_wrenches
        from idto_tpu.models.model import GeomType, ModelBuilder

        def build(use_convex):
            b = ModelBuilder()
            from idto_tpu.models.model import JointType

            b.add_link(
                "pad", "world", JointType.FLOATING, mass=1.0,
                com=[0, 0, 0], inertia=np.eye(3) * 1e-3,
            )
            if use_convex:
                b.add_geometry(
                    "pad", GeomType.CONVEX,
                    verts=_box_corners(np.array([0.1, 0.1, 0.02])),
                    name="pad_g",
                )
            else:
                b.add_geometry(
                    "pad", GeomType.BOX, [0.1, 0.1, 0.02], name="pad_g"
                )
            b.add_geometry(
                "world", GeomType.HALFSPACE, [], name="ground"
            )
            return b.finalize()

        q = jnp.asarray([1.0, 0, 0, 0, 0.0, 0.0, 0.015])  # 5 mm overlap
        v = jnp.zeros(6)
        params = ContactParams()
        outs = []
        for use_convex in (True, False):
            m = build(use_convex)
            (tq, f), info = contact_wrenches(
                m, q, v, params, return_info=True
            )
            outs.append((np.asarray(f), np.asarray(info.phi)))
        np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-4)
