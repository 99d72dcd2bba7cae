"""Mesh -> bounding-primitive approximation (models/mesh.py).

The reference sidesteps mesh collisions by shipping hand-simplified
primitive models (mini_cheetah_simple_v2.urdf vs mini_cheetah_mesh.urdf);
this pathway automates the reduction so mesh-referencing URDF/SDF files
still load.
"""
import struct

import numpy as np
import pytest

from idto_tpu.models.mesh import (
    approximate_mesh,
    fit_box,
    fit_capsule,
    fit_sphere,
    load_mesh_vertices,
)
from idto_tpu.models.model import GeomType
from idto_tpu.models.urdf import parse_urdf_file


def _sphere_cloud(center, r, n=200, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return center + r * d


def _cylinder_cloud(r, half_len, n=400, seed=1):
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-half_len, half_len, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], axis=1)


class TestFitting:
    def test_sphere(self):
        c, r = fit_sphere(_sphere_cloud([0.3, -0.2, 1.0], 0.25))
        np.testing.assert_allclose(c, [0.3, -0.2, 1.0], atol=0.02)
        assert 0.24 <= r <= 0.3  # must bound, not underestimate badly

    def test_box_axis_aligned(self):
        rng = np.random.default_rng(2)
        verts = rng.uniform(-1, 1, (500, 3)) * np.array([0.4, 0.1, 0.05])
        R, c, half = fit_box(verts)
        np.testing.assert_allclose(np.sort(half)[::-1],
                                   [0.4, 0.1, 0.05], rtol=0.1)
        np.testing.assert_allclose(c, 0.0, atol=0.02)

    def test_capsule_on_elongated_cloud(self):
        verts = _cylinder_cloud(0.03, 0.2)
        R, c, r, hl = fit_capsule(verts)
        assert abs(r - 0.03) < 0.01
        # axis must align with z (the elongated direction); PCA on a finite
        # sample carries ~0.02 rad of tilt noise
        assert abs(abs(R[2, 2]) - 1.0) < 1e-3

    def test_auto_picks_capsule_for_leg_like_mesh(self):
        gtype, params, R, p = approximate_mesh(_cylinder_cloud(0.02, 0.15))
        assert gtype == GeomType.CAPSULE

    def test_auto_picks_sphere_for_blob(self):
        gtype, params, R, p = approximate_mesh(_sphere_cloud([0, 0, 0], 0.1))
        assert gtype == GeomType.SPHERE

    def test_bounding_property(self):
        """Every vertex must lie inside (or on) the fitted primitive."""
        verts = _cylinder_cloud(0.05, 0.1)
        gtype, params, R, p = approximate_mesh(verts, kind="capsule")
        r, hl = params
        local = (verts - p) @ R  # into capsule frame (z = axis)
        z = np.clip(local[:, 2], -hl, hl)
        d = np.linalg.norm(local - np.stack(
            [np.zeros_like(z), np.zeros_like(z), z], axis=1), axis=1)
        assert (d <= r + 1e-9).all()


class TestLoading:
    def test_obj(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text("# comment\nv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        v = load_mesh_vertices(p)
        assert v.shape == (3, 3)
        np.testing.assert_allclose(v[1], [1, 0, 0])

    def test_binary_stl(self, tmp_path):
        tri = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        data = b"\0" * 80 + struct.pack("<I", 1)
        data += struct.pack("<3f", 0, 0, 1)
        for vtx in tri:
            data += struct.pack("<3f", *vtx)
        data += struct.pack("<H", 0)
        p = tmp_path / "tri.stl"
        p.write_bytes(data)
        v = load_mesh_vertices(p)
        assert v.shape == (3, 3)
        np.testing.assert_allclose(v[2], [0, 1, 0])

    def test_ascii_stl(self, tmp_path):
        p = tmp_path / "tri.stl"
        p.write_text(
            "solid t\n facet normal 0 0 1\n  outer loop\n"
            "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
            "  endloop\n endfacet\nendsolid t\n"
        )
        v = load_mesh_vertices(p)
        assert v.shape == (3, 3)


class TestUrdfMeshCollision:
    def test_mesh_collision_approximated(self, tmp_path):
        """A URDF referencing a mesh collision loads with the mesh replaced
        by a fitted primitive (reference mini_cheetah_mesh.urdf pattern)."""
        (tmp_path / "leg.obj").write_text(
            "\n".join(
                f"v {x} {y} {z}"
                for x, y, z in _cylinder_cloud(0.02, 0.1, n=60)
            )
        )
        urdf = """<robot name="r">
  <link name="leg">
    <inertial><mass value="1"/>
      <inertia ixx="1e-3" iyy="1e-3" izz="1e-3" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0.5"/>
      <geometry><mesh filename="leg.obj"/></geometry>
    </collision>
  </link>
</robot>"""
        p = tmp_path / "r.urdf"
        p.write_text(urdf)
        m = parse_urdf_file(p, floating_base=True).finalize()
        assert len(m.geoms.types) == 1
        # the fitted primitive sits near the collision origin offset
        np.testing.assert_allclose(
            np.asarray(m.geoms.p[0])[2], 0.5, atol=0.05
        )

    def test_missing_mesh_skipped(self, tmp_path):
        urdf = """<robot name="r">
  <link name="l">
    <inertial><mass value="1"/>
      <inertia ixx="1e-3" iyy="1e-3" izz="1e-3" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision><geometry><mesh filename="nope.obj"/></geometry></collision>
  </link>
</robot>"""
        p = tmp_path / "r.urdf"
        p.write_text(urdf)
        m = parse_urdf_file(p).finalize()
        assert len(m.geoms.types) == 0
