"""SDF parser correctness (reference: Drake's Parser loads SDF for
allegro_hand.sdf, punyoid.sdf, box_15cm.sdf, j2s7s300_arm_*.sdf).

Oracles: URDF<->SDF cross-parity (the two parsers share no code beyond the
ModelBuilder), plus hand-computable frame-decoupling cases -- SDF joints
carry their own frame, unlike URDF where joint frame == child-link frame.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.models.dynamics import inverse_dynamics
from idto_tpu.models.kinematics import forward_kinematics
from idto_tpu.models.sdf import parse_model_file, parse_sdf_string
from idto_tpu.models.urdf import parse_urdf_string

PENDULUM_SDF = """<?xml version="1.0"?>
<sdf version="1.7">
  <model name="pendulum">
    <link name="arm">
      <pose>0 0 1.0 0 0 0</pose>
      <inertial>
        <pose>0 0 -0.5 0 0 0</pose>
        <mass>1.25</mass>
        <inertia><ixx>0.01</ixx><iyy>0.01</iyy><izz>0.001</izz>
                 <ixy>0</ixy><ixz>0</ixz><iyz>0</iyz></inertia>
      </inertial>
      <collision name="tip">
        <pose>0 0 -0.5 0 0 0</pose>
        <geometry><sphere><radius>0.05</radius></sphere></geometry>
      </collision>
    </link>
    <joint name="theta" type="revolute">
      <parent>world</parent>
      <child>arm</child>
      <axis>
        <xyz>0 1 0</xyz>
        <dynamics><damping>0.1</damping></dynamics>
        <limit><effort>10</effort></limit>
      </axis>
    </joint>
  </model>
</sdf>
"""

PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="pendulum">
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -0.5"/>
      <mass value="1.25"/>
      <inertia ixx="0.01" iyy="0.01" izz="0.001" ixy="0" ixz="0" iyz="0"/>
    </inertial>
    <collision name="tip">
      <origin xyz="0 0 -0.5"/>
      <geometry><sphere radius="0.05"/></geometry>
    </collision>
  </link>
  <joint name="theta" type="revolute">
    <origin xyz="0 0 1.0"/>
    <parent link="world"/>
    <child link="arm"/>
    <axis xyz="0 1 0"/>
    <dynamics damping="0.1"/>
  </joint>
  <transmission><joint name="theta"/></transmission>
</robot>
"""


class TestSdfUrdfParity:
    def test_pendulum_matches_urdf(self):
        """The same pendulum authored in both formats must produce
        identical models (topology, inertials, geometry, actuation)."""
        ms = parse_sdf_string(PENDULUM_SDF).finalize()
        mu = parse_urdf_string(PENDULUM_URDF).finalize()
        assert ms.nq == mu.nq == 1
        assert ms.nv == mu.nv == 1
        np.testing.assert_allclose(np.asarray(ms.B), np.asarray(mu.B))
        q = jnp.array([0.7])
        Rs, ps = forward_kinematics(ms, q)
        Ru, pu = forward_kinematics(mu, q)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pu), atol=1e-14)
        np.testing.assert_allclose(np.asarray(Rs), np.asarray(Ru), atol=1e-14)
        v = jnp.array([0.3])
        a = jnp.array([-1.2])
        np.testing.assert_allclose(
            np.asarray(inverse_dynamics(ms, q, v, a)),
            np.asarray(inverse_dynamics(mu, q, v, a)),
            atol=1e-13,
        )

    def test_geometry_pose(self):
        ms = parse_sdf_string(PENDULUM_SDF).finalize()
        np.testing.assert_allclose(
            np.asarray(ms.geoms.p[0]), [0, 0, -0.5], atol=1e-15
        )


class TestJointFrameDecoupling:
    """SDF joints have their own frame; the parser re-expresses the child
    link's data into the joint frame (canonical-frame reduction)."""

    SDF = """<?xml version="1.0"?>
<sdf version="1.7">
  <model name="two">
    <link name="base">
      <inertial><mass>1.0</mass></inertial>
    </link>
    <link name="tip">
      <pose relative_to="base">0.3 0 0 0 0 0</pose>
      <inertial>
        <pose>0.1 0 0 0 0 0</pose>
        <mass>0.5</mass>
        <inertia><ixx>1e-3</ixx><iyy>1e-3</iyy><izz>1e-3</izz>
                 <ixy>0</ixy><ixz>0</ixz><iyz>0</iyz></inertia>
      </inertial>
      <collision name="ball">
        <pose>0.2 0 0 0 0 0</pose>
        <geometry><sphere><radius>0.02</radius></sphere></geometry>
      </collision>
    </link>
    <joint name="base_w" type="fixed">
      <parent>world</parent>
      <child>base</child>
    </joint>
    <joint name="hinge" type="revolute">
      <parent>base</parent>
      <child>tip</child>
      <pose>-0.1 0 0 0 0 0</pose>
      <axis>
        <xyz expressed_in="__model__">0 0 1</xyz>
        <limit><effort>5</effort></limit>
      </axis>
    </joint>
  </model>
</sdf>
"""

    def test_rotation_center(self):
        """The joint <pose> offsets the hinge -0.1 m from the tip frame, so
        the rotation center sits at x = 0.2 in the world; the tip-link
        origin must orbit that point with radius 0.1."""
        m = parse_sdf_string(self.SDF, floating_base=False).finalize()
        assert m.nq == 1
        for theta in (0.0, 0.5, np.pi / 2):
            R, p = forward_kinematics(m, jnp.array([theta]))
            # The canonical (joint) frame origin is the rotation center.
            tip = np.asarray(p[m.link_names.index("tip")])
            np.testing.assert_allclose(tip, [0.2, 0.0, 0.0], atol=1e-14)
            # The collision sphere was authored at x=0.2 in the tip frame
            # = 0.3 in the joint frame: it orbits at radius 0.3.
            Rt = np.asarray(R[m.link_names.index("tip")])
            center = tip + Rt @ np.asarray(m.geoms.p[0])
            expect = [0.2 + 0.3 * np.cos(theta), 0.3 * np.sin(theta), 0.0]
            np.testing.assert_allclose(center, expect, atol=1e-14)

    def test_model_frame_axis(self):
        """expressed_in=__model__ with a rotated joint frame must re-express
        the axis into the joint frame."""
        sdf = self.SDF.replace(
            "<pose>-0.1 0 0 0 0 0</pose>",
            "<pose>-0.1 0 0 0 0 1.5707963267948966</pose>",
        )
        m = parse_sdf_string(sdf, floating_base=False).finalize()
        # Rotation must still be about the world/model z axis regardless of
        # the joint frame's own yaw.
        R, p = forward_kinematics(m, jnp.array([0.25]))
        tip = np.asarray(p[m.link_names.index("tip")])
        np.testing.assert_allclose(tip, [0.2, 0.0, 0.0], atol=1e-14)
        Rt = np.asarray(R[m.link_names.index("tip")])
        # z column of the world rotation stays +z (pure yaw).
        np.testing.assert_allclose(Rt[:, 2], [0, 0, 1.0], atol=1e-14)


class TestFreeBody:
    SDF = """<?xml version="1.0"?>
<sdf version="1.7">
  <model name="box_ball">
    <link name="box">
      <inertial><mass>0.55</mass>
        <inertia><ixx>0.002</ixx><iyy>0.002</iyy><izz>0.002</izz>
                 <ixy>0</ixy><ixz>0</ixz><iyz>0</iyz></inertia>
      </inertial>
      <collision name="c0">
        <geometry><sphere><radius>0.07</radius></sphere></geometry>
      </collision>
      <collision name="c1">
        <pose>0.045 0.045 0.045 0 0 0</pose>
        <geometry><sphere><radius>0.03</radius></sphere></geometry>
      </collision>
    </link>
  </model>
</sdf>
"""

    def test_floating_root(self):
        m = parse_sdf_string(self.SDF).finalize()
        assert m.nq == 7 and m.nv == 6  # quaternion free joint
        assert len(m.geoms.types) == 2

    def test_welded_root(self):
        m = parse_sdf_string(self.SDF, floating_base=False).finalize()
        assert m.nq == 0


def test_parse_model_file_dispatch(tmp_path):
    p = tmp_path / "pend.sdf"
    p.write_text(PENDULUM_SDF)
    m = parse_model_file(p).finalize()
    assert m.nq == 1
    u = tmp_path / "pend.urdf"
    u.write_text(PENDULUM_URDF)
    m2 = parse_model_file(u).finalize()
    assert m2.nq == 1
