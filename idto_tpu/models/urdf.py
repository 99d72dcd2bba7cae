"""URDF parser -> :class:`Model`.

Behavioral replacement for Drake's ``Parser(plant).AddModels(urdf)`` as used
by every reference example (e.g. examples/spinner/spinner.cc:36-39).  Only
the URDF subset exercised by the reference model suite is supported:

  * joints: fixed, revolute, continuous, prismatic, planar, floating
    (plus an implicit floating joint for root links not attached to world,
    matching Drake's free-body convention),
  * planar-joint axis realignment follows Drake's MakeFromOneUnitVector
    deterministic basis (see rotations.make_frame_from_z) so that YAML
    configs written for the reference (e.g. hopper: q = [height, x, theta])
    keep their meaning,
  * inertial origin/rpy, mass, full inertia tensor (re-expressed from the
    inertial frame into the link frame),
  * collision geometries: sphere, box, capsule, cylinder,
  * transmissions -> actuators,
  * drake:collision_filter_group exclusion groups.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from idto_tpu.models.model import GeomType, JointType, Model, ModelBuilder

_JOINT_TYPES = {
    "fixed": JointType.FIXED,
    "revolute": JointType.REVOLUTE,
    "continuous": JointType.REVOLUTE,
    "prismatic": JointType.PRISMATIC,
    "planar": JointType.PLANAR,
    "floating": JointType.FLOATING,
}


def _floats(s: str) -> np.ndarray:
    return np.array([float(x) for x in s.replace(",", " ").split()])


def _origin(elem: Optional[ET.Element]) -> tuple[np.ndarray, np.ndarray]:
    """Returns (R, p) from an <origin xyz rpy> element (identity if None)."""
    from idto_tpu.models.rotations import rpy_to_rot_np

    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = _floats(elem.get("xyz", "0 0 0"))
    rpy = _floats(elem.get("rpy", "0 0 0"))
    return rpy_to_rot_np(rpy), xyz


def _parse_inertial(link: ET.Element):
    inertial = link.find("inertial")
    if inertial is None:
        return 0.0, np.zeros(3), np.zeros((3, 3))
    R, com = _origin(inertial.find("origin"))
    mass_el = inertial.find("mass")
    mass = float(mass_el.get("value")) if mass_el is not None else 0.0
    in_el = inertial.find("inertia")
    if in_el is None:
        I = np.zeros((3, 3))
    else:
        ixx = float(in_el.get("ixx", 0))
        iyy = float(in_el.get("iyy", 0))
        izz = float(in_el.get("izz", 0))
        ixy = float(in_el.get("ixy", 0))
        ixz = float(in_el.get("ixz", 0))
        iyz = float(in_el.get("iyz", 0))
        I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    # Re-express inertia (given in the inertial frame) in the link frame.
    I_link = R @ I @ R.T
    return mass, com, I_link


def _parse_geometry(geom_el: ET.Element, mesh_dir: Optional[str] = None):
    """Returns (GeomType, params, R_extra, p_extra) or None if unsupported.

    R_extra/p_extra compose inside the collision origin: identity for
    primitives; for meshes they carry the pose of the fitted bounding
    primitive (see models/mesh.py -- the automated analog of the
    reference's hand-simplified collision models)."""
    import numpy as _np

    eye, zero = _np.eye(3), _np.zeros(3)
    for child in geom_el:
        tag = child.tag.rsplit("}", 1)[-1]  # strip any xml namespace
        if tag == "sphere":
            return GeomType.SPHERE, [float(child.get("radius"))], eye, zero
        if tag == "box":
            size = _floats(child.get("size"))
            return GeomType.BOX, list(size / 2.0), eye, zero
        if tag == "capsule":
            return GeomType.CAPSULE, [
                float(child.get("radius")),
                float(child.get("length")) / 2.0,
            ], eye, zero
        if tag == "cylinder":
            return GeomType.CYLINDER, [
                float(child.get("radius")),
                float(child.get("length")) / 2.0,
            ], eye, zero
        if tag == "mesh":
            if mesh_dir is None:
                return None  # no way to resolve the mesh file
            from idto_tpu.models.mesh import mesh_to_collision

            fname = child.get("filename")
            if not fname:
                return None  # malformed <mesh> with no filename
            scale_attr = child.get("scale")
            scale = _floats(scale_attr) if scale_attr else None
            import os

            path = fname if os.path.isabs(fname) else os.path.join(
                mesh_dir, fname
            )
            if not os.path.exists(path):
                return None
            return mesh_to_collision(path, scale=scale)
    return None


def parse_urdf_string(
    text: str,
    builder: Optional[ModelBuilder] = None,
    *,
    floating_base: Optional[bool] = None,
    prefix: str = "",
    R_base=None,
    p_base=None,
    gravity_enabled: bool = True,
    mesh_dir: Optional[str] = None,
) -> ModelBuilder:
    """Parse URDF into a ModelBuilder (call ``.finalize()`` for the Model).

    ``mesh_dir`` resolves relative ``<mesh filename=...>`` references; mesh
    collisions are approximated by fitted bounding primitives
    (models/mesh.py).  When None (e.g. parsing from a string with no file
    context), mesh collisions are skipped.

    ``floating_base``: if None, root links without a joint to world get a
    floating joint (Drake free-body behavior); True forces it; False welds
    roots to the world.

    ``prefix`` renames every link/joint/geometry (``prefix + name``) so the
    same file can be instanced twice into one builder -- the analog of
    Drake's per-model-instance namespacing used by dual_jaco
    (examples/dual_jaco/dual_jaco.cc:42-56).

    ``R_base``/``p_base`` pose the model root in the world, the analog of
    ``WeldFrames(world, base, X)``; they compose into the root joints of
    links whose parent is the world.

    ``gravity_enabled=False`` disables gravity on every link added by this
    call (Drake's ``set_gravity_enabled(instance, false)``).
    """
    # URDFs in the wild use the drake: namespace prefix without declaring
    # it (e.g. the reference's mini_cheetah_mesh.urdf); declare it so the
    # XML parser accepts the file.
    if "drake:" in text and "xmlns:drake" not in text:
        text = text.replace(
            "<robot", '<robot xmlns:drake="http://drake.mit.edu"', 1
        )
    root = ET.fromstring(text)
    builder = builder or ModelBuilder()
    R_base = np.eye(3) if R_base is None else np.asarray(R_base, float)
    p_base = np.zeros(3) if p_base is None else np.asarray(p_base, float)

    def pfx(name: str) -> str:
        return name if name == "world" else prefix + name

    links = {l.get("name"): l for l in root.findall("link")}
    joints = list(root.findall("joint"))

    # child link name -> joint element
    joint_of_child = {}
    for j in joints:
        child = j.find("child").get("link")
        joint_of_child[child] = j

    # Topologically order links: repeatedly add links whose parent is done.
    done: set[str] = {"world"}
    order: list[str] = []
    remaining = [name for name in links if name != "world"]
    while remaining:
        progress = False
        for name in list(remaining):
            j = joint_of_child.get(name)
            parent = j.find("parent").get("link") if j is not None else "world"
            if parent in done:
                order.append(name)
                done.add(name)
                remaining.remove(name)
                progress = True
        if not progress:
            raise ValueError(f"URDF kinematic loop or dangling links: {remaining}")

    for name in order:
        link_el = links[name]
        mass, com, I = _parse_inertial(link_el)
        j = joint_of_child.get(name)
        if j is None:
            # Root link: floating (free body) unless told otherwise.
            jt = (
                JointType.FLOATING
                if (floating_base is None or floating_base)
                else JointType.FIXED
            )
            builder.add_link(
                pfx(name),
                "world",
                jt,
                joint_name=pfx(f"{name}_base"),
                R_pj=R_base,
                p_pj=p_base,
                mass=mass,
                com=com,
                inertia=I,
                gravity_enabled=gravity_enabled,
            )
        else:
            jt = _JOINT_TYPES[j.get("type")]
            R_pj, p_pj = _origin(j.find("origin"))
            if j.find("parent").get("link") == "world":
                R_pj = R_base @ R_pj
                p_pj = p_base + R_base @ p_pj
            axis_el = j.find("axis")
            axis = (
                _floats(axis_el.get("xyz"))
                if axis_el is not None
                else np.array([0.0, 0.0, 1.0])
            )
            dyn = j.find("dynamics")
            damping = float(dyn.get("damping", 0.0)) if dyn is not None else 0.0
            if jt == JointType.PLANAR:
                # Realign the joint frame so that z == axis (Drake behavior;
                # see module docstring).
                from idto_tpu.models.rotations import make_frame_from_z

                R_align = make_frame_from_z(axis / np.linalg.norm(axis))
                R_pj = R_pj @ R_align
                axis = np.array([0.0, 0.0, 1.0])
            builder.add_link(
                pfx(name),
                pfx(j.find("parent").get("link")),
                jt,
                joint_name=pfx(j.get("name")),
                R_pj=R_pj,
                p_pj=p_pj,
                axis=axis,
                damping=damping,
                mass=mass,
                com=com,
                inertia=I,
                gravity_enabled=gravity_enabled,
            )

        # Collision geometry.
        for ci, col in enumerate(link_el.findall("collision")):
            parsed = _parse_geometry(col.find("geometry"), mesh_dir)
            if parsed is None:
                continue
            gtype, params, R_g, p_g = parsed
            R, p = _origin(col.find("origin"))
            builder.add_geometry(
                pfx(name),
                gtype,
                params,
                R=R @ R_g,
                p=p + R @ p_g,
                name=pfx(col.get("name", f"{name}_collision_{ci}")),
            )

    # Actuators from <transmission> blocks.
    for trans in root.findall("transmission"):
        jel = trans.find("joint")
        if jel is not None:
            jname = jel.get("name")
        else:
            act = trans.find("actuator")
            jname = act.get("name") if act is not None else None
        if jname is not None:
            builder.add_actuator(pfx(jname))

    # drake:collision_filter_group support (used by mini_cheetah feet).
    ns = "{drake.mit.edu}"
    groups: dict[str, list[str]] = {}
    ignores: list[tuple[str, str]] = []
    for g in root.iter():
        if g.tag.endswith("collision_filter_group"):
            gname = g.get("name")
            members = []
            for m in g:
                if m.tag.endswith("member"):
                    members.append(m.get("link"))
                if m.tag.endswith("ignored_collision_filter_group"):
                    ignores.append((gname, m.get("name")))
            groups[gname] = members
    groups = {g: [pfx(m) for m in ms] for g, ms in groups.items()}
    for ga, gb in ignores:
        for la in groups.get(ga, []):
            for lb in groups.get(gb, []):
                if la == lb:
                    continue
                # Exclude every geom pair between the two links.
                for na in _geom_names_of_link(builder, la):
                    for nb in _geom_names_of_link(builder, lb):
                        builder.exclude_collision(na, nb)
    _ = ns
    return builder


def _geom_names_of_link(builder: ModelBuilder, link: str) -> list[str]:
    try:
        idx = builder.link_index(link)
    except ValueError:
        return []
    return [
        n
        for n, b in zip(builder._geom_names, builder._geom_bodies)
        if b == idx
    ]


def parse_urdf_file(path, **kwargs) -> ModelBuilder:
    import os

    kwargs.setdefault("mesh_dir", os.path.dirname(os.path.abspath(str(path))))
    with open(path) as f:
        return parse_urdf_string(f.read(), **kwargs)
