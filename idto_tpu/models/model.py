"""Multibody model representation: a kinematic tree as a JAX pytree.

This is the TPU-native replacement for the reference's dependence on Drake's
``MultibodyPlant`` (the reference outsources all physics to Drake; see
SURVEY.md L0).  A :class:`Model` carries:

  * static topology (joint types, parents, dof offsets) as pytree aux data,
    so jit specializes on the tree structure, and
  * all numeric parameters (inertias, joint frames, axes, actuation matrix,
    collision geometry) as array leaves, so they can be traced -- which is
    what enables vmapped domain randomization over model parameters.

Topology conventions:
  * link ``i`` is the child of joint ``i`` (URDF-style 1:1 mapping),
  * ``joint_parents[i]`` is the parent *link* index, with ``-1`` = world,
  * joints are stored in topological order (parent index < child index).

Generalized coordinates (Drake ordering conventions, which the reference's
YAML configs assume):
  * revolute / prismatic: 1 dof,
  * planar: ``q = [x, y, theta]`` -- translation in the joint frame's x/y
    plane then rotation about its z axis.  When built from a URDF ``axis``
    the joint frame is re-aligned so z == axis using the same deterministic
    basis completion as Drake's ``RotationMatrix::MakeFromOneUnitVector``
    (see ``rotations.make_frame_from_z``),
  * floating (quaternion): ``q = [qw, qx, qy, qz, x, y, z]``,
    ``v = [w_WB_W, v_WB_W]`` (world-frame angular + linear velocity).
"""
from __future__ import annotations

import enum
from typing import Any, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from idto_tpu.utils.structs import pytree_dataclass, static


class JointType(enum.IntEnum):
    FIXED = 0
    REVOLUTE = 1
    PRISMATIC = 2
    PLANAR = 3
    FLOATING = 4


JOINT_NQ = {
    JointType.FIXED: 0,
    JointType.REVOLUTE: 1,
    JointType.PRISMATIC: 1,
    JointType.PLANAR: 3,
    JointType.FLOATING: 7,
}
JOINT_NV = {
    JointType.FIXED: 0,
    JointType.REVOLUTE: 1,
    JointType.PRISMATIC: 1,
    JointType.PLANAR: 3,
    JointType.FLOATING: 6,
}


class GeomType(enum.IntEnum):
    SPHERE = 0
    BOX = 1
    CAPSULE = 2
    CYLINDER = 3
    HALFSPACE = 4  # plane through origin of geom frame, +z outward
    CONVEX = 5  # convex hull of a stored vertex set (mesh collision)


@pytree_dataclass
class CollisionGeoms:
    """Flat collision geometry table.

    ``body`` is the link index each geometry is attached to (-1 = world).
    ``params`` packs up to 3 shape numbers: sphere [r,-,-], box half-extents
    [hx,hy,hz], capsule [r, half_len,-], cylinder [r, half_len,-].
    ``pairs`` is the static list of candidate (i, j) geometry index pairs
    (the analog of Drake's ComputeSignedDistancePairwiseClosestPoints
    enumeration used at trajectory_optimizer.cc:273-279, but enumerated once
    at model build time since jit needs a static pair set).
    """

    # static
    types: tuple = static(default=())
    bodies: tuple = static(default=())
    pairs: tuple = static(default=())
    names: tuple = static(default=())
    # arrays
    R: Any = None  # (ng, 3, 3) geom pose in body frame
    p: Any = None  # (ng, 3)
    params: Any = None  # (ng, 3)
    # Convex-hull vertex sets (mesh-fidelity collision): (ng, VMAX, 3) in
    # each geometry's own frame, padded by repeating the first vertex
    # (repetition does not change the hull); all-zero rows for primitive
    # geoms.  None when the model has no CONVEX geometry.
    verts: Any = None

    @property
    def num_geoms(self) -> int:
        return len(self.types)


@pytree_dataclass
class Model:
    # ---- static topology ----
    joint_types: tuple = static(default=())
    joint_parents: tuple = static(default=())
    q_starts: tuple = static(default=())
    v_starts: tuple = static(default=())
    nq: int = static(default=0)
    nv: int = static(default=0)
    nu: int = static(default=0)
    joint_names: tuple = static(default=())
    link_names: tuple = static(default=())
    actuator_joints: tuple = static(default=())  # joint index per actuator
    # Level schedule: levels[d] = tuple of joint indices at tree depth d.
    # Joints within a level are independent, so FK processes each level as
    # ONE batched gather+compose -- the op count is O(depth), not O(joints).
    levels: tuple = static(default=())
    # Joint indices grouped by type, for batched joint-transform evaluation.
    type_groups: tuple = static(default=())  # ((type, (j, ...)), ...)

    # ---- numeric parameters (pytree leaves) ----
    R_pj: Any = None  # (nj, 3, 3) joint frame rotation in parent link frame
    p_pj: Any = None  # (nj, 3)    joint frame origin in parent link frame
    axis: Any = None  # (nj, 3)    joint axis in (aligned) joint frame
    damping: Any = None  # (nv,)   viscous joint damping per v-dof
    mass: Any = None  # (nl,)
    com: Any = None  # (nl, 3)     center of mass in link frame
    inertia: Any = None  # (nl, 3, 3) rotational inertia about com, link frame
    B: Any = None  # (nv, nu)      actuation matrix (Drake MakeActuationMatrix)
    gravity: Any = None  # (3,)
    grav_scale: Any = None  # (nl,) 1.0, or 0.0 for gravity-disabled links
    geoms: CollisionGeoms = None

    @property
    def num_joints(self) -> int:
        return len(self.joint_types)

    @property
    def num_links(self) -> int:
        return len(self.joint_types)

    def joint_nq(self, j: int) -> int:
        return JOINT_NQ[JointType(self.joint_types[j])]

    def joint_nv(self, j: int) -> int:
        return JOINT_NV[JointType(self.joint_types[j])]

    @property
    def unactuated_vdofs(self) -> tuple:
        """v-dof indices with no actuator (reference: unactuated_dofs_,
        trajectory_optimizer.cc:63-72); drives the equality constraints.
        Derived from static metadata only (B may be a traced array)."""
        actuated = {
            self.v_starts[j] for j in self.actuator_joints
        }
        return tuple(i for i in range(self.nv) if i not in actuated)


class ModelBuilder:
    """Programmatic model construction (analog of the reference examples that
    build plants in code, e.g. examples/airhockey/airhockey.cc:44-100)."""

    def __init__(self, gravity: Sequence[float] = (0.0, 0.0, -9.81)):
        self._gravity = np.asarray(gravity, dtype=np.float64)
        self._joint_types: list[JointType] = []
        self._joint_parents: list[int] = []
        self._joint_names: list[str] = []
        self._link_names: list[str] = []
        self._R_pj: list[np.ndarray] = []
        self._p_pj: list[np.ndarray] = []
        self._axis: list[np.ndarray] = []
        self._damping: list[np.ndarray] = []  # per joint, length nv_j
        self._mass: list[float] = []
        self._com: list[np.ndarray] = []
        self._inertia: list[np.ndarray] = []
        self._actuators: list[int] = []
        self._grav_on: list[bool] = []
        # geometry
        self._geom_types: list[GeomType] = []
        self._geom_bodies: list[int] = []
        self._geom_R: list[np.ndarray] = []
        self._geom_p: list[np.ndarray] = []
        self._geom_params: list[np.ndarray] = []
        self._geom_verts: list[Optional[np.ndarray]] = []
        self._geom_names: list[str] = []
        self._pair_filter: list[tuple] = []

    # ------------------------------------------------------------------
    def link_index(self, name: str) -> int:
        if name in ("world", "WorldBody"):
            return -1
        return self._link_names.index(name)

    def add_link(
        self,
        name: str,
        parent: str,
        joint_type: JointType,
        *,
        joint_name: Optional[str] = None,
        R_pj: Optional[np.ndarray] = None,
        p_pj: Optional[np.ndarray] = None,
        axis: Sequence[float] = (0.0, 0.0, 1.0),
        damping: float | Sequence[float] = 0.0,
        mass: float = 0.0,
        com: Sequence[float] = (0.0, 0.0, 0.0),
        inertia: Optional[np.ndarray] = None,
        gravity_enabled: bool = True,
    ) -> int:
        """Add a link connected to ``parent`` by a new joint; returns index."""
        parent_idx = self.link_index(parent)
        idx = len(self._link_names)
        if parent_idx >= idx:
            raise ValueError("links must be added in topological order")
        jt = JointType(joint_type)
        self._joint_types.append(jt)
        self._joint_parents.append(parent_idx)
        self._joint_names.append(joint_name or f"{name}_joint")
        self._link_names.append(name)
        self._R_pj.append(
            np.eye(3) if R_pj is None else np.asarray(R_pj, dtype=np.float64)
        )
        self._p_pj.append(
            np.zeros(3) if p_pj is None else np.asarray(p_pj, dtype=np.float64)
        )
        ax = np.asarray(axis, dtype=np.float64)
        n = np.linalg.norm(ax)
        self._axis.append(ax / n if n > 0 else ax)
        nv_j = JOINT_NV[jt]
        d = np.asarray(damping, dtype=np.float64)
        if d.ndim == 0:
            d = np.full(nv_j, float(d))
        if d.shape != (nv_j,):
            raise ValueError(f"damping must have {nv_j} entries")
        self._damping.append(d)
        self._mass.append(float(mass))
        self._com.append(np.asarray(com, dtype=np.float64))
        self._inertia.append(
            np.zeros((3, 3))
            if inertia is None
            else np.asarray(inertia, dtype=np.float64)
        )
        self._grav_on.append(bool(gravity_enabled))
        return idx

    def set_gravity(self, gravity) -> None:
        """Analog of Drake's mutable_gravity_field().set_gravity_vector()
        (allegro_hand.cc:92-94 --upside_down)."""
        self._gravity = np.asarray(gravity, dtype=np.float64)

    def set_gravity_enabled(self, link_name: str, enabled: bool) -> None:
        """Analog of Drake's plant->set_gravity_enabled(instance, ...) as
        used by the manipulation examples (kuka.cc:56, jaco.cc:62)."""
        self._grav_on[self.link_index(link_name)] = bool(enabled)

    def add_actuator(self, joint_name: str) -> None:
        j = self._joint_names.index(joint_name)
        self._actuators.append(j)

    def add_geometry(
        self,
        body: str,
        gtype: GeomType,
        params: Sequence[float] = (),
        *,
        R: Optional[np.ndarray] = None,
        p: Sequence[float] = (0.0, 0.0, 0.0),
        name: str = "",
        verts: Optional[np.ndarray] = None,
    ) -> int:
        """``verts`` (m, 3) is required for GeomType.CONVEX (the convex
        hull of the points, in the geometry frame) and ignored otherwise;
        use models.mesh.mesh_to_convex to reduce a mesh file to one."""
        idx = len(self._geom_types)
        gtype = GeomType(gtype)
        if gtype == GeomType.CONVEX:
            if verts is None:
                # The URDF/SDF parsers hand the hull vertices through the
                # params slot (mesh_to_convex's return contract).
                verts, params = params, ()
            verts = np.asarray(verts, dtype=np.float64)
            if verts.ndim != 2 or verts.shape[1] != 3:
                raise ValueError("CONVEX geometry requires verts (m, 3)")
        self._geom_types.append(gtype)
        self._geom_bodies.append(self.link_index(body))
        self._geom_R.append(np.eye(3) if R is None else np.asarray(R))
        self._geom_p.append(np.asarray(p, dtype=np.float64))
        prm = np.zeros(3)
        prm[: len(params)] = params
        self._geom_params.append(prm)
        self._geom_verts.append(verts)
        self._geom_names.append(name or f"geom_{idx}")
        return idx

    def exclude_collision(self, name_a: str, name_b: str) -> None:
        self._pair_filter.append((name_a, name_b))

    # ------------------------------------------------------------------
    def finalize(self, dtype=None) -> Model:
        # Default dtype follows the jax_enable_x64 flag: float64 on CPU test
        # rigs (matching the reference's double precision), float32 on TPU
        # where f64 is emulated and slow.
        if dtype is None:
            dtype = jnp.zeros(0).dtype
        nj = len(self._joint_types)
        q_starts, v_starts = [], []
        nq = nv = 0
        for jt in self._joint_types:
            q_starts.append(nq)
            v_starts.append(nv)
            nq += JOINT_NQ[jt]
            nv += JOINT_NV[jt]
        nu = len(self._actuators)
        Bmat = np.zeros((nv, nu))
        for a, j in enumerate(self._actuators):
            if JOINT_NV[self._joint_types[j]] != 1:
                raise ValueError("only single-dof joints can be actuated")
            Bmat[v_starts[j], a] = 1.0
        damping = np.concatenate(self._damping) if nv else np.zeros(0)

        geoms = self._finalize_geoms(dtype)

        # Level schedule (depth-based): parents always have smaller depth.
        depth = [0] * nj
        for j, p in enumerate(self._joint_parents):
            depth[j] = 0 if p < 0 else depth[p] + 1
        levels = []
        for d in range(max(depth, default=-1) + 1):
            levels.append(tuple(j for j in range(nj) if depth[j] == d))

        # Type groups.
        groups: dict = {}
        for j, jt in enumerate(self._joint_types):
            groups.setdefault(int(jt), []).append(j)
        type_groups = tuple(
            (t, tuple(js)) for t, js in sorted(groups.items())
        )

        return Model(
            levels=tuple(levels),
            type_groups=type_groups,
            joint_types=tuple(int(t) for t in self._joint_types),
            joint_parents=tuple(self._joint_parents),
            q_starts=tuple(q_starts),
            v_starts=tuple(v_starts),
            nq=nq,
            nv=nv,
            nu=nu,
            joint_names=tuple(self._joint_names),
            link_names=tuple(self._link_names),
            actuator_joints=tuple(self._actuators),
            R_pj=jnp.asarray(np.stack(self._R_pj), dtype=dtype),
            p_pj=jnp.asarray(np.stack(self._p_pj), dtype=dtype),
            axis=jnp.asarray(np.stack(self._axis), dtype=dtype),
            damping=jnp.asarray(damping, dtype=dtype),
            mass=jnp.asarray(np.asarray(self._mass), dtype=dtype),
            com=jnp.asarray(np.stack(self._com), dtype=dtype),
            inertia=jnp.asarray(np.stack(self._inertia), dtype=dtype),
            B=jnp.asarray(Bmat, dtype=dtype),
            gravity=jnp.asarray(self._gravity, dtype=dtype),
            grav_scale=jnp.asarray(
                np.asarray(self._grav_on, dtype=np.float64), dtype=dtype
            ),
            geoms=geoms,
        )

    def _finalize_geoms(self, dtype) -> CollisionGeoms:
        ng = len(self._geom_types)
        if ng == 0:
            return CollisionGeoms(
                R=jnp.zeros((0, 3, 3), dtype=dtype),
                p=jnp.zeros((0, 3), dtype=dtype),
                params=jnp.zeros((0, 3), dtype=dtype),
            )
        filtered = set()
        for a, b in self._pair_filter:
            ia = self._geom_names.index(a)
            ib = self._geom_names.index(b)
            filtered.add((min(ia, ib), max(ia, ib)))
        pairs = []
        for i in range(ng):
            for j in range(i + 1, ng):
                if self._geom_bodies[i] == self._geom_bodies[j]:
                    continue  # same body never collides with itself
                if (i, j) in filtered:
                    continue
                pairs.append((i, j))
        verts = None
        if any(v is not None for v in self._geom_verts):
            vmax = max(
                v.shape[0] for v in self._geom_verts if v is not None
            )
            stacked = np.zeros((ng, vmax, 3))
            for i, v in enumerate(self._geom_verts):
                if v is None:
                    continue
                # Pad by repeating the first vertex: repetition leaves the
                # convex hull (and every support value) unchanged.
                stacked[i, : v.shape[0]] = v
                stacked[i, v.shape[0]:] = v[0]
            verts = jnp.asarray(stacked, dtype=dtype)
        return CollisionGeoms(
            types=tuple(int(t) for t in self._geom_types),
            bodies=tuple(self._geom_bodies),
            pairs=tuple(pairs),
            names=tuple(self._geom_names),
            R=jnp.asarray(np.stack(self._geom_R), dtype=dtype),
            p=jnp.asarray(np.stack(self._geom_p), dtype=dtype),
            params=jnp.asarray(np.stack(self._geom_params), dtype=dtype),
            verts=verts,
        )
