"""Example registry: builds the model + config for each reference example.

The analog of each reference example's ``CreatePlantModel`` override
(e.g. examples/spinner/spinner.cc:34-40, examples/hopper/hopper.cc:36-50)
plus the ground-geometry registration the C++ examples do in code.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from idto_tpu.models.model import GeomType, JointType, Model, ModelBuilder
from idto_tpu.models.urdf import parse_urdf_file
from idto_tpu.utils.find_resource import find_resource


def _add_ground_box(
    builder: ModelBuilder, *, z_top: float = 0.0, size: float = 25.0,
    depth: float = 10.0
) -> None:
    """Large ground box welded to the world (the pattern of
    examples/hopper/hopper.cc:43-49, mini_cheetah.cc:49-55)."""
    builder.add_geometry(
        "world",
        GeomType.BOX,
        [size / 2, size / 2, depth / 2],
        p=(0.0, 0.0, z_top - depth / 2),
        name="ground",
    )


def _pendulum() -> ModelBuilder:
    return parse_urdf_file(find_resource("idto_tpu/assets/pendulum.urdf"))


def _acrobot() -> ModelBuilder:
    return parse_urdf_file(find_resource("idto_tpu/assets/acrobot.urdf"))


def _spinner() -> ModelBuilder:
    return parse_urdf_file(
        find_resource("idto_tpu/assets/spinner_friction.urdf")
    )


def _hopper() -> ModelBuilder:
    b = parse_urdf_file(find_resource("idto_tpu/assets/hopper.urdf"))
    _add_ground_box(b, z_top=0.0)
    return b


def _mini_cheetah(hills: int = 0, hill_height: float = 0.05,
                  hill_spacing: float = 1.0) -> ModelBuilder:
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/mini_cheetah.urdf")
    )
    _add_ground_box(b, z_top=0.0)
    # Optional cylindrical "hills" (mini_cheetah.cc:57-68).
    from idto_tpu.models.rotations import rpy_to_rot_np

    for i in range(hills):
        px = 2.0 + hill_spacing * i
        R = rpy_to_rot_np([np.pi / 2, 0.0, 0.0])
        b.add_geometry(
            "world", GeomType.CYLINDER, [1.0, 12.5],
            R=R, p=(px, 0.0, -1.0 + hill_height), name=f"hill_{i}",
        )
    return b


def _airhockey() -> ModelBuilder:
    """Programmatic pusher + puck model (examples/airhockey/airhockey.cc:
    44-100): prismatic x/y + revolute pusher over dummy massless links, a
    planar-joint puck; both with sphere collision of radius 0.1."""
    b = ModelBuilder()
    mass, radius, height = 0.1, 0.1, 0.05
    # Solid cylinder inertia about z.
    izz = 0.5 * mass * radius**2
    ixx = mass * (3 * radius**2 + height**2) / 12.0
    inertia = np.diag([ixx, ixx, izz])
    b.add_link("dummy1", "world", JointType.PRISMATIC,
               joint_name="pusher_x", axis=(1, 0, 0))
    b.add_link("dummy2", "dummy1", JointType.PRISMATIC,
               joint_name="pusher_y", axis=(0, 1, 0))
    b.add_link("pusher", "dummy2", JointType.REVOLUTE,
               joint_name="pusher_theta", axis=(0, 0, 1),
               mass=mass, inertia=inertia)
    b.add_actuator("pusher_x")
    b.add_actuator("pusher_y")
    b.add_actuator("pusher_theta")
    b.add_geometry("pusher", GeomType.SPHERE, [radius],
                   name="pusher_collision")
    b.add_link("puck", "world", JointType.PLANAR, joint_name="puck_joint",
               damping=(0.1, 0.1, 0.1), mass=mass, inertia=inertia)
    b.add_geometry("puck", GeomType.SPHERE, [radius], name="puck_collision")
    return b


def _solid_sphere_inertia(mass: float, radius: float) -> np.ndarray:
    return np.eye(3) * (0.4 * mass * radius**2)


def _solid_box_inertia(mass: float, half) -> np.ndarray:
    hx, hy, hz = half
    return np.diag([
        mass / 3.0 * (hy**2 + hz**2),
        mass / 3.0 * (hx**2 + hz**2),
        mass / 3.0 * (hx**2 + hy**2),
    ])


def _add_free_sphere(b: ModelBuilder, name: str, radius: float, mass: float):
    """Free-floating ball manipuland (the pattern of jaco_ball.cc:56-67,
    allegro_hand.cc:95-108, punyo.cc:54-66)."""
    b.add_link(
        name, "world", JointType.FLOATING, joint_name=f"{name}_joint",
        mass=mass, inertia=_solid_sphere_inertia(mass, radius),
    )
    b.add_geometry(name, GeomType.SPHERE, [radius], name=f"{name}_collision")


def _add_free_box(b: ModelBuilder, name: str, half, mass: float):
    """Free-floating box manipuland (box_intel_nuc.sdf / box_15cm.sdf)."""
    b.add_link(
        name, "world", JointType.FLOATING, joint_name=f"{name}_joint",
        mass=mass, inertia=_solid_box_inertia(mass, half),
    )
    b.add_geometry(name, GeomType.BOX, list(half), name=f"{name}_collision")


def _kuka() -> ModelBuilder:
    """Kuka iiwa pushes a box across the ground (examples/kuka/kuka.cc:
    49-76: sphere-collision iiwa, gravity disabled on the arm,
    box_intel_nuc manipuland, 25x25x10 ground box)."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/kuka_iiwa.urdf"),
        gravity_enabled=False,
    )
    _add_free_box(b, "box", (0.138, 0.099, 0.088), 1.45)
    _add_ground_box(b, z_top=0.0)
    return b


def _jaco_mount():
    from idto_tpu.models.rotations import rpy_to_rot_np

    return rpy_to_rot_np([0.0, 0.0, np.pi / 2])


def _jaco() -> ModelBuilder:
    """Jaco arm pushes a 15 cm box (examples/jaco/jaco.cc:54-78): arm welded
    at RollPitchYaw(0,0,pi/2) + (0, 0.27, 0.11), gravity disabled on the
    arm, box_15cm manipuland, ground top at z=0."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/jaco_arm.urdf"),
        gravity_enabled=False,
        R_base=_jaco_mount(),
        p_base=(0.0, 0.27, 0.11),
    )
    _add_free_box(b, "box", (0.075, 0.075, 0.075), 0.55)
    _add_ground_box(b, z_top=0.0)
    return b


def _dual_jaco() -> ModelBuilder:
    """Two jaco arms lift one box together (examples/dual_jaco/dual_jaco.cc:
    38-66: same arm model instanced twice at y = +/-0.27)."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/jaco_arm.urdf"),
        gravity_enabled=False,
        prefix="left_",
        R_base=_jaco_mount(),
        p_base=(0.0, 0.27, 0.11),
    )
    parse_urdf_file(
        find_resource("idto_tpu/assets/jaco_arm.urdf"),
        builder=b,
        gravity_enabled=False,
        prefix="right_",
        R_base=_jaco_mount(),
        p_base=(0.0, -0.27, 0.11),
    )
    _add_free_box(b, "box", (0.075, 0.075, 0.075), 0.55)
    _add_ground_box(b, z_top=0.0)
    return b


def _jaco_ball() -> ModelBuilder:
    """Jaco arm rolls a ball on the table (examples/jaco_ball/jaco_ball.cc:
    43-95: r=0.06, m=0.3 ball, same arm mounting as jaco)."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/jaco_arm.urdf"),
        gravity_enabled=False,
        R_base=_jaco_mount(),
        p_base=(0.0, 0.27, 0.11),
    )
    _add_free_sphere(b, "ball", 0.06, 0.3)
    _add_ground_box(b, z_top=0.0)
    return b


def _allegro_hand(upside_down: bool = False) -> ModelBuilder:
    """Allegro hand rotates a ball in-hand (examples/allegro_hand/
    allegro_hand.cc:80-111: palm-up hand, r=0.06 m=0.05 ball, no ground;
    --upside_down flips gravity)."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/allegro_hand.urdf"),
        gravity_enabled=True,
    )
    if upside_down:
        b.set_gravity((0.0, 0.0, 9.81))
    _add_free_sphere(b, "ball", 0.06, 0.05)
    return b


def _punyo() -> ModelBuilder:
    """Punyo humanoid hugs and lifts a large ball (examples/punyo/punyo.cc:
    44-77: gravity disabled on the robot, r=0.2 m=1.0 ball, ground box)."""
    b = parse_urdf_file(
        find_resource("idto_tpu/assets/punyoid.urdf"),
        gravity_enabled=False,
    )
    _add_free_sphere(b, "ball", 0.2, 1.0)
    _add_ground_box(b, z_top=0.0)
    return b


@dataclasses.dataclass(frozen=True)
class ExampleDef:
    name: str
    build: Callable[[], ModelBuilder]
    config: str
    # Separate simulation plant (the reference's
    # CreatePlantModelForSimulation override, example_base.h:171): the
    # closed-loop simulator can run a DIFFERENT model than the optimizer
    # plans with.  None -> same model (the reference default).
    build_sim: Optional[Callable[[], ModelBuilder]] = None
    # Simulation-side contact overrides (ContactParams field dict).  The
    # reference's hydroelastic sim plants are much stiffer/less smoothed
    # than the optimizer's smoothed-compliant law; this is that analog.
    sim_contact: Optional[dict] = None


# The five examples whose reference sim plant is hydroelastic (near-rigid)
# rather than the optimizer's smoothed compliant law (jaco.cc:68-97,
# dual_jaco.cc, jaco_ball.cc, allegro_hand.cc, punyo.cc
# CreatePlantModelForSimulation overrides): same kinematics, much stiffer
# and less smoothed contact on the simulation side.
_HYDRO_SIM_CONTACT = {"stiffness_scale": 10.0, "smoothing_scale": 0.1}

_REGISTRY = {
    "pendulum": ExampleDef("pendulum", _pendulum, "pendulum.yaml"),
    "acrobot": ExampleDef("acrobot", _acrobot, "acrobot.yaml"),
    "spinner": ExampleDef("spinner", _spinner, "spinner.yaml"),
    "hopper": ExampleDef("hopper", _hopper, "hopper.yaml"),
    "mini_cheetah": ExampleDef(
        "mini_cheetah", _mini_cheetah, "mini_cheetah.yaml"
    ),
    "airhockey": ExampleDef("airhockey", _airhockey, "airhockey.yaml"),
    "kuka": ExampleDef("kuka", _kuka, "kuka.yaml"),
    "jaco": ExampleDef("jaco", _jaco, "jaco.yaml",
                       sim_contact=_HYDRO_SIM_CONTACT),
    "dual_jaco": ExampleDef("dual_jaco", _dual_jaco, "dual_jaco.yaml",
                            sim_contact=_HYDRO_SIM_CONTACT),
    "jaco_ball": ExampleDef("jaco_ball", _jaco_ball, "jaco_ball.yaml",
                            sim_contact=_HYDRO_SIM_CONTACT),
    "allegro_hand": ExampleDef(
        "allegro_hand", _allegro_hand, "allegro_hand.yaml",
        sim_contact=_HYDRO_SIM_CONTACT,
    ),
    "punyo": ExampleDef("punyo", _punyo, "punyo.yaml",
                        sim_contact=_HYDRO_SIM_CONTACT),
}


def example_names():
    return sorted(_REGISTRY)


def get_example(name: str) -> ExampleDef:
    return _REGISTRY[name]


def load_example(name: str, test_mode: bool = False):
    """Build (model, config, problem, params, q_guess) for an example."""
    from idto_tpu.examples.config import (
        ExampleConfig,
        build_initial_guess,
        build_problem,
        build_solver_params,
    )

    ex = get_example(name)
    cfg = ExampleConfig.load(
        find_resource(f"idto_tpu/examples/configs/{ex.config}")
    )
    if test_mode:
        cfg = cfg.apply_test_mode()
    model = ex.build().finalize()
    prob = build_problem(cfg, model)
    params = build_solver_params(cfg)
    q_guess = build_initial_guess(cfg, prob)
    return model, cfg, prob, params, q_guess


def load_sim_plant(name: str, params):
    """(sim_model, sim_contact) for closed-loop simulation, where the
    example defines a simulation plant different from the optimizer's
    (reference CreatePlantModelForSimulation, example_base.h:171).
    Returns (None, None) when the example simulates the optimizer model
    with optimizer contact (the reference default)."""
    import dataclasses as _dc

    ex = get_example(name)
    sim_model = ex.build_sim().finalize() if ex.build_sim else None
    sim_contact = None
    if ex.sim_contact:
        sc = dict(ex.sim_contact)
        contact = params.contact
        contact = _dc.replace(
            contact,
            stiffness=contact.stiffness * sc.pop("stiffness_scale", 1.0),
            smoothing_factor=(
                contact.smoothing_factor * sc.pop("smoothing_scale", 1.0)
            ),
            **sc,
        )
        sim_contact = contact
    return sim_model, sim_contact
