"""Model-variant assets (reference: models/spinner_{sphere,capsule,square,
rectangle}.urdf, 2dof_spinner*.urdf, wall_ball.urdf -- used by
optimizer/test/trajectory_optimizer_test.cc, e.g. ContactGradientMethods at
:183-280 loads spinner_sphere).  Each variant parses, builds, and produces
finite contact-aware dynamics; wall_ball solves a short reach problem."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.contact.force import ContactParams, contact_wrenches
from idto_tpu.models.dynamics import inverse_dynamics
from idto_tpu.models.urdf import parse_urdf_file
from idto_tpu.optimizer.problem import (
    ProblemDefinition,
    SolverParameters,
    linear_interp_nominal,
)
from idto_tpu.optimizer.solver import solve_trust_region
from idto_tpu.utils.find_resource import find_resource

VARIANTS = [
    ("spinner_sphere.urdf", 3, 2),
    ("spinner_capsule.urdf", 3, 2),
    ("spinner_square.urdf", 3, 2),
    ("spinner_rectangle.urdf", 3, 2),
    ("2dof_spinner.urdf", 2, 1),
    ("2dof_spinner_capsule.urdf", 2, 1),
    ("wall_ball.urdf", 1, 1),
]


@pytest.mark.parametrize("fname,nq,nu", VARIANTS)
def test_variant_builds_and_evaluates(fname, nq, nu):
    model = parse_urdf_file(
        find_resource(f"idto_tpu/assets/{fname}")
    ).finalize()
    assert model.nq == nq and model.nu == nu, (model.nq, model.nu)
    assert len(model.geoms.pairs) >= 1  # finger-spinner / ball-wall pairs
    q = jnp.zeros(model.nq) + 0.1
    v = jnp.zeros(model.nv)
    contact = ContactParams()
    w = contact_wrenches(model, q, v, contact)
    tau = inverse_dynamics(model, q, v, jnp.zeros(model.nv), w)
    assert np.isfinite(np.asarray(tau)).all()


@pytest.mark.parametrize(
    "fname", ["spinner_sphere.urdf", "spinner_square.urdf",
              "spinner_capsule.urdf"]
)
def test_variant_contact_gradients_finite(fname):
    """d(tau)/dq through the variant's mixed-shape contact stays finite in
    a near-contact configuration (the reference's ContactGradientMethods
    pattern, trajectory_optimizer_test.cc:183-280)."""
    model = parse_urdf_file(
        find_resource(f"idto_tpu/assets/{fname}")
    ).finalize()
    contact = ContactParams(stiffness=200.0, smoothing_factor=0.05)

    def tau_of_q(q):
        w = contact_wrenches(model, q, jnp.zeros(model.nv), contact)
        return inverse_dynamics(
            model, q, jnp.zeros(model.nv), jnp.zeros(model.nv), w
        )

    # Finger folded toward the spinner: shapes near/in contact.
    q = jnp.asarray([0.6, -1.2, 0.1][: model.nq])
    J = jax.jacfwd(tau_of_q)(q)
    assert np.isfinite(np.asarray(J)).all()


def test_wall_ball_solves_toward_wall():
    """Actuated ball commanded to the wall face: the optimizer pushes the
    ball toward the target and the smoothed contact keeps it finite."""
    model = parse_urdf_file(
        find_resource("idto_tpu/assets/wall_ball.urdf")
    ).finalize()
    T, dt = 20, 0.05
    q0, qT = np.array([0.5]), np.array([0.11])
    q_nom = linear_interp_nominal(q0, qT, T)
    prob = ProblemDefinition(
        num_steps=T, dt=dt,
        q_init=jnp.asarray(q0), v_init=jnp.zeros(1),
        q_nom=jnp.asarray(q_nom), v_nom=jnp.zeros((T + 1, 1)),
        Qq=jnp.asarray([10.0]), Qv=jnp.asarray([1.0]),
        R=jnp.asarray([0.1]),
        Qf_q=jnp.asarray([100.0]), Qf_v=jnp.asarray([1.0]),
    )
    params = SolverParameters(
        max_iterations=20, equality_constraints=False,
        contact=ContactParams(stiffness=500.0, smoothing_factor=0.01),
    )
    q_guess = jnp.asarray(linear_interp_nominal(q0, q0, T))
    sol, stats, _ = jax.jit(
        lambda m, p, qg: solve_trust_region(m, p, params, qg)
    )(model, prob, q_guess)
    costs = np.asarray(stats.cost)[: int(stats.num_iters)]
    assert np.isfinite(np.asarray(sol.q)).all()
    assert costs[-1] < 0.5 * costs[0]
    # Ball moved toward the wall (started at x=0.5, target 0.11).
    assert float(sol.q[-1, 0]) < 0.3
