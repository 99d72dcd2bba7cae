"""Sim-model != optimizer-model support (reference
CreatePlantModelForSimulation, example_base.h:171 and the hydroelastic sim
plants of jaco.cc:68-97 etc.): closed-loop MPC evaluated against a plant
that differs from the one the optimizer plans with."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.examples.registry import get_example, load_example, load_sim_plant
from idto_tpu.mpc.controller import make_mpc_params, mpc_initialize, mpc_step
from idto_tpu.mpc.simulator import simulate_segment
from idto_tpu.optimizer.problem import SolverParameters, linear_interp_nominal
from tests.test_optimizer import pendulum_problem


def test_load_sim_plant_hydro_examples_get_stiffer_contact():
    model, cfg, prob, params, q_guess = load_example("jaco", test_mode=True)
    sim_model, sim_contact = load_sim_plant("jaco", params)
    assert sim_model is None  # same kinematics as the optimizer plant
    assert sim_contact is not None
    assert sim_contact.stiffness > params.contact.stiffness
    assert sim_contact.smoothing_factor < params.contact.smoothing_factor


def test_load_sim_plant_default_is_none():
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    assert load_sim_plant("spinner", params) == (None, None)


def test_runner_rejects_layout_mismatch():
    from idto_tpu.mpc.runner import run_mpc

    model, cfg, prob, params, q_guess = load_example("pendulum",
                                                     test_mode=True)
    other, _, _, _, _ = load_example("acrobot", test_mode=True)
    try:
        run_mpc(model, cfg, prob, params, q_guess, sim_model=other)
    except AssertionError as e:
        assert "layout" in str(e)
    else:
        raise AssertionError("layout mismatch not rejected")


@pytest.mark.slow
def test_mpc_tracks_through_model_mismatch():
    """Closed-loop MPC where the SIMULATED pendulum is 25% heavier than
    the one the optimizer plans with: the loop must stay finite and still
    drive the pendulum away from its rest angle (robustness evaluation the
    reference enables via CreatePlantModelForSimulation)."""
    model, prob = pendulum_problem(T=10)
    heavy = model.replace(mass=model.mass * 1.25,
                          inertia=model.inertia * 1.25)
    params = SolverParameters(
        max_iterations=10, scaling=True, equality_constraints=False,
    )
    q_guess = jnp.asarray(linear_interp_nominal([0.1], [0.1], 10))
    carry, _ = mpc_initialize(model, prob, params, q_guess)

    mpc_params = make_mpc_params(params, mpc_iters=1)
    rel = np.zeros(1)
    step = jax.jit(
        lambda c, x0, t: mpc_step(model, prob, mpc_params, rel, c, x0, t)
    )

    from idto_tpu.contact.force import ContactParams

    q, v = prob.q_init, prob.v_init
    replan, h = 0.1, 5e-3
    substeps = int(replan / h)
    for k in range(30):
        t = k * replan
        x0 = jnp.concatenate([q, v])
        carry, sol = step(carry, x0, jnp.asarray(t, q.dtype))
        # Simulate the HEAVY plant under the controller planned on the
        # nominal one.
        q, v, _ = simulate_segment(
            heavy, ContactParams(), h, substeps, carry.stored,
            jnp.zeros(1), jnp.zeros(1), q, v, jnp.asarray(t, q.dtype),
        )
    assert np.isfinite(float(q[0])) and np.isfinite(float(v[0]))
    # Quantitative acceptance: despite the 25% model mismatch the MPC must
    # complete the swingup -- measured |q - pi| ~ 3e-4 at t = 3 s; the
    # bound leaves two orders of headroom.
    assert abs(float(q[0]) - np.pi) < 0.05
