"""Example-suite smoke and behavior tests (analog of the reference's
--test smoke mode on every example binary, example_base.cc:36-45, plus the
spinner/hopper behavior expectations from their YAML targets)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.examples.registry import example_names, load_example
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.solver import solve_trust_region


@pytest.mark.parametrize("name", example_names())
def test_example_loads(name):
    model, cfg, prob, params, q_guess = load_example(name, test_mode=True)
    assert prob.q_init.shape == (model.nq,)
    assert prob.v_init.shape == (model.nv,)
    assert prob.q_nom.shape == (prob.num_steps + 1, model.nq)
    assert q_guess.shape == (prob.num_steps + 1, model.nq)
    # Cost evaluates finite for every example; the (compile-heavy)
    # gradient only for a feature-representative subset in the fast tier
    # (fixed base / contact / floating+quaternion / dual-arm SDF); the
    # full solve sweep in the slow tier covers gradients for the rest.
    L = trajectory.cost(model, prob, params.contact, q_guess)
    assert np.isfinite(float(L))
    if name in ("pendulum", "spinner"):
        # Revolute-chain + contact representatives; the floating-base
        # gradient (the largest compile in this sweep) is covered fast-tier
        # by tests/test_f32_regime.py's native cheetah run and slow-tier by
        # the full solve sweep below.
        g = trajectory.gradient(model, prob, params.contact, q_guess)
        assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("name", example_names())
@pytest.mark.slow
def test_example_solves_in_test_mode(name):
    """Every example solves end-to-end in --test smoke mode (10 iterations,
    the reference's per-binary smoke test, example_base.cc:36-45) with
    finite iterates and a strictly decreased cost."""
    model, cfg, prob, params, q_guess = load_example(name, test_mode=True)
    sol, stats, _ = jax.jit(
        lambda m, p, qg: solve_trust_region(m, p, params, qg)
    )(model, prob, q_guess)
    iters = int(stats.num_iters)
    costs = np.asarray(stats.cost)[:iters]
    assert iters >= 1
    assert np.isfinite(costs).all(), costs
    assert np.all(np.isfinite(np.asarray(sol.q)))
    assert costs[-1] < costs[0], (name, costs[0], costs[-1])
    # Trust region only accepts improving steps: recorded per-iterate cost
    # is non-increasing.
    assert np.all(np.diff(costs) <= 1e-9), (name, costs)


@pytest.mark.slow
def test_spinner_solve_makes_progress():
    """Open-loop spinner: cost drops by orders of magnitude and the wheel
    turns toward the 2.0 rad target (spinner.yaml q_nom_end)."""
    model, cfg, prob, params, q_guess = load_example("spinner")
    params = params.replace(max_iterations=30)
    sol, stats, _ = jax.jit(
        lambda qg: solve_trust_region(model, prob, params, qg)
    )(q_guess)
    costs = np.asarray(stats.cost)
    iters = int(stats.num_iters)
    assert costs[iters - 1] < 0.05 * costs[0], (costs[0], costs[iters - 1])
    # The wheel (dof 2) should have rotated substantially toward 2.0 rad.
    assert float(sol.q[-1, 2]) > 0.5
    # Unactuated torque (wheel) should be small: equality constraints.
    tau_wheel = np.asarray(sol.tau)[:, 2]
    assert np.abs(tau_wheel).max() < 1.0


@pytest.mark.slow
def test_hopper_test_mode_progress():
    model, cfg, prob, params, q_guess = load_example("hopper", test_mode=True)
    sol, stats, _ = jax.jit(
        lambda qg: solve_trust_region(model, prob, params, qg)
    )(q_guess)
    costs = np.asarray(stats.cost)
    iters = int(stats.num_iters)
    assert np.isfinite(costs[: max(iters, 1)]).all()
    assert costs[iters - 1] < costs[0]


def test_mini_cheetah_builds_and_evaluates():
    model, cfg, prob, params, q_guess = load_example(
        "mini_cheetah", test_mode=True
    )
    assert model.nq == 19 and model.nv == 18 and model.nu == 12
    tau = trajectory.generalized_forces(model, prob, params.contact, q_guess)
    assert tau.shape == (prob.num_steps, 18)
    assert np.all(np.isfinite(np.asarray(tau)))
    # Standing at the nominal crouch, contact forces should roughly support
    # the robot: vertical net force on the floating base small.
    g = trajectory.gradient(model, prob, params.contact, q_guess)
    assert np.all(np.isfinite(np.asarray(g)))
