"""Warm-start consistency (reference:
python_bindings/test/warm_start_test.py:17-182): solving from a freshly
created warm start must be IDENTICAL to a direct solve, and the warm-start
carry (q trajectory + trust radius) round-trips through MPC re-solves."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.examples.registry import load_example
from idto_tpu.optimizer.problem import SolverParameters, linear_interp_nominal
from idto_tpu.optimizer.solver import (
    WarmStart,
    solve_from_warm_start,
    solve_trust_region,
)
from tests.test_optimizer import pendulum_problem


def test_solve_equals_solve_from_warm_start_pendulum():
    model, prob = pendulum_problem(T=20)
    params = SolverParameters(
        max_iterations=15, scaling=True, equality_constraints=False
    )
    q_guess = jnp.asarray(linear_interp_nominal([0.1], [0.1], prob.num_steps))

    sol_a, stats_a, warm_a = solve_trust_region(model, prob, params, q_guess)
    warm0 = WarmStart(q=q_guess, Delta=jnp.asarray(params.Delta0,
                                                   dtype=q_guess.dtype))
    sol_b, stats_b, warm_b = solve_from_warm_start(model, prob, params, warm0)

    np.testing.assert_array_equal(np.asarray(sol_a.q), np.asarray(sol_b.q))
    np.testing.assert_array_equal(
        np.asarray(warm_a.Delta), np.asarray(warm_b.Delta)
    )
    assert int(stats_a.num_iters) == int(stats_b.num_iters)


@pytest.mark.slow
def test_warm_start_continues_descent_spinner():
    """Continuing from the returned warm start (state + carried trust
    radius, reference warm_start.h:23-76) picks up where the first solve
    left off: the continued run equals one longer run."""
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    sol1, stats1, warm1 = solve_trust_region(model, prob, params, q_guess)
    params2 = params.replace(max_iterations=3)
    sol2, stats2, warm2 = solve_from_warm_start(model, prob, params2, warm1)
    c1 = np.asarray(stats1.cost)[int(stats1.num_iters) - 1]
    c2 = np.asarray(stats2.cost)[int(stats2.num_iters) - 1]
    # The warm-started continuation never regresses.
    assert c2 <= c1 * (1 + 1e-9)
    assert np.all(np.isfinite(np.asarray(sol2.q)))

    # Oracle: 10 iterations then 3 warm-started ones == 13 straight
    # iterations (state AND trust radius both carried; with a reset Delta0
    # the radius adaptation path would differ).
    sol13, stats13, _ = solve_trust_region(
        model, prob, params.replace(max_iterations=13), q_guess
    )
    np.testing.assert_allclose(
        np.asarray(sol2.q), np.asarray(sol13.q), rtol=1e-10, atol=1e-12
    )
