"""Scenario batching and multi-device sharding tests (8 virtual CPU
devices from conftest)."""
import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.optimizer.problem import SolverParameters, linear_interp_nominal
from idto_tpu.optimizer.solver import solve_trust_region
from idto_tpu.parallel.batching import (
    broadcast_problem,
    make_mesh,
    solve_batch,
    solve_batch_sharded,
)

from tests.test_optimizer import pendulum_problem


def _setup(batch):
    model, prob = pendulum_problem(T=8)
    params = SolverParameters(
        max_iterations=10, equality_constraints=False, verbose=False
    )
    probs = broadcast_problem(prob, batch)
    # Different targets per scenario.
    targets = np.linspace(2.5, 3.5, batch)
    q_nom = jnp.asarray(
        np.tile(targets[:, None, None], (1, prob.num_steps + 1, 1))
    )
    probs = probs.replace(q_nom=q_nom)
    qg = jnp.tile(
        jnp.asarray(linear_interp_nominal([0.1], [0.1], 8))[None],
        (batch, 1, 1),
    )
    return model, prob, params, probs, qg, targets


def test_batched_solve_distinct_scenarios():
    model, prob, params, probs, qg, targets = _setup(4)
    sols, stats, warms = jax.jit(
        lambda p, q: solve_batch(model, p, params, q)
    )(probs, qg)
    assert sols.q.shape == (4, 9, 1)
    # Each scenario converges toward its own target.
    finals = np.asarray(sols.q[:, -1, 0])
    assert np.all(np.abs(finals - targets) < 0.5)
    assert np.std(finals) > 0.05  # actually distinct


def test_sharded_solve_matches_vmap():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    model, prob, params, probs, qg, targets = _setup(8)
    mesh = make_mesh(8)
    sol_s, stats_s, warm_s, mean_cost = jax.jit(
        lambda p, q: solve_batch_sharded(model, p, params, q, mesh)
    )(probs, qg)
    sol_v, stats_v, _ = solve_batch(model, probs, params, qg)
    np.testing.assert_allclose(
        np.asarray(sol_s.q), np.asarray(sol_v.q), rtol=1e-8, atol=1e-10
    )
    # psum'd mean final cost matches the vmap result.
    iters = np.maximum(np.asarray(stats_v.num_iters) - 1, 0)
    finals = np.asarray(stats_v.cost)[np.arange(8), iters]
    np.testing.assert_allclose(float(mean_cost), finals.mean(), rtol=1e-8)
