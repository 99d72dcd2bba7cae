"""Parity tests pinning the batch-native trust-region solve
(optimizer/batched.py) to vmap(solve_trust_region) -- the per-scenario
path that is itself pinned to the reference by tests/test_parity.py.

The two paths run the identical algorithm (the batched loop masks carry
updates with each scenario's continue-predicate, the same rule jax's
while_loop batching applies), so agreement is expected to near machine
precision in f64.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idto_tpu.optimizer.batched import can_solve_batched_native
from idto_tpu.parallel.batching import broadcast_problem, solve_batch


def _setup(name, B, max_iters, seed=0, **param_overrides):
    from idto_tpu.examples.registry import load_example

    model, cfg, prob, params, q_guess = load_example(name)
    params = params.replace(
        max_iterations=max_iters,
        check_convergence=True,
        verbose=False,
        record_iteration_times=False,
        **param_overrides,
    )
    probs = broadcast_problem(prob, B)
    rng = np.random.default_rng(seed)
    qg = jnp.asarray(q_guess)[None] + 0.01 * jnp.asarray(
        rng.standard_normal((B,) + np.shape(q_guess))
    )
    # q_0 is pinned to q_init in every scenario (not a decision variable).
    qg = qg.at[:, 0].set(jnp.asarray(prob.q_init)[None])
    return model, probs, params, qg


# Every case compiles TWO full solve graphs (native + vmapped) -- minutes
# each on a cold 2-core host -- so only pendulum pins the fast tier
# (VERDICT r4 item 6); spinner (contact) and mini_cheetah (floating base,
# nq=19, the two largest graphs in the suite) run slow-tier.
CASES = [
    ("pendulum", {}),
    pytest.param("spinner", {}, marks=pytest.mark.slow),
    pytest.param(
        "mini_cheetah", {"normalize_quaternions": True},
        marks=pytest.mark.slow,
    ),
]


@pytest.mark.parametrize("name,overrides", CASES)
def test_native_matches_vmap(name, overrides):
    B = 3
    model, probs, params, qg = _setup(name, B, max_iters=8, **overrides)
    assert can_solve_batched_native(model, params)

    sol_n, st_n, warm_n = jax.jit(
        lambda p, q: solve_batch(model, p, params, q, native=True)
    )(probs, qg)
    sol_v, st_v, warm_v = jax.jit(
        lambda p, q: solve_batch(model, p, params, q, native=False)
    )(probs, qg)

    np.testing.assert_array_equal(
        np.asarray(st_n.num_iters), np.asarray(st_v.num_iters)
    )
    np.testing.assert_array_equal(
        np.asarray(st_n.solver_flag), np.asarray(st_v.solver_flag)
    )
    np.testing.assert_allclose(
        np.asarray(sol_n.q), np.asarray(sol_v.q), rtol=1e-7, atol=1e-9,
        err_msg=f"{name}: final q",
    )
    np.testing.assert_allclose(
        np.asarray(sol_n.tau), np.asarray(sol_v.tau), rtol=1e-6, atol=1e-8,
    )
    # Per-iteration statistics: cost / trust radius / rho trajectories.
    for field in ("cost", "delta", "rho", "dq_norm", "grad_norm", "merit",
                  "h_norm"):
        a = np.asarray(getattr(st_n, field))
        b = np.asarray(getattr(st_v, field))
        mask = ~np.isnan(b)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        np.testing.assert_allclose(
            a[mask], b[mask], rtol=1e-6, atol=1e-9,
            err_msg=f"{name}: stats.{field}",
        )
    np.testing.assert_allclose(
        np.asarray(warm_n.Delta), np.asarray(warm_v.Delta), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(warm_n.dq), np.asarray(warm_v.dq), rtol=1e-5, atol=1e-8
    )


def test_scenarios_converge_independently():
    """Scenarios with different targets stop at different iteration counts;
    finished scenarios' stats/warm-start must stay frozen."""
    B = 4
    model, probs, params, qg = _setup("pendulum", B, max_iters=40)
    params = params.replace(
        tolerances=params.tolerances.replace(
            rel_cost_reduction=1e-4, abs_cost_reduction=1e-8
        )
    )
    # Spread the nominal targets so convergence happens at different k.
    q_nom = np.asarray(probs.q_nom)
    q_nom = q_nom + np.linspace(0.0, 1.5, B)[:, None, None]
    probs = probs.replace(q_nom=jnp.asarray(q_nom))

    sol_n, st_n, _ = solve_batch(model, probs, params, qg, native=True)
    sol_v, st_v, _ = solve_batch(model, probs, params, qg, native=False)

    iters = np.asarray(st_n.num_iters)
    np.testing.assert_array_equal(iters, np.asarray(st_v.num_iters))
    assert len(set(iters.tolist())) > 1, (
        "test should exercise distinct per-scenario stopping points, "
        f"got {iters}"
    )
    np.testing.assert_allclose(
        np.asarray(sol_n.q), np.asarray(sol_v.q), rtol=1e-7, atol=1e-9
    )
    # Rows past each scenario's own num_iters stay NaN (never written).
    cost = np.asarray(st_n.cost)
    for b in range(B):
        assert np.all(np.isnan(cost[b, iters[b]:]))
        assert np.all(~np.isnan(cost[b, : iters[b]]))


def test_fallback_configs_rejected():
    model, probs, params, qg = _setup("pendulum", 2, max_iters=2)
    from idto_tpu.optimizer.problem import GradientsMethod

    fd = params.replace(
        gradients_method=GradientsMethod.FORWARD_DIFFERENCES
    )
    assert not can_solve_batched_native(model, fd)
    # solve_batch auto-falls back and still works.
    sol, st, _ = solve_batch(model, probs, fd, qg)
    assert np.all(np.isfinite(np.asarray(sol.q)))
