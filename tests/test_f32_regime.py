"""f32 bench-regime regression tests.

Round 4 shipped a regression that only existed in the regime bench.py runs
(f32, CYCLIC_REDUCTION, max_iterations=1, large batch, chained
warm-started solves): one scenario's degraded f32 CR solve produced a
trial point with infinite merit, the trust ratio became NaN, and the NaN
was written into the stats row -- tripping the bench's own finiteness
assertion (VERDICT r4 items 1/2/7).  Every other test runs f64-on-CPU
(tests/conftest.py), so nothing caught it.

These tests run the solver in float32 via jax.enable_x64(False):

  * chained warm-started 1-iteration CR solves over a perturbed scenario
    batch (the exact structure of the bench loop) with the full stats
    finiteness assertion, on both the batch-native and the vmapped path;
  * a deterministic unit repro of the non-finite trust ratio: a huge
    trust radius overflows the f32 trial cost to inf, so
    rho = (-inf)/(-inf) = NaN without the containment in
    optimizer/solver.py (the reference instead aborts the process on a
    non-descent direction, trajectory_optimizer.cc:2528-2538 -- a batched
    device solve must survive and report instead).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idto_tpu.optimizer.problem import LinearSolverType
from idto_tpu.optimizer.solver import SolverFlag, solve_trust_region
from idto_tpu.parallel.batching import broadcast_problem, solve_batch


def _to_f32(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _bench_regime_setup(name, B, seed=0):
    from idto_tpu.examples.registry import load_example

    model, cfg, prob, params, q_guess = load_example(name)
    params = params.replace(
        max_iterations=1,
        check_convergence=False,
        linear_solver=LinearSolverType.CYCLIC_REDUCTION,
    )
    model = _to_f32(model)
    prob = _to_f32(prob)
    q_guess = jnp.asarray(q_guess, jnp.float32)
    probs = broadcast_problem(prob, B)
    rng = np.random.default_rng(seed)
    dq = 0.01 * rng.standard_normal((B, model.nq)).astype(np.float32)
    probs = probs.replace(q_init=probs.q_init + dq)
    qgs = (
        jnp.broadcast_to(q_guess, (B,) + q_guess.shape) + dq[:, None, :]
    )
    return model, probs, params, qgs


def _assert_stats_finite(stats, B):
    for field in ("cost", "rho", "delta", "q_norm", "dq_norm", "dqH_norm",
                  "grad_norm", "dL_dq", "merit"):
        col = np.asarray(getattr(stats, field))[:, 0]
        assert np.isfinite(col).all(), (
            f"stats.{field} non-finite in the bench regime: "
            f"{col[~np.isfinite(col)][:5]} at scenarios "
            f"{np.nonzero(~np.isfinite(col))[0][:5]}"
        )


def _run_chained(name, B, n_chain, native):
    with jax.enable_x64(False):
        model, probs, params, qgs = _bench_regime_setup(name, B)

        step = jax.jit(
            lambda p, q: solve_batch(model, p, params, q, native=native)
        )
        sol, stats, warm = step(probs, qgs)
        for _ in range(n_chain - 1):
            sol, stats, warm = step(probs, sol.q)
        q_out = np.asarray(sol.q)
        assert q_out.dtype == np.float32
        assert np.isfinite(q_out).all()
        _assert_stats_finite(stats, B)


@pytest.mark.parametrize(
    "native",
    [True, pytest.param(False, marks=pytest.mark.slow)],
)
def test_chained_warm_start_stats_finite(native):
    """bench.py's exact loop structure at a fast-tier size.  The native
    leg (the path bench.py actually runs) stays fast-tier; the vmapped
    leg costs a second several-minute cold compile and runs slow-tier."""
    _run_chained("mini_cheetah", B=16, n_chain=3, native=native)


@pytest.mark.slow
def test_chained_warm_start_stats_finite_large():
    """VERDICT r4 item 1's requested regression size: B >= 256 perturbed
    scenarios, 5 chained warm-started solves, batch-native path."""
    _run_chained("mini_cheetah", B=256, n_chain=5, native=True)


@pytest.mark.parametrize("native", [True, False])
def test_nonfinite_trust_ratio_contained(native):
    """Deterministic NaN-rho repro: Delta0 = 1e18 in f32 makes the dogleg
    step overflow the trial cost, so actual and predicted reductions are
    both -inf and rho would be NaN.  The containment must (a) keep every
    stats entry finite, (b) reject the step so q stays finite."""
    with jax.enable_x64(False):
        model, probs, params, qgs = _bench_regime_setup("pendulum", B=4)
        B = 4
        sol, stats, warm = jax.jit(
            lambda p, q: solve_batch(
                model, p, params, q, native=native
            )
        )(probs, qgs * 0.0 + jnp.float32(1e18))
        # (q_guess 1e18 => first cost/gradient overflow; the solver must
        # not emit NaN stats even from an absurd starting point, and the
        # poisoned step must be rejected so q stays finite.)
        rho = np.asarray(stats.rho)[:, 0]
        assert np.isfinite(rho).all(), rho
        assert np.isfinite(np.asarray(sol.q)).all()
        # The poisoned step must NOT read as a success: either the
        # factorization path flagged it, or the contained rho = -1
        # rejection ran the iteration budget out.
        flag = np.asarray(stats.solver_flag)
        ok = (flag == int(SolverFlag.FACTORIZATION_FAILED)) | (
            flag == int(SolverFlag.MAX_ITERATIONS)
        )
        assert ok.all(), flag
