"""Pallas fused cyclic-reduction kernel, interpreter mode (CPU suite).

The same kernel is validated on real TPU hardware by bench_linsolve.py and
the driver bench; here the interpreter executes the identical kernel body
against the dense oracle and the pure-JAX cyclic reduction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.ops import cr_pallas, cyclic_reduction, penta
from tests.test_penta import random_spd_penta


def _f32(H):
    return jax.tree.map(lambda x: x.astype(jnp.float32), H)


@pytest.mark.parametrize("n,k", [(1, 2), (3, 2), (8, 3), (21, 5)])
def test_pallas_cr_vs_dense(n, k):
    rng = np.random.default_rng(n * 7 + k)
    H, dense = random_spd_penta(n, k, rng)
    R = 3
    b = rng.standard_normal((R, n, k)).astype(np.float32)
    x = cr_pallas.solve_many(_f32(H), jnp.asarray(b), interpret=True)
    xd = np.stack(
        [np.linalg.solve(dense, b[r].ravel().astype(np.float64)).reshape(n, k)
         for r in range(R)]
    )
    err = np.abs(np.asarray(x, dtype=np.float64) - xd).max() / np.abs(xd).max()
    assert err < 5e-5, (n, k, err)


def test_pallas_matches_pure_jax_cr():
    rng = np.random.default_rng(0)
    n, k = 11, 4
    H, _ = random_spd_penta(n, k, rng)
    H32 = _f32(H)
    b = jnp.asarray(rng.standard_normal((2, n, k)).astype(np.float32))
    x_pl = cr_pallas.solve_many(H32, b, interpret=True)
    x_jx = jax.vmap(lambda r: cyclic_reduction.solve(H32, r))(b)
    np.testing.assert_allclose(
        np.asarray(x_pl), np.asarray(x_jx), rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_solver_pallas_path_interpret():
    """solve_trust_region with cr_use_pallas=True (forced; interpreter on
    CPU) reproduces the pendulum swingup oracle in f32."""
    from idto_tpu.optimizer.problem import (
        LinearSolverType, SolverParameters, linear_interp_nominal,
    )
    from idto_tpu.optimizer.solver import solve_trust_region
    from tests.test_optimizer import pendulum_problem

    model, prob = pendulum_problem(T=20)

    def to_f32(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            t,
        )

    model, prob32 = to_f32(model), to_f32(prob)
    params = SolverParameters(
        max_iterations=20,
        scaling=True,
        equality_constraints=False,
        linear_solver=LinearSolverType.CYCLIC_REDUCTION,
        cr_use_pallas=True,
    )
    q_guess = jnp.asarray(
        linear_interp_nominal([0.1], [0.1], prob.num_steps), dtype=jnp.float32
    )
    sol, stats, warm = solve_trust_region(model, prob32, params, q_guess)
    assert abs(float(sol.q[-1, 0]) - np.pi) < 1e-2  # f32 tolerance
