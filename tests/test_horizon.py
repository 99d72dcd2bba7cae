"""Horizon-sharded (sequence-parallel) distributed cyclic reduction:
sharded == unsharded on the virtual 8-device mesh (SURVEY section 2.6.4;
VERDICT r1 item 4 asks for exactly this oracle at T=160)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.ops import cyclic_reduction
from idto_tpu.parallel.batching import make_mesh
from idto_tpu.parallel.horizon import solve_sharded
from tests.test_penta import random_spd_penta


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    return make_mesh(8, axis="horizon")


@pytest.mark.slow
def test_sharded_matches_dense_T160(mesh8):
    """The VERDICT-designated oracle: T=160 horizon (161 block rows)."""
    n, k = 161, 3
    rng = np.random.default_rng(161 + 3)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    x = solve_sharded(H, jnp.asarray(b), mesh8)
    xd = np.linalg.solve(dense, b.ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), xd, rtol=1e-8, atol=1e-10
    )


@pytest.mark.parametrize("n,k", [(33, 4), (64, 2), (100, 5)])
def test_sharded_matches_unsharded(mesh8, n, k):
    rng = np.random.default_rng(n + k)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    x_sh = solve_sharded(H, jnp.asarray(b), mesh8)
    x_un = cyclic_reduction.solve(H, jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x_sh), np.asarray(x_un), rtol=1e-9, atol=1e-11
    )


def test_sharded_under_jit(mesh8):
    n, k = 96, 3
    rng = np.random.default_rng(7)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    f = jax.jit(lambda H, b: solve_sharded(H, b, mesh8))
    x = f(H, jnp.asarray(b))
    xd = np.linalg.solve(dense, b.ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), xd, rtol=1e-8, atol=1e-10
    )


@pytest.mark.slow
def test_full_solve_horizon_sharded(mesh8):
    """Sequence-parallel FULL trust-region solve (GSPMD over the horizon)
    matches the unsharded solve on the pendulum swingup at 160 knots.
    The scatter-free gradient/Hessian assembly (hessian.py NOTE) is what
    makes this partitioning sound."""
    from idto_tpu.optimizer.problem import (
        LinearSolverType, SolverParameters, linear_interp_nominal,
    )
    from idto_tpu.optimizer.solver import solve_trust_region
    from idto_tpu.parallel.horizon import solve_trust_region_horizon_sharded
    from tests.test_optimizer import pendulum_problem

    T = 159  # 160 knots / 8 devices
    model, prob = pendulum_problem(T=T)
    params = SolverParameters(
        max_iterations=25, scaling=True, equality_constraints=False,
        linear_solver=LinearSolverType.CYCLIC_REDUCTION,
    )
    q_guess = jnp.asarray(linear_interp_nominal([0.1], [0.1], T))
    sol_sh, st_sh, _ = jax.jit(
        lambda m, p, qg: solve_trust_region_horizon_sharded(
            m, p, params, qg, mesh8
        )
    )(model, prob, q_guess)
    sol_un, st_un, _ = jax.jit(
        lambda m, p, qg: solve_trust_region(m, p, params, qg)
    )(model, prob, q_guess)
    np.testing.assert_allclose(
        np.asarray(sol_sh.q), np.asarray(sol_un.q), rtol=1e-9, atol=1e-12
    )
    assert abs(float(sol_sh.q[-1, 0]) - np.pi) < 1e-3


def test_single_device_fallback():
    n, k = 21, 3
    rng = np.random.default_rng(3)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    mesh1 = make_mesh(1, axis="horizon")
    x = solve_sharded(H, jnp.asarray(b), mesh1)
    xd = np.linalg.solve(dense, b.ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), xd, rtol=1e-8, atol=1e-10
    )
