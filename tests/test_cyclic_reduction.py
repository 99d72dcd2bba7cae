"""Block cyclic reduction vs the Thomas scan solver and dense solves,
including the condition-number sweep of the reference
(optimizer/test/penta_diagonal_solver_test.cc:260-319) in BOTH f64 and f32,
and the factorization-failure status."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.ops import cyclic_reduction, penta
from tests.test_penta import random_spd_penta


@pytest.mark.parametrize("n,k", [(1, 2), (2, 3), (3, 2), (5, 2), (8, 3),
                                 (21, 5), (41, 3), (64, 2), (100, 3)])
def test_cr_vs_dense(n, k):
    rng = np.random.default_rng(n * 7 + k)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    x = cyclic_reduction.solve(H, jnp.asarray(b))
    x_dense = np.linalg.solve(dense, b.ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_dense, rtol=1e-7, atol=1e-9
    )


def test_cr_factorization_reuse():
    """One factorize, many solves (the trust-region solver reuses the
    factorization for the Newton step + every constraint column)."""
    rng = np.random.default_rng(0)
    n, k = 21, 4
    H, dense = random_spd_penta(n, k, rng)
    F = cyclic_reduction.factorize(H)
    assert bool(cyclic_reduction.factorization_status(F))
    for i in range(3):
        b = rng.standard_normal((n, k))
        x = cyclic_reduction.solve_factorized(F, jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(x).ravel(), np.linalg.solve(dense, b.ravel()),
            rtol=1e-8, atol=1e-10,
        )


def test_cr_vs_thomas_batched():
    rng = np.random.default_rng(0)
    n, k = 33, 4
    H, dense = random_spd_penta(n, k, rng)
    B = 5
    bs = jnp.asarray(rng.standard_normal((B, n, k)))
    x_cr = jax.vmap(lambda b: cyclic_reduction.solve(H, b))(bs)
    x_th = jax.vmap(lambda b: penta.solve(H, b))(bs)
    np.testing.assert_allclose(
        np.asarray(x_cr), np.asarray(x_th), rtol=1e-7, atol=1e-9
    )


def _sweep(solve_fn, dtype, conds, n=10, k=3):
    """Condition sweep harness: relative error vs the true solution must
    degrade gracefully (~cond * eps), mirroring the reference sweep."""
    rng = np.random.default_rng(7)
    N = n * k
    H0, _ = random_spd_penta(n, k, rng)
    H0 = jax.tree.map(lambda x: x.astype(dtype), H0)
    eps = np.finfo(dtype).eps
    for cond_target in conds:
        scale = np.power(cond_target, np.linspace(0, 0.5, N))
        d = jnp.asarray(scale.reshape(n, k), dtype=dtype)
        H = penta.scale_by_diagonal(H0, d)
        dense = np.asarray(penta.to_dense(H), dtype=np.float64)
        x_true = rng.standard_normal(N)
        b = dense @ x_true
        x = solve_fn(H, jnp.asarray(b.reshape(n, k), dtype=dtype))
        err = np.linalg.norm(
            np.asarray(x, dtype=np.float64).ravel() - x_true
        ) / np.linalg.norm(x_true)
        cond = np.linalg.cond(dense)
        assert err < max(100 * eps, 100 * cond * eps * N), (
            cond_target, cond, err,
        )


def test_cr_condition_sweep_f64():
    _sweep(cyclic_reduction.solve, np.float64, [1e2, 1e6, 1e10, 1e14])


def test_cr_condition_sweep_f32():
    _sweep(cyclic_reduction.solve, np.float32, [1e1, 1e2, 1e3, 1e4])


def test_thomas_condition_sweep_f32():
    """f32 variant of the Thomas sweep (the TPU bench precision; the f64
    sweep lives in tests/test_penta.py)."""
    _sweep(penta.solve, np.float32, [1e1, 1e2, 1e3, 1e4])


def _extreme_system(cond_target, dtype, n=10, k=3, seed=7):
    rng = np.random.default_rng(seed)
    N = n * k
    H0, _ = random_spd_penta(n, k, rng)
    H0 = jax.tree.map(lambda x: x.astype(dtype), H0)
    scale = np.power(cond_target, np.linspace(0, 0.5, N))
    d = jnp.asarray(scale.reshape(n, k), dtype=dtype)
    H = penta.scale_by_diagonal(H0, d)
    dense = np.asarray(penta.to_dense(H), dtype=np.float64)
    x_true = rng.standard_normal(N)
    b = dense @ x_true
    return H, dense, x_true, b


def _relerr(x, x_true):
    x = np.asarray(x, dtype=np.float64).ravel()
    return np.linalg.norm(x - x_true) / np.linalg.norm(x_true)


@pytest.mark.parametrize("cond_target", [1e16, 1e18, 1e20])
def test_condition_sweep_f64_to_1e20(cond_target):
    """The last six orders of the reference's sweep
    (penta_diagonal_solver_test.cc:260-319, which runs 1e1 -> 1e20 and
    only PRINTS the errors): past 1/eps both solvers lose all digits, but
    they must degrade gracefully -- finite output, and error comparable
    to what a dense f64 solve produces on the same system."""
    H, dense, x_true, b = _extreme_system(cond_target, np.float64)
    bj = jnp.asarray(b.reshape(H.C.shape[0], H.C.shape[1]))
    err_dense = _relerr(np.linalg.solve(dense, b), x_true)
    for name, fn in (("thomas", penta.solve),
                     ("cr", cyclic_reduction.solve)):
        x = np.asarray(fn(H, bj), dtype=np.float64)
        assert np.isfinite(x).all(), f"{name} blew up at {cond_target:g}"
        err = _relerr(x, x_true)
        # Same-ballpark degradation as dense LU (reference observes the
        # sparse error tracking the dense error across the whole sweep).
        assert err <= max(1e3 * err_dense, 1e-9), (
            name, cond_target, err, err_dense,
        )


@pytest.mark.parametrize("cond_target", [1e5, 1e6])
def test_cr_f32_high_condition(cond_target):
    """f32 CR at condition numbers a scaled cheetah GN Hessian can reach:
    must stay finite and within 100x of the f32 scan-Thomas error on the
    same system (the solver auto-selects the f32 CR path on TPU)."""
    H, dense, x_true, b = _extreme_system(cond_target, np.float32)
    bj = jnp.asarray(b.reshape(H.C.shape[0], H.C.shape[1]),
                     dtype=jnp.float32)
    x_th = np.asarray(penta.solve(H, bj), dtype=np.float64)
    x_cr = np.asarray(cyclic_reduction.solve(H, bj), dtype=np.float64)
    assert np.isfinite(x_th).all() and np.isfinite(x_cr).all()
    err_th = _relerr(x_th, x_true)
    err_cr = _relerr(x_cr, x_true)
    assert err_cr <= max(100.0 * err_th, 1e-4), (
        cond_target, err_cr, err_th,
    )


def test_cr_singular_status():
    """A singular diagonal block must be reported, not silently NaN'd
    (reference: PentaDiagonalFactorizationStatus,
    penta_diagonal_solver.h:16-22)."""
    n, k = 6, 2
    zero = jnp.zeros((n, k, k))
    H = penta.PentaBands(A=zero, B=zero, C=zero, D=zero, E=zero)
    F = cyclic_reduction.factorize(H)
    assert not bool(cyclic_reduction.factorization_status(F))
    Ft = penta.factorize(H)
    assert not bool(penta.factorization_status(Ft))


def test_cr_singular_status_under_jit():
    """Status must be computable inside jit (it feeds SolverFlag)."""
    n, k = 6, 2

    def status_of(c_scale):
        zero = jnp.zeros((n, k, k))
        C = jnp.tile(jnp.eye(k), (n, 1, 1)) * c_scale
        H = penta.PentaBands(A=zero, B=zero, C=C, D=zero, E=zero)
        return cyclic_reduction.factorization_status(
            cyclic_reduction.factorize(H)
        )

    ok = jax.jit(status_of)(jnp.asarray(1.0))
    bad = jax.jit(status_of)(jnp.asarray(0.0))
    assert bool(ok) and not bool(bad)
