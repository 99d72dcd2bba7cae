"""Tests for the C++ host runtime (idto_tpu.native).

Mirrors the reference's penta_diagonal_solver_test.cc oracle style: the
native block-Thomas solve is checked against a dense numpy solve on random
SPD penta-diagonal systems, and the spline runtime is checked against its
defining Hermite interpolation properties (knot interpolation, knot
derivatives, warm-start shift identity at t_now = t0).
"""
import numpy as np
import pytest

from idto_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_spd_penta(n, k, rng, cond_boost=0.0):
    """Random SPD block penta-diagonal matrix as (A, B, C, D, E) bands plus
    its dense form, built as G^T G from a banded G (bandwidth <= 2 blocks)."""
    dense = np.zeros((n * k, n * k))
    for i in range(n):
        for j in range(max(0, i - 1), min(n, i + 2)):
            dense[i * k:(i + 1) * k, j * k:(j + 1) * k] = rng.standard_normal(
                (k, k)
            )
    dense = dense.T @ dense + (1e-6 + cond_boost) * np.eye(n * k)

    A = np.zeros((n, k, k))
    B = np.zeros((n, k, k))
    C = np.zeros((n, k, k))
    D = np.zeros((n, k, k))
    E = np.zeros((n, k, k))
    for i in range(n):
        C[i] = dense[i * k:(i + 1) * k, i * k:(i + 1) * k]
        if i >= 1:
            B[i] = dense[i * k:(i + 1) * k, (i - 1) * k:i * k]
        if i >= 2:
            A[i] = dense[i * k:(i + 1) * k, (i - 2) * k:(i - 1) * k]
        if i + 1 < n:
            D[i] = dense[i * k:(i + 1) * k, (i + 1) * k:(i + 2) * k]
        if i + 2 < n:
            E[i] = dense[i * k:(i + 1) * k, (i + 2) * k:(i + 3) * k]
    return (A, B, C, D, E), dense


@pytest.mark.parametrize("n,k", [(5, 2), (11, 3), (21, 5), (40, 7)])
def test_native_penta_solve_vs_dense(n, k):
    rng = np.random.default_rng(0)
    bands, dense = _random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    x = native.penta_solve(*bands, b)
    x_dense = np.linalg.solve(dense, b.reshape(-1)).reshape(n, k)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-8)


def test_native_penta_matvec_vs_dense():
    rng = np.random.default_rng(1)
    n, k = 9, 4
    bands, dense = _random_spd_penta(n, k, rng)
    x = rng.standard_normal((n, k))
    y = native.penta_matvec(*bands, x)
    np.testing.assert_allclose(
        y.reshape(-1), dense @ x.reshape(-1), rtol=1e-12, atol=1e-12
    )


def test_native_penta_condition_sweep():
    """Accuracy across conditioning (reference:
    penta_diagonal_solver_test.cc:260-319 sweeps kappa up to 1e20; here we
    verify residuals stay at machine-precision scale up to 1e12)."""
    rng = np.random.default_rng(2)
    n, k = 15, 3
    for scale in [1.0, 1e-4, 1e-8, 1e-12]:
        bands, dense = _random_spd_penta(n, k, rng, cond_boost=scale)
        b = rng.standard_normal((n, k))
        x = native.penta_solve(*bands, b)
        resid = dense @ x.reshape(-1) - b.reshape(-1)
        rel = np.linalg.norm(resid) / np.linalg.norm(b)
        assert rel < 1e-7, (scale, rel)


def test_native_matches_jax_penta():
    """Host and device solvers agree on the same system."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from idto_tpu.ops import penta

    rng = np.random.default_rng(3)
    n, k = 12, 4
    bands, _ = _random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    H = penta.PentaBands(*[jnp.asarray(x) for x in bands])
    x_jax = np.asarray(penta.solve(H, jnp.asarray(b)))
    x_native = native.penta_solve(*bands, b)
    np.testing.assert_allclose(x_native, x_jax, rtol=1e-9, atol=1e-9)


def test_spline_interpolates_knots():
    rng = np.random.default_rng(4)
    T, d = 10, 3
    y = rng.standard_normal((T + 1, d))
    yd = rng.standard_normal((T + 1, d))
    sp = native.StoredTrajectoryNative(t0=0.5, dt=0.1, y=y, yd=yd)
    ts = 0.5 + 0.1 * np.arange(T + 1)
    np.testing.assert_allclose(sp.value(ts), y, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(sp.derivative(ts), yd, rtol=1e-9, atol=1e-9)


def test_spline_derivative_consistency():
    """Analytic derivative matches a central difference of value()."""
    rng = np.random.default_rng(5)
    T, d = 6, 2
    sp = native.StoredTrajectoryNative(
        t0=0.0, dt=0.2,
        y=rng.standard_normal((T + 1, d)),
        yd=rng.standard_normal((T + 1, d)),
    )
    ts = np.linspace(0.05, T * 0.2 - 0.05, 17)
    h = 1e-6
    num = (sp.value(ts + h) - sp.value(ts - h)) / (2 * h)
    np.testing.assert_allclose(sp.derivative(ts), num, rtol=1e-4, atol=1e-4)


def test_warmstart_shift():
    """Shift at t_now = t0 is the identity; a shift by one knot advances
    the trajectory with a clamped tail (reference: UpdateInitialGuess
    behavior past the stored horizon)."""
    rng = np.random.default_rng(6)
    T, d = 8, 2
    y = rng.standard_normal((T + 1, d))
    yd = rng.standard_normal((T + 1, d))
    sp = native.StoredTrajectoryNative(t0=1.0, dt=0.05, y=y, yd=yd)
    np.testing.assert_allclose(
        sp.warmstart_shift(1.0), y, rtol=1e-12, atol=1e-12
    )
    shifted = sp.warmstart_shift(1.0 + 0.05)
    np.testing.assert_allclose(shifted[:-1], y[1:], rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(shifted[-1], y[-1], rtol=1e-12, atol=1e-12)
