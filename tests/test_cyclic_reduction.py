"""Block cyclic reduction vs the Thomas scan solver and dense solves."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.ops import cyclic_reduction, penta
from tests.test_penta import random_spd_penta


@pytest.mark.parametrize("n,k", [(3, 2), (5, 2), (8, 3), (21, 5), (41, 3),
                                 (64, 2), (100, 3)])
def test_cr_vs_dense(n, k):
    rng = np.random.default_rng(n * 7 + k)
    H, dense = random_spd_penta(n, k, rng)
    b = rng.standard_normal((n, k))
    x = cyclic_reduction.solve(H, jnp.asarray(b))
    x_dense = np.linalg.solve(dense, b.ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_dense, rtol=1e-7, atol=1e-9
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


def test_cr_moderate_conditioning():
    rng = np.random.default_rng(3)
    n, k = 16, 3
    H0, _ = random_spd_penta(n, k, rng)
    scale = np.power(1e8, np.linspace(0, 0.5, n * k)).reshape(n, k)
    H = penta.scale_by_diagonal(H0, jnp.asarray(scale))
    dense = np.asarray(penta.to_dense(H))
    x_true = rng.standard_normal(n * k)
    b = (dense @ x_true).reshape(n, k)
    x = cyclic_reduction.solve(H, jnp.asarray(b))
    err = np.linalg.norm(np.asarray(x).ravel() - x_true) / np.linalg.norm(x_true)
    assert err < 1e-6, err
