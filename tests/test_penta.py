"""Penta-diagonal block solver tests.

Mirrors the reference suite optimizer/test/penta_diagonal_solver_test.cc:
matvec vs dense, solve vs dense for identity / block-diagonal /
tri-diagonal / penta SPD systems, the condition-number sweep, and
diagonal extraction/scaling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.ops import penta


def random_spd_penta(n, k, rng, scale=1.0):
    """Random SPD block penta-diagonal matrix built as P^T P with banded P
    (the reference does the same, penta_diagonal_solver_test.cc:109-257)."""
    A = rng.standard_normal((n, k, k))
    B = rng.standard_normal((n, k, k))
    C = rng.standard_normal((n, k, k)) * scale + np.eye(k) * 3 * np.sqrt(k)
    A[:2] = 0
    B[:1] = 0
    lower = penta.PentaBands(
        A=jnp.asarray(A), B=jnp.asarray(B), C=jnp.asarray(C),
        D=jnp.zeros((n, k, k)), E=jnp.zeros((n, k, k)),
    )
    dense_l = np.asarray(penta.to_dense(lower))
    dense = dense_l @ dense_l.T + np.eye(n * k) * 0.1
    return from_dense(dense, n, k), dense


def from_dense(M, n, k):
    A = np.zeros((n, k, k))
    B = np.zeros((n, k, k))
    C = np.zeros((n, k, k))
    D = np.zeros((n, k, k))
    E = np.zeros((n, k, k))
    for i in range(n):
        C[i] = M[i * k : (i + 1) * k, i * k : (i + 1) * k]
        if i >= 1:
            B[i] = M[i * k : (i + 1) * k, (i - 1) * k : i * k]
        if i >= 2:
            A[i] = M[i * k : (i + 1) * k, (i - 2) * k : (i - 1) * k]
        if i + 1 < n:
            D[i] = M[i * k : (i + 1) * k, (i + 1) * k : (i + 2) * k]
        if i + 2 < n:
            E[i] = M[i * k : (i + 1) * k, (i + 2) * k : (i + 3) * k]
    return penta.PentaBands(*[jnp.asarray(x) for x in (A, B, C, D, E)])


class TestPentaOps:
    def test_matvec_vs_dense(self):
        rng = np.random.default_rng(0)
        H, dense = random_spd_penta(7, 3, rng)
        x = rng.standard_normal((7, 3))
        y = penta.matvec(H, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y).ravel(), dense @ x.ravel(), rtol=1e-12
        )

    def test_to_dense_roundtrip(self):
        rng = np.random.default_rng(1)
        H, dense = random_spd_penta(5, 2, rng)
        np.testing.assert_allclose(np.asarray(penta.to_dense(H)), dense)

    def test_extract_diagonal(self):
        rng = np.random.default_rng(2)
        H, dense = random_spd_penta(4, 3, rng)
        d = penta.extract_diagonal(H)
        np.testing.assert_allclose(np.asarray(d).ravel(), np.diag(dense))

    def test_scale_by_diagonal(self):
        rng = np.random.default_rng(3)
        n, k = 5, 3
        H, dense = random_spd_penta(n, k, rng)
        d = rng.uniform(0.5, 2.0, size=(n, k))
        Hs = penta.scale_by_diagonal(H, jnp.asarray(d))
        expected = np.diag(d.ravel()) @ dense @ np.diag(d.ravel())
        np.testing.assert_allclose(
            np.asarray(penta.to_dense(Hs)), expected, rtol=1e-12
        )

    def test_solve_identity(self):
        n, k = 6, 2
        eye = penta.PentaBands(
            A=jnp.zeros((n, k, k)), B=jnp.zeros((n, k, k)),
            C=jnp.tile(jnp.eye(k), (n, 1, 1)),
            D=jnp.zeros((n, k, k)), E=jnp.zeros((n, k, k)),
        )
        b = jnp.asarray(np.random.default_rng(4).standard_normal((n, k)))
        x = penta.solve(eye, b)
        np.testing.assert_allclose(np.asarray(x), np.asarray(b))

    @pytest.mark.parametrize("n,k", [(5, 2), (10, 3), (21, 5), (41, 3)])
    def test_solve_vs_dense(self, n, k):
        rng = np.random.default_rng(n * 10 + k)
        H, dense = random_spd_penta(n, k, rng)
        b = rng.standard_normal((n, k))
        x = penta.solve(H, jnp.asarray(b))
        x_dense = np.linalg.solve(dense, b.ravel())
        np.testing.assert_allclose(
            np.asarray(x).ravel(), x_dense, rtol=1e-8, atol=1e-10
        )

    def test_condition_number_sweep(self):
        """Accuracy degrades gracefully with conditioning, staying within
        ~cond * eps relative error like the reference's sweep
        (penta_diagonal_solver_test.cc:260-319)."""
        rng = np.random.default_rng(7)
        n, k = 10, 3
        N = n * k
        # Build an SPD matrix with prescribed condition number via a banded
        # orthogonal-ish basis; simpler: diagonal scaling of a well-
        # conditioned SPD penta matrix.
        H0, dense0 = random_spd_penta(n, k, rng)
        for cond_target in [1e2, 1e6, 1e10, 1e14]:
            scale = np.power(
                cond_target, np.linspace(0, 0.5, N)
            )  # spread eigenvalues
            d = jnp.asarray(scale.reshape(n, k))
            H = penta.scale_by_diagonal(H0, d)
            dense = np.asarray(penta.to_dense(H))
            x_true = rng.standard_normal(N)
            b = dense @ x_true
            x = penta.solve(H, jnp.asarray(b.reshape(n, k)))
            err = np.linalg.norm(np.asarray(x).ravel() - x_true) / np.linalg.norm(
                x_true
            )
            cond = np.linalg.cond(dense)
            assert err < max(1e-10, 100 * cond * np.finfo(float).eps * N), (
                cond_target,
                err,
            )

    def test_batched_solve_vmap(self):
        rng = np.random.default_rng(9)
        n, k, batch = 8, 3, 4
        Hs, denses, bs = [], [], []
        for i in range(batch):
            H, dense = random_spd_penta(n, k, rng)
            Hs.append(H)
            denses.append(dense)
            bs.append(rng.standard_normal((n, k)))
        Hb = jax.tree.map(lambda *xs: jnp.stack(xs), *Hs)
        bb = jnp.asarray(np.stack(bs))
        xb = jax.vmap(penta.solve)(Hb, bb)
        for i in range(batch):
            expected = np.linalg.solve(denses[i], bs[i].ravel())
            np.testing.assert_allclose(
                np.asarray(xb[i]).ravel(), expected, rtol=1e-8, atol=1e-10
            )

    def test_make_symmetric_from_lower(self):
        rng = np.random.default_rng(11)
        n, k = 6, 2
        A = rng.standard_normal((n, k, k))
        B = rng.standard_normal((n, k, k))
        C = rng.standard_normal((n, k, k))
        A[:2] = 0
        B[:1] = 0
        H = penta.make_symmetric_from_lower(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(C)
        )
        dense = np.asarray(penta.to_dense(H))
        np.testing.assert_allclose(dense, dense.T, atol=1e-12)
