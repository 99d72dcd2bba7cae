"""Block penta-diagonal matrices and the Thomas block solver.

TPU-native replacement for the reference's ``PentaDiagonalMatrix``
(optimizer/penta_diagonal_matrix.h) and ``PentaDiagonalFactorization``
(optimizer/penta_diagonal_solver.h, the Benkert & Fischer 2007 block Thomas
algorithm).  The bands are stored as dense ``(n, k, k)`` arrays so every
band operation (matvec, diagonal scaling, assembly) is a batched einsum on
the MXU; the factorization itself is a ``lax.scan`` over block rows --
sequential in the horizon, parallel over batch/vmap axes.

Block row i has blocks [A_i, B_i, C_i, D_i, E_i] in columns i-2..i+2, with
the same zero-padding convention as the reference (penta_diagonal_matrix.h:
33-35): A[0]=A[1]=B[0]=0, D[n-1]=E[n-2]=E[n-1]=0.

A log-depth block cyclic-reduction Pallas kernel is the planned fast path
for long horizons; this scan implementation is the correctness baseline and
is already fast for the reference's T <= 40 horizons, where batch
parallelism (vmap over scenarios) supplies the TPU occupancy.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from idto_tpu.utils.structs import pytree_dataclass


@pytree_dataclass
class PentaBands:
    """Symmetric-structure block penta-diagonal matrix (bands stored
    explicitly; symmetry is by construction where required)."""

    A: Any  # (n, k, k) block at (i, i-2)
    B: Any  # (n, k, k) block at (i, i-1)
    C: Any  # (n, k, k) block at (i, i)
    D: Any  # (n, k, k) block at (i, i+1)
    E: Any  # (n, k, k) block at (i, i+2)

    @property
    def n(self):
        return self.C.shape[0]

    @property
    def k(self):
        return self.C.shape[1]


def make_symmetric_from_lower(A, B, C):
    """Build full bands from the lower bands, mirroring the reference's
    MakeSymmetric (penta_diagonal_matrix.cc): D_i = B_{i+1}^T, E_i = A_{i+2}^T,
    and C is symmetrized from its lower triangle."""
    Csym = jnp.tril(C) + jnp.triu(jnp.swapaxes(jnp.tril(C, -1), -1, -2), 1)
    D = jnp.concatenate(
        [jnp.swapaxes(B[1:], -1, -2), jnp.zeros_like(B[:1])], axis=0
    )
    E = jnp.concatenate(
        [jnp.swapaxes(A[2:], -1, -2), jnp.zeros_like(A[:2])], axis=0
    )
    return PentaBands(A=A, B=B, C=Csym, D=D, E=E)


def matvec(H: PentaBands, x):
    """y = H x for x of shape (n, k) (reference: MultiplyBy,
    penta_diagonal_matrix.cc:180-207)."""
    pad = jnp.zeros_like(x[:1])
    xm1 = jnp.concatenate([pad, x[:-1]], axis=0)
    xm2 = jnp.concatenate([pad, pad, x[:-2]], axis=0)
    xp1 = jnp.concatenate([x[1:], pad], axis=0)
    xp2 = jnp.concatenate([x[2:], pad, pad], axis=0)
    return (
        jnp.einsum("nij,nj->ni", H.A, xm2)
        + jnp.einsum("nij,nj->ni", H.B, xm1)
        + jnp.einsum("nij,nj->ni", H.C, x)
        + jnp.einsum("nij,nj->ni", H.D, xp1)
        + jnp.einsum("nij,nj->ni", H.E, xp2)
    )


def to_dense(H: PentaBands):
    """Dense (n*k, n*k) matrix (reference: MakeDense)."""
    n, k = H.n, H.k
    M = jnp.zeros((n, n, k, k), dtype=H.C.dtype)
    idx = jnp.arange(n)
    M = M.at[idx, idx].set(H.C)
    M = M.at[idx[1:], idx[:-1]].set(H.B[1:])
    M = M.at[idx[2:], idx[:-2]].set(H.A[2:])
    M = M.at[idx[:-1], idx[1:]].set(H.D[:-1])
    M = M.at[idx[:-2], idx[2:]].set(H.E[:-2])
    return M.transpose(0, 2, 1, 3).reshape(n * k, n * k)


def extract_diagonal(H: PentaBands):
    """Scalar diagonal of H as an (n, k) array (reference: ExtractDiagonal)."""
    return jnp.diagonal(H.C, axis1=-2, axis2=-1)


def scale_by_diagonal(H: PentaBands, d):
    """H -> diag(d) H diag(d) for d of shape (n, k) (reference:
    ScaleByDiagonal, penta_diagonal_matrix.cc:220-257)."""
    pad = jnp.zeros_like(d[:1])
    dm1 = jnp.concatenate([pad, d[:-1]], axis=0)
    dm2 = jnp.concatenate([pad, pad, d[:-2]], axis=0)
    dp1 = jnp.concatenate([d[1:], pad], axis=0)
    dp2 = jnp.concatenate([d[2:], pad, pad], axis=0)
    row = d[:, :, None]
    return PentaBands(
        A=row * H.A * dm2[:, None, :],
        B=row * H.B * dm1[:, None, :],
        C=row * H.C * d[:, None, :],
        D=row * H.D * dp1[:, None, :],
        E=row * H.E * dp2[:, None, :],
    )


@pytree_dataclass
class PentaFactorization:
    """Forward-eliminated factors from the block Thomas sweep."""

    L1: Any  # (n, k, k) multiplier of row i-1 subtracted from row i
    L2: Any  # (n, k, k) multiplier of row i-2
    Cp: Any  # (n, k, k) eliminated diagonal blocks
    Dp: Any  # (n, k, k) eliminated super-diagonal
    Ep: Any  # (n, k, k) (unchanged) second super-diagonal


def factorize(H: PentaBands) -> PentaFactorization:
    """Block LU of a penta-diagonal matrix via the Thomas forward sweep
    (reference: PentaDiagonalFactorization::Factorize,
    penta_diagonal_solver.h:124-197).  Sequential over block rows via
    lax.scan; each step is a pair of k x k solves."""
    k = H.k
    eye = jnp.eye(k, dtype=H.C.dtype)
    zero = jnp.zeros((k, k), dtype=H.C.dtype)

    def step(carry, row):
        (C1, D1, E1, C2, D2, E2) = carry  # row i-1 and i-2 eliminated blocks
        A, B, C, D, E = row
        # L2 = A @ inv(C2):  solve C2^T x^T = A^T.
        L2 = jnp.linalg.solve(jnp.swapaxes(C2, -1, -2), jnp.swapaxes(A, -1, -2))
        L2 = jnp.swapaxes(L2, -1, -2)
        Bp = B - L2 @ D2
        L1 = jnp.linalg.solve(jnp.swapaxes(C1, -1, -2), jnp.swapaxes(Bp, -1, -2))
        L1 = jnp.swapaxes(L1, -1, -2)
        Cp = C - L2 @ E2 - L1 @ D1
        Dp = D - L1 @ E1
        Ep = E
        new_carry = (Cp, Dp, Ep, C1, D1, E1)
        return new_carry, (L1, L2, Cp, Dp, Ep)

    init = (eye, zero, zero, eye, zero, zero)
    rows = (H.A, H.B, H.C, H.D, H.E)
    _, (L1, L2, Cp, Dp, Ep) = jax.lax.scan(step, init, rows)
    return PentaFactorization(L1=L1, L2=L2, Cp=Cp, Dp=Dp, Ep=Ep)


def factorization_status(F: PentaFactorization):
    """True iff every factor block is finite.  A singular diagonal block in
    the forward sweep propagates inf/nan into L1/Cp, so this is the analog
    of the reference's PentaDiagonalFactorizationStatus
    (penta_diagonal_solver.h:16-22) -- checked by the solver to surface
    SolverFlag.FACTORIZATION_FAILED rather than silently NaN-ing the
    trajectory."""
    ok = jnp.asarray(True)
    for x in (F.L1, F.L2, F.Cp, F.Dp):
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(x)))
    return ok


def solve_factorized(F: PentaFactorization, b):
    """Solve H x = b given the factorization; b of shape (n, k)
    (reference: SolveInPlace, penta_diagonal_solver.h:199-248)."""
    k = b.shape[-1]
    zero = jnp.zeros(k, dtype=b.dtype)

    # Forward elimination: y_i = b_i - L1_i y_{i-1} - L2_i y_{i-2}.
    def fwd(carry, inp):
        y1, y2 = carry
        L1, L2, bi = inp
        y = bi - L1 @ y1 - L2 @ y2
        return (y, y1), y

    _, y = jax.lax.scan(fwd, (zero, zero), (F.L1, F.L2, b))

    # Back substitution: x_i = Cp_i^{-1} (y_i - Dp_i x_{i+1} - Ep_i x_{i+2}).
    def bwd(carry, inp):
        x1, x2 = carry
        Cp, Dp, Ep, yi = inp
        x = jnp.linalg.solve(Cp, yi - Dp @ x1 - Ep @ x2)
        return (x, x1), x

    _, x_rev = jax.lax.scan(
        bwd, (zero, zero), (F.Cp, F.Dp, F.Ep, y), reverse=True
    )
    return x_rev


def solve(H: PentaBands, b):
    """One-shot solve H x = b (factorize + substitution)."""
    return solve_factorized(factorize(H), b)
