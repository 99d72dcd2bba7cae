"""Block cyclic reduction for penta-diagonal systems: the log-depth,
TPU-native alternative to the sequential Thomas sweep.

SURVEY.md flags the reference's serial Thomas factorization
(penta_diagonal_solver.h:124-248, strictly sequential over the T+1 block
rows) as the horizon-length bottleneck.  This solver restores parallelism:

  1. pair adjacent block rows so the penta-diagonal system becomes block
     *tridiagonal* in super-blocks of size 2k,
  2. run block cyclic reduction: each level eliminates the odd super-rows
     with batched (vmapped) k-sized matmuls and solves -- every level is
     one big batched GEMM on the MXU, and there are only ceil(log2 n)
     levels instead of n sequential steps,
  3. back-substitute level by level.

For the reference's horizons (T <= 40) the scan-based Thomas solver with
scenario batching is already fast; cyclic reduction wins for long horizons
and is the basis for horizon-sharded (sequence-parallel) solves where each
chip owns a contiguous slice and exchanges +-1 super-row halos.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from idto_tpu.ops.penta import PentaBands


def _to_super_tridiag(H: PentaBands, b):
    """Pack pairs of k-rows into 2k super-rows: returns (L, C, U, rhs) with
    shapes (m, 2k, 2k) and (m, 2k)."""
    n, k = H.n, H.k
    m = (n + 1) // 2
    pad = 2 * m - n
    dtype = H.C.dtype

    def pad_rows(X, diag=False):
        if pad == 0:
            return X
        extra = jnp.zeros((pad, k, k), dtype=dtype)
        if diag:
            extra = jnp.tile(jnp.eye(k, dtype=dtype), (pad, 1, 1))
        return jnp.concatenate([X, extra], axis=0)

    A = pad_rows(H.A)
    B = pad_rows(H.B)
    C = pad_rows(H.C, diag=True)
    D = pad_rows(H.D)
    E = pad_rows(H.E)
    rhs = jnp.concatenate(
        [b, jnp.zeros((pad, k), dtype=dtype)], axis=0
    ) if pad else b

    ev = slice(0, 2 * m, 2)
    od = slice(1, 2 * m, 2)
    z = jnp.zeros((m, k, k), dtype=dtype)

    def blk(tl, tr, bl, br):
        top = jnp.concatenate([tl, tr], axis=2)
        bot = jnp.concatenate([bl, br], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    L = blk(A[ev], B[ev], z, A[od])
    Cs = blk(C[ev], D[ev], B[od], C[od])
    U = blk(E[ev], z, D[od], E[od])
    rhs2 = jnp.concatenate([rhs[ev][:, None, :], rhs[od][:, None, :]],
                           axis=1).reshape(m, 2 * k)
    return L, Cs, U, rhs2


def _bcr_solve_tridiag(L, C, U, b):
    """Block cyclic reduction solve of a block tridiagonal system
    (L_i x_{i-1} + C_i x_i + U_i x_{i+1} = b_i; L_0 = U_{m-1} = 0)."""
    m = C.shape[0]
    K = C.shape[1]
    dtype = C.dtype

    # Pad to a power of two with identity rows.
    mpow = 1 << (m - 1).bit_length()
    if mpow != m:
        padn = mpow - m
        eye = jnp.tile(jnp.eye(K, dtype=dtype), (padn, 1, 1))
        zero = jnp.zeros((padn, K, K), dtype=dtype)
        L = jnp.concatenate([L, zero], axis=0)
        C = jnp.concatenate([C, eye], axis=0)
        U = jnp.concatenate([U, zero], axis=0)
        b = jnp.concatenate([b, jnp.zeros((padn, K), dtype=dtype)], axis=0)

    levels = []
    size = mpow
    while size > 1:
        odd_L, odd_C, odd_U, odd_b = L[0::2], C[0::2], U[0::2], b[0::2]
        ev_L, ev_C, ev_U, ev_b = L[1::2], C[1::2], U[1::2], b[1::2]
        # Eliminate the odd-indexed (0-based even positions 0,2,..) rows?
        # Convention: keep rows at positions 1, 3, 5, ... (odd), eliminate
        # even positions, halving the system; boundary rows handled by the
        # zero L_0 / U_last padding.
        half = size // 2
        # alpha_i = L(kept_i) C(elim_i)^-1  with elim_i the row above,
        # beta_i = U(kept_i) C(elim_below)^-1 with the row below.
        above_C, above_U, above_L, above_b = odd_C, odd_U, odd_L, odd_b
        below_C = jnp.concatenate(
            [odd_C[1:], jnp.tile(jnp.eye(K, dtype=dtype), (1, 1, 1))], axis=0
        )
        below_L = jnp.concatenate(
            [odd_L[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
        )
        below_U = jnp.concatenate(
            [odd_U[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
        )
        below_b = jnp.concatenate(
            [odd_b[1:], jnp.zeros((1, K), dtype=dtype)], axis=0
        )

        alpha = jnp.linalg.solve(
            jnp.swapaxes(above_C, -1, -2), jnp.swapaxes(ev_L, -1, -2)
        )
        alpha = jnp.swapaxes(alpha, -1, -2)
        beta = jnp.linalg.solve(
            jnp.swapaxes(below_C, -1, -2), jnp.swapaxes(ev_U, -1, -2)
        )
        beta = jnp.swapaxes(beta, -1, -2)

        newC = ev_C - alpha @ above_U - beta @ below_L
        newL = -(alpha @ above_L)
        newU = -(beta @ below_U)
        newb = (
            ev_b
            - jnp.einsum("nij,nj->ni", alpha, above_b)
            - jnp.einsum("nij,nj->ni", beta, below_b)
        )
        levels.append((above_C, above_L, above_U, above_b, below_b))
        L, C, U, b = newL, newC, newU, newb
        size = half

    # Single remaining row.
    x = jnp.linalg.solve(C[0], b[0])[None, :]

    # Unwind: reconstruct the eliminated rows at each level.
    for (above_C, above_L, above_U, above_b, _below_b) in reversed(levels):
        half = x.shape[0]
        # Eliminated rows sit ABOVE each kept row: elim_i couples
        # x_kept_{i-1} (via its L) and x_kept_i (via its U).
        x_prev = jnp.concatenate(
            [jnp.zeros((1, K), dtype=dtype), x[:-1]], axis=0
        )
        rhs = (
            above_b
            - jnp.einsum("nij,nj->ni", above_L, x_prev)
            - jnp.einsum("nij,nj->ni", above_U, x)
        )
        x_elim = jnp.linalg.solve(above_C, rhs[..., None])[..., 0]
        # Interleave: [elim_0, kept_0, elim_1, kept_1, ...]
        x = jnp.stack([x_elim, x], axis=1).reshape(2 * half, K)

    return x


def solve(H: PentaBands, b):
    """Solve H x = b by block cyclic reduction; same interface as
    penta.solve (b of shape (n, k))."""
    n, k = H.n, H.k
    L, C, U, rhs = _to_super_tridiag(H, b)
    x_super = _bcr_solve_tridiag(L, C, U, rhs)
    return x_super.reshape(-1, k)[:n]
