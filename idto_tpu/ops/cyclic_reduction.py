"""Block cyclic reduction for penta-diagonal systems: the log-depth,
TPU-native alternative to the sequential Thomas sweep.

SURVEY.md flags the reference's serial Thomas factorization
(optimizer/penta_diagonal_solver.h:124-248, strictly sequential over the
T+1 block rows) as the horizon-length bottleneck.  This solver restores
parallelism:

  1. pair adjacent block rows so the penta-diagonal system becomes block
     *tridiagonal* in super-blocks of size 2k (the SPD structure is
     preserved -- pairing is just a re-blocking),
  2. run block cyclic reduction: each level eliminates the even-indexed
     super-rows with batched 2k-sized matmuls and solves; every level is
     one batched GEMM on the MXU and there are only ceil(log2 m) levels
     instead of m sequential steps,
  3. back-substitute level by level.

The reduction of the *matrix* is factored out (``factorize``) from the
application to a right-hand side (``solve_factorized``): the trust-region
solver re-uses one factorization for the Newton step, the merit-gradient
solve, and every equality-constraint column (reference: the same split in
PentaDiagonalFactorization::Factorize / SolveInPlace).  Eliminated diagonal
blocks are stored as explicit inverses so a solve is matmuls only --
MXU-friendly, with per-block (not global) conditioning governing the
inversion error; the f64/f32 condition sweeps in tests/test_cyclic_reduction.py
validate stability against the dense oracle.

A Pallas kernel fusing all levels in VMEM (f32) is the single-kernel fast
path; see idto_tpu/ops/cr_pallas.py.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from idto_tpu.ops.penta import PentaBands
from idto_tpu.utils.structs import pytree_dataclass, static


def _pack_super_tridiag(H: PentaBands, dtype=None):
    """Pair adjacent k-rows into 2k super-rows: penta -> block tridiagonal.

    Row pair (2i, 2i+1) couples pairs (2i-2, 2i-1) on the left (through
    bands A and B of row 2i and A of row 2i+1) and (2i+2, 2i+3) on the
    right.  Returns (L, C, U) with shapes (m, 2k, 2k), m = ceil(n/2);
    an odd trailing row is padded with an identity diagonal block.
    """
    n, k = H.n, H.k
    m = (n + 1) // 2
    pad = 2 * m - n
    dtype = dtype or H.C.dtype

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

    ev = slice(0, 2 * m, 2)
    od = slice(1, 2 * m, 2)
    z = jnp.zeros((m, k, k), dtype=dtype)

    def blk(tl, tr, bl, br):
        top = jnp.concatenate([tl, tr], axis=2)
        bot = jnp.concatenate([bl, br], axis=2)
        return jnp.concatenate([top, bot], axis=1)

    L = blk(A[ev], B[ev], z, A[od])
    C2 = blk(C[ev], D[ev], B[od], C[od])
    U = blk(E[ev], z, D[od], E[od])
    return L, C2, U


def _pack_rhs(b, m):
    n, k = b.shape
    pad = 2 * m - n
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, k), dtype=b.dtype)], axis=0)
    return b.reshape(m, 2 * k)


@pytree_dataclass
class CRLevel:
    """One reduction level.  Even-indexed rows are eliminated; odd rows are
    kept and become the next (half-size) level's rows."""

    Cinv_even: Any  # (h, K, K) inverses of the eliminated diagonal blocks
    alpha: Any      # (h, K, K)  L_odd @ Cinv(above even)
    beta: Any       # (h, K, K)  U_odd @ Cinv(below even)
    L_even: Any     # (h, K, K)  kept for back substitution
    U_even: Any     # (h, K, K)


@pytree_dataclass
class CRFactorization:
    levels: Any = None       # tuple of CRLevel, coarsest last
    C_final_inv: Any = None  # (1, K, K); None when a Pallas tail is kept
    # Hybrid long-horizon path (VERDICT r3 Weak #3): when tail_LCU is set,
    # the reduction stopped at a power-of-two row count that fits the fused
    # Pallas kernel's VMEM/compile budget; solve_factorized dispatches the
    # remaining (latency-dominated, deep) levels to one fused kernel launch
    # instead of materializing each level through HBM.
    tail_LCU: Any = None     # optional (Lt, Ct, Ut), each (mt, K, K)
    n: int = static(default=0)  # original block-row count
    k: int = static(default=0)  # original block size


def _inv(M):
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return jnp.linalg.solve(M, eye)


def factorize(H: PentaBands, tail_rows: int = 1) -> CRFactorization:
    """Log-depth reduction of the matrix.  All shapes are static: the
    super-tridiagonal system is padded to a power-of-two row count with
    identity rows, so every level halves exactly.

    ``tail_rows`` (a power of two) stops the XLA-level reduction once the
    system has shrunk to that many super-rows; the remaining tridiagonal
    tail is stored verbatim for a fused Pallas solve (the hybrid path:
    wide levels ride XLA/HBM where bandwidth dominates, the deep narrow
    levels fuse in VMEM where launch/roundtrip latency dominates).
    ``tail_rows=1`` reproduces the pure-XLA reduction."""
    n, k = H.n, H.k
    L, C, U = _pack_super_tridiag(H)
    m = C.shape[0]
    K = C.shape[1]
    dtype = C.dtype

    mpow = 1 << max(m - 1, 0).bit_length()
    if mpow != m:
        padn = mpow - m
        eye = jnp.tile(jnp.eye(K, dtype=dtype), (padn, 1, 1))
        zero = jnp.zeros((padn, K, K), dtype=dtype)
        L = jnp.concatenate([L, zero], axis=0)
        C = jnp.concatenate([C, eye], axis=0)
        U = jnp.concatenate([U, zero], axis=0)

    assert tail_rows >= 1 and tail_rows & (tail_rows - 1) == 0
    levels = []
    size = mpow
    while size > tail_rows and size > 1:
        # 0-based: eliminate even rows 0,2,...,size-2; keep odd rows.
        L_ev, C_ev, U_ev = L[0::2], C[0::2], U[0::2]
        L_od, C_od, U_od = L[1::2], C[1::2], U[1::2]
        Cinv_ev = _inv(C_ev)
        # Odd row 2j+1: above even row 2j -> Cinv_ev[j];
        # below even row 2j+2 -> Cinv_ev[j+1] (identity pad for the last).
        Cinv_below = jnp.concatenate(
            [Cinv_ev[1:], jnp.tile(jnp.eye(K, dtype=dtype), (1, 1, 1))],
            axis=0,
        )
        L_below = jnp.concatenate(
            [L_ev[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
        )
        U_below = jnp.concatenate(
            [U_ev[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
        )
        alpha = L_od @ Cinv_ev
        beta = U_od @ Cinv_below
        levels.append(
            CRLevel(
                Cinv_even=Cinv_ev, alpha=alpha, beta=beta,
                L_even=L_ev, U_even=U_ev,
            )
        )
        L = -(alpha @ L_ev)
        C = C_od - alpha @ U_ev - beta @ L_below
        U = -(beta @ U_below)
        size //= 2

    if size > 1:
        return CRFactorization(
            levels=tuple(levels), C_final_inv=None, tail_LCU=(L, C, U),
            n=n, k=k,
        )
    return CRFactorization(
        levels=tuple(levels), C_final_inv=_inv(C), n=n, k=k
    )


def factorization_status(F: CRFactorization):
    """True iff every stored factor block is finite (a singular eliminated
    block yields inf/nan from the LU solve).  Analog of the reference's
    PentaDiagonalFactorizationStatus (penta_diagonal_solver.h:16-22).
    A singular Pallas-tail block surfaces as non-finite solve output,
    which the solver's Newton-step finiteness check covers."""
    leaves = jax.tree.leaves((F.levels, F.C_final_inv, F.tail_LCU))
    ok = jnp.asarray(True)
    for x in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(x)))
    return ok


def solve_factorized(F: CRFactorization, b):
    """Apply the stored reduction to a right-hand side: matmuls only."""
    n, k = F.n, F.k
    m0 = (n + 1) // 2
    rhs = _pack_rhs(b, m0)
    K = rhs.shape[1]
    dtype = rhs.dtype

    mpow = 1 << max(m0 - 1, 0).bit_length()
    if mpow != m0:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((mpow - m0, K), dtype=dtype)], axis=0
        )

    # Downward pass: fold the even rows' rhs into the kept odd rows.
    b_evens = []
    for lvl in F.levels:
        b_ev, b_od = rhs[0::2], rhs[1::2]
        b_below = jnp.concatenate(
            [b_ev[1:], jnp.zeros((1, K), dtype=dtype)], axis=0
        )
        b_evens.append(b_ev)
        rhs = (
            b_od
            - jnp.einsum("nij,nj->ni", lvl.alpha, b_ev)
            - jnp.einsum("nij,nj->ni", lvl.beta, b_below)
        )

    if F.tail_LCU is not None:
        from idto_tpu.ops import cr_pallas

        Lt, Ct, Ut = F.tail_LCU
        x = cr_pallas.solve_tridiag_many(Lt, Ct, Ut, rhs[None])[0]
    else:
        x = jnp.einsum("nij,nj->ni", F.C_final_inv, rhs)

    # Upward pass: recover the eliminated even rows.
    for lvl, b_ev in zip(reversed(F.levels), reversed(b_evens)):
        # Even row 2j: above odd = kept j-1 (zero for j = 0), below odd =
        # kept j.
        x_above = jnp.concatenate(
            [jnp.zeros((1, K), dtype=dtype), x[:-1]], axis=0
        )
        r = (
            b_ev
            - jnp.einsum("nij,nj->ni", lvl.L_even, x_above)
            - jnp.einsum("nij,nj->ni", lvl.U_even, x)
        )
        x_ev = jnp.einsum("nij,nj->ni", lvl.Cinv_even, r)
        x = jnp.stack([x_ev, x], axis=1).reshape(2 * x.shape[0], K)

    return x[:m0].reshape(2 * m0, k)[:n]


def solve(H: PentaBands, b):
    """One-shot solve H x = b (same interface as penta.solve)."""
    return solve_factorized(factorize(H), b)
