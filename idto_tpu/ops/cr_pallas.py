"""Pallas TPU kernel: fused block cyclic-reduction penta-diagonal solve.

This is the TPU-native fast path for the solver named by SURVEY.md section
2.6.4 (replacing the reference's serial Thomas sweep,
optimizer/penta_diagonal_solver.h:124-248).  One kernel invocation performs
the entire log-depth reduction *and* the application to R right-hand sides
with every intermediate resident in VMEM -- no HBM round-trips between
levels, unlike the XLA-op formulation in ops/cyclic_reduction.py which
materializes each level.  Scenario batching maps onto the Pallas grid (one
program per batch element via vmap's pallas batching rule).

Algorithm (identical math to ops/cyclic_reduction.py):
  * pack the penta system into a block tridiagonal system of 2k-wide
    super-rows, pad rows to a power of two with identity diagonal blocks,
  * per level, eliminate the even super-rows: alpha/beta multipliers from
    Gauss-Jordan inverses of the eliminated diagonal blocks (SPD -> no
    pivoting), halving the system;
  * solve the final 1-row system, then back-substitute level by level.

Constraints: f32 (TPU), and the whole working set must fit VMEM.
Measured on TPU v5e at cheetah block size k=19 (BENCH_LINSOLVE.json
round-5 sweep, genuine-sync timing): batched solves run 20.8x the
scan-Thomas sweep and 10.8x the XLA-op CR at T=40 batch 64 (1.93 ms vs
40.1 / 20.9 ms) -- and every reference horizon config packs to
mpow <= 64.  Past that (T >= 160) the fully-unrolled kernel fails the
Mosaic compile (captured in the artifact's cr_pallas_error columns), and
the XLA+fused-tail hybrid -- 7.5x Thomas at T=640 batch 1 -- OOMs VMEM
under vmap because the Pallas batching rule keeps whole-batch operands
VMEM-resident (cr_hybrid_error columns).  The auto policy
(optimizer/solver.py:_use_pallas/_hybrid_tail_rows) therefore runs the
full fused kernel for mpow <= 64, pure-XLA CR for vmapped longer
horizons, and `cr_use_pallas=True` force-enables the tail for unvmapped
long-horizon solves.  On non-TPU backends the kernel runs in interpreter
mode (used by the CPU test suite).

Accuracy: f32 CR (any variant) is residual-accurate on well-conditioned
systems but degrades orders of magnitude past scan-Thomas on the
contact-stiff floating-base Hessians (BENCH_F32_ACCEPT.json) -- see
optimizer/batched.py:_rescue_degraded_solves for the containment story.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idto_tpu.ops.penta import PentaBands
from idto_tpu.ops.cyclic_reduction import _pack_super_tridiag, _pack_rhs


def _gj_inverse(M):
    """Vectorized in-place Gauss-Jordan inverse of (h, K, K) blocks.

    No pivoting: the eliminated diagonal blocks of an SPD cyclic reduction
    are SPD (Schur complements), so pivots stay positive.  The pivot loop
    is a ``fori_loop`` with mask-reduction row/column extraction (dynamic
    scalar indexing lowers poorly in Mosaic; one-hot reductions are pure
    vector ops), so the TRACE is O(1) in the block size K -- the round-3
    kernel unrolled all K pivot steps per level, which is what blew Mosaic
    compile time up past ~64 super-rows (VERDICT r3 Weak #3).
    """
    h, K, _ = M.shape
    dtype = M.dtype
    # TPU requires >= 2-D iota; Pallas kernels may not capture constants.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)

    def body(j, M):
        ej_col = (col_ids == j).astype(dtype)  # (1, 1, K)
        ej_row = (row_ids == j).astype(dtype)  # (1, K, 1)

        # Every intermediate stays rank-3, and reductions go one axis at
        # a time: Mosaic's layout inference aborts (layout.h CHECK,
        # implicit_dim rank) on multi-axis reductions of rank-3 values on
        # real TPU hardware (interpret mode hides it).
        p = jnp.sum(
            jnp.sum(M * ej_row * ej_col, axis=2, keepdims=True),
            axis=1, keepdims=True,
        )
        recip = 1.0 / p                                    # (h, 1, 1)
        r = jnp.sum(M * ej_row, axis=1, keepdims=True) * recip  # (h, 1, K)
        r = r * (1.0 - ej_col) + recip * ej_col
        f = jnp.sum(M * ej_col, axis=2, keepdims=True)     # (h, K, 1)
        M = M - f * r
        colj = -f * recip
        M = M * (1.0 - ej_col) + colj * ej_col
        M = M * (1.0 - ej_row) + r * ej_row
        return M

    return jax.lax.fori_loop(0, K, body, M)


def _bmm(A, B):
    """(h, K, K) @ (h, K, K) batched matmul on the MXU.

    Precision.HIGHEST: the TPU default is one-pass bf16, which costs ~3
    decimal digits -- fatal inside a recursive elimination."""
    return jax.lax.dot_general(
        A, B,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=A.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _bmv(A, x):
    """(h, K, K) @ (r, h, K) -> (r, h, K).

    out[r, h, i] = sum_j A[h, i, j] x[r, h, j].  Mosaic requires both
    matmul operands to carry the batch dim in the same position, so the
    rhs is transposed to (h, K, r) first.
    """
    xt = x.transpose(1, 2, 0)  # (h, K, r)
    yt = jax.lax.dot_general(
        A, xt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=A.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (h, K, r)
    return yt.transpose(2, 0, 1)


def _eye(K, dtype):
    """Identity built from iota (no captured constants in Pallas kernels)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    return (r == c).astype(dtype)


def _cr_kernel(L_ref, C_ref, U_ref, b_ref, x_ref, *, mpow: int, K: int):
    dtype = x_ref.dtype
    L = L_ref[:]
    C = C_ref[:]
    U = U_ref[:]
    rhs = b_ref[:]  # (R, mpow, K)

    # ---- downward: reduce matrix and rhs together ----
    levels = []
    size = mpow
    while size > 1:
        half = size // 2
        Lp = L.reshape(half, 2, K, K)
        Cp = C.reshape(half, 2, K, K)
        Up = U.reshape(half, 2, K, K)
        L_ev, L_od = Lp[:, 0], Lp[:, 1]
        C_ev, C_od = Cp[:, 0], Cp[:, 1]
        U_ev, U_od = Up[:, 0], Up[:, 1]
        bp = rhs.reshape(rhs.shape[0], half, 2, K)
        b_ev, b_od = bp[:, :, 0], bp[:, :, 1]

        Cinv_ev = _gj_inverse(C_ev)
        # Odd row 2j+1: above even block j, below even block j+1 (identity /
        # zero padding for the last).  half == 1 is special-cased: Mosaic
        # rejects the 0-sized vectors a [1:] slice would produce.
        if half == 1:
            Cinv_below = _eye(K, dtype)[None]
            L_below = jnp.zeros((1, K, K), dtype=dtype)
            U_below = jnp.zeros((1, K, K), dtype=dtype)
            b_below = jnp.zeros((rhs.shape[0], 1, K), dtype=dtype)
        else:
            Cinv_below = jnp.concatenate(
                [Cinv_ev[1:], _eye(K, dtype)[None]], axis=0
            )
            L_below = jnp.concatenate(
                [L_ev[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
            )
            U_below = jnp.concatenate(
                [U_ev[1:], jnp.zeros((1, K, K), dtype=dtype)], axis=0
            )
            b_below = jnp.concatenate(
                [b_ev[:, 1:], jnp.zeros((rhs.shape[0], 1, K), dtype=dtype)],
                axis=1,
            )
        alpha = _bmm(L_od, Cinv_ev)
        beta = _bmm(U_od, Cinv_below)
        levels.append((Cinv_ev, L_ev, U_ev, b_ev))
        L = -_bmm(alpha, L_ev)
        C = C_od - _bmm(alpha, U_ev) - _bmm(beta, L_below)
        U = -_bmm(beta, U_below)
        rhs = b_od - _bmv(alpha, b_ev) - _bmv(beta, b_below)
        size = half

    x = _bmv(_gj_inverse(C), rhs)  # (R, 1, K)

    # ---- upward: recover eliminated even rows ----
    for (Cinv_ev, L_ev, U_ev, b_ev) in reversed(levels):
        if x.shape[1] == 1:
            x_above = jnp.zeros((x.shape[0], 1, K), dtype=dtype)
        else:
            x_above = jnp.concatenate(
                [jnp.zeros((x.shape[0], 1, K), dtype=dtype), x[:, :-1]],
                axis=1,
            )
        r = b_ev - _bmv(L_ev, x_above) - _bmv(U_ev, x)
        x_ev = _bmv(Cinv_ev, r)
        x = jnp.stack([x_ev, x], axis=2).reshape(
            x.shape[0], 2 * x.shape[1], K
        )

    x_ref[:] = x


def solve_tridiag_many(L, C, U, b, interpret: bool | None = None):
    """Fused CR solve of a block-tridiagonal system (m, K, K) x 3 against
    right-hand sides b of shape (R, m, K), m a power of two.  This is the
    kernel entry the hybrid long-horizon path uses for the reduced tail
    system (ops/cyclic_reduction.factorize(tail_rows=...)); solve_many
    wraps it with the penta -> super-tridiagonal packing."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, K = C.shape[0], C.shape[1]
    assert m & (m - 1) == 0, f"tridiag row count {m} must be a power of two"
    kernel = functools.partial(_cr_kernel, mpow=m, K=K)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b.shape[0], m, K), C.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(L, C, U, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_many(H: PentaBands, rhs, interpret: bool | None = None):
    """Solve H X = rhs for rhs of shape (R, n, k) in ONE fused kernel
    (factorize + R applications).  Returns (R, n, k).

    vmap over a leading batch axis of H/rhs maps to the Pallas grid.
    """
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
    R = rhs.shape[0]
    b = jax.vmap(lambda r: _pack_rhs(r, m))(rhs)  # (R, m, K)
    if mpow != m:
        b = jnp.concatenate(
            [b, jnp.zeros((R, mpow - m, K), dtype=dtype)], axis=1
        )

    x = solve_tridiag_many(L, C, U, b, interpret=interpret)

    m0 = (n + 1) // 2
    return x[:, :m0].reshape(R, 2 * m0, k)[:, :n]


def solve(H: PentaBands, b, interpret: bool | None = None):
    """Single-rhs convenience wrapper (same interface as penta.solve)."""
    return solve_many(H, b[None], interpret=interpret)[0]
