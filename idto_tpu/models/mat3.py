"""Component-form 3x3 matrix / 3-vector algebra.

Why not ``A @ B``: the spatial-algebra hot path operates on tensors shaped
``(..., 3, 3)`` with several leading batch axes (links, horizon, scenarios,
AD tangents).  On TPU these tiny trailing dims (a) pad catastrophically
into the (8, 128) register tile, and (b) high-rank transpose+dot patterns
have crashed the XLA:TPU algebraic simplifier outright (RET_CHECK in
HloOptimize observed on batched FK).  Writing the 3x3 contractions as
explicit multiply-adds over component slices keeps everything elementwise
over the batch axes -- VPU-shaped, fusion-friendly, and dot-free.

All functions broadcast over arbitrary leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp


def mul(A, B):
    """A @ B for (..., 3, 3) operands, as multiply-adds."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                A[..., i, 0] * B[..., 0, j]
                + A[..., i, 1] * B[..., 1, j]
                + A[..., i, 2] * B[..., 2, j]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mul_t(A, B):
    """A @ B^T."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                A[..., i, 0] * B[..., j, 0]
                + A[..., i, 1] * B[..., j, 1]
                + A[..., i, 2] * B[..., j, 2]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def t_mul(A, B):
    """A^T @ B."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(
                A[..., 0, i] * B[..., 0, j]
                + A[..., 1, i] * B[..., 1, j]
                + A[..., 2, i] * B[..., 2, j]
            )
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def mv(A, v):
    """A @ v for (..., 3, 3) x (..., 3)."""
    return jnp.stack(
        [
            A[..., i, 0] * v[..., 0]
            + A[..., i, 1] * v[..., 1]
            + A[..., i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def tmv(A, v):
    """A^T @ v."""
    return jnp.stack(
        [
            A[..., 0, i] * v[..., 0]
            + A[..., 1, i] * v[..., 1]
            + A[..., 2, i] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def cross(a, b):
    """a x b for (..., 3) operands (jnp.cross is fine but this keeps the
    module self-contained and stack-based)."""
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def transpose(A):
    return jnp.swapaxes(A, -1, -2)
