"""Component-leading 3x3 / 3-vector algebra for the SoA pipeline.

Operands are shaped ``(3, 3, ...)`` (matrices) and ``(3, ...)`` (vectors)
with the instance axes TRAILING -- the transpose of ``models/mat3``.
Every contraction is an explicit multiply-add over component slices, so
all ops are elementwise over the huge trailing axes (full VPU lanes) and
there are no tiny trailing dims to pad.
"""
from __future__ import annotations

import jax.numpy as jnp


def mul(A, B):
    """A @ B for (3, 3, ...) operands."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    A[i, 0] * B[0, j] + A[i, 1] * B[1, j] + A[i, 2] * B[2, j]
                    for j in range(3)
                ],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )


def mul_t(A, B):
    """A @ B^T."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    A[i, 0] * B[j, 0] + A[i, 1] * B[j, 1] + A[i, 2] * B[j, 2]
                    for j in range(3)
                ],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )


def t_mul(A, B):
    """A^T @ B."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    A[0, i] * B[0, j] + A[1, i] * B[1, j] + A[2, i] * B[2, j]
                    for j in range(3)
                ],
                axis=0,
            )
            for i in range(3)
        ],
        axis=0,
    )


def mv(A, v):
    """A @ v for (3, 3, ...) x (3, ...)."""
    return jnp.stack(
        [A[i, 0] * v[0] + A[i, 1] * v[1] + A[i, 2] * v[2] for i in range(3)],
        axis=0,
    )


def tmv(A, v):
    """A^T @ v."""
    return jnp.stack(
        [A[0, i] * v[0] + A[1, i] * v[1] + A[2, i] * v[2] for i in range(3)],
        axis=0,
    )


def cross(a, b):
    """a x b for (3, ...) operands."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def dot(a, b):
    """<a, b> over the leading component axis: (3, ...) x (3, ...) -> (...)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def norm(a, eps=1e-12):
    """Guarded |a| over the leading component axis."""
    return jnp.sqrt(dot(a, a) + eps)


def transpose(A):
    return jnp.swapaxes(A, 0, 1)


def from_aos_mat(M):
    """(..., 3, 3) -> (3, 3, ...)."""
    return jnp.moveaxis(M, (-2, -1), (0, 1))


def to_aos_mat(M):
    """(3, 3, ...) -> (..., 3, 3)."""
    return jnp.moveaxis(M, (0, 1), (-2, -1))


def from_aos_vec(v):
    """(..., 3) -> (3, ...)."""
    return jnp.moveaxis(v, -1, 0)


def to_aos_vec(v):
    """(3, ...) -> (..., 3)."""
    return jnp.moveaxis(v, 0, -1)
