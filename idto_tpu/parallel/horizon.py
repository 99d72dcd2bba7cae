"""Horizon-sharded (sequence-parallel) penta-diagonal solve.

SURVEY.md section 2.6.4: the reference's Thomas sweep is strictly
sequential over the T+1 block rows (penta_diagonal_solver.h:124-248); the
TPU-native replacement shards the horizon across a device mesh and runs
*distributed* block cyclic reduction:

  * the penta system is packed into a block tridiagonal system of 2k-wide
    super-rows (exactly as ops/cyclic_reduction.py) and padded so every
    device owns a power-of-two contiguous slice,
  * each reduction level eliminates the even-local-index rows; the only
    cross-device dependency is the *first* even row of the next device
    (the "below" neighbor of each device's last kept row) -- one backward
    ``ppermute`` halo exchange per level, riding ICI,
  * after log2(rows-per-device) levels each device holds ONE super-row;
    the tiny P-row reduced tridiagonal system is ``all_gather``-ed and
    solved redundantly on every device (no extra round trip),
  * back-substitution unwinds the levels with one forward ``ppermute``
    per level (each device's first recovered row needs the last solved
    row of the previous device).

Communication: 2 log2(m/P) ppermutes of one (K,K)-block row + one
all_gather of a (P,K,K) system -- O(log T) latency instead of O(T)
sequential steps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from idto_tpu.ops.cyclic_reduction import _pack_rhs, _pack_super_tridiag
from idto_tpu.ops.penta import PentaBands


def _inv(M):
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    return jnp.linalg.solve(M, eye)


def _tridiag_thomas(L, C, U, b):
    """Sequential block-tridiagonal solve for the tiny reduced system
    (P rows; runs redundantly on every device).  Static Python loop."""
    m = C.shape[0]
    cs, ds = [], []
    Cp = C[0]
    bp = b[0]
    cs.append(Cp)
    ds.append(bp)
    Us = [U[i] for i in range(m)]
    for i in range(1, m):
        w = L[i] @ _inv(cs[-1])
        cs.append(C[i] - w @ Us[i - 1])
        ds.append(b[i] - w @ ds[-1])
    x = [None] * m
    x[m - 1] = jnp.linalg.solve(cs[m - 1], ds[m - 1])
    for i in range(m - 2, -1, -1):
        x[i] = jnp.linalg.solve(cs[i], ds[i] - Us[i] @ x[i + 1])
    return jnp.stack(x)


def solve_sharded(
    H: PentaBands, b, mesh: Mesh, axis: str = "horizon"
):
    """Solve H x = b with the block rows sharded over ``mesh[axis]``.

    H bands: (n, k, k); b: (n, k).  Requires n large enough that each
    device owns at least one super-row pair (n >= 2 * mesh size).
    """
    nP = mesh.shape[axis]
    n, k = H.n, H.k
    if nP == 1:
        from idto_tpu.ops import cyclic_reduction

        return cyclic_reduction.solve(H, b)

    L, C, U = _pack_super_tridiag(H)
    m = C.shape[0]
    K = C.shape[1]
    dtype = C.dtype
    assert m >= nP, f"horizon too short to shard: {m} super-rows < {nP} devices"

    # Pad so rows-per-device is a power of two (>= 1).
    s0 = -(-m // nP)  # ceil
    s0 = 1 << (s0 - 1).bit_length()
    mpad = s0 * nP
    if mpad != m:
        padn = mpad - m
        eye = jnp.tile(jnp.eye(K, dtype=dtype), (padn, 1, 1))
        zero = jnp.zeros((padn, K, K), dtype=dtype)
        L = jnp.concatenate([L, zero], axis=0)
        C = jnp.concatenate([C, eye], axis=0)
        U = jnp.concatenate([U, zero], axis=0)
    rhs = _pack_rhs(b, m)
    if mpad != m:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((mpad - m, K), dtype=dtype)], axis=0
        )

    fwd = [(d, d + 1) for d in range(nP - 1)]   # to next device
    bwd = [(d + 1, d) for d in range(nP - 1)]   # to previous device

    def local_solve(Ll, Cl, Ul, bl):
        s = Ll.shape[0]
        levels = []
        # ---- downward reduction ----
        while s > 1:
            L_ev, L_od = Ll[0::2], Ll[1::2]
            C_ev, C_od = Cl[0::2], Cl[1::2]
            U_ev, U_od = Ul[0::2], Ul[1::2]
            b_ev, b_od = bl[0::2], bl[1::2]
            Cinv_ev = _inv(C_ev)

            # Halo: the last local odd row's "below" even row lives on the
            # next device; send each device's FIRST even row backward.
            # The last device receives zeros -- safe, its last U_od is the
            # global zero band / padding.
            def halo_bwd(X):
                return jax.lax.ppermute(X[0:1], axis, perm=bwd)

            Cinv_below = jnp.concatenate(
                [Cinv_ev[1:], halo_bwd(Cinv_ev)], axis=0
            )
            L_below = jnp.concatenate([L_ev[1:], halo_bwd(L_ev)], axis=0)
            U_below = jnp.concatenate([U_ev[1:], halo_bwd(U_ev)], axis=0)
            b_below = jnp.concatenate([b_ev[1:], halo_bwd(b_ev)], axis=0)

            alpha = L_od @ Cinv_ev
            beta = U_od @ Cinv_below
            levels.append((Cinv_ev, L_ev, U_ev, b_ev))
            Ll = -(alpha @ L_ev)
            Cl = C_od - alpha @ U_ev - beta @ L_below
            Ul = -(beta @ U_below)
            bl = (
                b_od
                - jnp.einsum("nij,nj->ni", alpha, b_ev)
                - jnp.einsum("nij,nj->ni", beta, b_below)
            )
            s //= 2

        # ---- reduced P-row system, solved redundantly ----
        Lg = jax.lax.all_gather(Ll[0], axis)  # (P, K, K)
        Cg = jax.lax.all_gather(Cl[0], axis)
        Ug = jax.lax.all_gather(Ul[0], axis)
        bg = jax.lax.all_gather(bl[0], axis)
        xg = _tridiag_thomas(Lg, Cg, Ug, bg)  # (P, K)
        idx = jax.lax.axis_index(axis)
        x = jax.lax.dynamic_slice_in_dim(xg, idx, 1, axis=0)  # (1, K)

        # ---- upward back-substitution ----
        for (Cinv_ev, L_ev, U_ev, b_ev) in reversed(levels):
            # Even local row j needs x_odd[j-1]; j = 0 needs the previous
            # device's LAST solved row -- one forward ppermute.
            halo = jax.lax.ppermute(x[-1:], axis, perm=fwd)
            x_above = jnp.concatenate([halo, x[:-1]], axis=0)
            r = (
                b_ev
                - jnp.einsum("nij,nj->ni", L_ev, x_above)
                - jnp.einsum("nij,nj->ni", U_ev, x)
            )
            x_ev = jnp.einsum("nij,nj->ni", Cinv_ev, r)
            x = jnp.stack([x_ev, x], axis=1).reshape(2 * x.shape[0], K)
        return x

    sharded = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    x = sharded(L, C, U, rhs)
    m0 = (n + 1) // 2
    return x[:m0].reshape(2 * m0, k)[:n]


def solve_trust_region_horizon_sharded(
    model, prob, params, q_guess, mesh: Mesh, axis: str = "horizon"
):
    """Full trust-region solve with the HORIZON axis sharded over the mesh
    (sequence parallelism; SURVEY section 5 "long-context").

    Implementation is the scaling-book recipe: annotate the horizon-indexed
    inputs with NamedSharding and let GSPMD partition the vmapped per-step
    physics, derivative assembly, and the log-depth cyclic-reduction solve,
    inserting ICI collectives where the +-2-block stencils cross shard
    boundaries.  Validated bitwise-close against the unsharded solve
    (tests/test_horizon.py).

    Requires (T+1) divisible by the mesh size.  Use
    LinearSolverType.CYCLIC_REDUCTION: the scan-Thomas path is sequential
    over the horizon and would serialize every level through one device.
    """
    import jax as _jax
    from jax.sharding import NamedSharding

    n_knots = prob.num_steps + 1
    nP = mesh.shape[axis]
    if n_knots % nP != 0:
        raise ValueError(
            f"horizon knots ({n_knots}) must divide the mesh ({nP}); pad T"
        )
    shT = NamedSharding(mesh, P(axis))
    prob_sh = prob.replace(
        q_nom=_jax.device_put(prob.q_nom, shT),
        v_nom=_jax.device_put(prob.v_nom, shT),
    )
    q_sh = _jax.device_put(q_guess, shT)

    from idto_tpu.optimizer.solver import solve_trust_region

    return solve_trust_region(model, prob_sh, params, q_sh)
