"""Benchmark: scan-Thomas vs pure-JAX cyclic reduction vs the fused Pallas
CR kernel, across horizon lengths, on the current default backend.

Writes BENCH_LINSOLVE.json at the repo root:  per (T, batch) the
milliseconds per batched solve (factorize + 1 rhs, the solver's
per-iteration unit) for each method.

Run on TPU (default backend) for the recorded artifact; runs on CPU too
(with interpret-mode Pallas, timing meaningless there).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np


def make_spd_penta_batch(B, n, k, rng, dtype):
    """Batch of SPD penta systems (same construction as the test oracle)."""
    from idto_tpu.ops import penta

    A = rng.standard_normal((B, n, k, k))
    Bb = rng.standard_normal((B, n, k, k))
    C = rng.standard_normal((B, n, k, k)) + np.eye(k) * 3 * np.sqrt(k)
    A[:, :2] = 0
    Bb[:, :1] = 0
    lower = penta.PentaBands(
        A=jnp.asarray(A, dtype=dtype), B=jnp.asarray(Bb, dtype=dtype),
        C=jnp.asarray(C, dtype=dtype),
        D=jnp.zeros((B, n, k, k), dtype=dtype),
        E=jnp.zeros((B, n, k, k), dtype=dtype),
    )

    # H = L L^T + 0.1 I, computed with the band matvec structure: build
    # via dense per batch is too slow for big n, so use band products.
    def spd_from_lower(lw):
        # (L L^T) bands: row i of L has blocks (A_i, B_i, C_i) at cols
        # i-2, i-1, i.  (L L^T)_{i,j} = sum_m L_{i,m} L_{j,m}^T.
        Ai, Bi, Ci = lw.A, lw.B, lw.C
        eye = jnp.eye(k, dtype=dtype)
        Tt = lambda X: jnp.swapaxes(X, -1, -2)
        Bm1 = jnp.concatenate([jnp.zeros((1, k, k), dtype=dtype), Bi[:-1]], 0)
        Cm1 = jnp.concatenate([jnp.zeros((1, k, k), dtype=dtype), Ci[:-1]], 0)
        Cm2 = jnp.concatenate([jnp.zeros((2, k, k), dtype=dtype), Ci[:-2]], 0)
        # (L L^T) bands from L's rows (A_i, B_i, C_i) at cols i-2, i-1, i:
        C_ = Ai @ Tt(Ai) + Bi @ Tt(Bi) + Ci @ Tt(Ci) + 0.1 * eye
        B_ = Ai @ Tt(Bm1) + Bi @ Tt(Cm1)   # (i, i-1)
        A_ = Ai @ Tt(Cm2)                  # (i, i-2)
        from idto_tpu.ops.penta import make_symmetric_from_lower

        return make_symmetric_from_lower(A_, B_, C_)

    return jax.vmap(spd_from_lower)(lower)


class CaseTimeout(Exception):
    pass


_RTT = [0.0]


def timeit(fn, *args, iters=10, budget_s=600):
    """Compile + time with a REAL device sync per call (block_until_ready
    does not synchronize on the remote-TPU platform; round-2's artifact
    recorded physically impossible rows because of it -- see
    idto_tpu/utils/timing.py).  A SIGALRM budget skips cases whose
    (remote AOT) compile stalls instead of wedging the whole sweep."""
    import signal

    from idto_tpu.utils import timing

    def _raise(signum, frame):
        raise CaseTimeout(
            f"compile/run exceeded the {budget_s}s per-case budget "
            "(Mosaic compile time blows up past ~64 packed super-rows)"
        )

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(budget_s)
    try:
        out = fn(*args)
        timing.sync(out)  # compile + warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            timing.sync(fn(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        dt = max(ts[len(ts) // 2] - _RTT[0], 0.0)
        return dt, out
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    from idto_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from idto_tpu.ops import cr_pallas, cyclic_reduction, penta
    from idto_tpu.utils import timing

    _RTT[0] = timing.measure_rtt()
    print(json.dumps({"rtt_ms": round(_RTT[0] * 1e3, 3)}), flush=True)

    backend = jax.default_backend()
    dtype = jnp.float32
    k = 19  # mini cheetah nq
    rng = np.random.default_rng(0)
    results = []

    thomas = jax.jit(jax.vmap(lambda H, b: penta.solve(H, b)))
    crjax = jax.jit(jax.vmap(lambda H, b: cyclic_reduction.solve(H, b)))
    pallas = jax.jit(
        jax.vmap(lambda H, b: cr_pallas.solve_many(H, b[None])[0])
    )
    # Hybrid: XLA levels down to 64 super-rows, fused Pallas kernel for
    # the deep tail -- the solver's long-horizon path
    # (optimizer/solver.py:_hybrid_tail_rows).
    crhybrid = jax.jit(
        jax.vmap(
            lambda H, b: cyclic_reduction.solve_factorized(
                cyclic_reduction.factorize(H, tail_rows=64), b
            )
        )
    )

    for T in (20, 40, 160, 640):
        n = T + 1
        for B in (1, 64):
            H = make_spd_penta_batch(B, n, k, rng, dtype)
            b = jnp.asarray(
                rng.standard_normal((B, n, k)), dtype=dtype
            )
            row = {"T": T, "batch": B, "k": k, "backend": backend}
            x_ref = None
            for name, fn in (
                ("thomas_scan", thomas), ("cr_jax", crjax),
                ("cr_pallas", pallas), ("cr_hybrid", crhybrid),
            ):
                try:
                    dt, out = timeit(fn, H, b)
                    out_np = np.asarray(out[0], dtype=np.float64)
                    if x_ref is None:
                        x_ref = out_np
                        err = 0.0
                    else:
                        err = float(
                            np.abs(out_np - x_ref).max()
                            / max(1e-12, np.abs(x_ref).max())
                        )
                    assert np.isfinite(out_np).all(), f"{name} not finite"
                    row[f"{name}_ms"] = round(dt * 1e3, 3)
                    row[f"{name}_relerr_vs_thomas"] = round(err, 9)
                except Exception as e:  # noqa: BLE001 (record and continue)
                    row[f"{name}_ms"] = None
                    # repr, not str: several compiler exceptions stringify
                    # to "" (round-4 artifact recorded empty error columns).
                    row[f"{name}_error"] = repr(e)[:300]
            results.append(row)
            print(json.dumps(row), flush=True)
            out_path = os.path.join(os.path.dirname(__file__), "..",
                                    "BENCH_LINSOLVE.json")
            with open(out_path, "w") as f:
                json.dump({"results": results}, f, indent=1)
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
