"""Generate the committed golden files in goldens/ used by
tests/test_parity.py.

  * cheetah_id.npz -- mini-cheetah inverse dynamics tau for a fixed,
    seeded (q, v, a).  Regenerating after any convention change will show a
    diff; the committed file pins the conventions that the independent
    Euler-Lagrange oracle (test_parity.lagrangian_tau) has validated.
  * spinner_T40.npz -- the spinner example's T=40 solve trajectory
    (solution q/tau and the per-iteration cost curve), locking the whole
    optimizer pipeline as a regression.

Run from the repo root:  python scripts/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from idto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
)

SPINNER_GOLDEN_ITERS = 40


def cheetah_id_golden():
    from idto_tpu.examples.registry import get_example
    from idto_tpu.models.dynamics import inverse_dynamics

    model = get_example("mini_cheetah").build().finalize()
    rng = np.random.RandomState(7)
    q = np.zeros(model.nq)
    quat = rng.randn(4)
    q[0:4] = quat / np.linalg.norm(quat)
    q[4:7] = [0.1, -0.2, 0.35]
    q[7:] = 0.4 * rng.randn(model.nq - 7)
    v = 0.6 * rng.randn(model.nv)
    a = 1.5 * rng.randn(model.nv)
    tau = np.asarray(inverse_dynamics(
        model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(a)
    ))
    path = os.path.join(GOLDEN_DIR, "cheetah_id.npz")
    np.savez(path, q=q, v=v, a=a, tau=tau)
    print(f"wrote {path}  (tau norm {np.linalg.norm(tau):.6f})")


def spinner_solve_golden():
    from idto_tpu.examples.registry import load_example
    from idto_tpu.optimizer.solver import solve

    model, cfg, prob, params, q_guess = load_example("spinner")
    params = params.replace(max_iterations=SPINNER_GOLDEN_ITERS)
    sol, stats, _ = jax.jit(solve)(model, prob, params, q_guess)
    n = int(stats.num_iters)
    path = os.path.join(GOLDEN_DIR, "spinner_T40.npz")
    np.savez(
        path,
        q=np.asarray(sol.q),
        v=np.asarray(sol.v),
        tau=np.asarray(sol.tau),
        cost=np.asarray(stats.cost),
        num_iters=n,
        max_iterations=SPINNER_GOLDEN_ITERS,
    )
    print(
        f"wrote {path}  (iters {n}, cost "
        f"{float(np.asarray(stats.cost)[0]):.6g} -> "
        f"{float(np.asarray(stats.cost)[max(n - 1, 0)]):.6g})"
    )


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    cheetah_id_golden()
    spinner_solve_golden()
