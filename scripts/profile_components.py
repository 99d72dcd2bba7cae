"""Per-component TPU timing for the mini_cheetah GN iteration.

Times each stage of one Gauss-Newton iteration (batch-of-scenarios) in
isolation to find where device time goes: inverse-dynamics partials,
Hessian assembly, penta factorize+solve, dogleg, merit/rollout.
"""
import time

import jax
import jax.numpy as jnp

from idto_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from idto_tpu.examples.registry import load_example
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.hessian import (
    gauss_newton_hessian,
    gradient_from_partials,
)
from idto_tpu.optimizer.partials import id_partials, nplus_stack
from idto_tpu.ops import penta


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.2f} ms")
    return out


def main(batch=256):
    model, cfg, prob, params, q_guess = load_example("mini_cheetah")
    contact = params.contact
    key = jax.random.PRNGKey(0)
    dq = 0.01 * jax.random.normal(key, (batch, model.nq), dtype=q_guess.dtype)
    q = jnp.broadcast_to(q_guess, (batch,) + q_guess.shape) + dq[:, None, :]
    print(f"platform={jax.devices()[0].platform} batch={batch} "
          f"T={prob.num_steps} nq={model.nq} nv={model.nv}")

    vb = lambda f: jax.jit(jax.vmap(f))

    f_vel = vb(lambda qq: trajectory.velocities(model, prob, qq))
    v = timeit("velocities", f_vel, q)

    def tau_of(qq):
        vv = trajectory.velocities(model, prob, qq)
        aa = trajectory.accelerations(prob, vv)
        return jax.vmap(
            lambda qn, vn, an: trajectory.step_tau(model, contact, qn, vn, an)
        )(qq[1:], vv[1:], aa)

    tau = timeit("inverse dynamics (tau)", vb(tau_of), q)

    f_cost = vb(lambda qq: trajectory.cost(model, prob, contact, qq))
    timeit("cost", f_cost, q)

    f_parts = vb(lambda qq: id_partials(model, prob, contact, qq))
    parts = timeit("id_partials (jacfwd)", f_parts, q)

    f_np = vb(lambda qq: nplus_stack(model, qq))
    npl = timeit("nplus_stack", f_np, q)

    f_hess = vb(lambda p, nn: gauss_newton_hessian(model, prob, p, nn))
    H = timeit("hessian assembly", f_hess, parts, npl)

    f_grad = vb(
        lambda p, nn, qq, vv, tt: gradient_from_partials(
            model, prob, p, nn, qq, vv, tt
        )
    )
    g = timeit("gradient assembly", f_grad, parts, npl, q, v, tau)

    f_fact = vb(penta.factorize)
    fact = timeit("penta factorize", f_fact, H)

    f_solve = vb(penta.solve_factorized)
    timeit("penta back-substitute", f_solve, fact, g)

    # Full single iteration for reference.
    from idto_tpu.parallel.batching import broadcast_problem, solve_batch

    probs = broadcast_problem(prob, batch)
    probs = probs.replace(q_init=probs.q_init + dq)
    prm = params.replace(max_iterations=1, check_convergence=False)
    f_full = jax.jit(lambda m, p, qg: solve_batch(m, p, prm, qg)[0].q)
    timeit("FULL 1-iter solve", f_full, model, probs, q)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
