"""Solver statistics CSV export (reference:
TrajectoryOptimizerStats::SaveToCsv, trajectory_optimizer_solution.h:161-184,
written by example_base.cc:323-326 as solver_stats.csv)."""
from __future__ import annotations

import numpy as np


def attach_iteration_times(stats):
    """Fill ``stats.time`` from the itimer marks captured during the last
    solve (requires ``SolverParameters.record_iteration_times`` and an
    ``itimer.reset()`` before dispatch).  Returns the updated Stats."""
    import jax

    from idto_tpu.optimizer import itimer

    # debug.callback delivery is asynchronous and block_until_ready does not
    # imply the callbacks have flushed (on the remote-TPU platform it does
    # not even imply execution finished); drain them before reading marks.
    jax.effects_barrier()
    times = itimer.collect()
    if not times:
        return stats
    t = np.full(np.asarray(stats.time).shape, np.nan)
    n = min(len(times), t.shape[0])
    t[:n] = times[:n]
    return stats.replace(time=t)


def save_stats_csv(stats, path: str) -> None:
    """Column-for-column superset of the reference's solver_stats.csv
    (TrajectoryOptimizerStats::SaveToCsv, trajectory_optimizer_solution.h:
    160-184: iter, time, cost, ls_iters, alpha, delta, q_norm, dq_norm,
    dqH_norm, trust_ratio, grad_norm, dL_dq, h_norm, merit)."""
    iters = int(stats.num_iters)
    cols = [
        ("iter", np.arange(iters)),
        ("time", np.asarray(stats.time)[:iters]),
        ("cost", np.asarray(stats.cost)[:iters]),
        ("ls_iters", np.asarray(stats.ls_iters)[:iters]),
        ("alpha", np.asarray(stats.alpha)[:iters]),
        ("delta", np.asarray(stats.delta)[:iters]),
        ("q_norm", np.asarray(stats.q_norm)[:iters]),
        ("dq_norm", np.asarray(stats.dq_norm)[:iters]),
        ("dqH_norm", np.asarray(stats.dqH_norm)[:iters]),
        ("trust_ratio", np.asarray(stats.rho)[:iters]),
        ("grad_norm", np.asarray(stats.grad_norm)[:iters]),
        ("dL_dq", np.asarray(stats.dL_dq)[:iters]),
        ("h_norm", np.asarray(stats.h_norm)[:iters]),
        ("merit", np.asarray(stats.merit)[:iters]),
    ]
    header = ",".join(name for name, _ in cols)
    data = np.stack(
        [np.asarray(col, dtype=np.float64) for _, col in cols], axis=1
    )
    np.savetxt(path, data, delimiter=",", header=header, comments="")


def save_contour_csv(model, prob, params, q, path: str,
                     i1=(1, 0), i2=(2, 0), rng=0.5, n=50) -> None:
    """2-D cost landscape over two decision variables (reference:
    SaveContourPlotDataFirstTwoVariables, trajectory_optimizer.cc:1709-1757
    writes contour_data.csv over q[1][0] x q[2][0]).

    i1/i2 are (timestep, dof) pairs; the grid spans +-rng around the
    current value.  Columns: q1, q2, L.
    """
    import jax
    import jax.numpy as jnp

    from idto_tpu.optimizer import trajectory

    t1, d1 = i1
    t2, d2 = i2
    c1 = float(q[t1, d1])
    c2 = float(q[t2, d2])
    g1 = jnp.linspace(c1 - rng, c1 + rng, n)
    g2 = jnp.linspace(c2 - rng, c2 + rng, n)

    def cost_at(a, b):
        qq = q.at[t1, d1].set(a).at[t2, d2].set(b)
        return trajectory.cost(model, prob, params.contact, qq)

    L = jax.jit(
        jax.vmap(jax.vmap(cost_at, in_axes=(None, 0)), in_axes=(0, None))
    )(g1, g2)
    A, B = np.meshgrid(np.asarray(g1), np.asarray(g2), indexing="ij")
    data = np.stack([A.ravel(), B.ravel(), np.asarray(L).ravel()], axis=1)
    np.savetxt(path, data, delimiter=",", header="q1,q2,L", comments="")


def save_lineplot_csv(model, prob, params, q, direction, path: str,
                      lo=-0.2, hi=1.2, n=100) -> None:
    """1-D cost/merit sweep L(q + alpha * dq) (reference:
    SaveLinePlotDataFirstVariable / linesearch residual dumps,
    trajectory_optimizer.cc:1649-1683, 1797-1835).  Columns: alpha, L."""
    import jax
    import jax.numpy as jnp

    from idto_tpu.optimizer import trajectory

    alphas = jnp.linspace(lo, hi, n)

    def cost_at(a):
        return trajectory.cost(
            model, prob, params.contact, q + a * direction
        )

    L = jax.jit(jax.vmap(cost_at))(alphas)
    data = np.stack([np.asarray(alphas), np.asarray(L)], axis=1)
    np.savetxt(path, data, delimiter=",", header="alpha,L", comments="")
