"""Solver statistics CSV export (reference:
TrajectoryOptimizerStats::SaveToCsv, trajectory_optimizer_solution.h:161-184,
written by example_base.cc:323-326 as solver_stats.csv)."""
from __future__ import annotations

import numpy as np


def save_stats_csv(stats, path: str) -> None:
    iters = int(stats.num_iters)
    cols = [
        ("iter", np.arange(iters)),
        ("cost", np.asarray(stats.cost)[:iters]),
        ("Delta", np.asarray(stats.delta)[:iters]),
        ("rho", np.asarray(stats.rho)[:iters]),
        ("q_norm", np.asarray(stats.q_norm)[:iters]),
        ("dq_norm", np.asarray(stats.dq_norm)[:iters]),
        ("dqH_norm", np.asarray(stats.dqH_norm)[:iters]),
        ("grad_norm", np.asarray(stats.grad_norm)[:iters]),
        ("dL_dq", np.asarray(stats.dL_dq)[:iters]),
        ("h_norm", np.asarray(stats.h_norm)[:iters]),
        ("merit", np.asarray(stats.merit)[:iters]),
    ]
    header = ",".join(name for name, _ in cols)
    data = np.stack([col for _, col in cols], axis=1)
    np.savetxt(path, data, delimiter=",", header=header, comments="")
