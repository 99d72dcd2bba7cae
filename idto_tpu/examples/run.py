"""Example runner CLI: the analog of the reference's per-example binaries
(TrajOptExample::RunExample, examples/example_base.cc:28-57).

Usage:
    python -m idto_tpu.examples.run spinner [--test] [--mpc]
    python -m idto_tpu.examples.run --list
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("example", nargs="?", help="example name")
    parser.add_argument("--list", action="store_true", help="list examples")
    parser.add_argument(
        "--test", action="store_true",
        help="smoke-test mode: 10 iterations, no MPC (reference --test flag)",
    )
    parser.add_argument("--mpc", action="store_true", help="run closed-loop MPC")
    parser.add_argument("--stats-csv", default=None,
                        help="write per-iteration stats to this CSV file")
    parser.add_argument("--verbose", action="store_true",
                        help="print the per-iteration table (reference "
                             "verbose console output)")
    parser.add_argument("--contour-csv", default=None,
                        help="write a 2-D cost-landscape CSV over the "
                             "first two decision variables (reference "
                             "save_contour_plot_data)")
    parser.add_argument("--lineplot-csv", default=None,
                        help="write a 1-D cost sweep along the total solve "
                             "displacement sol.q - q_guess (reference "
                             "lineplot dumps sweep the last search "
                             "direction instead)")
    parser.add_argument("--quadratic-csv", default=None,
                        help="write per-iteration quadratic-model data "
                             "(reference quadratic_data.csv, "
                             "trajectory_optimizer.cc:1759-1795)")
    parser.add_argument("--linesearch-csv", default=None,
                        help="write the linesearch residual sweep over "
                             "alpha in [-0.2, 1.2] along the final Newton "
                             "direction (reference SaveLinesearchResidual, "
                             "trajectory_optimizer.cc:1797-1835)")
    parser.add_argument("--print-debug-data", action="store_true",
                        help="print per-iteration Hessian condition "
                             "numbers (reference print_debug_data, "
                             "trajectory_optimizer.cc:2499-2507)")
    parser.add_argument("--profile", action="store_true",
                        help="print the host profiler table "
                             "(reference TableOfAverages)")
    parser.add_argument("--platform", default=None,
                        choices=("cpu", "tpu"),
                        help="force the JAX backend (a machine-level "
                             "sitecustomize may pin a remote-TPU platform "
                             "that overrides JAX_PLATFORMS; this flag and "
                             "the env var both win over it here)")
    parser.add_argument("--live", default=None, type=int, nargs="?",
                        const=8765, metavar="PORT",
                        help="with --mpc: serve a live WebGL viewer on "
                             "PORT (default 8765) and stream every "
                             "replan's planned trajectory to it over a "
                             "websocket (reference: live meshcat "
                             "publishing, example_base.cc:81-82)")
    parser.add_argument("--playback", default=None, metavar="OUT.html",
                        help="export the solved trajectory as a standalone "
                             "WebGL playback HTML (reference meshcat "
                             "StaticHtml, example_base.cc:173-181); also "
                             "honors the YAML play_optimal_trajectory / "
                             "play_initial_guess / play_target_trajectory "
                             "flags by writing <name>_{optimal,guess,"
                             "target}.html next to OUT.html")
    args = parser.parse_args(argv)

    from idto_tpu.examples.registry import example_names, load_example

    if args.list or not args.example:
        print("available examples:", ", ".join(example_names()))
        return 0

    import os

    import jax

    # Respect an explicit backend choice.  The env var alone is not enough
    # when a sitecustomize pre-imports jax with its own platform pin, so
    # re-apply it through jax.config.  f64 on CPU matches the reference's
    # double-precision solves; the TPU backend stays f32.
    platform = args.platform or os.environ.get("JAX_PLATFORMS")
    if platform:
        jax.config.update("jax_platforms", platform.lower())
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    model, cfg, prob, params, q_guess = load_example(
        args.example, test_mode=args.test
    )
    print(
        f"[{args.example}] nq={model.nq} nv={model.nv} nu={model.nu} "
        f"T={prob.num_steps} dt={prob.dt} "
        f"pairs={len(model.geoms.pairs)}"
    )

    if args.mpc and cfg.mpc and not args.test:
        from idto_tpu.examples.registry import load_sim_plant
        from idto_tpu.mpc.runner import run_mpc

        sim_model, sim_contact = load_sim_plant(args.example, params)
        viewer = None
        on_replan = None
        if args.live is not None:
            from idto_tpu.utils.liveview import LiveViewer

            viewer = LiveViewer(model, dt=prob.dt, port=args.live)
            print(f"live viewer: http://localhost:{viewer.port}")

            def on_replan(t_now, q_plan, _v=viewer):
                _v.publish(q_plan)

        try:
            result = run_mpc(model, cfg, prob, params, q_guess,
                             sim_model=sim_model, sim_contact=sim_contact,
                             on_replan=on_replan)
        finally:
            if viewer is not None:
                viewer.close()
        print(
            f"MPC: {result.num_solves} solves, "
            f"mean solve time {1e3 * result.mean_solve_time:.2f} ms "
            f"({1.0 / max(result.mean_solve_time, 1e-9):.1f} Hz)"
        )
        return 0

    from idto_tpu.optimizer import itimer
    from idto_tpu.optimizer.solver import solve
    from idto_tpu.optimizer.stats_io import attach_iteration_times

    want_csv = args.stats_csv or (cfg.save_solver_stats_csv and not args.test)

    t0 = time.time()
    solve_jit = jax.jit(solve)
    sol, stats, warm = jax.block_until_ready(
        solve_jit(model, prob, params, q_guess)
    )
    t_compile = time.time() - t0

    t0 = time.time()
    sol, stats, warm = jax.block_until_ready(
        solve_jit(model, prob, params, q_guess)
    )
    t_solve = time.time() - t0

    if want_csv:
        # Separate pass with per-iteration callback timing for the CSV
        # `time` column: the ordered callbacks add a host round-trip per
        # iteration, so they must not contaminate the timed t_solve above
        # (each duration also carries that transport floor -- see
        # itimer.collect).
        params_rec = params.replace(record_iteration_times=True)
        solve_rec = jax.jit(solve)
        # Warm the recorded executable first so iteration 0's duration is
        # not the compile time, then capture a clean window.
        jax.block_until_ready(solve_rec(model, prob, params_rec, q_guess))
        itimer.reset()
        jax.block_until_ready(solve_rec(model, prob, params_rec, q_guess))
        stats = attach_iteration_times(stats)

    iters = int(stats.num_iters)
    costs = np.asarray(stats.cost)
    if args.verbose:
        # Post-hoc per-iteration table (reference prints this live,
        # trajectory_optimizer.cc:2486-2492, 2570-2583; the solve here runs
        # entirely on device, so the table is reconstructed from stats).
        hdr = (f"{'iter':>5} {'cost':>12} {'Delta':>10} {'rho':>10} "
               f"{'|dq|':>10} {'|g|':>10} {'merit':>12}")
        for k in range(iters):
            if k % 50 == 0:
                print(hdr)
            print(
                f"{k:5d} {costs[k]:12.6g} "
                f"{np.asarray(stats.delta)[k]:10.4g} "
                f"{np.asarray(stats.rho)[k]:10.4g} "
                f"{np.asarray(stats.dq_norm)[k]:10.4g} "
                f"{np.asarray(stats.grad_norm)[k]:10.4g} "
                f"{np.asarray(stats.merit)[k]:12.6g}"
            )
    print(f"iterations:     {iters}")
    print(f"initial cost:   {costs[0]:.6g}")
    print(f"final cost:     {costs[max(iters - 1, 0)]:.6g}")
    print(f"solve time:     {t_solve * 1e3:.1f} ms (compile {t_compile:.1f} s)")
    print(f"final q[T]:     {np.asarray(sol.q[-1])}")
    tau = np.asarray(sol.tau)
    print(f"max |tau|:      {np.abs(tau).max():.4g}")
    reason = int(np.asarray(stats.convergence_reason))
    names = [name for bit, name in
             [(1, "cost_reduction"), (2, "gradient"), (4, "state_change")]
             if reason & bit]
    print(f"convergence:    {'+'.join(names) if names else 'max_iterations'}")

    if want_csv:
        from idto_tpu.optimizer.stats_io import save_stats_csv

        path = args.stats_csv or "solver_stats.csv"
        save_stats_csv(stats, path)
        print(f"stats written to {path}")

    if args.contour_csv:
        from idto_tpu.optimizer.stats_io import save_contour_csv

        save_contour_csv(model, prob, params, sol.q, args.contour_csv)
        print(f"contour data written to {args.contour_csv}")

    if args.lineplot_csv:
        from idto_tpu.optimizer.stats_io import save_lineplot_csv

        direction = np.asarray(sol.q) - np.asarray(q_guess)
        save_lineplot_csv(
            model, prob, params, jax.numpy.asarray(q_guess),
            jax.numpy.asarray(direction), args.lineplot_csv,
        )
        print(f"lineplot data written to {args.lineplot_csv}")

    if args.quadratic_csv:
        from idto_tpu.optimizer.debug_dump import save_quadratic_csv

        save_quadratic_csv(
            model, prob, params, q_guess, args.quadratic_csv, n_iters=iters
        )
        print(f"quadratic-model data written to {args.quadratic_csv}")

    if args.linesearch_csv:
        from idto_tpu.optimizer.debug_dump import (
            save_linesearch_residual_csv,
        )

        # Sweep along the final Newton direction at the solved iterate --
        # the post-mortem direction the reference dumps on linesearch
        # failure (trajectory_optimizer.cc:2315-2326).
        save_linesearch_residual_csv(
            model, prob, params, sol.q, warm.dqH, args.linesearch_csv,
        )
        print(f"linesearch residual written to {args.linesearch_csv}")

    if args.print_debug_data:
        from idto_tpu.optimizer.debug_dump import (
            print_condition_numbers,
            replay_iterations,
        )

        for r in replay_iterations(model, prob, params, q_guess, iters):
            print(f"iter {r.k}:")
            print_condition_numbers(r)

    if args.playback:
        import os

        from idto_tpu.utils.playback import export_html

        base, ext = os.path.splitext(args.playback)
        out = export_html(model, sol.q, prob.dt, args.playback,
                          title=f"{args.example} (optimal)")
        print(f"playback written to {out}")
        # YAML play_* flags (reference example_base.cc:107-124) select
        # additional recordings.
        extras = []
        if cfg.play_initial_guess:
            extras.append((q_guess, "guess"))
        if cfg.play_target_trajectory:
            extras.append((prob.q_nom, "target"))
        for qs, tag in extras:
            out = export_html(model, qs, prob.dt, f"{base}_{tag}{ext}",
                              title=f"{args.example} ({tag})")
            print(f"playback written to {out}")

    if args.profile:
        from idto_tpu.utils.profiler import table_of_averages

        print(table_of_averages())
    return 0


if __name__ == "__main__":
    sys.exit(main())
