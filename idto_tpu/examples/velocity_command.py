"""Velocity-command (joystick-analog) closed-loop MPC demo.

The reference drives the mini cheetah MPC from a gamepad
(python_examples/mini_cheetah_mpc.py:134-229: left stick -> body-frame
vx/vy, right stick -> yaw rate, nominal integrated from the current pose).
This headless analog takes a scripted command SCHEDULE on the command line
and runs the same loop: jitted velocity-command MPC step + on-device
simulation segments, with the command as a traced array (changing it never
recompiles).

Usage:
    python -m idto_tpu.examples.velocity_command mini_cheetah \
        --schedule "0: 0.3 0 0; 2: 0.3 0 0.5; 4: 0 0 0" \
        --sim-time 6 [--playback out.html]

Each schedule entry is "t_start: vx vy wz" (body-frame m/s, rad/s).
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_schedule(text: str):
    """'0: 0.3 0 0; 2: 0 0 0.5' -> [(0.0, (0.3, 0, 0)), (2.0, (0, 0, 0.5))]."""
    out = []
    for entry in text.split(";"):
        entry = entry.strip()
        if not entry:
            continue
        t_str, cmd_str = entry.split(":")
        vals = [float(x) for x in cmd_str.replace(",", " ").split()]
        assert len(vals) == 3, f"need 'vx vy wz' in {entry!r}"
        out.append((float(t_str), tuple(vals)))
    out.sort(key=lambda e: e[0])
    assert out, "empty schedule"
    return out


def command_at(schedule, t):
    cmd = schedule[0][1]
    for t0, c in schedule:
        if t >= t0:
            cmd = c
    return cmd


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("example", nargs="?", default="mini_cheetah",
                        help="a floating-base example (default mini_cheetah)")
    parser.add_argument("--schedule", default="0: 0.3 0 0",
                        help="'t: vx vy wz; t: vx vy wz; ...'")
    parser.add_argument("--sim-time", type=float, default=None,
                        help="override the YAML sim_time")
    parser.add_argument("--playback", default=None, metavar="OUT.html",
                        help="export the simulated trajectory")
    args = parser.parse_args(argv)
    schedule = parse_schedule(args.schedule)

    import jax
    import jax.numpy as jnp

    from idto_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from idto_tpu.examples.registry import load_example, load_sim_plant
    from idto_tpu.mpc.controller import (
        make_mpc_params,
        mpc_initialize,
        mpc_step_velocity_command,
    )
    from idto_tpu.mpc.simulator import simulate_segment

    model, cfg, prob, params, q_guess = load_example(args.example)
    assert cfg.mpc, f"{args.example} has no MPC configuration"
    sim_model, sim_contact = load_sim_plant(args.example, params)
    sim_model = sim_model if sim_model is not None else model
    sim_contact = sim_contact if sim_contact is not None else params.contact

    replan = 1.0 / cfg.controller_frequency
    h = cfg.sim_time_step
    substeps = max(1, int(round(replan / h)))
    sim_time = args.sim_time if args.sim_time is not None else cfg.sim_time
    num_replans = int(sim_time / replan)
    mpc_params = make_mpc_params(params, cfg.mpc_iters)
    Kp = jnp.asarray(np.asarray(cfg.Kp, dtype=np.float64))
    Kd = jnp.asarray(np.asarray(cfg.Kd, dtype=np.float64))

    carry, _ = jax.jit(mpc_initialize)(model, prob, params, q_guess)
    step_fn = jax.jit(
        lambda m, p, c, x0, t, cmd: mpc_step_velocity_command(
            m, p, mpc_params, c, x0, t, cmd
        )
    )
    sim_fn = jax.jit(
        lambda m, stored, q0, v0, t: simulate_segment(
            m, sim_contact, h, substeps, stored, Kp, Kd, q0, v0, t,
            cfg.feed_forward,
        )
    )

    q, v = prob.q_init, prob.v_init
    q_log = [np.asarray(q)[None]]
    solve_times = []
    for k in range(num_replans):
        t_now = k * replan
        cmd = jnp.asarray(command_at(schedule, t_now), dtype=q.dtype)
        x0 = jnp.concatenate([q, v])
        t0 = time.perf_counter()
        carry, sol = jax.block_until_ready(
            step_fn(model, prob, carry, x0, jnp.asarray(t_now), cmd)
        )
        solve_times.append(time.perf_counter() - t0)
        q, v, log = jax.block_until_ready(
            sim_fn(sim_model, carry.stored, q, v, jnp.asarray(t_now))
        )
        q_log.append(np.asarray(log[0]))

    qs = np.concatenate(q_log)
    mean_ms = 1e3 * float(np.mean(solve_times[1:])) if len(solve_times) > 1 \
        else 1e3 * solve_times[0]
    base_xy = qs[-1, 4:6] - qs[0, 4:6]
    print(f"[{args.example}] {num_replans} replans, "
          f"mean solve {mean_ms:.2f} ms ({1e3 / max(mean_ms, 1e-9):.1f} Hz)")
    print(f"base displacement: dx={base_xy[0]:+.3f} m dy={base_xy[1]:+.3f} m")
    if args.playback:
        from idto_tpu.utils.playback import export_html

        # Subsample the 1 kHz sim log to ~50 fps for a compact file.
        stride = max(1, int(round(0.02 / h)))
        out = export_html(model, qs[::stride], h * stride, args.playback,
                          title=f"{args.example} velocity-command MPC")
        print(f"playback written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
