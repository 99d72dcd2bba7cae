"""Smoke tests for the research-debug dumps (reference parity: per-
iteration quadratic-model CSV trajectory_optimizer.cc:1759-1795, the
linesearch residual sweep :1797-1835, and print_debug_data condition
numbers :2499-2507)."""
import numpy as np
import jax.numpy as jnp
import pytest

from idto_tpu.optimizer.debug_dump import (
    print_condition_numbers,
    replay_iterations,
    save_linesearch_residual_csv,
    save_quadratic_csv,
)
from idto_tpu.optimizer.problem import (
    ProblemDefinition,
    SolverParameters,
    linear_interp_nominal,
)
from idto_tpu.optimizer.solver import solve_trust_region

from tests.test_dynamics import make_acrobot


def acrobot_problem(T=6, dt=0.05):
    model = make_acrobot()
    q0 = np.array([0.1, 0.0])
    qT = np.array([np.pi, 0.0])
    q_nom = linear_interp_nominal(q0, qT, T)
    prob = ProblemDefinition(
        num_steps=T,
        dt=dt,
        q_init=jnp.asarray(q0),
        v_init=jnp.zeros(2),
        q_nom=jnp.asarray(q_nom),
        v_nom=jnp.zeros((T + 1, 2)),
        Qq=jnp.array([1.0, 1.0]),
        Qv=jnp.array([0.1, 0.1]),
        R=jnp.array([0.01, 0.01]),
        Qf_q=jnp.array([100.0, 100.0]),
        Qf_v=jnp.array([1.0, 1.0]),
    )
    q_guess = jnp.asarray(q_nom)
    return model, prob, q_guess


class TestQuadraticCsv:
    @pytest.mark.slow  # solve compile; test_sweep_columns keeps the CSV schema fast
    def test_columns_and_rows(self, tmp_path):
        model, prob, q_guess = acrobot_problem()
        params = SolverParameters(max_iterations=3, check_convergence=False,
                                  equality_constraints=False)
        path = tmp_path / "quadratic_data.csv"
        save_quadratic_csv(model, prob, params, q_guess, str(path), n_iters=3)
        lines = path.read_text().strip().split("\n")
        header = lines[0]
        # Reference header layout (trajectory_optimizer.cc:1763-1764).
        assert header.replace(" ", "") == (
            "iter,q1,q2,dq1,dq2,Delta,cost,g1,g2,H11,H12,H21,H22,"
            "g_norm,H_norm"
        )
        data = np.loadtxt(str(path), delimiter=",", skiprows=1)
        assert data.shape == (3, 15)
        # iters increment; Delta positive; cost finite and decreasing-ish.
        np.testing.assert_array_equal(data[:, 0], [0, 1, 2])
        assert np.all(data[:, 5] > 0)
        assert np.all(np.isfinite(data))
        # H11 is the diagonal of an SPD Hessian block.
        assert np.all(data[:, 9] > 0)

    def test_rejects_nq1(self, tmp_path):
        from tests.test_optimizer import pendulum_problem

        model, prob = pendulum_problem(T=3)
        params = SolverParameters(equality_constraints=False)
        with pytest.raises(ValueError):
            save_quadratic_csv(
                model, prob, params, prob.q_nom, str(tmp_path / "x.csv"),
                n_iters=1,
            )


class TestLinesearchResidual:
    def test_sweep_columns(self, tmp_path):
        model, prob, q_guess = acrobot_problem()
        params = SolverParameters(max_iterations=5, check_convergence=False,
                                  equality_constraints=False)
        sol, stats, warm = solve_trust_region(model, prob, params, q_guess)
        path = tmp_path / "linesearch_data.csv"
        save_linesearch_residual_csv(
            model, prob, params, sol.q, warm.dqH, str(path)
        )
        lines = path.read_text().strip().split("\n")
        assert lines[0].replace(" ", "") == "alpha,cost,gradient,dq,L_prime"
        data = np.loadtxt(str(path), delimiter=",", skiprows=1)
        # alpha in [-0.2, 1.2] step 0.01 (reference :1802-1804) -> 141 rows.
        assert data.shape == (141, 5)
        np.testing.assert_allclose(data[0, 0], -0.2, atol=1e-12)
        np.testing.assert_allclose(data[-1, 0], 1.2, atol=1e-9)
        assert np.all(np.isfinite(data))
        # residual at alpha = 0 is L(q) - L(q) = 0.
        i0 = np.argmin(np.abs(data[:, 0]))
        assert abs(data[i0, 1]) < 1e-8 * max(1.0, abs(data[:, 1]).max())
        # dq column is the constant direction norm.
        assert np.allclose(data[:, 3], data[0, 3])


class TestConditionNumbers:
    @pytest.mark.slow  # replay re-solves per iteration
    def test_replay_and_print(self, capsys):
        model, prob, q_guess = acrobot_problem()
        params = SolverParameters(max_iterations=2, check_convergence=False,
                                  equality_constraints=False)
        recs = list(replay_iterations(model, prob, params, q_guess, 2))
        assert len(recs) == 2
        for r in recs:
            print_condition_numbers(r)
        out = capsys.readouterr().out
        assert out.count("condition_number =") == 2
        assert out.count("condition_number_scaled =") == 2
        # Scaling should not worsen conditioning on this problem.
        conds = [float(l.split("=")[1]) for l in out.splitlines()
                 if l.startswith("condition_number ")]
        assert all(np.isfinite(c) and c >= 1.0 for c in conds)
