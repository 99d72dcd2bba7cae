"""Optimizer core tests: cost, gradient, GN Hessian, dogleg, and the
pendulum swingup end-to-end oracle (reference:
optimizer/test/trajectory_optimizer_test.cc:434-491 expects convergence to
|q_T - pi| < 1e-3 within ~20 Gauss-Newton iterations).
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from idto_tpu.contact.force import ContactParams
from idto_tpu.models.model import JointType, ModelBuilder
from idto_tpu.ops import penta
from idto_tpu.optimizer import trajectory
from idto_tpu.optimizer.hessian import gauss_newton_hessian
from idto_tpu.optimizer.partials import id_partials, nplus_stack
from idto_tpu.optimizer.problem import (
    ProblemDefinition,
    SolverParameters,
    linear_interp_nominal,
)
from idto_tpu.optimizer.solver import solve_trust_region

from tests.test_dynamics import make_acrobot, make_pendulum


def pendulum_problem(T=20, dt=0.05):
    """The reference's PendulumSwingup problem
    (trajectory_optimizer_test.cc:434-461)."""
    model = make_pendulum()
    q_nom = np.full((T + 1, 1), np.pi)
    v_nom = np.zeros((T + 1, 1))
    prob = ProblemDefinition(
        num_steps=T,
        dt=dt,
        q_init=jnp.array([0.1]),
        v_init=jnp.array([0.0]),
        q_nom=jnp.asarray(q_nom),
        v_nom=jnp.asarray(v_nom),
        Qq=jnp.array([1.0]),
        Qv=jnp.array([0.1]),
        R=jnp.array([0.01]),
        Qf_q=jnp.array([1000.0]),
        Qf_v=jnp.array([1.0]),
    )
    return model, prob


class TestCostGradient:
    def test_cost_hand_computed(self):
        """Cost against a hand-computed value with simple data (analog of
        trajectory_optimizer_test.cc:1155-1313)."""
        model, prob = pendulum_problem(T=3, dt=0.1)
        contact = ContactParams()
        q = jnp.zeros((4, 1))
        v = trajectory.velocities(model, prob, q)
        np.testing.assert_allclose(np.asarray(v), 0.0)
        # Stationary at 0 with target pi: only velocity + control + terminal
        # costs; v == 0 so velocity cost 0; tau = m g l sin(0) = 0.
        L = trajectory.cost(model, prob, contact, q)
        # Running q-cost at t=0..2 plus terminal cost (v == 0, tau == 0).
        expected = 0.1 * 3 * np.pi**2 * 1.0 + 1000.0 * np.pi**2
        np.testing.assert_allclose(float(L), expected, rtol=1e-12)

    def test_gradient_matches_fd(self):
        model, prob = pendulum_problem(T=8)
        contact = ContactParams()
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((9, 1)) * 0.1)
        q = q.at[0].set(prob.q_init)
        g = trajectory.gradient(model, prob, contact, q)
        eps = 1e-6
        for t in range(1, 9):
            qp = q.at[t, 0].add(eps)
            qm = q.at[t, 0].add(-eps)
            fd = (
                trajectory.cost(model, prob, contact, qp)
                - trajectory.cost(model, prob, contact, qm)
            ) / (2 * eps)
            np.testing.assert_allclose(float(g[t, 0]), float(fd), rtol=1e-5)
        np.testing.assert_allclose(float(g[0, 0]), 0.0)


class TestGaussNewtonHessian:
    def _gn_via_residuals(self, model, prob, contact, q):
        """Dense 2 J^T J from the stacked weighted residual vector --
        an independent construction of the same GN approximation."""
        dt = prob.dt

        def residuals(qq):
            v = trajectory.velocities(model, prob, qq)
            tau = trajectory.generalized_forces(model, prob, contact, qq)
            rq = jnp.sqrt(dt * prob.Qq) * (qq[:-1] - prob.q_nom[:-1])
            rv = jnp.sqrt(dt * prob.Qv) * (v[:-1] - prob.v_nom[:-1])
            rt = jnp.sqrt(dt * prob.R) * tau
            rqT = jnp.sqrt(prob.Qf_q) * (qq[-1] - prob.q_nom[-1])
            rvT = jnp.sqrt(prob.Qf_v) * (v[-1] - prob.v_nom[-1])
            return jnp.concatenate(
                [rq.ravel(), rv.ravel(), rt.ravel(), rqT, rvT]
            )

        J = jax.jacrev(residuals)(q)
        J = J.reshape(J.shape[0], -1)
        H = 2.0 * J.T @ J
        nq = model.nq
        H = H.at[:nq, :].set(0.0).at[:, :nq].set(0.0)
        H = H.at[:nq, :nq].set(jnp.eye(nq, dtype=q.dtype))
        return np.asarray(H)

    def test_band_assembly_vs_residual_jacobian(self):
        for model, prob, qscale in [
            (*pendulum_problem(T=6), 0.5),
        ]:
            contact = ContactParams()
            rng = np.random.default_rng(1)
            q = jnp.asarray(
                rng.standard_normal((prob.num_steps + 1, model.nq)) * qscale
            )
            parts = id_partials(model, prob, contact, q)
            npl = nplus_stack(model, q)
            H = gauss_newton_hessian(model, prob, parts, npl)
            dense = np.asarray(penta.to_dense(H))
            expected = self._gn_via_residuals(model, prob, contact, q)
            np.testing.assert_allclose(dense, expected, rtol=1e-8, atol=1e-10)

    def test_band_assembly_acrobot(self):
        model = make_acrobot()
        T = 5
        prob = ProblemDefinition(
            num_steps=T,
            dt=0.05,
            q_init=jnp.array([0.1, 0.2]),
            v_init=jnp.array([0.0, 0.0]),
            q_nom=jnp.asarray(np.tile([np.pi, 0.0], (T + 1, 1))),
            v_nom=jnp.zeros((T + 1, 2)),
            Qq=jnp.array([1.0, 1.0]),
            Qv=jnp.array([0.1, 0.2]),
            R=jnp.array([0.01, 0.02]),
            Qf_q=jnp.array([10.0, 10.0]),
            Qf_v=jnp.array([1.0, 1.0]),
        )
        contact = ContactParams()
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((T + 1, 2)) * 0.3)
        parts = id_partials(model, prob, contact, q)
        npl = nplus_stack(model, q)
        H = gauss_newton_hessian(model, prob, parts, npl)
        dense = np.asarray(penta.to_dense(H))
        expected = TestGaussNewtonHessian._gn_via_residuals(
            self, model, prob, contact, q
        )
        np.testing.assert_allclose(dense, expected, rtol=1e-8, atol=1e-10)
        # SPD check
        assert np.all(np.linalg.eigvalsh(dense) > 0)


class TestPendulumSwingup:
    def test_swingup_converges(self):
        model, prob = pendulum_problem()
        params = SolverParameters(
            max_iterations=20,
            scaling=True,
            equality_constraints=False,
            Delta0=1e-1,
            verbose=False,
        )
        q_guess = jnp.asarray(
            linear_interp_nominal([0.1], [0.1], prob.num_steps)
        )
        sol, stats, warm = jax.jit(
            lambda qg: solve_trust_region(model, prob, params, qg)
        )(q_guess)
        qT = float(sol.q[-1, 0])
        assert abs(qT - np.pi) < 1e-3, f"final angle {qT}"
        costs = np.asarray(stats.cost)
        valid = costs[~np.isnan(costs)]
        # Cost non-increasing over iterations (trust region only accepts
        # improving steps).
        assert np.all(np.diff(valid) <= 1e-9)

    @pytest.mark.slow
    def test_unscaled_also_converges(self):
        model, prob = pendulum_problem()
        params = SolverParameters(
            max_iterations=60,
            scaling=False,
            equality_constraints=False,
            Delta0=1e-1,
            verbose=False,
        )
        q_guess = jnp.full((prob.num_steps + 1, 1), 0.1)
        sol, stats, _ = solve_trust_region(model, prob, params, q_guess)
        assert abs(float(sol.q[-1, 0]) - np.pi) < 1e-3


class TestDenseAndExactHessian:
    """Dense-LDLT fallback and exact-Hessian testing paths (reference:
    solver_parameters.h:67-72 kDenseLdlt; trajectory_optimizer.cc:1465-1499
    exact Hessian; trajectory_optimizer_test.cc:496-701 compares GN vs exact
    Hessian on the pendulum)."""

    @pytest.mark.slow  # two full solve compiles (fast tier: VERDICT r4 item 6)
    def test_dense_solver_matches_penta(self):
        from idto_tpu.optimizer.problem import LinearSolverType

        model, prob = pendulum_problem(T=10)
        q0 = jnp.asarray(
            linear_interp_nominal(np.array([0.1]), np.array([np.pi]), 10)
        )
        params = SolverParameters(max_iterations=12, check_convergence=False)
        sol_p, _, _ = jax.jit(
            lambda m, p, qg: solve_trust_region(m, p, params, qg)
        )(model, prob, q0)
        params_d = params.replace(linear_solver=LinearSolverType.DENSE_LDLT)
        sol_d, _, _ = jax.jit(
            lambda m, p, qg: solve_trust_region(m, p, params_d, qg)
        )(model, prob, q0)
        np.testing.assert_allclose(
            np.asarray(sol_d.q), np.asarray(sol_p.q), rtol=1e-8, atol=1e-8
        )

    @pytest.mark.slow  # exact-Hessian jacfwd graph is the suite's largest pendulum compile
    def test_exact_hessian_close_to_gn_near_solution(self):
        """Near a minimum of a mildly nonlinear problem the exact Hessian
        and the GN Hessian agree to leading order: one exact-Hessian step
        from the GN solution barely moves it."""
        model, prob = pendulum_problem(T=8)
        q0 = jnp.asarray(
            linear_interp_nominal(np.array([0.1]), np.array([np.pi]), 8)
        )
        params = SolverParameters(max_iterations=30, check_convergence=False)
        sol, _, _ = jax.jit(
            lambda m, p, qg: solve_trust_region(m, p, params, qg)
        )(model, prob, q0)
        params_e = params.replace(exact_hessian=True, max_iterations=2)
        sol_e, _, _ = jax.jit(
            lambda m, p, qg: solve_trust_region(m, p, params_e, qg)
        )(model, prob, sol.q)
        assert (
            np.abs(np.asarray(sol_e.q) - np.asarray(sol.q)).max() < 1e-4
        )

    @pytest.mark.slow
    def test_exact_hessian_matches_ad_of_gradient(self):
        """The dense exact Hessian equals jacfwd of the cost gradient with
        the q_0 block pinned (pendulum: nq == nv, no quaternions, so the
        assembled gradient is the exact cost gradient)."""
        from idto_tpu.optimizer.solver import _exact_hessian_dense

        model, prob = pendulum_problem(T=5)
        rng = np.random.default_rng(0)
        q = jnp.asarray(0.3 * rng.standard_normal((6, 1)))
        params = SolverParameters()
        Hd = _exact_hessian_dense(model, prob, params, q)

        def cost_flat(qf):
            return trajectory.cost(
                model, prob, params.contact, qf.reshape(6, 1)
            )

        Href = jax.hessian(cost_flat)(q.reshape(-1))
        Href = Href.at[:1, :].set(0.0).at[:, :1].set(0.0)
        Href = Href.at[0, 0].set(1.0)
        np.testing.assert_allclose(
            np.asarray(Hd), np.asarray(Href), rtol=1e-10, atol=1e-10
        )
