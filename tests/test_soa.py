"""Parity tests pinning the SoA (structure-of-arrays, instance-axis-
trailing) physics pipeline to the AoS reference implementation on every
registered example model.  The AoS pipeline is itself pinned to
hand-derived/Euler-Lagrange oracles (tests/test_parity.py), so agreement
here transfers that evidence to the fast path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idto_tpu.models import dynamics as dyn_aos
from idto_tpu.models import kinematics as kin_aos
from idto_tpu.soa import dynamics as dyn_soa
from idto_tpu.soa import kinematics as kin_soa

# A structurally diverse subset: revolute chains, planar, floating base
# with quaternions, prismatic, fixed links.  (Full-registry sweep lives in
# the slow tier.)
FAST_MODELS = ["pendulum", "acrobot", "spinner", "hopper", "mini_cheetah"]


def _load(name):
    from idto_tpu.examples.registry import load_example

    model, cfg, prob, params, q_guess = load_example(name)
    return model, prob


def _rand_states(model, N=5, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((N, model.nq)) * 0.5
    # Keep quaternions away from zero norm.
    from idto_tpu.models.model import JointType

    for j in range(model.num_joints):
        if JointType(model.joint_types[j]) == JointType.FLOATING:
            qs = model.q_starts[j]
            q[:, qs : qs + 4] += np.array([1.0, 0.0, 0.0, 0.0])
    v = rng.standard_normal((N, model.nv)) * 0.3
    a = rng.standard_normal((N, model.nv)) * 0.2
    return jnp.asarray(q), jnp.asarray(v), jnp.asarray(a)


@pytest.mark.parametrize("name", FAST_MODELS)
class TestSoaParity:
    def test_forward_kinematics(self, name):
        model, _ = _load(name)
        q, _, _ = _rand_states(model)
        R_a, p_a = jax.vmap(lambda qq: kin_aos.forward_kinematics(model, qq))(q)
        R_s, p_s = kin_soa.forward_kinematics(model, q.T)
        np.testing.assert_allclose(
            np.transpose(np.asarray(R_s), (3, 2, 0, 1)), np.asarray(R_a),
            atol=1e-12, err_msg=name,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(p_s), (2, 1, 0)),
            np.asarray(p_a), atol=1e-12,
        )

    def test_velocity_maps(self, name):
        model, _ = _load(name)
        q, v, _ = _rand_states(model)
        qd_a = jax.vmap(lambda qq, vv: kin_aos.v_to_qdot(model, qq, vv))(q, v)
        qd_s = kin_soa.v_to_qdot(model, q.T, v.T)
        np.testing.assert_allclose(np.asarray(qd_s).T, np.asarray(qd_a),
                                   atol=1e-12)
        v_a = jax.vmap(lambda qq, qd: kin_aos.qdot_to_v(model, qq, qd))(q, qd_a)
        v_s = kin_soa.qdot_to_v(model, q.T, qd_s)
        np.testing.assert_allclose(np.asarray(v_s).T, np.asarray(v_a),
                                   atol=1e-12)

    def test_nplus(self, name):
        model, _ = _load(name)
        q, _, _ = _rand_states(model)
        Np_a = jax.vmap(lambda qq: kin_aos.nplus_matrix(model, qq))(q)
        Np_s = kin_soa.nplus_matrix(model, q.T)
        np.testing.assert_allclose(
            np.transpose(np.asarray(Np_s), (2, 0, 1)), np.asarray(Np_a),
            atol=1e-12,
        )

    def test_body_velocities(self, name):
        model, _ = _load(name)
        q, v, _ = _rand_states(model)
        R_a, p_a, w_a, pd_a = jax.vmap(
            lambda qq, vv: kin_aos.body_velocities(model, qq, vv)
        )(q, v)
        R_s, p_s, w_s, pd_s = kin_soa.body_velocities(model, q.T, v.T)
        for aos, soa in ((w_a, w_s), (pd_a, pd_s)):
            np.testing.assert_allclose(
                np.transpose(np.asarray(soa), (2, 1, 0)),
                np.asarray(aos), atol=1e-11,
            )

    def test_inverse_dynamics(self, name):
        model, _ = _load(name)
        q, v, a = _rand_states(model)
        tau_a = jax.vmap(
            lambda qq, vv, aa: dyn_aos.inverse_dynamics(model, qq, vv, aa)
        )(q, v, a)
        tau_s = dyn_soa.inverse_dynamics(model, q.T, v.T, a.T)
        np.testing.assert_allclose(np.asarray(tau_s).T, np.asarray(tau_a),
                                   atol=1e-10, err_msg=name)

    def test_inverse_dynamics_with_wrenches(self, name):
        model, _ = _load(name)
        q, v, a = _rand_states(model)
        rng = np.random.default_rng(7)
        tq = rng.standard_normal((5, model.num_links, 3))
        fr = rng.standard_normal((5, model.num_links, 3))
        tau_a = jax.vmap(
            lambda qq, vv, aa, t, f: dyn_aos.inverse_dynamics(
                model, qq, vv, aa, (t, f)
            )
        )(q, v, a, jnp.asarray(tq), jnp.asarray(fr))
        # SoA wrench layout: (3, nl, N)
        tq_s = jnp.moveaxis(jnp.asarray(tq), (0, 1, 2), (2, 1, 0))
        fr_s = jnp.moveaxis(jnp.asarray(fr), (0, 1, 2), (2, 1, 0))
        tau_s = dyn_soa.inverse_dynamics(model, q.T, v.T, a.T, (tq_s, fr_s))
        np.testing.assert_allclose(np.asarray(tau_s).T, np.asarray(tau_a),
                                   atol=1e-10, err_msg=name)


CONTACT_MODELS = ["spinner", "hopper", "mini_cheetah", "airhockey",
                  "allegro_hand", "jaco"]


@pytest.mark.parametrize("name", CONTACT_MODELS)
class TestSoaContact:
    def test_supports(self, name):
        from idto_tpu.soa.contact import supports_soa

        model, _ = _load(name)
        assert supports_soa(model)

    def test_contact_wrenches_parity(self, name):
        from idto_tpu.contact.force import contact_wrenches as cw_aos
        from idto_tpu.soa.contact import contact_wrenches as cw_soa
        from idto_tpu.examples.registry import load_example

        model, cfg, prob, params, q_guess = load_example(name)
        # States near the guess trajectory so contacts are realistic
        # (forces at random far-field states are all ~0, a weak test).
        rng = np.random.default_rng(3)
        N = 4
        qs = np.asarray(q_guess)[
            rng.integers(0, q_guess.shape[0], size=N)
        ] + 0.03 * rng.standard_normal((N, model.nq))
        vs = 0.5 * rng.standard_normal((N, model.nv))
        q = jnp.asarray(qs)
        v = jnp.asarray(vs)
        (tq_a, fr_a) = jax.vmap(
            lambda qq, vv: cw_aos(model, qq, vv, params.contact)
        )(q, v)
        tq_s, fr_s = cw_soa(model, q.T, v.T, params.contact)
        np.testing.assert_allclose(
            np.transpose(np.asarray(tq_s), (2, 1, 0)), np.asarray(tq_a),
            atol=1e-9, err_msg=name,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(fr_s), (2, 1, 0)), np.asarray(fr_a),
            atol=1e-9, err_msg=name,
        )
        # The states must actually produce nonzero contact forces for this
        # parity check to mean anything.
        assert np.abs(np.asarray(fr_a)).max() > 1e-6, (
            f"{name}: test states produced no contact force"
        )

    def test_step_tau_parity(self, name):
        from idto_tpu.optimizer.trajectory import step_tau as st_aos
        from idto_tpu.soa.contact import step_tau as st_soa
        from idto_tpu.examples.registry import load_example

        model, cfg, prob, params, q_guess = load_example(name)
        rng = np.random.default_rng(5)
        N = 4
        qs = np.asarray(q_guess)[
            rng.integers(0, q_guess.shape[0], size=N)
        ] + 0.02 * rng.standard_normal((N, model.nq))
        vs = 0.4 * rng.standard_normal((N, model.nv))
        acc = 0.4 * rng.standard_normal((N, model.nv))
        q, v, a = jnp.asarray(qs), jnp.asarray(vs), jnp.asarray(acc)
        tau_a = jax.vmap(
            lambda qq, vv, aa: st_aos(model, params.contact, qq, vv, aa)
        )(q, v, a)
        tau_s = st_soa(model, params.contact, q.T, v.T, a.T)
        np.testing.assert_allclose(
            np.asarray(tau_s).T, np.asarray(tau_a), atol=1e-8, err_msg=name
        )


# mini_cheetah's AoS-side vmapped partials is the largest graph this
# module compiles (minutes on a cold 2-core host); its rollout/partials
# pins run slow-tier, with pendulum + spinner keeping the fast-tier pin
# and the cheaper per-component cheetah pins above staying fast.
ROLLOUT_MODELS = [
    "pendulum",
    "spinner",
    pytest.param("mini_cheetah", marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name", ROLLOUT_MODELS)
class TestSoaRolloutPartials:
    def _setup(self, name, B=3, seed=11):
        from idto_tpu.examples.registry import load_example

        model, cfg, prob, params, q_guess = load_example(name)
        rng = np.random.default_rng(seed)
        qs = np.asarray(q_guess)[None] + 0.02 * rng.standard_normal(
            (B,) + q_guess.shape
        )
        return model, prob, params, jnp.asarray(qs)

    def test_rollout_parity(self, name):
        from idto_tpu.optimizer import trajectory as traj_aos
        from idto_tpu.soa import rollout as roll_soa

        model, prob, params, qs = self._setup(name)
        v_a = jax.vmap(lambda q: traj_aos.velocities(model, prob, q))(qs)
        v_s = roll_soa.velocities(model, prob, qs)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_a),
                                   atol=1e-10, err_msg=name)
        tau_a = jax.vmap(
            lambda q: traj_aos.generalized_forces(
                model, prob, params.contact, q
            )
        )(qs)
        tau_s, _ = roll_soa.generalized_forces(model, prob, params.contact, qs)
        np.testing.assert_allclose(np.asarray(tau_s), np.asarray(tau_a),
                                   atol=1e-8, err_msg=name)
        L_a = jax.vmap(
            lambda q: traj_aos.cost(model, prob, params.contact, q)
        )(qs)
        L_s = roll_soa.cost(model, prob, params.contact, qs)
        np.testing.assert_allclose(np.asarray(L_s), np.asarray(L_a),
                                   rtol=1e-10, err_msg=name)

    def test_partials_parity(self, name):
        from idto_tpu.optimizer.partials import id_partials as idp_aos
        from idto_tpu.optimizer.partials import nplus_stack as nps_aos
        from idto_tpu.soa.partials import (
            id_partials_batched,
            nplus_stack_batched,
        )

        model, prob, params, qs = self._setup(name)
        pa = jax.vmap(
            lambda q: idp_aos(model, prob, params.contact, q)
        )(qs)
        ps = id_partials_batched(model, prob, params.contact, qs)
        for fa, fs, lbl in zip(pa, ps, ("dqm", "dqt", "dqp")):
            np.testing.assert_allclose(
                np.asarray(fs), np.asarray(fa), atol=2e-8,
                err_msg=f"{name}:{lbl}",
            )
        na = jax.vmap(lambda q: nps_aos(model, q))(qs)
        ns = nplus_stack_batched(model, qs)
        np.testing.assert_allclose(np.asarray(ns), np.asarray(na), atol=1e-12)
