"""Multi-host scaling layer (SURVEY 2.6.3).  True multi-process runs need
real hosts; these tests validate the single-process degradation, the mesh
layout rule (horizon axis innermost = ICI), and global-array construction
on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idto_tpu.examples.registry import load_example
from idto_tpu.parallel import multihost
from idto_tpu.parallel.batching import broadcast_problem, solve_batch


def test_initialize_single_process_noop():
    assert multihost.initialize() is False
    assert jax.process_count() == 1


def test_mesh_layout_horizon_innermost():
    mesh = multihost.make_global_mesh(sp=4)
    assert mesh.axis_names == ("scenario", "horizon")
    assert mesh.shape["horizon"] == 4
    assert mesh.shape["scenario"] == len(jax.devices()) // 4
    # Horizon groups are CONSECUTIVE devices (ICI-adjacent under the
    # process-major device ordering).
    grid = np.asarray(mesh.devices)
    ids = np.asarray([[d.id for d in row] for row in grid])
    for row in ids:
        assert list(row) == list(range(row[0], row[0] + 4))


def test_mesh_rejects_indivisible_sp():
    with pytest.raises(AssertionError):
        multihost.make_global_mesh(sp=3)


@pytest.mark.slow
def test_solve_batch_global_matches_vmap():
    """Global scenario-sharded solve == plain vmap on the same batch."""
    model, cfg, prob, params, q_guess = load_example("spinner",
                                                     test_mode=True)
    batch = 8
    probs = broadcast_problem(prob, batch)
    dq = 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (batch, model.nq), dtype=q_guess.dtype
    )
    probs = probs.replace(q_init=probs.q_init + dq)
    qgs = (
        jnp.broadcast_to(q_guess, (batch,) + q_guess.shape)
        + dq[:, None, :]
    )

    mesh = multihost.make_global_mesh(sp=1)
    sol_g, stats_g, warm_g, mean_cost = multihost.solve_batch_global(
        model, probs, params, qgs, mesh
    )
    sol_v, stats_v, _ = jax.jit(
        lambda m, p, prm, qg: solve_batch(m, p, prm, qg)
    )(model, probs, params, qgs)
    np.testing.assert_allclose(
        np.asarray(sol_g.q), np.asarray(sol_v.q), rtol=1e-8, atol=1e-10
    )
    assert np.isfinite(float(mean_cost))


def test_shard_scenarios_from_local_roundtrip():
    mesh = multihost.make_global_mesh(sp=1)
    x = np.arange(8 * 3, dtype=np.float64).reshape(8, 3)
    g = multihost.shard_scenarios_from_local(mesh, x)
    assert g.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(g), x)
