"""Checkpoint/resume of solver pytrees (idto_tpu.utils.checkpoint)."""
import numpy as np

from idto_tpu.utils import checkpoint as ckpt


def _make_warmstart():
    import jax.numpy as jnp

    from idto_tpu.optimizer.solver import WarmStart

    rng = np.random.default_rng(0)
    return WarmStart(
        q=jnp.asarray(rng.standard_normal((11, 3))),
        Delta=jnp.asarray(0.25),
    )


def test_save_restore_roundtrip(tmp_path):
    warm = _make_warmstart()
    path = ckpt.save(str(tmp_path / "warm"), warm)
    like = _make_warmstart()
    restored = ckpt.restore(path, like)
    np.testing.assert_allclose(np.asarray(restored.q), np.asarray(warm.q))
    np.testing.assert_allclose(
        np.asarray(restored.Delta), np.asarray(warm.Delta)
    )


def test_manager_rolls_old_checkpoints(tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    warm = _make_warmstart()
    for step in [1, 2, 3]:
        mgr.save(step, warm.replace(Delta=np.float64(step)))
    assert mgr.latest_step() == 3
    step, restored = mgr.restore_latest(warm)
    assert step == 3
    np.testing.assert_allclose(float(np.asarray(restored.Delta)), 3.0)
    # Oldest checkpoint dropped.
    assert mgr._index() == [2, 3]
