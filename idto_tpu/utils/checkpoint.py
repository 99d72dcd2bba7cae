"""Checkpoint / resume for batch solve and MPC jobs.

The reference has no disk checkpointing; its in-memory analog is the
``WarmStart`` object persisted between MPC re-solves
(reference: optimizer/warm_start.h:23-76).  For TPU batch jobs (thousands
of scenarios, long campaigns) this module adds real disk checkpointing of
any solver pytree (WarmStart, MpcCarry, batched solutions) via orbax when
available, with a numpy ``.npz`` fallback.

Pytrees are flattened with ``jax.tree_util``; static dataclass fields are
not stored (re-supply the same model/params when restoring).
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

try:  # pragma: no cover - environment dependent
    import orbax.checkpoint as _ocp
except Exception:  # pragma: no cover
    _ocp = None


def _leaf_paths(tree):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any, step: int | None = None) -> str:
    """Save a pytree of arrays.  Returns the path written.

    With orbax available and ``path`` ending in a directory-style name,
    uses an orbax PyTreeCheckpointer; otherwise writes a flat ``.npz``.
    """
    import jax

    leaves, _ = _leaf_paths(tree)
    # Leaves stored under zero-padded index keys: checkpoint formats that
    # round-trip dicts in key order (orbax) then restore in leaf order.
    arrays = {f"leaf_{i:06d}": np.asarray(x) for i, x in enumerate(leaves)}

    if _ocp is not None and not path.endswith(".npz"):
        ckpt = _ocp.PyTreeCheckpointer()
        target = os.path.abspath(
            path if step is None else os.path.join(path, str(step))
        )
        ckpt.save(target, arrays, force=True)
        return target

    out = path if path.endswith(".npz") else path + ".npz"
    np.savez(out, **arrays)
    return out


def restore(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save`.

    ``like`` provides the tree structure (and static fields); leaf values
    are replaced by the stored arrays.
    """
    import jax

    leaves_like, treedef = _leaf_paths(like)

    if _ocp is not None and os.path.isdir(path):
        ckpt = _ocp.PyTreeCheckpointer()
        data = ckpt.restore(path)
    else:
        npz_path = path if path.endswith(".npz") else path + ".npz"
        data = np.load(npz_path)
    leaves_new = [data[f"leaf_{i:06d}"] for i in range(len(leaves_like))]
    return jax.tree_util.tree_unflatten(treedef, leaves_new)


class CheckpointManager:
    """Rolling checkpoints for long batch campaigns: keeps the latest
    ``max_to_keep`` steps under ``directory`` with a small JSON index."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._index_path = os.path.join(self.directory, "index.json")

    def _index(self) -> list[int]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return []

    def _write_index(self, steps: list[int]) -> None:
        with open(self._index_path, "w") as f:
            json.dump(steps, f)

    def save(self, step: int, tree: Any) -> str:
        path = save(os.path.join(self.directory, f"step_{step}"), tree)
        steps = sorted(set(self._index() + [step]))
        while len(steps) > self.max_to_keep:
            drop = steps.pop(0)
            for suffix in ("", ".npz"):
                p = os.path.join(self.directory, f"step_{drop}{suffix}")
                if os.path.isfile(p):
                    os.remove(p)
                elif os.path.isdir(p):
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)
        self._write_index(steps)
        return path

    def latest_step(self) -> int | None:
        steps = self._index()
        return steps[-1] if steps else None

    def restore_latest(self, like: Any) -> tuple[int, Any] | None:
        step = self.latest_step()
        if step is None:
            return None
        path = os.path.join(self.directory, f"step_{step}")
        return step, restore(path, like)
