"""Resource lookup (analog of utils/find_resource.h in the reference).

Maps ``idto_tpu/...`` paths to the installed package directory so example
configs and model assets resolve regardless of the working directory.
"""
from __future__ import annotations

import os

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_resource(path: str) -> str:
    """Resolve a path like ``idto_tpu/assets/spinner_friction.urdf`` (or
    ``assets/spinner_friction.urdf``) to an absolute filename."""
    rel = path
    if rel.startswith("idto_tpu/"):
        rel = rel[len("idto_tpu/") :]
    full = os.path.join(_PKG_ROOT, rel)
    if not os.path.exists(full):
        raise FileNotFoundError(
            f"Resource '{path}' not found (looked at {full})"
        )
    return full
