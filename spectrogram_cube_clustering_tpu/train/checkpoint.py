"""Orbax checkpointing.

The reference only ever saves model weights (.pt state_dicts, SURVEY.md §5
"Checkpoint / resume") and cannot resume training. Here checkpoints are
orbax directories carrying arbitrary pytrees — params alone (reference
artifact names like AEC_Params_Final / DEC_Params_Initial map to
subdirectories), or full train state including optimizer moments for
preemption-safe resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree: Any) -> str:
    """Save a pytree checkpoint at `path` (created, must not exist)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(tree))
    ckpt.wait_until_finished()
    return path


def restore(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; `template` provides structure/dtypes."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if template is not None:
        template = jax.tree.map(np.asarray, jax.device_get(template))
        return ckpt.restore(path, template)
    return ckpt.restore(path)
