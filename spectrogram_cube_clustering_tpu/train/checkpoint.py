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
    """Save a pytree checkpoint at `path`, overwriting an existing one
    (a resumed run re-lands its finals in the same run dir — review
    r3.2; orbax refuses existing destinations without `force`).

    Leaves sharded across processes (e.g. the DEC snapshot's target
    distribution on a multi-host mesh) are all-gathered first — a bare
    device_get raises on them, which would kill the very run the
    snapshot exists to protect."""
    from spectrogram_cube_clustering_tpu.train.layout import fetch_global

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, fetch_global(tree), force=True)
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


def check_restored_shapes(restored, template, what: str) -> None:
    """Raise a clear error when a checkpoint's param shapes differ from the
    model template (orbax restore is shape-lenient, so without this the
    mismatch only surfaces as an opaque dot_general error inside the first
    jitted step). Shared by the workflow loaders and the serving tier."""
    mismatches = []

    def walk(r, t, path):
        if isinstance(t, dict):
            for k in t:
                if isinstance(r, dict) and k in r:
                    walk(r[k], t[k], path + (k,))
                else:
                    # a whole submodule the checkpoint lacks (e.g. an
                    # AEC checkpoint restored into a packed template:
                    # the key sets are disjoint, so shape comparison
                    # alone would pass vacuously)
                    mismatches.append(("/".join(path + (k,)),
                                       "missing", "present"))
            return
        rs, ts = getattr(r, "shape", None), getattr(t, "shape", None)
        if rs is not None and ts is not None and tuple(rs) != tuple(ts):
            mismatches.append(("/".join(path), tuple(rs), tuple(ts)))

    walk(restored, template, ())
    if mismatches:
        detail = "; ".join(
            f"{p}: checkpoint {rs} vs model {ts}"
            for p, rs, ts in mismatches[:4]
        )
        raise ValueError(
            f"checkpoint at odds with the configured {what} model — param "
            f"shapes differ ({detail}). Check that `arch`, `input_hw` and "
            "`attention_faithful` match the values the checkpoint was "
            "trained with (attention_faithful changes the encoder head "
            "width, models/aec.py)."
        )


# -- preemption-safe training snapshots -------------------------------------
#
# The reference can only save weights; a killed run restarts from scratch
# (SURVEY.md §5 "Failure detection ... none"). A snapshot carries the full
# optimizer state plus loop metadata (epoch, histories, early-stop
# counters), so training resumes exactly where it stopped.


def save_snapshot(path: str, state, meta: dict, extra: Optional[Any] = None) -> str:
    """Atomically persist train state (params + optimizer + step), JSON
    loop metadata, and an optional extra array pytree (e.g. best params).
    Overwrites any snapshot already at `path`."""
    import json
    import shutil

    path = os.path.abspath(path)
    tmp = path + ".tmp"
    # Multi-process: EVERY process must call `save` (orbax coordinates
    # its multi-host barriers internally and only process 0 writes a
    # host-local tree), all with the SAME shared path; the surrounding
    # filesystem juggling runs on process 0 alone.
    primary = jax.process_index() == 0
    if primary and os.path.exists(tmp):
        shutil.rmtree(tmp)
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if extra is not None:
        tree["extra"] = extra
    save(tmp, tree)
    if primary:
        with open(os.path.join(tmp, "loop_meta.json"), "w") as f:
            json.dump(meta, f)
        # never a moment with no complete snapshot on disk: the previous
        # rmtree(path)-then-rename window meant a preemption landing
        # between them silently restarted training from epoch 0 (resume
        # gates on os.path.exists). Sequence: old aside -> tmp in -> drop
        # old; restore_snapshot falls back to the .old copy if a crash
        # lands between the two renames.
        old = path + ".old"
        if os.path.exists(path):
            # make room for the rotation — at this moment `path` is a
            # complete snapshot, so dropping a stale .old keeps the
            # invariant. When `path` is ABSENT (recovering from a crash
            # that left only .old), the fallback must survive until the
            # new snapshot is in place — deleting it first would reopen
            # the zero-snapshot window.
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    if jax.process_count() > 1:
        # don't let any process race ahead to the next epoch (or a
        # restart) before the rename is visible
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("snapshot_rename")
    return path


def snapshot_exists(path: str) -> bool:
    """True when a resumable snapshot exists at `path` (or its `.old`
    fallback from a crash mid-rotation)."""
    path = os.path.abspath(path)
    return os.path.exists(path) or os.path.exists(path + ".old")


def restore_snapshot(path: str, state, extra_template: Optional[Any] = None) -> tuple:
    """Restore (state, meta, extra) from a snapshot; `state` is a freshly
    created TrainState providing the structure. Falls back to the `.old`
    copy save_snapshot rotated aside when a crash landed between its two
    renames."""
    import json

    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        path = path + ".old"
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if extra_template is not None:
        template["extra"] = extra_template
    tree = restore(path, template)
    with open(os.path.join(path, "loop_meta.json")) as f:
        meta = json.load(f)
    state = state.replace(
        params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
    )
    return state, meta, tree.get("extra")
