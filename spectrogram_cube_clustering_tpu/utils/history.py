"""Training-history and label CSV writers.

Parity targets: `add_to_history`/`save_history`/`save_labels`
(Cluster/utils.py:549-566, 1158-1209) — pandas CSVs with the first key as
index, and append-mode Labels.csv with a header written once.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd


def add_to_history(
    history: Dict[str, list], values: Dict[str, float]
) -> Dict[str, list]:
    """Append one row of scalars to a history dict of lists."""
    for k, v in values.items():
        history.setdefault(k, []).append(v)
    return history


def _is_coordinator() -> bool:
    """True on the single process that owns file artifacts (multi-process
    runtimes hold identical fetched arrays on every host; concurrent CSV
    writes would tear or duplicate). Import-light: jax is only consulted
    when already initialized."""
    import sys

    jax = sys.modules.get("jax")
    return jax is None or jax.process_index() == 0


def save_history(history: Dict[str, Sequence], path: str) -> pd.DataFrame:
    """Write a history dict to CSV, first key as index
    (reference utils.py:1158-1179). No-op file-wise off process 0."""
    df = pd.DataFrame.from_dict(dict(history))
    df = df.set_index(list(history.keys())[0])
    if _is_coordinator():
        df.to_csv(path)
    return df


def save_labels(
    label_rows, savepath: str, serial: str | None = None
) -> str:
    """Write Labels[serial].csv (reference utils.py:1182-1209).

    Deliberate fix vs the reference: it APPENDS, so re-running predict
    or gmm_fit into the same deterministic artifact dir silently
    duplicates every row while labels_*.npy overwrite — here the CSV
    overwrites like every other artifact. No-op off process 0 (one
    writer per cluster).

    `label_rows` is either a list of dict rows (reference shape) or a
    1-D integer array — the array path streams `idx,label` lines
    directly instead of materializing one dict per window (a multi-GB
    spike at cube scale)."""
    fname = os.path.join(
        savepath, f"Labels{serial}.csv" if serial else "Labels.csv"
    )
    if not _is_coordinator() or len(label_rows) == 0:
        # empty rows: nothing to write (indexing label_rows[0] on the
        # coordinator alone would kill the one process that owns file
        # artifacts and hang the next multi-process barrier)
        return fname
    if isinstance(label_rows, np.ndarray):
        with open(fname, "w", newline="") as f:
            f.write("idx,label\n")
            for start in range(0, len(label_rows), 1 << 20):
                chunk = label_rows[start : start + (1 << 20)]
                idx = np.arange(start, start + len(chunk))
                np.savetxt(f, np.column_stack([idx, chunk]),
                           fmt="%d", delimiter=",")
        return fname
    keys = label_rows[0].keys()
    with open(fname, "w", newline="") as f:
        w = csv.DictWriter(f, keys)
        w.writeheader()
        w.writerows(label_rows)
    return fname
