"""Training-history and label CSV writers.

Parity targets: `add_to_history`/`save_history`/`save_labels`
(Cluster/utils.py:549-566, 1158-1209) — pandas CSVs with the first key as
index, and append-mode Labels.csv with a header written once.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Sequence

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
    label_rows: List[Dict], savepath: str, serial: str | None = None
) -> str:
    """Append label rows to Labels[serial].csv, header once
    (reference utils.py:1182-1209). No-op off process 0: the append mode
    would otherwise interleave one copy of every row per host."""
    fname = os.path.join(
        savepath, f"Labels{serial}.csv" if serial else "Labels.csv"
    )
    if not _is_coordinator() or not label_rows:
        # empty rows: nothing to append (indexing label_rows[0] on the
        # coordinator alone would kill the one process that owns file
        # artifacts and hang the next multi-process barrier)
        return fname
    keys = label_rows[0].keys()
    write_header = not os.path.exists(fname)
    with open(fname, "a", newline="") as f:
        w = csv.DictWriter(f, keys)
        if write_header:
            w.writeheader()
        w.writerows(label_rows)
    return fname
