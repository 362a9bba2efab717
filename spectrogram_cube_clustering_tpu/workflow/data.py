"""Workflow data loading.

Parity target: `load_data` (Cluster/production.py:25-62):
- AEC train  -> Zarr cube windows with a 70/30 train/val split
  (get_zarr_data(split_dataset=True), ZarrDataLoader.py:103-107);
- DEC train / AEC|DEC predict -> all windows, unsplit;
- GMM fit    -> precomputed latents `Prediction/Z_AEC.npy` next to the AEC
  saved weights (production.py:58-62).

TPU-first deviation: instead of torch DataLoaders feeding per-batch H2D
copies, windows are materialized host-side as one float32 array and later
laid out device-resident (train.layout.make_batched_data); normalization
fuses into the jitted compute. The split permutes *items* (whole Zarr
chunks) like the reference's random_split over dataset indices.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from spectrogram_cube_clustering_tpu.data.cube import (
    CubeSpec,
    ZarrCubeDataset,
    train_val_split,
)


def _cube_spec(config) -> CubeSpec:
    """CubeSpec from optional config overrides (defaults = reference
    constants, ZarrDataLoader.py:49-66)."""
    kwargs = {}
    for field in (
        "chunk_size", "window_rows", "channel_start", "channel_stride",
    ):
        v = getattr(config, field, None)
        if v is not None:
            kwargs[field] = int(v)
    return CubeSpec(**kwargs)


def _waveform_windows(config) -> np.ndarray:
    """Raw waveform (.npy, 1-D or (channels, T)) -> spectrogram windows via
    the on-device STFT — the upstream stage the reference assumes was run
    elsewhere (SURVEY.md §5 'Long-context'). Config keys nperseg/hop
    override the 200/100 defaults; normalization happens later with the
    configured transform like every other source."""
    import jax.numpy as jnp

    from spectrogram_cube_clustering_tpu.signal.stft import (
        spectrogram_windows,
    )

    wave = np.load(config.fname_dataset)
    out = spectrogram_windows(
        jnp.asarray(wave),
        nperseg=int(getattr(config, "nperseg", None) or 200),
        hop=int(getattr(config, "hop", None) or 100),
        window_rows=int(getattr(config, "window_rows", None) or 4),
        transform=None,  # workflow applies config.transform afterwards
    )
    return np.asarray(out)


def load_windows(
    config, split: bool
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Materialize windows as float32 arrays: (train, val or None).

    datafiletype 'zarr' (default) reads the chunked cube; 'waveform' runs
    the on-device STFT over a raw .npy waveform first.
    """
    if getattr(config, "datafiletype", None) == "waveform":
        x = _waveform_windows(config)
        if not split:
            return x, None
        idx_tra, idx_val = train_val_split(len(x))
        return x[idx_tra], x[idx_val]
    ds = ZarrCubeDataset(config.fname_dataset, spec=_cube_spec(config))
    if not split:
        return ds.load_all_windows(), None
    idx_tra, idx_val = train_val_split(len(ds))
    return ds.load_all_windows(idx_tra), ds.load_all_windows(idx_val)


def load_data(config):
    """Dispatch on (model, mode) like the reference (production.py:25-62)."""
    model = config.model
    if model in ("AEC", "DEC"):
        if config.mode == "train":
            if model == "AEC":
                return load_windows(config, split=True)
            tra, _ = load_windows(config, split=False)
            return tra, np.array([])
        if config.mode == "predict":
            x, _ = load_windows(config, split=False)
            return x
        raise ValueError(f"unknown mode {config.mode!r} for {model}")
    if model == "GMM":
        run_dir = os.path.abspath(
            os.path.join(config.saved_weights, os.pardir)
        )
        fname = os.path.join(run_dir, "Prediction", "Z_AEC.npy")
        return np.load(fname)
    raise ValueError(f"unknown model {model!r}")
