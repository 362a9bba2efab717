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


def _h5_windows(config) -> np.ndarray:
    """H5 event-catalog samples as NHWC windows (M, 87, 100, 1).

    The reference's SeismicDataset flow (utils.py:211-287, dormant in
    production.py:29-34): each catalog event is ONE model window — crop
    drops the embedded time/freq vectors; normalization is applied later
    with the configured transform like every other source. Sets
    `config.input_hw` so make_model builds the matching geometry, and
    `config.index_tra` for gallery/init paths that index by training
    position (reference models.py:529).
    """
    ftype = getattr(config, "h5_ftype", None) or "h5"
    if ftype == "np":
        # convert_h5_to_np output: (M, 1, H, W) NCHW, already cropped (and
        # default-normalized at conversion time, data/h5.py) — load
        # directly rather than through SeismicDataset's crop pipeline,
        # which would crop a second time (the reference's np path has the
        # same latent double-crop hazard, utils.py:272-278 with the
        # default transform)
        x = np.load(config.fname_dataset)
        if x.ndim != 4 or x.shape[1] != 1:
            raise ValueError(
                "h5_ftype='np' expects a (M, 1, H, W) catalog dump "
                f"(convert_h5_to_np output); got shape {x.shape} in "
                f"{config.fname_dataset}"
            )
        x = np.moveaxis(x, 1, -1).astype(np.float32)  # NHWC
    else:
        # contiguous block reads (one H5 slice per 4096 events) instead of
        # SeismicDataset's one-open-one-read per event — orders of
        # magnitude fewer IO calls at catalog scale
        from spectrogram_cube_clustering_tpu.data.h5 import H5StreamDataset

        ds = H5StreamDataset(config.fname_dataset, block=4096)
        x = np.concatenate(
            [ds.item(i) for i in range(len(ds))], axis=0
        )
    config.input_hw = (int(x.shape[1]), int(x.shape[2]))
    return x


def _h5_split(config, n: int):
    """Train/val indices for the catalog: the reference's persisted
    TraVal index pickle when `indexpath` is configured (utils.py:173-179),
    else the seeded 70/30 permutation split."""
    if getattr(config, "indexpath", None):
        from spectrogram_cube_clustering_tpu.data.h5 import load_traval_index

        idx_tra, idx_val = load_traval_index(config.indexpath)
        return np.asarray(idx_tra), np.asarray(idx_val)
    return train_val_split(n)


def load_windows(
    config, split: bool
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Materialize windows as float32 arrays: (train, val or None).

    datafiletype 'zarr' (default) reads the chunked cube; 'waveform' runs
    the on-device STFT over a raw .npy waveform first; 'h5' reads the
    event-catalog spectrograms (one window per catalog event).

    Every branch records the produced window geometry in
    `config.input_hw` so make_model builds the matching model — without
    this, nperseg/window_rows overrides or a non-(4, 101) cube would feed
    windows into the default-geometry model and fail with a shape error
    inside the first jitted step.
    """
    ftype = getattr(config, "datafiletype", None)
    if ftype == "waveform":
        x = _waveform_windows(config)
        config.input_hw = (int(x.shape[1]), int(x.shape[2]))
        if not split:
            return x, None
        idx_tra, idx_val = train_val_split(len(x))
        return x[idx_tra], x[idx_val]
    if ftype == "h5":
        x = _h5_windows(config)
        if not split:
            config.index_tra = np.arange(len(x))
            return x, None
        idx_tra, idx_val = _h5_split(config, len(x))
        config.index_tra = np.asarray(idx_tra)
        config.index_val = np.asarray(idx_val)
        return x[idx_tra], x[idx_val]
    ds = ZarrCubeDataset(config.fname_dataset, spec=_cube_spec(config))
    config.input_hw = tuple(int(v) for v in ds.window_shape[:2])
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
