"""Data ingestion: synthetic generators, Zarr cube, HDF5 catalogs, feeding."""

from spectrogram_cube_clustering_tpu.data.synthetic import synthetic_windows
from spectrogram_cube_clustering_tpu.data import zarrlite
from spectrogram_cube_clustering_tpu.data import h5
from spectrogram_cube_clustering_tpu.data.h5 import SeismicDataset
from spectrogram_cube_clustering_tpu.data.cube import (
    CubeSpec,
    ZarrCubeDataset,
    make_synthetic_cube,
    train_val_split,
)
from spectrogram_cube_clustering_tpu.data.prefetch import (
    PrefetchLoader,
    zarr_prefetch_loader,
)
from spectrogram_cube_clustering_tpu.data.waveform import WaveformStreamDataset

__all__ = [
    "synthetic_windows",
    "zarrlite",
    "h5",
    "SeismicDataset",
    "CubeSpec",
    "ZarrCubeDataset",
    "make_synthetic_cube",
    "train_val_split",
    "PrefetchLoader",
    "zarr_prefetch_loader",
    "WaveformStreamDataset",
]
