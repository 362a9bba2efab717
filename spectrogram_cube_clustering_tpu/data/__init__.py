"""Data ingestion: synthetic generators, Zarr cube, HDF5 catalogs, feeding."""

from spectrogram_cube_clustering_tpu.data.synthetic import synthetic_windows

__all__ = ["synthetic_windows"]
