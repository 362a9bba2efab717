"""Host-side analysis: figures, label catalogues, environment data."""

from spectrogram_cube_clustering_tpu.analysis import plotting

__all__ = ["plotting"]
