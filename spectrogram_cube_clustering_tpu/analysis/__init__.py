"""Host-side analysis: figures, label catalogues, environment data."""

from spectrogram_cube_clustering_tpu.analysis import plotting
from spectrogram_cube_clustering_tpu.analysis import sacio
from spectrogram_cube_clustering_tpu.analysis import seismic
from spectrogram_cube_clustering_tpu.analysis.catalogue import (
    EnvironmentCatalogue,
    LabelCatalogue,
    read_era5,
    read_kpdr,
    read_meteo,
)

__all__ = [
    "plotting", "sacio", "seismic", "LabelCatalogue",
    "EnvironmentCatalogue", "read_era5", "read_kpdr", "read_meteo",
]
