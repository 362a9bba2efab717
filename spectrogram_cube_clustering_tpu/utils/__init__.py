"""Configuration (.ini), experiment trees, history CSVs, misc math utils."""

from spectrogram_cube_clustering_tpu.utils.config import (
    init_project_env,
    Configuration,
    config_training,
    load_config,
    parse_nclusters,
)
from spectrogram_cube_clustering_tpu.utils.history import (
    add_to_history,
    save_history,
    save_labels,
)
from spectrogram_cube_clustering_tpu.utils.mathutils import (
    distance_matrix,
    fractional_distance,
    measure_class_inertia,
    measure_label_change,
)
from spectrogram_cube_clustering_tpu.utils import profiling
from spectrogram_cube_clustering_tpu.utils import torch_port

__all__ = [
    "Configuration",
    "config_training",
    "load_config",
    "parse_nclusters",
    "init_project_env",
    "add_to_history",
    "save_history",
    "save_labels",
    "fractional_distance",
    "distance_matrix",
    "measure_class_inertia",
    "measure_label_change",
    "profiling",
    "torch_port",
]
