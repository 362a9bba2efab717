"""Command-line entry points (reference runDC + setup.py console scripts)."""

from spectrogram_cube_clustering_tpu.cli.run_dc import main as run_dc
from spectrogram_cube_clustering_tpu.cli.tools import (
    build_cube,
    convert_h5_to_np,
    convert_torch_checkpoint,
    export_torch_checkpoint,
    extract_h5dataset,
    generate_sample_index,
    query_h5size,
)
from spectrogram_cube_clustering_tpu.cli.drivers import (
    aec_predict,
    aec_train,
    dec_predict,
    dec_train,
    gmm_centroids,
)

__all__ = [
    "run_dc", "query_h5size", "extract_h5dataset", "generate_sample_index",
    "convert_h5_to_np", "build_cube", "convert_torch_checkpoint",
    "export_torch_checkpoint", "aec_train", "aec_predict", "gmm_centroids",
    "dec_train", "dec_predict",
]
