"""Core plumbing: device meshes, precision policies, PRNG threading."""

from spectrogram_cube_clustering_tpu.core.precision import Precision, DEFAULT, BF16, PARITY64
from spectrogram_cube_clustering_tpu.core.mesh import (
    initialize_distributed,
    make_data_mesh,
    make_multislice_mesh,
    batch_sharding,
    replicated_sharding,
    pad_to_multiple,
    shard_batch,
)

__all__ = [
    "Precision", "DEFAULT", "BF16", "PARITY64",
    "make_data_mesh", "make_multislice_mesh", "initialize_distributed", "batch_sharding", "replicated_sharding",
    "pad_to_multiple", "shard_batch",
]
