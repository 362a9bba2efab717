"""Parallelism: sharding helpers, halo exchange, distributed clustering.

The reference's only distributed story is a pointer to an absent dev_ddp
branch (readme.md:65; SURVEY.md §2.2). Here parallelism is first-class and
XLA-native:

- data parallelism: shardings on the batch axis (core.mesh + train.layout),
  gradient psums inserted by XLA — no NCCL analog needed;
- sequence-parallel STFT: the time axis of raw waveforms sharded across
  devices with hop-overlap halo exchange (`halo_exchange_1d`,
  `sharded_spectrogram`) — the rebuild's analog of ring/context
  parallelism for this windowed workload (SURVEY.md §2.2);
- distributed clustering: psum-reduced sufficient statistics for k-means
  /GMM-EM over sharded latents (`sharded_kmeans_step`).
"""

from spectrogram_cube_clustering_tpu.parallel.halo import (
    halo_exchange_1d,
    sharded_spectrogram,
)
from spectrogram_cube_clustering_tpu.parallel.cluster import (
    sharded_gmm,
    sharded_gmm_em_step,
    sharded_kmeans,
    sharded_kmeans_step,
)

__all__ = [
    "halo_exchange_1d",
    "sharded_spectrogram",
    "sharded_kmeans_step",
    "sharded_gmm_em_step",
    "sharded_kmeans",
    "sharded_gmm",
]
