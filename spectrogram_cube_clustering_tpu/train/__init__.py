"""Training engine: jit-compiled steps and loops for AEC and DEC.

TPU-first structure (contrast with the reference's per-batch H2D loop,
Cluster/models.py:106-168, 1089-1163):

- the whole (padded) dataset is laid out device-resident as
  (n_batches, batch, H, W, C), sharded over the data mesh along the batch
  axis; an epoch is a single `lax.scan` over the leading axis — no
  host<->device traffic inside an epoch;
- AEC/DEC train steps are pure jitted functions of (state, batch);
  gradient reductions across devices are inserted by XLA from shardings;
- the DEC target-distribution refresh is a jitted full-dataset eval scan
  (reference batch_eval, models.py:41-103), and the stretches between
  refreshes are scanned on-device ("segments").
"""

from spectrogram_cube_clustering_tpu.train.layout import (
    BatchedData,
    fetch_global,
    make_batched_data,
)
from spectrogram_cube_clustering_tpu.train.state import create_train_state
from spectrogram_cube_clustering_tpu.train.aec import (
    train_aec,
    train_aec_stream,
    AECConfig,
)
from spectrogram_cube_clustering_tpu.train.dec import (
    train_dec,
    train_dec_stream,
    DECConfig,
    full_eval,
)
from spectrogram_cube_clustering_tpu.train import checkpoint

__all__ = [
    "BatchedData", "make_batched_data", "create_train_state",
    "train_aec", "train_aec_stream", "AECConfig",
    "train_dec", "train_dec_stream", "DECConfig", "full_eval",
    "checkpoint",
]
