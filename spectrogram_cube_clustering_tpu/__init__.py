"""spectrogram_cube_clustering_tpu — TPU-native deep embedded clustering of
spectrogram cubes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Julia310/Spectrogram-Cube-Clustering (PyTorch): convolutional-autoencoder
pretraining, GMM latent-space initialization, and DEC (Xie/Girshick/Farhadi
2016) joint refinement over seismic/acoustic spectrogram windows, designed
TPU-first (device meshes + pjit sharding, static shapes, bf16/f32 numerics).

Typical usage::

    import spectrogram_cube_clustering_tpu as scc
    model = scc.models.AEC()
    ...

Subpackages
-----------
core      : mesh / precision / PRNG plumbing
ops       : pure array ops (normalizers, Student-t assignment, losses, kernels)
models    : flax.linen network definitions (Encoder/Decoder/AEC/DEC/UNet)
cluster   : on-device k-means, GMM-EM, metrics, t-SNE
data      : Zarr cube + HDF5 catalog readers, synthetic data, prefetching
train     : jit-compiled train steps, loops, checkpointing
signal    : on-device STFT (raw waveform -> spectrogram windows)
parallel  : halo exchange, sharded STFT, distributed k-means/GMM steps
native    : C++ runtime components (threaded Zarr chunk decoder)
workflow  : train/predict/gmm_fit orchestration (reference production.py parity)
utils     : configuration (.ini), experiment trees, history CSVs, profiling
analysis  : plotting, label/environment catalogues, seismic preprocessing
serve     : low-latency online inference (fixed-shape jitted predictors)
serve_http: HTTP serving front-end + cross-request micro-batching
cli       : entry points (runDC equivalent, drivers, H5/cube tools)
"""

__version__ = "0.1.0"

from spectrogram_cube_clustering_tpu import (  # noqa: F401
    analysis,
    cli,
    cluster,
    core,
    data,
    models,
    ops,
    parallel,
    serve,
    serve_http,
    signal,
    train,
    utils,
    workflow,
)

__all__ = [
    "analysis", "cli", "cluster", "core", "data", "models", "ops",
    "parallel", "serve", "serve_http", "signal", "train", "utils",
    "workflow", "__version__",
]
