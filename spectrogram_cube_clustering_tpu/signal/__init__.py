"""On-device signal processing: raw waveform -> spectrogram windows.

The scale-out extension over the reference (which consumes precomputed
cubes): STFT on device (jnp rfft or the fused Pallas matmul-DFT kernel),
and a time-sharded variant with halo exchange in `parallel.halo`.
"""

from spectrogram_cube_clustering_tpu.signal.stft import (
    dft_matrices,
    frame,
    hann_window,
    spectrogram,
    spectrogram_windows,
)

__all__ = [
    "dft_matrices",
    "frame",
    "hann_window",
    "spectrogram",
    "spectrogram_windows",
]
