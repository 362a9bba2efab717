"""On-device STFT: raw waveform -> log-power spectrogram windows.

The reference consumes *precomputed* spectrogram cubes (the STFT that built
them lives outside the repo; SURVEY.md §5 "Long-context"). This module is
the TPU-native upstream: a fused frame -> Hann window -> DFT -> power ->
log10 pipeline that turns raw seismic/DAS waveforms into the exact
(window_rows, n_freq) samples the models consume, entirely on device.

Defaults produce reference-geometry windows: nperseg=200 -> 101 rFFT bins
(the cube's freq width), contiguous 4-row time groups -> (4, 101) model
windows.

Two implementations with identical semantics:
- `spectrogram` — jnp (rfft), used on CPU and as the parity oracle;
- `ops.pallas_stft.spectrogram_pallas` — fused Pallas kernel computing the
  DFT as two real matmuls on the MXU (freq-bin count is far below nperseg,
  so the matmul DFT beats FFT's log factor while fusing window+power+log
  into one VMEM pass).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def np_hann(nperseg: int) -> np.ndarray:
    """Periodic Hann window, numpy (single source of the window formula —
    the Pallas kernel folds this into its DFT bases; diverging copies
    would silently break the jnp-path-as-parity-oracle contract)."""
    n = np.arange(nperseg, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / nperseg)


def np_dft_angles(nperseg: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag rDFT basis matrices (nperseg, nfreq), numpy — the single
    source of the DFT convention shared by `dft_matrices` and the Pallas
    kernel's windowed bases."""
    nfreq = nperseg // 2 + 1
    n = np.arange(nperseg)[:, None]
    k = np.arange(nfreq)[None, :]
    ang = 2.0 * np.pi * n * k / nperseg
    return np.cos(ang), np.sin(ang)


def hann_window(nperseg: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann') convention)."""
    return jnp.asarray(np_hann(nperseg), dtype)


def frame(x: jnp.ndarray, nperseg: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, nperseg) via strided gather;
    n_frames = (T - nperseg) // hop + 1 (trailing partial frame dropped)."""
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal length {t} < nperseg {nperseg}")
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(nperseg)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("nperseg", "hop", "log", "eps"))
def spectrogram(
    x: jnp.ndarray,
    nperseg: int = 200,
    hop: int = 100,
    log: bool = True,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Log-power spectrogram: (..., T) -> (..., n_frames, nperseg//2 + 1).

    power = |rFFT(frame * hann)|^2, log10 when `log`.
    """
    frames = frame(x.astype(jnp.float32), nperseg, hop)
    win = hann_window(nperseg)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if log:
        return jnp.log10(power + eps)
    return power


def dft_matrices(nperseg: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag rDFT bases, window pre-folded OUT: (nperseg, nfreq) each,
    so that rfft(f)[k] == f @ cos[:, k] - 1j * f @ sin[:, k]."""
    cos, sin = np_dft_angles(nperseg)
    return jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)


def pallas_eligible(nperseg: int, hop: int, platform: str = None) -> bool:
    """True when the backend + STFT geometry can use the fused Pallas
    kernel: its hop-chunk layout needs nperseg % hop == 0, hop <= 128
    lanes (ops/pallas_stft.py preconditions), and the resident
    hop-chunked DFT bases — 2 * ratio * 128 * round_up(nfreq, 128) f32,
    pinned in VMEM for every grid step — must leave room for the row
    blocks and accumulators in the ~16 MiB v5e VMEM (e.g. nperseg=512 /
    hop=8 needs ~25 MiB of bases alone). The round-3 rawread layout
    reads the waveform's natural (rows, hop) reshape directly, so the
    old staged-plane HBM inflation is gone and small-ratio geometries
    that bound used to reject are now fine. Other configs fall back to
    the XLA path, which handles them fine. `platform` overrides the
    process default backend (pass the target mesh's device platform
    when the devices differ from the default, e.g. a CPU mesh in a
    TPU-default process)."""
    if not (
        (platform or jax.default_backend()) == "tpu"
        and nperseg % hop == 0
        and hop <= 128
    ):
        return False
    nfreq_pad = -(-(nperseg // 2 + 1) // 128) * 128
    bases_bytes = 2 * (nperseg // hop) * 128 * nfreq_pad * 4
    return bases_bytes <= 4 * 1024 * 1024


def spectrogram_windows(
    x: jnp.ndarray,
    nperseg: int = 200,
    hop: int = 100,
    window_rows: int = 4,
    transform: Optional[str] = "sample_norm_cent",
    use_pallas: Optional[bool] = None,
    platform: Optional[str] = None,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Raw waveform(s) -> model-ready windows (N, window_rows, n_freq, 1).

    Consecutive `window_rows` spectrogram frames form one sample (the Zarr
    reader's 4-row windowing, ZarrDataLoader.py:72); trailing partial
    windows are dropped; normalization fuses on device (ops.normalize).
    `use_pallas=None` auto-selects the Pallas kernel on TPU backends;
    `platform` overrides the backend the auto-selection keys on (pass the
    target devices' platform when they differ from the process default),
    and `interpret=True` runs the kernel in interpret mode (the off-TPU
    path — a compiled Mosaic kernel crashes on CPU backends).

    `precision="default"` opts the Pallas kernel into the MXU's native
    reduced-precision dots: 2.6x kernel throughput, clustering-outcome
    parity measured at workflow scale, but O(1) log-scale errors at
    near-zero bins — for clustering-feature pipelines only, never for
    spectrogram-value consumers (RESULTS.md "Loose-precision STFT
    variant"; ignored on the rfft path, which is f32 exact).
    """
    from spectrogram_cube_clustering_tpu.ops.normalize import make_normalizer

    if use_pallas is None:
        use_pallas = pallas_eligible(nperseg, hop, platform=platform)
    if use_pallas:
        from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
            spectrogram_pallas,
        )

        spec = spectrogram_pallas(
            x, nperseg=nperseg, hop=hop, interpret=interpret,
            precision=precision,
        )
    else:
        spec = spectrogram(x, nperseg=nperseg, hop=hop)
    # (..., n_frames, n_freq) -> (N, window_rows, n_freq), windowing each
    # channel independently: the trailing partial window of every channel
    # is dropped so no window straddles a channel boundary.
    n_frames, n_freq = spec.shape[-2], spec.shape[-1]
    spec = spec.reshape(-1, n_frames, n_freq)
    per_channel = n_frames // window_rows
    spec = spec[:, : per_channel * window_rows].reshape(
        -1, window_rows, n_freq
    )
    spec = make_normalizer(transform)(spec)
    return spec[..., None]
