"""Fused Pallas STFT kernel: frame + Hann + DFT + log-power in one pass.

Why a matmul DFT instead of FFT: the spectrogram keeps only
nfreq = nperseg/2 + 1 ~ 101 bins, so the DFT is a skinny
(frames, nperseg) @ (nperseg, nfreq) contraction — two real matmuls that
run on the MXU at full tilt, while window/power/log fuse into the same
VMEM residency; an FFT would round-trip the complex spectrum through HBM
and its log-factor advantage is irrelevant at nperseg ~ 200. (The same
GEMM-native NDFT argument for accelerator frontends appears publicly in
MelT, arXiv:2606.01009.)

Layout: the waveform is staged as `ratio = nperseg/hop` row planes of
hop-sample rows padded to the 128-lane tile, plane j shifted by j rows —
so frame f's j-th hop-chunk is plane[j][f] and the kernel is pure aligned
BlockSpec pipelining: per grid step it reads a (ratio, F, 128) block and
accumulates `ratio` (F, 128) @ (128, nfreq) MXU matmuls against
hop-chunked windowed DFT bases. No sublane-shifted slices, rolls, or
manual DMA — all three are Mosaic compile hazards (miscompiles or
pathological compile times, found empirically on v5e).

Measured on one v5e chip (4M-sample waveform, nperseg=200, hop=100):
13.0–14.8 Gsamples/s vs ~71 Msamples/s for the XLA rfft path — ~200x —
(two-point dependency-chain timing that cancels the remote tunnel's
per-dispatch cost; benchmarks/RESULTS.md "STFT interior" section. Three
interior rules bought ~4.4x over the first version: write only the
nfreq lanes from the kernel so the padded output never re-streams
through HBM; skip the vmap wrapper for single waveforms; stage the row
planes strictly 2-D — a unit batch axis threaded through the staging
pads/stack costs 2.5x the whole op.) Numerics match
signal.stft.spectrogram to ~3e-4 (1-D) / ~6e-4 (batched) absolute on the
log10 scale
(f32-precision matmuls; the MXU's default reduced precision is NOT
acceptable here — the windowed DFT cancels catastrophically at
near-zero DC/Nyquist bins and shows O(1) log-scale errors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _windowed_dft_bases(nperseg: int, hop: int, nfreq_pad: int):
    """Hann-windowed rDFT bases laid out per hop-chunk:
    (ratio, LANE, nfreq_pad); chunk j rows [0, hop) hold windowed basis
    rows [j*hop, (j+1)*hop), pad rows are zero (they meet the waveform's
    pad lanes)."""
    # window + DFT convention come from signal.stft's numpy singletons —
    # the jnp spectrogram there is this kernel's parity oracle, and a
    # second copy of either formula could silently diverge from it
    from spectrogram_cube_clustering_tpu.signal.stft import (
        np_dft_angles,
        np_hann,
    )

    ratio = nperseg // hop
    nfreq = nperseg // 2 + 1
    cos_a, sin_a = np_dft_angles(nperseg)
    win = np_hann(nperseg)
    full_cos = win[:, None] * cos_a
    full_sin = win[:, None] * sin_a
    cos = np.zeros((ratio, LANE, nfreq_pad), np.float32)
    sin = np.zeros((ratio, LANE, nfreq_pad), np.float32)
    for j in range(ratio):
        cos[j, :hop, :nfreq] = full_cos[j * hop : (j + 1) * hop]
        sin[j, :hop, :nfreq] = full_sin[j * hop : (j + 1) * hop]
    return jnp.asarray(cos), jnp.asarray(sin)


def _stft_kernel(planes_ref, cos_ref, sin_ref, out_ref, *, ratio, eps):
    # planes_ref: (ratio, F, LANE) — plane j holds frame rows shifted by j;
    # cos/sin: (ratio, LANE, nfreq_pad); out: (F, nfreq) — NARROW: the HBM
    # output keeps only the nfreq real bins, so the padded lanes never
    # leave the kernel and no host-side lane-slice copy remains (the
    # standalone slice cost as much as the whole kernel, RESULTS.md).
    # HIGHEST: the DFT cancels catastrophically at near-zero bins
    # (DC/Nyquist under a Hann window), where the MXU's default bf16
    # multiplies show up as O(1) errors on the log10 scale.
    nf = out_ref.shape[1]
    c = jnp.zeros((planes_ref.shape[1], cos_ref.shape[2]), jnp.float32)
    s = jnp.zeros_like(c)
    for j in range(ratio):
        rows = planes_ref[j]
        c += jnp.dot(
            rows, cos_ref[j], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        s += jnp.dot(
            rows, sin_ref[j], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[:] = jnp.log10(c * c + s * s + eps)[:, :nf]


@functools.partial(
    jax.jit,
    static_argnames=(
        "nperseg", "hop", "log", "eps", "frames_per_block", "interpret"
    ),
)
def spectrogram_pallas(
    x: jnp.ndarray,
    nperseg: int = 200,
    hop: int = 100,
    log: bool = True,
    eps: float = 1e-12,
    frames_per_block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused log-power spectrogram: (..., T) -> (..., n_frames, nfreq).

    Semantics identical to signal.stft.spectrogram. Requires
    nperseg % hop == 0 and hop <= 128 (hop-chunk layout).
    """
    if nperseg % hop != 0:
        raise ValueError("pallas STFT requires nperseg % hop == 0")
    if hop > LANE:
        raise ValueError(f"pallas STFT requires hop <= {LANE}")
    if not log:
        raise ValueError("pallas STFT always returns log power")

    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal length {t} < nperseg {nperseg}")
    nfreq = nperseg // 2 + 1
    nfreq_pad = _round_up(nfreq, LANE)
    cos, sin = _windowed_dft_bases(nperseg, hop, nfreq_pad)

    ratio = nperseg // hop
    n_blocks = -(-n_frames // frames_per_block)
    rows_padded = n_blocks * frames_per_block
    rows_needed = rows_padded + ratio - 1
    # hop-row layout, each row padded to the 128-lane tile; rows_needed
    # always covers the last full frame, but the signal may carry leftover
    # samples past it (t > rows_needed * hop) — drop those, never pad by
    # a negative width
    need = rows_needed * hop

    def _stage(x1):
        # (t,) -> (ratio, rows_padded, LANE) shifted row planes:
        # planes[j, f] = rows[f + j]. Staged strictly in 2-D/3-D — threading
        # a unit batch axis through these pads/stacks instead costs ~2.5x
        # the whole op on v5e (benchmarks/stft_outslice_tpu.py A/B).
        x2 = jnp.pad(x1[:need], (0, max(0, need - t)))
        x2 = x2.reshape(rows_needed, hop)
        if hop < LANE:
            x2 = jnp.pad(x2, ((0, 0), (0, LANE - hop)))
        return jnp.stack([x2[j : j + rows_padded] for j in range(ratio)])

    flat = x.reshape(-1, t).astype(jnp.float32)

    kernel = functools.partial(_stft_kernel, ratio=ratio, eps=eps)

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (ratio, frames_per_block, LANE), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ratio, LANE, nfreq_pad), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ratio, LANE, nfreq_pad), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (frames_per_block, nfreq), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * frames_per_block, nfreq), jnp.float32
        ),
        interpret=interpret,  # CPU test path; compiled Mosaic on TPU
    )

    if flat.shape[0] == 1:
        # single waveform: skip the vmap wrapper and batch-axis staging
        # entirely — together with the narrow output this is worth ~3x
        # standalone (RESULTS.md, benchmarks/stft_outslice_tpu.py)
        out = call(_stage(flat[0]), cos, sin)[:n_frames][None]
    else:
        # vmap folds the batch/channel axis into the kernel grid as one
        # pallas_call (lax.map would lower to a scan of C dependent calls,
        # repeating the grid prologue per channel with no cross-channel
        # pipelining)
        planes = jax.vmap(_stage)(flat)
        out = jax.vmap(call, in_axes=(0, None, None))(planes, cos, sin)
        out = out[:, :n_frames]
    return out.reshape(*batch_shape, n_frames, nfreq)
