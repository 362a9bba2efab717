"""Fused Pallas STFT kernel: frame + Hann + DFT + log-power in one pass.

Why a matmul DFT instead of FFT: the spectrogram keeps only
nfreq = nperseg/2 + 1 ~ 101 bins, so the DFT is a skinny
(frames, nperseg) @ (nperseg, nfreq) contraction — two real matmuls that
run on the MXU at full tilt, while window/power/log fuse into the same
VMEM residency. An FFT would round-trip HBM twice (frames materialized at
hop < nperseg overlap ~2x the waveform bytes, then the complex spectrum)
and its log-factor advantage is irrelevant at nperseg ~ 200.

Layout: the waveform arrives as hop-sample rows padded to the 128-lane
tile (hop <= 128; the pad lanes multiply zero basis rows, so alignment
costs no correctness). The kernel DMAs overlapping row blocks HBM -> VMEM
per grid step — framing never materializes in HBM — and accumulates the
frame @ basis product as `ratio` shifted (F, 128) @ (128, nfreq) matmuls,
because frame f is rows f..f+ratio-1 of the segment. (Mosaic supports
neither lane-axis concat of sublane-shifted views nor non-128-aligned
DMA lanes, hence this formulation.)

Numerics match signal.stft.spectrogram (rfft) to ~3e-4 absolute on the
log10 scale.
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
    """Hann-windowed rDFT bases laid out per hop-chunk: (ratio * LANE,
    nfreq_pad); chunk j rows [j*LANE, j*LANE + hop) hold windowed basis
    rows [j*hop, (j+1)*hop), the pad rows are zero (they meet the
    waveform's pad lanes)."""
    ratio = nperseg // hop
    nfreq = nperseg // 2 + 1
    n = np.arange(nperseg)[:, None]
    k = np.arange(nfreq)[None, :]
    ang = 2.0 * np.pi * n * k / nperseg
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(nperseg) / nperseg)
    full_cos = win[:, None] * np.cos(ang)
    full_sin = win[:, None] * np.sin(ang)
    cos = np.zeros((ratio * LANE, nfreq_pad), np.float32)
    sin = np.zeros((ratio * LANE, nfreq_pad), np.float32)
    for j in range(ratio):
        cos[j * LANE : j * LANE + hop, :nfreq] = full_cos[j * hop : (j + 1) * hop]
        sin[j * LANE : j * LANE + hop, :nfreq] = full_sin[j * hop : (j + 1) * hop]
    return jnp.asarray(cos), jnp.asarray(sin)


def _stft_kernel(
    x_hbm, cos_ref, sin_ref, out_ref, seg_ref, sem,
    *, frames_per_block, ratio, seg_rows, eps,
):
    i = pl.program_id(0)

    # Overlapping waveform rows for this frame block: HBM -> VMEM. The
    # waveform arrives pre-reshaped to (rows, LANE) hop-chunks; frame f
    # spans rows f .. f+ratio-1. seg_rows is 8-aligned (f32 sublane tile).
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * frames_per_block, seg_rows), :],
        seg_ref,
        sem,
    )
    dma.start()
    dma.wait()

    # frames @ B = sum_j seg[j : j+F] @ B_chunk[j] — `ratio` accumulated
    # (F, LANE) @ (LANE, nfreq_pad) matmuls on the MXU; the frame matrix
    # never materializes. The row shift uses pltpu.roll + an aligned
    # from-zero slice (Mosaic miscompiles sublane-offset slices as matmul
    # operands).
    seg = seg_ref[:]
    c = jnp.zeros(out_ref.shape, jnp.float32)
    s = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(ratio):
        shifted = pltpu.roll(seg, shift=seg_rows - j, axis=0) if j else seg
        rows = shifted[:frames_per_block]
        c += jnp.dot(
            rows, cos_ref[j * LANE : (j + 1) * LANE, :],
            preferred_element_type=jnp.float32,
        )
        s += jnp.dot(
            rows, sin_ref[j * LANE : (j + 1) * LANE, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = jnp.log10(c * c + s * s + eps)


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
    # segment DMA length rounded to the f32 sublane tile (8)
    seg_rows = _round_up(frames_per_block + ratio - 1, 8)
    rows_total = n_blocks * frames_per_block + (seg_rows - frames_per_block)
    # hop-chunk layout, each row padded to the 128-lane tile
    x2 = x.reshape(-1, t).astype(jnp.float32)
    x2 = jnp.pad(x2, ((0, 0), (0, rows_total * hop - t)))
    x2 = x2.reshape(-1, rows_total, hop)
    if hop < LANE:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, LANE - hop)))

    kernel = functools.partial(
        _stft_kernel,
        frames_per_block=frames_per_block,
        ratio=ratio,
        seg_rows=seg_rows,
        eps=eps,
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # waveform stays in HBM
            pl.BlockSpec(
                (ratio * LANE, nfreq_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ratio * LANE, nfreq_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (frames_per_block, nfreq_pad), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * frames_per_block, nfreq_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((seg_rows, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,  # CPU test path; compiled Mosaic on TPU
    )

    out = jax.lax.map(lambda xb: call(xb, cos, sin), x2)
    out = out[:, :n_frames, :nfreq]
    return out.reshape(*batch_shape, n_frames, nfreq)
