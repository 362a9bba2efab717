"""Fused Pallas STFT kernel: frame + Hann + DFT + log-power in one pass.

Why a matmul DFT instead of FFT: the spectrogram keeps only
nfreq = nperseg/2 + 1 ~ 101 bins, so the DFT is a skinny
(frames, nperseg) @ (nperseg, nfreq) contraction — two real matmuls that
run on the MXU at full tilt, while window/power/log fuse into the same
VMEM residency; an FFT would round-trip the complex spectrum through HBM
and its log-factor advantage is irrelevant at nperseg ~ 200. (The same
GEMM-native NDFT argument for accelerator frontends appears publicly in
MelT, arXiv:2606.01009.)

Layout (round-3 "rawread" rewrite): the kernel reads the waveform's
NATURAL (rows, hop) reshape directly — no staged shifted planes, so the
former ratio-fold HBM staging blowup (~60% of the op, RESULTS.md "STFT
interior") is gone. Each grid step gets its (fpb, hop) row block plus a
halo block of the next `halo >= ratio-1` rows from the SAME array via a
second BlockSpec (index map (i+1)*fpb/halo); in VMEM it computes
Y_j = rows_cat @ basis_j over fpb+halo rows per hop-chunk j and
accumulates the frame sum as shifted slices of the dot VALUES:
c = sum_j Y_j[j : j+fpb]. The v5e Mosaic hazards this repo documented
are sublane-shifted slices as MATMUL OPERANDS (miscompile) and lane-axis
concats of shifted views (compile error) — here shifts touch only dot
outputs feeding adds, and the one concat (rowsA ++ rowsB) is a
sublane-axis concat of unshifted refs. Ragged tail frames (the < fpb
remainder plus the halo's overhang) run through a second, tiny pallas
call on a zero-padded tail slice — NOT the XLA rfft path, whose
worst-case ~fpb-frame tail would cost more than the whole kernel.

Measured on one v5e chip (4M-sample waveform, nperseg=200, hop=100):
16.5 Gsamples/s vs 10.3 for the previous staged-plane kernel same hour
(benchmarks/stft_rawread_tpu.py; two-point dependency-chain timing that
cancels the remote tunnel's per-dispatch cost) and ~71 Msamples/s for
the XLA rfft path — ~230x. Numerics match signal.stft.spectrogram to
the same worst-case error as the staged kernel (2.2e-3 at one near-zero
DC bin, p99.9 = 3.5e-6, f32-precision matmuls; the MXU's default
reduced precision is NOT acceptable here — the windowed DFT cancels
catastrophically at near-zero DC/Nyquist bins and shows O(1) log-scale
errors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8  # f32 sublane tile; halo heights and block rows align to it


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _windowed_dft_bases(nperseg: int, hop: int, nfreq_pad: int):
    """Hann-windowed rDFT bases laid out per hop-chunk:
    (ratio, LANE, nfreq_pad); chunk j rows [0, hop) hold windowed basis
    rows [j*hop, (j+1)*hop), pad rows are zero (the kernel only reads
    the [:hop] slice)."""
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


def _stft_kernel(rowsA_ref, rowsB_ref, cos_ref, sin_ref, out_ref, *,
                 ratio, hop, eps, precision=None):
    # rowsA: (fpb, hop) hop-sample waveform rows; rowsB: (halo, hop) the
    # next halo rows of the SAME array (frame f spans rows f..f+ratio-1,
    # so the block's last frames read past its own rows); cos/sin:
    # (ratio, LANE, nfreq_pad); out: (fpb, nfreq) — NARROW: the HBM
    # output keeps only the nfreq real bins, so the padded lanes never
    # leave the kernel and no host-side lane-slice copy remains (the
    # standalone slice cost as much as the whole kernel, RESULTS.md).
    # HIGHEST: the DFT cancels catastrophically at near-zero bins
    # (DC/Nyquist under a Hann window), where the MXU's default bf16
    # multiplies show up as O(1) errors on the log10 scale.
    fpb, nf = out_ref.shape
    prec = (
        jax.lax.Precision.HIGHEST if precision is None else precision
    )
    rows_cat = jnp.concatenate([rowsA_ref[:], rowsB_ref[:]], axis=0)
    c = jnp.zeros((fpb, cos_ref.shape[2]), jnp.float32)
    s = jnp.zeros_like(c)
    for j in range(ratio):
        yc = jnp.dot(
            rows_cat, cos_ref[j, :hop, :],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        ys = jnp.dot(
            rows_cat, sin_ref[j, :hop, :],
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        c += yc[j : j + fpb]
        s += ys[j : j + fpb]
    out_ref[:] = jnp.log10(c * c + s * s + eps)[:, :nf]


def _make_call(kernel, n_blocks, fpb, halo, hop, ratio, nfreq, nfreq_pad,
               interpret):
    """pallas_call over (n_blocks,) grid; step i reads waveform rows
    [i*fpb, (i+1)*fpb + halo) as two aligned blocks and writes frames
    [i*fpb, (i+1)*fpb). Requires fpb % halo == 0 (the halo block's index
    map counts in halo-row units)."""
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (fpb, hop), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (halo, hop), lambda i: ((i + 1) * (fpb // halo), 0),
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
            (fpb, nfreq), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * fpb, nfreq), jnp.float32),
        interpret=interpret,  # CPU test path; compiled Mosaic on TPU
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nperseg", "hop", "log", "eps", "frames_per_block", "interpret",
        "precision",
    ),
)
def spectrogram_pallas(
    x: jnp.ndarray,
    nperseg: int = 200,
    hop: int = 100,
    log: bool = True,
    eps: float = 1e-12,
    frames_per_block: int = 512,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Fused log-power spectrogram: (..., T) -> (..., n_frames, nfreq).

    Semantics identical to signal.stft.spectrogram. Requires
    nperseg % hop == 0 and hop <= 128 (hop-chunk layout).

    `precision` is an explicit opt-in surface, NOT a tuning knob:

    - "highest" (default): f32-exact MXU dots; parity with the oracle to
      the documented 3e-4 contract. EVERY product path uses this.
    - "default": the MXU's native reduced-precision multiplies. The
      roofline measurement (RESULTS.md "STFT roofline") shows the
      HIGHEST emulation is what caps the kernel (its bare-dot ceiling
      runs >=4x faster at DEFAULT), but DEFAULT shows O(1) log10 errors
      at near-zero DC/Nyquist bins (catastrophic cancellation) — callers
      must tolerate loose spectrograms and own that decision. Measured
      consequences on chip: throughput and a workflow-scale clustering
      A/B are recorded in RESULTS.md "Loose-precision STFT variant".
    """
    if precision not in ("highest", "default"):
        raise ValueError(
            f"precision must be 'highest' or 'default', got {precision!r}"
        )
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
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
    # halo rows each block reads past its own: enough for the last
    # frame's ratio-1 overhang, aligned to the f32 sublane tile (non-8-
    # multiple sublane DMA lengths fault at runtime on v5e)
    halo = _round_up(max(ratio - 1, 1), SUBLANE)
    fpb = _round_up(frames_per_block, halo)
    kernel = functools.partial(
        _stft_kernel, ratio=ratio, hop=hop, eps=eps, precision=prec
    )

    rows_avail = t // hop
    n_main = max((rows_avail - halo) // fpb, 0)
    frames_main = n_main * fpb  # always <= n_frames (halo >= ratio-1)
    tail_frames = n_frames - frames_main

    main_call = tail_call = None
    if n_main:
        main_call = _make_call(
            kernel, n_main, fpb, halo, hop, ratio, nfreq, nfreq_pad,
            interpret,
        )
    if tail_frames:
        # the < fpb + halo remaining frames run as one tiny grid step on
        # a zero-padded tail slice; fpb_t is halo-aligned so the halo
        # block's index map stays in whole blocks
        fpb_t = _round_up(tail_frames, halo)
        need_t = (fpb_t + halo) * hop
        tail_start = frames_main * hop
        tail_call = _make_call(
            kernel, 1, fpb_t, halo, hop, ratio, nfreq, nfreq_pad, interpret
        )

    def _one(x1):
        # staging is strictly per-waveform 2-D: the main grid reads the
        # natural (rows, hop) reshape with NO pad/stack copies (threading
        # a unit batch axis through staging ops costs ~2.5x the whole op
        # on v5e — benchmarks/stft_outslice_tpu.py A/B)
        parts = []
        if main_call is not None:
            x2 = x1[: rows_avail * hop].reshape(rows_avail, hop)
            parts.append(main_call(x2, x2, cos, sin))
        if tail_call is not None:
            seg = x1[tail_start : min(tail_start + need_t, t)]
            seg = jnp.pad(seg, (0, need_t - seg.shape[0]))
            xt = seg.reshape(fpb_t + halo, hop)
            parts.append(tail_call(xt, xt, cos, sin)[:tail_frames])
        return (
            jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        )

    flat = x.reshape(-1, t).astype(jnp.float32)
    if flat.shape[0] == 1:
        # single waveform: skip the vmap wrapper entirely — worth ~3x
        # standalone next to the narrow output (RESULTS.md)
        out = _one(flat[0])[None]
    else:
        # vmap folds the batch/channel axis into the kernel grid as one
        # pallas_call (lax.map would lower to a scan of C dependent calls,
        # repeating the grid prologue per channel with no cross-channel
        # pipelining)
        out = jax.vmap(_one)(flat)
    return out.reshape(*batch_shape, n_frames, nfreq)
