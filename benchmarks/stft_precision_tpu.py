"""STFT kernel micro-architecture experiment: folded-K bases + MXU precision.

The shipped `ops.pallas_stft` kernel issues 2*ratio separate
(F, 128) @ (128, nfreq_pad) matmuls per grid block at
`Precision.HIGHEST` (bf16x6: six MXU passes per f32 matmul). Two untested
levers remain:

1. **Fold the hop-plane loop into K and the cos|sin pair into N**: stage
   rows as (F, ratio*LANE) host-side and concatenate the windowed DFT
   bases to (ratio*LANE, 2*nfreq_pad), so each block is ONE
   (F, 256) @ (256, 256) matmul — fewer, squarer MXU dispatches, same
   FLOPs.
2. **Precision.HIGH (bf16x3: three passes, 2x the HIGHEST issue rate)**:
   HIGHEST was adopted in round 1 after DEFAULT (one bf16 pass) showed
   O(1) log10 errors at near-zero DC/Nyquist bins; the intermediate
   bf16x3 mode was never measured for accuracy or speed.

Accuracy gate: max abs log10 error vs `signal.stft.spectrogram` (the
parity oracle `tests/test_signal.py` pins the shipped kernel to at
1.2e-4) AND vs a float64 numpy oracle, on the same normal-noise input
class that exposed the DEFAULT-precision cancellation.

Timing: scan dependency chain + value fetch (chain-50), median of 3 —
the remote tunnel memoizes identical executes and `block_until_ready`
is not a real sync here (benchmarks/RESULTS.md "Tuning notes").

Run from /root/repo:  python benchmarks/stft_precision_tpu.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def _folded_bases(nperseg, hop, nfreq_pad):
    """cos|sin bases with the hop-chunk planes stacked along K:
    (ratio*LANE, 2*nfreq_pad); K rows [j*LANE, j*LANE+hop) hold windowed
    basis rows [j*hop, (j+1)*hop), cos in N[:nfreq_pad], sin after."""
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
    basis = np.zeros((ratio * LANE, 2 * nfreq_pad), np.float32)
    for j in range(ratio):
        basis[j * LANE : j * LANE + hop, :nfreq] = full_cos[
            j * hop : (j + 1) * hop
        ]
        basis[j * LANE : j * LANE + hop, nfreq_pad : nfreq_pad + nfreq] = (
            full_sin[j * hop : (j + 1) * hop]
        )
    return jnp.asarray(basis)


def _folded_kernel(rows_ref, basis_ref, out_ref, *, nfreq_pad, eps, prec):
    cs = jnp.dot(
        rows_ref[:], basis_ref[:],
        preferred_element_type=jnp.float32, precision=prec,
    )
    c = cs[:, :nfreq_pad]
    s = cs[:, nfreq_pad:]
    out_ref[:] = jnp.log10(c * c + s * s + eps)


def _folded_kernel_b3(rows_ref, bhi_ref, blo_ref, out_ref, *, nfreq_pad, eps):
    """Hand-rolled bf16x3: Mosaic rejects Precision.HIGH, so split each
    f32 operand into a bf16 hi + bf16 residual and issue three
    DEFAULT-precision (single-pass) MXU dots with f32 accumulation —
    half the passes of HIGHEST's bf16x6, error ~2^-24 per product."""
    rows = rows_ref[:]
    r_hi = rows.astype(jnp.bfloat16)
    r_lo = (rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    cs = dot(r_hi, bhi_ref[:]) + dot(r_hi, blo_ref[:]) + dot(
        r_lo, bhi_ref[:]
    )
    c = cs[:, :nfreq_pad]
    s = cs[:, nfreq_pad:]
    out_ref[:] = jnp.log10(c * c + s * s + eps)


@functools.partial(
    jax.jit, static_argnames=("nperseg", "hop", "eps", "fpb", "prec")
)
def spectrogram_folded(
    x, nperseg=200, hop=100, eps=1e-12, fpb=256,
    prec=jax.lax.Precision.HIGHEST,
):
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    nfreq = nperseg // 2 + 1
    nfreq_pad = _round_up(nfreq, LANE)
    ratio = nperseg // hop
    basis = _folded_bases(nperseg, hop, nfreq_pad)

    n_blocks = -(-n_frames // fpb)
    rows_padded = n_blocks * fpb
    rows_needed = rows_padded + ratio - 1
    need = rows_needed * hop
    x2 = x.reshape(-1, t).astype(jnp.float32)
    x2 = jnp.pad(x2[:, :need], ((0, 0), (0, max(0, need - t))))
    x2 = x2.reshape(-1, rows_needed, hop)
    if hop < LANE:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, LANE - hop)))
    # host-side staging: row f = [x2[f] | x2[f+1] | ...] — one (F, r*128)
    # operand per block instead of `ratio` shifted planes
    rows = jnp.concatenate(
        [x2[:, j : j + rows_padded, :] for j in range(ratio)], axis=-1
    )  # (B, rows_padded, ratio*LANE)

    kernel = functools.partial(
        _folded_kernel, nfreq_pad=nfreq_pad, eps=eps, prec=prec
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (fpb, ratio * LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ratio * LANE, 2 * nfreq_pad), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (fpb, nfreq_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * fpb, nfreq_pad), jnp.float32
        ),
    )
    out = jax.vmap(call, in_axes=(0, None))(rows, basis)
    out = out[:, :n_frames, :nfreq]
    return out.reshape(*batch_shape, n_frames, nfreq)


@functools.partial(jax.jit, static_argnames=("nperseg", "hop", "eps", "fpb"))
def spectrogram_folded_b3(x, nperseg=200, hop=100, eps=1e-12, fpb=256):
    """Folded layout + hand-rolled bf16x3 dots (see _folded_kernel_b3)."""
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    nfreq = nperseg // 2 + 1
    nfreq_pad = _round_up(nfreq, LANE)
    ratio = nperseg // hop
    basis = _folded_bases(nperseg, hop, nfreq_pad)
    b_hi = basis.astype(jnp.bfloat16)
    b_lo = (basis - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    n_blocks = -(-n_frames // fpb)
    rows_padded = n_blocks * fpb
    rows_needed = rows_padded + ratio - 1
    need = rows_needed * hop
    x2 = x.reshape(-1, t).astype(jnp.float32)
    x2 = jnp.pad(x2[:, :need], ((0, 0), (0, max(0, need - t))))
    x2 = x2.reshape(-1, rows_needed, hop)
    if hop < LANE:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, LANE - hop)))
    rows = jnp.concatenate(
        [x2[:, j : j + rows_padded, :] for j in range(ratio)], axis=-1
    )

    kernel = functools.partial(
        _folded_kernel_b3, nfreq_pad=nfreq_pad, eps=eps
    )
    bspec = pl.BlockSpec(
        (ratio * LANE, 2 * nfreq_pad), lambda i: (0, 0),
        memory_space=pltpu.VMEM,
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (fpb, ratio * LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            bspec,
            bspec,
        ],
        out_specs=pl.BlockSpec(
            (fpb, nfreq_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * fpb, nfreq_pad), jnp.float32
        ),
    )
    out = jax.vmap(call, in_axes=(0, None, None))(rows, b_hi, b_lo)
    out = out[:, :n_frames, :nfreq]
    return out.reshape(*batch_shape, n_frames, nfreq)


def _f64_oracle(x, nperseg=200, hop=100, eps=1e-12):
    from spectrogram_cube_clustering_tpu.signal.stft import (
        np_dft_angles,
        np_hann,
    )

    x = np.asarray(x, np.float64)
    cos_a, sin_a = np_dft_angles(nperseg)
    win = np_hann(nperseg)
    n_frames = (len(x) - nperseg) // hop + 1
    idx = np.arange(nperseg)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * win[None, :]
    c = frames @ cos_a.astype(np.float64)
    s = frames @ sin_a.astype(np.float64)
    return np.log10(c * c + s * s + eps)


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    P = jax.lax.Precision
    rng = np.random.default_rng(0)

    # ---- accuracy gate (200k samples; normal noise exposed the
    # DEFAULT-precision cancellation in round 1) ----
    xa = rng.normal(size=(200_000,)).astype(np.float32)
    ref64 = _f64_oracle(xa)
    oracle = np.asarray(spectrogram(jnp.asarray(xa)))
    acc = {}
    variants = {
        "shipped_HIGHEST": lambda v: spectrogram_pallas(v),
        "folded_HIGHEST": lambda v: spectrogram_folded(v, prec=P.HIGHEST),
        "folded_bf16x3": lambda v: spectrogram_folded_b3(v),
        "folded_DEFAULT": lambda v: spectrogram_folded(v, prec=P.DEFAULT),
    }
    for name, fn in variants.items():
        out = np.asarray(fn(jnp.asarray(xa)))
        acc[name] = {
            "max_abs_vs_oracle": float(np.max(np.abs(out - oracle))),
            "max_abs_vs_f64": float(np.max(np.abs(out - ref64))),
        }
        print(name, acc[name], flush=True)

    # ---- throughput (4M samples, chain-50, median of 3) ----
    n = 4_000_000
    reps = 50
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    results = {}

    def timed(name, fn):
        @jax.jit
        def chain(x, salt):
            def body(carry, _):
                out = fn(x + carry + salt)
                return jnp.mean(out) * 1e-6, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        t0 = time.perf_counter()
        float(chain(x, jnp.float32(0.0)))  # compile + warm
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
        rates = []
        for r in range(3):
            t0 = time.perf_counter()
            float(chain(x, jnp.float32(1.0 + r)))
            rates.append(n * reps / (time.perf_counter() - t0))
        rates.sort()
        results[name] = round(rates[1] / 1e6, 1)
        print(f"{name}: {rates[1] / 1e6:.0f} Msamples/s "
              f"(min {rates[0] / 1e6:.0f}, max {rates[2] / 1e6:.0f})",
              flush=True)

    timed("shipped_HIGHEST", lambda v: spectrogram_pallas(v))
    timed("folded_HIGHEST", lambda v: spectrogram_folded(v, prec=P.HIGHEST))
    timed("folded_bf16x3", lambda v: spectrogram_folded_b3(v))

    print(json.dumps({"accuracy": acc, "throughput_Msps": results}))


if __name__ == "__main__":
    main()
