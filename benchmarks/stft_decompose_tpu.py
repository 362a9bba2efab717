"""Where does the STFT kernel's time actually go?

The precision experiment (stft_precision_tpu.py) showed halving the MXU
pass count (bf16x3 vs HIGHEST's bf16x6) moves throughput only +7% — so
at ~3.5 Gsamples/s the matmul is ~15% of step time and something else
binds. First-principles budget for 4M samples (40k frames, fpb=256):
staging ~150us of HBM traffic, matmul ~160us at HIGHEST, log10 ~50us —
yet the measured step is ~1.1ms. This script times the pieces:

  stage_only    host-side layout staging (pad/stack/reshape), no kernel
  kernel_nolog  full kernel with the log10 epilogue replaced by c*c+s*s
  kernel_nopow  full kernel writing just c (one matmul family exercised)
  full          the shipped spectrogram_pallas

Timing: chain-50 dependency scan + value fetch, median of 3 (tunnel
memoization / fake-sync hazards, benchmarks/RESULTS.md).

Run from /root/repo:  python benchmarks/stft_decompose_tpu.py
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


def _stage(x, nperseg=200, hop=100, fpb=256):
    """The shipped kernel's host-side staging (ops/pallas_stft.py)."""
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    ratio = nperseg // hop
    n_blocks = -(-n_frames // fpb)
    rows_padded = n_blocks * fpb
    rows_needed = rows_padded + ratio - 1
    need = rows_needed * hop
    x2 = x.reshape(-1, t).astype(jnp.float32)
    x2 = jnp.pad(x2[:, :need], ((0, 0), (0, max(0, need - t))))
    x2 = x2.reshape(-1, rows_needed, hop)
    if hop < LANE:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, LANE - hop)))
    planes = jnp.stack(
        [x2[:, j : j + rows_padded, :] for j in range(ratio)], axis=1
    )
    return planes, n_blocks, n_frames


def _variant_kernel(planes_ref, cos_ref, sin_ref, out_ref, *, ratio, mode):
    c = jnp.zeros(out_ref.shape, jnp.float32)
    s = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(ratio):
        rows = planes_ref[j]
        c += jnp.dot(
            rows, cos_ref[j], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if mode != "nopow":
            s += jnp.dot(
                rows, sin_ref[j], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    if mode == "nopow":
        out_ref[:] = c
    elif mode == "nolog":
        out_ref[:] = c * c + s * s + 1e-12
    else:
        out_ref[:] = jnp.log10(c * c + s * s + 1e-12)


@functools.partial(jax.jit, static_argnames=("mode", "fpb"))
def variant(x, mode="full", fpb=256):
    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        _windowed_dft_bases,
    )

    nperseg, hop = 200, 100
    ratio = nperseg // hop
    nfreq = nperseg // 2 + 1
    nfreq_pad = _round_up(nfreq, LANE)
    cos, sin = _windowed_dft_bases(nperseg, hop, nfreq_pad)
    planes, n_blocks, n_frames = _stage(x, nperseg, hop, fpb)
    if mode == "stage_only":
        return planes.sum(axis=(1, 2, 3))
    kernel = functools.partial(_variant_kernel, ratio=ratio, mode=mode)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ratio, fpb, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ratio, LANE, nfreq_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ratio, LANE, nfreq_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fpb, nfreq_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * fpb, nfreq_pad), jnp.float32
        ),
    )
    out = jax.vmap(call, in_axes=(0, None, None))(planes, cos, sin)
    return out[:, :n_frames, :nfreq]


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = 4_000_000
    reps = 50
    rng = np.random.default_rng(0)
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
        float(chain(x, jnp.float32(0.0)))
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

    timed("stage_only", lambda v: variant(v, mode="stage_only"))
    timed("kernel_nopow", lambda v: variant(v, mode="nopow"))
    timed("kernel_nolog", lambda v: variant(v, mode="nolog"))
    timed("full", lambda v: variant(v, mode="full"))

    print(json.dumps({"throughput_Msps": results}))


if __name__ == "__main__":
    main()
