"""Decisive STFT cost isolation.

Prior experiments were confounded two ways: the dependency-chain harness
itself caps at ~6.4 Gsamples/s (chain_only, stft_stage_tpu.py), and XLA
fuses the staging into any jnp reduction used to "time" it — but NOT
into a pallas_call, whose operands must materialize. So this times the
full pipeline (staging + pallas) with three kernels:

  passthrough  out = planes[0] + planes[1]  — staging materialization,
               kernel DMA, grid overhead; zero MXU / transcendental work
  default      the real kernel at Precision.DEFAULT (1 bf16 MXU pass;
               numerically unusable, speed bound only)
  highest      the shipped kernel (bf16x6)

interior(variant) = 1/rate - 1/chain_rate splits into
  passthrough            = memory + pallas overhead
  default - passthrough  = one-pass matmul + log10 epilogue
  highest - default      = the five extra precision passes

Run from /root/repo:  python benchmarks/stft_isolate_tpu.py
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


def _kernel(planes_ref, cos_ref, sin_ref, out_ref, *, ratio, mode):
    if mode == "passthrough":
        acc = planes_ref[0]
        for j in range(1, ratio):
            acc = acc + planes_ref[j]
        out_ref[:] = acc[:, : out_ref.shape[1]] if (
            acc.shape[1] != out_ref.shape[1]
        ) else acc
        return
    prec = (
        jax.lax.Precision.DEFAULT
        if mode == "default"
        else jax.lax.Precision.HIGHEST
    )
    c = jnp.zeros(out_ref.shape, jnp.float32)
    s = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(ratio):
        rows = planes_ref[j]
        c += jnp.dot(rows, cos_ref[j], preferred_element_type=jnp.float32,
                     precision=prec)
        s += jnp.dot(rows, sin_ref[j], preferred_element_type=jnp.float32,
                     precision=prec)
    out_ref[:] = jnp.log10(c * c + s * s + 1e-12)


@functools.partial(jax.jit, static_argnames=("mode", "fpb"))
def pipeline(x, mode="highest", fpb=256):
    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        _windowed_dft_bases,
    )

    nperseg, hop = 200, 100
    ratio = nperseg // hop
    nfreq_pad = LANE
    cos, sin = _windowed_dft_bases(nperseg, hop, nfreq_pad)
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    n_blocks = -(-n_frames // fpb)
    rows_padded = n_blocks * fpb
    rows_needed = rows_padded + ratio - 1
    need = rows_needed * hop
    x2 = jnp.pad(x[:need], (0, max(0, need - t))).reshape(rows_needed, hop)
    x2 = jnp.pad(x2, ((0, 0), (0, LANE - hop)))
    planes = jnp.stack([x2[j : j + rows_padded] for j in range(ratio)])

    kernel = functools.partial(_kernel, ratio=ratio, mode=mode)
    out_lanes = LANE if mode == "passthrough" else nfreq_pad
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
        out_specs=pl.BlockSpec((fpb, out_lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * fpb, out_lanes), jnp.float32
        ),
    )
    return call(planes, cos, sin)


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

    timed("chain_only", lambda v: v[:8])
    timed("passthrough", lambda v: pipeline(v, mode="passthrough"))
    timed("default", lambda v: pipeline(v, mode="default"))
    timed("highest", lambda v: pipeline(v, mode="highest"))
    timed("passthrough_fpb1024",
          lambda v: pipeline(v, mode="passthrough", fpb=1024))

    # interior microseconds per 4M samples, chain overhead removed
    base = 1e6 * n / (results["chain_only"] * 1e6)
    interior = {
        k: round(1e6 * n / (v * 1e6) - base, 1)
        for k, v in results.items() if k != "chain_only"
    }
    print(json.dumps(
        {"throughput_Msps": results, "interior_us_per_4M": interior}
    ))


if __name__ == "__main__":
    main()
