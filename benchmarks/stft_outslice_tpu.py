"""Kill the STFT output-slice copy: write nfreq lanes from the kernel.

stft_harness_tpu.py pinned the shipped spectrogram_pallas interior at
~465us/4M while the core pipeline (padded output, no vmap) runs ~242us:
the trailing `out[:, :n_frames, :nfreq]` lane-slice copy plus the vmap
wrapper cost as much as the whole kernel when the op runs standalone.
This tests writing the (fpb, nfreq) block directly from the kernel (the
HBM out array is nfreq-wide; only the row slice remains host-side) and
bypassing the B=1 vmap.

Timing: two-point dependency chain (reps 100 minus reps 50) — removes
the per-dispatch fixed cost (~40ms tunnel RTT) exactly.

Run from /root/repo:  python benchmarks/stft_outslice_tpu.py
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


def _kernel(planes_ref, cos_ref, sin_ref, out_ref, *, ratio):
    nf = out_ref.shape[1]
    c = jnp.zeros((planes_ref.shape[1], cos_ref.shape[2]), jnp.float32)
    s = jnp.zeros_like(c)
    for j in range(ratio):
        rows = planes_ref[j]
        c += jnp.dot(rows, cos_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        s += jnp.dot(rows, sin_ref[j], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.log10(c * c + s * s + 1e-12)[:, :nf]


@functools.partial(jax.jit, static_argnames=("fpb",))
def spectrogram_narrow(x, fpb=256):
    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        _windowed_dft_bases,
    )

    nperseg, hop = 200, 100
    ratio = nperseg // hop
    nfreq = nperseg // 2 + 1
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

    kernel = functools.partial(_kernel, ratio=ratio)
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
        out_specs=pl.BlockSpec((fpb, nfreq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * fpb, nfreq), jnp.float32
        ),
    )
    out = call(planes, cos, sin)
    return out[:n_frames]


def two_point_rate(fn, x, label, results):
    n = x.shape[-1]

    def run(reps):
        @jax.jit
        def chain(x, salt):
            def body(carry, _):
                xc, acc = carry
                out = fn(xc)
                dep = jnp.sum(out[..., :1, :8]) * 1e-30
                xc = xc.at[0].add(dep + salt + 1.0)
                return (xc, acc + dep), None

            (xc, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0.0)), None, length=reps
            )
            return acc + xc[0]

        t0 = time.perf_counter()
        float(chain(x, jnp.float32(0.0)))
        comp = time.perf_counter() - t0
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(chain(x, jnp.float32(1.0 + r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1], comp

    t50, c50 = run(50)
    t100, c100 = run(100)
    per_rep = (t100 - t50) / 50
    rate = n / per_rep
    results[label] = {
        "Msps": round(rate / 1e6, 1),
        "us_per_rep": round(per_rep * 1e6, 1),
        "fixed_ms_per_dispatch": round((2 * t50 - t100) * 1e3, 1),
    }
    print(f"{label}: {rate / 1e6:.0f} Msamples/s ({per_rep * 1e6:.0f} "
          f"us/rep; compiles {c50:.1f}/{c100:.1f}s)", flush=True)


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(200_000,)).astype(np.float32))
    ref = np.asarray(spectrogram(xa))
    got = np.asarray(spectrogram_narrow(xa))
    err = float(np.max(np.abs(got - ref)))
    ship = float(np.max(np.abs(np.asarray(spectrogram_pallas(xa)) - ref)))
    print(f"accuracy narrow {err:.3e} vs shipped {ship:.3e}", flush=True)
    assert err <= max(2e-3, ship * 1.5), err

    n = 4_000_000
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    results = {}
    two_point_rate(spectrogram_pallas, x, "shipped", results)
    two_point_rate(spectrogram_narrow, x, "narrow_out", results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
