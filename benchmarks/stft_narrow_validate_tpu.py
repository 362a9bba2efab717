"""Validate the integrated narrow-output STFT kernel on the real chip.

Round-3 integration of benchmarks/stft_outslice_tpu.py's finding: writing
the nfreq-lane output block directly from the kernel (no host-side
lane-slice copy) plus skipping the B=1 vmap wrapper took the standalone
kernel from 484us to 161us per 4M samples (8.3 -> 24.8 Gsamples/s).
This script checks, post-integration into ops/pallas_stft.py:
  1. parity: 1-D, batched (4, T) multichannel, and the sharded halo path
     all match signal.stft.spectrogram to the shipped tolerance;
  2. throughput: two-point dependency-chain rates for the 1-D and
     batched entry points (the batched path keeps the vmap grid fold).

Run from /root/repo:  python benchmarks/stft_narrow_validate_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def two_point_rate(fn, x, label, results, chain_len=100):
    n = int(np.prod(x.shape))

    def make_chain(length):
        @jax.jit
        def chain(x, salt):
            def body(carry, _):
                xc, acc = carry
                out = fn(xc)
                dep = jnp.sum(out[..., :1, :8]) * 1e-30
                xc = xc.at[(0,) * xc.ndim].add(dep + salt + 1.0)
                return (xc, acc + dep), None

            (xc, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0.0)), None, length=length
            )
            return acc + xc[(0,) * xc.ndim]

        return chain

    c1, c2 = make_chain(chain_len), make_chain(2 * chain_len)
    float(c1(x, jnp.float32(0.0)))
    float(c2(x, jnp.float32(0.0)))
    rates = []
    for r in range(3):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(x, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(c2(x, salt + 0.5))
        t2 = time.perf_counter() - t0
        rates.append(n * chain_len / max(t2 - t1, 1e-9))
    rates.sort()
    results[label] = {
        "Msps": round(rates[1] / 1e6, 1),
        "us_per_rep": round(n / rates[1] * 1e6, 1),
        "spread_pct": round(100 * (rates[2] - rates[0]) / rates[1], 1),
    }
    print(f"{label}: {rates[1] / 1e6:.0f} Msamples/s "
          f"({n / rates[1] * 1e6:.0f} us/rep)", flush=True)


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.parallel.halo import (
        sharded_spectrogram,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(200_000,)).astype(np.float32))
    xb = jnp.asarray(rng.normal(size=(4, 200_000)).astype(np.float32))

    ref1 = np.asarray(spectrogram(x1))
    refb = np.asarray(spectrogram(xb))
    e1 = float(np.max(np.abs(np.asarray(spectrogram_pallas(x1)) - ref1)))
    eb = float(np.max(np.abs(np.asarray(spectrogram_pallas(xb)) - refb)))
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("data",))
    es = float(np.max(np.abs(
        np.asarray(sharded_spectrogram(x1, mesh=mesh)) - ref1
    )))
    print(f"parity: 1d {e1:.3e}  batched {eb:.3e}  sharded {es:.3e}",
          flush=True)
    assert max(e1, eb, es) <= 5e-4, (e1, eb, es)

    n = 4_000_000
    xt = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    xtb = jnp.asarray(rng.normal(size=(4, n // 4)).astype(np.float32))
    results = {}
    two_point_rate(spectrogram_pallas, xt, "narrow_1d", results)
    two_point_rate(spectrogram_pallas, xtb, "narrow_batched4", results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
