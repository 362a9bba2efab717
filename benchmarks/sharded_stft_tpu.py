"""Sharded-STFT per-device throughput on the real chip.

Measures `parallel.sharded_spectrogram` (halo exchange + per-shard kernel
under shard_map) on a 1-device TPU mesh — the only real-chip mesh this
environment exposes — with the Pallas kernel vs the XLA rfft path, against
the unsharded `spectrogram_pallas` flagship number. Validates that routing
the fused kernel through the sharded path keeps Pallas-class per-device
throughput (VERDICT r2 missing #1).

Timing uses the two-point O(1)-dependency chain harness (chains of L
and 2L reps, rate = n*L/(t2-t1) — cancels the tunnel's per-dispatch
fixed cost and adds no per-rep work; bench.py measure_stft_throughput).

Run from /root/repo:  python benchmarks/sharded_stft_tpu.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.core import make_data_mesh
    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.parallel import sharded_spectrogram
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    n = 4_000_000
    mesh = make_data_mesh()
    print(f"mesh: {mesh.devices.size} device(s), backend {jax.default_backend()}")

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n,)).astype(np.float32)
    )

    results = {}

    def timed(name, fn, chain_len=100):
        def make_chain(length):
            @jax.jit
            def chain(x, salt):
                def body(carry, _):
                    xc, acc = carry
                    out = fn(xc)
                    dep = jnp.sum(out[..., :1, :8]) * 1e-30
                    xc = xc.at[0].add(dep + salt + 1.0)
                    return (xc, acc + dep), None

                (xc, acc), _ = jax.lax.scan(
                    body, (x, jnp.float32(0.0)), None, length=length
                )
                return acc + xc[0]

            return chain

        c1, c2 = make_chain(chain_len), make_chain(2 * chain_len)
        t0 = time.perf_counter()
        float(c1(x, jnp.float32(0.0)))  # compile + warm
        float(c2(x, jnp.float32(0.0)))
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
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
        results[name] = rates[1]
        print(f"{name}: {rates[1] / 1e6:.0f} Msamples/s "
              f"(spread {100 * (rates[2] - rates[0]) / rates[1]:.0f}%)")

    timed("unsharded_pallas", lambda v: spectrogram_pallas(v))
    timed(
        "sharded_pallas",
        lambda v: sharded_spectrogram(v, mesh, use_pallas=True),
    )
    timed(
        "sharded_rfft",
        lambda v: sharded_spectrogram(v, mesh, use_pallas=False),
    )
    timed("unsharded_rfft", lambda v: spectrogram(v))

    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
