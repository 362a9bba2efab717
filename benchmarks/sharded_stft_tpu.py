"""Sharded-STFT per-device throughput on the real chip.

Measures `parallel.sharded_spectrogram` (halo exchange + per-shard kernel
under shard_map) on a 1-device TPU mesh — the only real-chip mesh this
environment exposes — with the Pallas kernel vs the XLA rfft path, against
the unsharded `spectrogram_pallas` flagship number. Validates that routing
the fused kernel through the sharded path keeps Pallas-class per-device
throughput (VERDICT r2 missing #1).

Timing uses a scan dependency chain + value fetch (the remote tunnel
memoizes repeated identical executes; bench.py measure_stft_throughput).

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
    reps = 50  # long chain: short ones measure tunnel RTT, not the chip
    mesh = make_data_mesh()
    print(f"mesh: {mesh.devices.size} device(s), backend {jax.default_backend()}")

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n,)).astype(np.float32)
    )

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
        print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        float(chain(x, jnp.float32(1.0)))
        dt = (time.perf_counter() - t0) / reps
        rate = n / dt
        results[name] = rate
        print(f"{name}: {rate / 1e6:.0f} Msamples/s")

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
