"""Staging micro-breakdown: what does the pitch-100 relayout really cost?

stft_conv_tpu.py measured the bare (T,) -> (rows, 100) reshape at
5.7 Gsamples/s — but every timed variant shares the dependency-chain
overhead (a (T,) elementwise add + mean per rep), which on a 1-D layout
may itself be slow. This pins:

  chain_only      the timing harness alone (add + mean)
  reshape128      (T,) -> (R, 128) aligned reshape + sum
  reshape100      (T,) -> (R, 100) pitch conversion + sum
  stage_full      the shipped kernel's staging (pad + stack) + sum
  stage_then_sum2 staging but summing planes along lanes only (rules out
                  the reduction shape as the confound)

Run from /root/repo:  python benchmarks/stft_stage_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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

    rows100 = n // 100

    def stage(v):
        """The shipped staging for nperseg=200, hop=100, fpb=256."""
        fpb, ratio, hop = 256, 2, 100
        n_frames = (n - 200) // 100 + 1
        n_blocks = -(-n_frames // fpb)
        rows_padded = n_blocks * fpb
        rows_needed = rows_padded + ratio - 1
        need = rows_needed * hop
        x2 = jnp.pad(v[:need], (0, max(0, need - n))).reshape(
            rows_needed, hop
        )
        x2 = jnp.pad(x2, ((0, 0), (0, 128 - hop)))
        return jnp.stack(
            [x2[j : j + rows_padded] for j in range(ratio)], axis=0
        )

    timed("chain_only", lambda v: v[:8])
    timed("reshape128", lambda v: v.reshape(-1, 128).sum(axis=1))
    timed("reshape100", lambda v: v[: rows100 * 100].reshape(-1, 100).sum(axis=1))
    timed("stage_full", lambda v: stage(v).sum(axis=(0, 2)))
    timed("stage_then_sum2", lambda v: stage(v).sum(axis=2).ravel()[:8])

    print(json.dumps({"throughput_Msps": results}))


if __name__ == "__main__":
    main()
