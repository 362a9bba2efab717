"""Validate a low-overhead STFT timing harness.

stft_isolate_tpu.py showed the chain harness itself costs 641us/rep on a
4M-sample input (full-array add + full-output mean + scan step), while
the shipped kernel's interior is ~242us — i.e. the published
3.4 Gsamples/s headline is ~75% harness. The fix: thread the waveform
through the scan as a carry with an O(1) data-dependent perturbation
(defeats loop-invariant hoisting and tunnel memoization), and take the
per-step dependency from a tiny slice of the output (the pallas_call is
opaque to XLA, so the whole spectrogram still executes).

Validation here, all on-chip:
  1. linearity: reps=50 vs reps=100 per-rep times agree (work really
     executes per step, nothing is hoisted or memoized);
  2. agreement: new-harness per-rep ~= old-harness interior (old minus
     chain_only, both measured in stft_isolate_tpu.py);
  3. sensitivity: different salts give different fetched values.

Run from /root/repo:  python benchmarks/stft_harness_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def chain_rate(fn, x, reps, fetch=True):
    """Low-overhead dependency chain: x is the scan carry, perturbed in
    place by an epsilon of the previous step's (tiny-slice) output."""

    @jax.jit
    def chain(x, salt):
        def body(carry, _):
            xc, acc = carry
            out = fn(xc)
            dep = jnp.sum(out[..., :1, :8]) * 1e-30
            # in-place on the aliased scan carry: O(1), not an O(N) add.
            # The +1.0+salt keeps the perturbation representable in f32
            # (a bare 1e-30 epsilon would round away and leave xc — and
            # the per-step spectrogram input — bit-identical).
            xc = xc.at[0].add(dep + salt + 1.0)
            return (xc, acc + dep), None

        (xc, acc), _ = jax.lax.scan(
            body, (x, jnp.float32(0.0)), None, length=reps
        )
        return acc + xc[0]

    t0 = time.perf_counter()
    v0 = float(chain(x, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    rates, vals = [], []
    for r in range(3):
        t0 = time.perf_counter()
        vals.append(float(chain(x, jnp.float32(1.0 + r))))
        rates.append(x.shape[-1] * reps / (time.perf_counter() - t0))
    rates.sort()
    return rates[1], compile_s, vals


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )

    n = 4_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    out = {}
    for reps in (50, 100):
        rate, comp, vals = chain_rate(spectrogram_pallas, x, reps)
        out[f"reps{reps}_Msps"] = round(rate / 1e6, 1)
        out[f"reps{reps}_us_per_rep"] = round(n / rate * 1e6, 1)
        print(f"reps={reps}: {rate / 1e6:.0f} Msamples/s "
              f"({n / rate * 1e6:.0f} us/rep, compile {comp:.1f}s), "
              f"salt values {vals}", flush=True)
        # sensitivity: distinct salts must produce distinct fetches
        assert len({f"{v:.17g}" for v in vals}) == len(vals), vals

    print(json.dumps(out))


if __name__ == "__main__":
    main()
