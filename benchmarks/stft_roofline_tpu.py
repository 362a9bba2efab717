"""Empirical roofline for the shipped Pallas STFT kernel.

The kernel's dots run `precision=HIGHEST` (mandatory: DEFAULT shows O(1)
log-scale errors at near-zero DC/Nyquist bins, and bf16x3 basis
splitting was measured at 2.3e-2 vs the 3e-4 parity contract —
RESULTS.md "STFT interior"). HIGHEST f32 on the v5e MXU is a multi-pass
emulation, so the kernel's honest ceiling is NOT the 197-TFLOPS bf16
peak or the ~49-TFLOPS f32 figure — it is the measured rate of a bare
HIGHEST-precision matmul at the kernel's own skinny contraction
geometry ((rows, hop) @ (hop, nfreq_pad), hop=100 against the 128-wide
MXU). This script measures:

  a. bare matmul TFLOPS at kernel geometry, precision=HIGHEST
  b. the same at precision=DEFAULT (what giving up parity would buy)
  c. the shipped kernel's effective TFLOPS (from its samples/s)

and prints the kernel's fraction of its measured ceiling — the number
that says whether more kernel engineering can pay without a precision
trade already rejected.

Timing: two-point dependency chains (L vs 2L) with value fetches —
the tunnel memoizes identical executes and block_until_ready is not a
real sync here (CLAUDE.md).

Run from /root/repo:  python benchmarks/stft_roofline_tpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

HOP = 100
NFREQ_PAD = 128
ROWS = 40_000  # ~ one grid body's worth of rows x many, amortized
REPS = 5


def _median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def measure_matmul(precision, chain=60):
    """TFLOPS of (ROWS, HOP) @ (HOP, NFREQ_PAD) at the given precision,
    two-point chain timing."""
    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((ROWS, HOP)), jnp.float32
    )
    b = jnp.asarray(
        np.random.default_rng(1).standard_normal((HOP, NFREQ_PAD)),
        jnp.float32,
    )

    def make(length):
        @jax.jit
        def run(a, salt):
            def body(carry, _):
                ac, acc = carry
                y = jnp.dot(
                    ac, b, preferred_element_type=jnp.float32,
                    precision=precision,
                )
                dep = y[0, 0] * 1e-30
                ac = ac.at[0, 0].add(dep + salt + 1.0)
                return (ac, acc + dep), None

            (ac, acc), _ = jax.lax.scan(
                body, (a, jnp.float32(0.0)), None, length=length
            )
            return acc + ac[0, 0]

        return run

    c1, c2 = make(chain), make(2 * chain)
    float(c1(a, jnp.float32(0.0)))
    float(c2(a, jnp.float32(0.0)))
    flop = 2 * ROWS * HOP * NFREQ_PAD * chain
    rates = []
    for r in range(REPS):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(a, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(c2(a, salt + 0.5))
        t2 = time.perf_counter() - t0
        rates.append(flop / max(t2 - t1, 1e-9) / 1e12)
    return _median(rates)


def main():
    out = {"platform": jax.devices()[0].platform}
    out["matmul_highest_tflops"] = round(
        measure_matmul(jax.lax.Precision.HIGHEST), 2
    )
    out["matmul_default_tflops"] = round(
        measure_matmul(jax.lax.Precision.DEFAULT), 2
    )

    # shipped kernel throughput on the same chip, same harness as bench
    from bench import measure_stft_throughput

    rate, _, spread = measure_stft_throughput(
        n_wave_samples=4_000_000, chain_len=160, reps=REPS
    )
    out["kernel_gsamples_per_sec"] = round(rate / 1e9, 2)
    out["kernel_spread"] = spread
    # FLOP accounting per waveform sample at nperseg=200/hop=100:
    # ratio x (cos+sin) dots of (rows, hop) @ (hop, NFREQ_PAD) per
    # hop-row of `hop` samples -> 2*2*2*hop*NFREQ_PAD/hop = 1024
    flop_per_sample = 2 * 2 * 2 * NFREQ_PAD
    out["kernel_effective_tflops"] = round(
        rate * flop_per_sample / 1e12, 2
    )
    out["kernel_pct_of_highest_ceiling"] = round(
        100.0 * out["kernel_effective_tflops"]
        / out["matmul_highest_tflops"], 1,
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
