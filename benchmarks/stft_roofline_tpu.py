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
  d. bare f32 GEMMs at the packed model's naive implicit-GEMM conv
     shape (+ lane-full and square references) — the packed-train-step
     corollary: the shipped step's 26.6 effective TFLOPS already beats
     the naive formulation of its own dominant op, so a hand GEMM-shaped
     training kernel is a regression risk, not headroom

and prints the kernel's fraction of its measured ceiling — the number
that says whether more kernel engineering can pay without a precision
trade already rejected. Results recorded in RESULTS.md "STFT roofline".

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
MM_REPS = 7


def measure_matmul(precision, chain=240, m=ROWS, k=HOP, n=NFREQ_PAD):
    """TFLOPS of a bare (m, k) @ (k, n) f32 dot at the given precision,
    two-point chain timing. Defaults to the STFT kernel's geometry."""
    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((m, k)), jnp.float32
    )
    b = jnp.asarray(
        np.random.default_rng(1).standard_normal((k, n)), jnp.float32
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
                # FULL-output reduction: a scalar-slice dependency
                # (y[0, 0]) lets XLA slice-DCE the dot down to one row —
                # observed as impossible 1e9-TFLOPS readings on large
                # shapes and as an artificially LOW DEFAULT reading at
                # this one. jnp.sum forces the whole product.
                dep = jnp.sum(y) * 1e-30
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
    flop = 2 * m * k * n * chain
    rates = []
    for r in range(MM_REPS):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(a, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(c2(a, salt + 0.5))
        t2 = time.perf_counter() - t0
        if t2 - t1 <= 1e-6:
            # a stall during the SHORT chain makes t1 > t2: clamping
            # would mint an absurd high-outlier rate that the low-side
            # stall trim below cannot reject — drop the rep instead
            continue
        rates.append(flop / (t2 - t1) / 1e12)
    if not rates:
        return float("nan"), {"reps": 0}
    # stall-trimmed median (bench._rep_stats): a single tunnel stall
    # inside a ~25 ms timed delta halves that rep's apparent rate —
    # observed 10.4-vs-20.8-TFLOPS swings between whole runs before
    # trimming + longer chains
    from bench import _rep_stats

    med, spread = _rep_stats(rates)
    return med, spread


def main():
    out = {"platform": jax.devices()[0].platform}
    hi, hi_spread = measure_matmul(jax.lax.Precision.HIGHEST)
    out["matmul_highest_tflops"] = round(hi, 2)
    out["matmul_highest_spread"] = hi_spread
    de, de_spread = measure_matmul(jax.lax.Precision.DEFAULT)
    out["matmul_default_tflops"] = round(de, 2)
    out["matmul_default_spread"] = de_spread
    # packed-step corollary: the naive implicit-GEMM shape of the packed
    # model's dominant conv, a lane-full variant, and a square reference
    default = jax.lax.Precision.DEFAULT
    out["gemm_packed_conv_tflops"] = round(
        measure_matmul(default, chain=120, m=319488, k=256, n=32)[0], 2
    )
    out["gemm_lane_full_tflops"] = round(
        measure_matmul(default, chain=120, m=319488, k=256, n=128)[0], 2
    )
    out["gemm_square_tflops"] = round(
        measure_matmul(default, chain=120, m=65536, k=512, n=512)[0], 2
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
