"""Conv-formulated STFT vs the Pallas kernel.

stft_decompose_tpu.py showed the shipped Pallas pipeline is bound by its
HOST-SIDE staging (the pitch-100 -> 128-lane relayout runs at ~61 GB/s
effective, ~85% of step time), not by the kernel. But the windowed-DFT
spectrogram is exactly a strided 1-D convolution:

    c[f, k] = sum_t x[hop*f + t] * (win[t] * cos_k[t])

i.e. 2*nfreq filters of width nperseg at stride hop — and XLA's TPU conv
pipeline performs the framing internally (implicit im2col into the MXU),
with no materialized staging at all. This measures:

  conv_HIGHEST   lax.conv_general_dilated, f32 HIGHEST (bf16x6)
  conv_bf16x3    hand-split operands, three DEFAULT-pass convs
  reshape_only   the bare (T,) -> (rows, hop) pitch relayout (sub-stage
                 of the shipped staging, to pin which op is slow)
  pallas         the shipped kernel (baseline)

Accuracy gate vs the f64 oracle as in stft_precision_tpu.py.

Run from /root/repo:  python benchmarks/stft_conv_tpu.py
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


def _conv_filters(nperseg, hop):
    from spectrogram_cube_clustering_tpu.signal.stft import (
        np_dft_angles,
        np_hann,
    )

    cos_a, sin_a = np_dft_angles(nperseg)
    win = np_hann(nperseg)
    # (W, I, O) = (nperseg, 1, 2*nfreq): cos filters then sin filters
    filt = np.concatenate(
        [win[:, None] * cos_a, win[:, None] * sin_a], axis=1
    ).astype(np.float32)[:, None, :]
    return jnp.asarray(filt)


@functools.partial(
    jax.jit, static_argnames=("nperseg", "hop", "eps", "mode")
)
def spectrogram_conv(x, nperseg=200, hop=100, eps=1e-12, mode="highest"):
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    nfreq = nperseg // 2 + 1
    filt = _conv_filters(nperseg, hop)
    xb = x.reshape(-1, t, 1).astype(jnp.float32)
    dn = jax.lax.conv_dimension_numbers(
        xb.shape, filt.shape, ("NWC", "WIO", "NWC")
    )
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(hop,), padding="VALID", dimension_numbers=dn,
    )
    if mode == "highest":
        y = conv(xb, filt, precision=jax.lax.Precision.HIGHEST)
    elif mode == "default":
        y = conv(xb, filt, precision=jax.lax.Precision.DEFAULT)
    else:  # bf16x3: hi/lo split, three single-pass convs, f32 accumulate
        x_hi = xb.astype(jnp.bfloat16)
        x_lo = (xb - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_hi = filt.astype(jnp.bfloat16)
        f_lo = (filt - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        conv = functools.partial(
            conv, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        y = conv(x_hi, f_hi) + conv(x_hi, f_lo) + conv(x_lo, f_hi)
    c = y[..., :nfreq]
    s = y[..., nfreq:]
    out = jnp.log10(c * c + s * s + eps)
    return out.reshape(*batch_shape, out.shape[-2], nfreq)


def _f64_oracle(x, nperseg=200, hop=100, eps=1e-12):
    from spectrogram_cube_clustering_tpu.signal.stft import (
        np_dft_angles,
        np_hann,
    )

    x = np.asarray(x, np.float64)
    cos_a, sin_a = np_dft_angles(nperseg)
    win = np_hann(nperseg)
    n_frames = (len(x) - nperseg) // hop + 1
    idx = np.arange(nperseg)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * win[None, :]
    c = frames @ cos_a.astype(np.float64)
    s = frames @ sin_a.astype(np.float64)
    return np.log10(c * c + s * s + eps)


def main():
    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )

    rng = np.random.default_rng(0)
    xa = rng.normal(size=(200_000,)).astype(np.float32)
    ref64 = _f64_oracle(xa)
    acc = {}
    for name, fn in {
        "conv_HIGHEST": lambda v: spectrogram_conv(v, mode="highest"),
        "conv_bf16x3": lambda v: spectrogram_conv(v, mode="bf16x3"),
        "pallas": lambda v: spectrogram_pallas(v),
    }.items():
        out = np.asarray(fn(jnp.asarray(xa)))
        acc[name] = float(np.max(np.abs(out - ref64)))
        print(name, acc[name], flush=True)

    n = 4_000_000
    reps = 50
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

    def reshape_only(v):
        rows = v.shape[0] // 100
        return v[: rows * 100].reshape(rows, 100).sum(axis=1)

    timed("conv_HIGHEST", lambda v: spectrogram_conv(v, mode="highest"))
    timed("conv_bf16x3", lambda v: spectrogram_conv(v, mode="bf16x3"))
    timed("reshape_only", reshape_only)
    timed("pallas", lambda v: spectrogram_pallas(v))

    print(json.dumps({"accuracy_vs_f64": acc, "throughput_Msps": results}))


if __name__ == "__main__":
    main()
