"""Benchmark: spectrogram training throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}

Primary metric: AEC training throughput (samples/sec, steady state) — the
hot loop of the reference workflow (Cluster/models.py:106-168). The
reference publishes no numbers (BASELINE.md), so the comparison anchor is a
measured run of a torch implementation of the same architecture/loss/
optimizer on this host (benchmarks/measure_reference.py writes
benchmarks/baseline_measured.json; GPU hardware for the original is not
available in this environment, which the baseline file records).

Usage: python bench.py [--quick] [--batch N] [--samples N]
"""

import argparse
import json
import os
import sys
import time


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-compile latency through the
    remote TPU compile service is erratic (seconds to minutes); caching
    insulates repeat bench runs from it."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def measure_aec_throughput(
    n_samples: int, batch_size: int, epochs: int = 3, fused: bool = False
):
    """Steady-state AEC train throughput.

    `fused=True` runs all epochs as ONE device call (the shipped
    `sync_every` on-device loop) — used for --quick, where the workload
    is small enough that a per-epoch dispatch round trip through this
    environment's remote tunnel would dominate and underreport ~4x."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import spectrogram_cube_clustering_tpu as scc

    x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    data = scc.train.make_batched_data(x, batch_size=batch_size)

    model = scc.models.AEC()
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
    )
    if fused:
        from spectrogram_cube_clustering_tpu.train.aec import (
            _init_loop_state,
            make_fused_epochs_fn,
        )

        run = make_fused_epochs_fn(
            model, epochs, patience=epochs, early_stopping=False
        )

        def once(st):
            st, loop = run(
                st, data.x, data.mask, None, None,
                _init_loop_state(st, epochs), jnp.int32(epochs),
            )
            loop["tra_hist"].block_until_ready()
            return st, loop["tra_hist"][-1]

        state, loss = once(state)  # compile + warmup
        t0 = time.perf_counter()
        state, loss = once(state)
        dt = time.perf_counter() - t0
        return n_samples * epochs / dt, float(loss)

    train_epoch, _ = scc.train.aec.make_epoch_fns(model)

    # compile + warmup
    state, loss = train_epoch(state, data.x, data.mask)
    loss.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(epochs):
        state, loss = train_epoch(state, data.x, data.mask)
    loss.block_until_ready()
    dt = time.perf_counter() - t0
    return n_samples * epochs / dt, float(loss)


def measure_dec_throughput(n_samples: int, batch_size: int, epochs: int = 3):
    """DEC refinement segment-scan throughput (the reference's hot loop,
    Cluster/models.py:1089-1163): samples/sec through the jitted
    MSE + gamma*KLD train step, target refresh excluded."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.ops.student_t import target_distribution
    from spectrogram_cube_clustering_tpu.train.dec import (
        _pad_p,
        make_segment_fn,
    )

    x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    data = scc.train.make_batched_data(x, batch_size=batch_size)

    model = scc.models.DEC(n_clusters=5)
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
    )
    q, _, _ = scc.train.full_eval(model, state.params, data)
    p_all = _pad_p(target_distribution(q), data.n_batches, batch_size)
    segment = make_segment_fn(model, 0.001, data.n_batches)

    state, sums = segment(state, data.x, data.mask, p_all, jnp.array(0))
    jax.tree.map(lambda a: a.block_until_ready(), sums)
    t0 = time.perf_counter()
    for _ in range(epochs):
        state, sums = segment(state, data.x, data.mask, p_all, jnp.array(0))
    jax.tree.map(lambda a: a.block_until_ready(), sums)
    dt = time.perf_counter() - t0
    # sums are per-step (seg_len,) arrays (per-batch history support)
    return n_samples * epochs / dt, float(sums[0].sum() / sums[3].sum())


def measure_stft_throughput(n_wave_samples: int = 4_000_000, reps: int = 10):
    """Fused Pallas STFT throughput (waveform samples/sec) on this chip
    (ops/pallas_stft.py).

    Executions are serialized through a scan dependency chain inside one
    jit and the result value is fetched — remote-TPU clients can memoize
    repeated identical execute calls, which makes naive timing loops
    report physically impossible numbers.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    stft = spectrogram_pallas if jax.default_backend() == "tpu" else spectrogram

    @jax.jit
    def chain(x, salt):
        def body(carry, _):
            out = stft(x + carry + salt)
            return jnp.mean(out) * 1e-6, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_wave_samples,)).astype(
            np.float32
        )
    )
    float(chain(x, jnp.float32(0.0)))  # compile + warm
    t0 = time.perf_counter()
    v = float(chain(x, jnp.float32(1.0)))  # fresh arg, value fetch
    dt = (time.perf_counter() - t0) / reps
    return n_wave_samples / dt, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=262144)
    ap.add_argument(
        "--metric", choices=["aec", "dec", "stft"], default="aec",
        help="aec: pretrain step throughput (primary); dec: refinement "
        "step; stft: fused Pallas spectrogram kernel",
    )
    args = ap.parse_args()

    if args.quick:
        args.samples = min(args.samples, 16384)

    _enable_compile_cache()
    if args.metric == "stft":
        n_wave = 400_000 if args.quick else 4_000_000
        reps = 3 if args.quick else 10
        measure, metric = (
            lambda: measure_stft_throughput(n_wave, reps),
            "stft_wave_samples_per_sec",
        )
    elif args.metric == "dec":
        measure, metric = (
            lambda: measure_dec_throughput(args.samples, args.batch),
            "dec_train_samples_per_sec",
        )
    else:
        # The headline measures the fused on-device multi-epoch loop (the
        # shipped `sync_every` training mode): all epochs run as ONE
        # device call, so the remote tunnel's per-dispatch RTT is
        # amortized out of the number (matters most at --quick sizes,
        # where per-epoch dispatch underreports ~4x; at full size the
        # fused loop is also simply the fastest shipped path, +5%).
        epochs = 16 if args.quick else 6
        measure, metric = (
            lambda: measure_aec_throughput(
                args.samples, args.batch, epochs=epochs, fused=True
            ),
            "aec_train_samples_per_sec",
        )

    # the remote-TPU tunnel occasionally throws transient backend errors;
    # one retry after a short pause rides them out
    try:
        throughput, loss = measure()
    except Exception as e:  # noqa: BLE001
        print(f"# transient failure ({type(e).__name__}); retrying", file=sys.stderr)
        time.sleep(15)
        throughput, loss = measure()

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_measured.json",
    )
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        ref = baseline.get(metric)
        if ref:
            vs_baseline = throughput / ref

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(throughput, 1),
                "unit": "samples/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
