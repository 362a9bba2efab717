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
import threading
import time

#: serializes _emit between the main loop and the watchdog thread: the
#: watchdog may re-emit the partial table while the main thread is inside
#: its own _emit, and interleaved prints would corrupt the last stdout
#: line the driver parses.
_EMIT_LOCK = threading.Lock()


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-compile latency through the
    remote TPU compile service is erratic (seconds to minutes); caching
    insulates repeat bench runs from it. Also honors JAX_PLATFORMS=cpu
    explicitly — this image's sitecustomize force-registers the TPU
    plugin, so the env var alone cannot pin a CPU run (CLAUDE.md)."""
    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _median(sorted_vals):
    n = len(sorted_vals)
    return (
        sorted_vals[n // 2]
        if n % 2
        else 0.5 * (sorted_vals[n // 2 - 1] + sorted_vals[n // 2])
    )


def _rep_stats(rates):
    """Median + spread over repeated timings: the driver-captured number
    wandered ~4% between rounds on single runs (remote-tunnel noise);
    the median of >=3 reps plus an explicit spread pins it down.

    Stall rejection: a rep whose rate falls below a third of the all-rep
    median was hit by a multi-second tunnel stall, not the kernel (r4:
    one stalled stft rep read 1.4 G against a 17.7 G median and blew the
    reported spread to 113%). Such reps are excluded from the reported
    min/max/spread and counted in `stalled_reps`; the median itself is
    computed over the KEPT reps, so when a stall is rejected the
    headline can shift slightly (e.g. odd->even kept count averages the
    middle pair) — by construction toward the unstalled rate.
    """
    rates = sorted(float(r) for r in rates)
    med_all = _median(rates)
    kept = [r for r in rates if r >= med_all / 3.0] or rates
    med = _median(kept)
    stats = {
        "reps": len(rates),
        "min": round(kept[0], 1),
        "max": round(kept[-1], 1),
        "spread_pct": round(100.0 * (kept[-1] - kept[0]) / med, 1)
        if med
        else None,
    }
    if len(kept) < len(rates):
        stats["stalled_reps"] = len(rates) - len(kept)
    return med, stats


#: shared data prep, keyed on (n_samples, batch_size): every train metric
#: in a default `--metric all` run uses the same synthetic windows, and
#: regenerating them per metric was most of BENCH_r03/r04's
#: time-to-first-metric (~30 s host generation + two 424 MB crossings of
#: a 6-90 MB/s tunnel per metric). Generated ON DEVICE instead (same
#: planted-class structure as data.synthetic_windows, jax.random PRNG),
#: normalized and batched without ever touching the host.
_PREP = {}


def _prep_train_data(n_samples: int, batch_size: int):
    """Device-resident BatchedData of normalized synthetic windows."""
    import jax
    import jax.numpy as jnp
    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.train.layout import BatchedData

    key = (n_samples, batch_size)
    if key in _PREP:
        return _PREP[key]

    n_classes, h, w, noise = 5, 4, 101, 0.2
    nb = -(-n_samples // batch_size)
    pad = nb * batch_size - n_samples

    @jax.jit
    def gen(seed):
        freqs = jnp.linspace(0.0, 1.0, w)
        centers = jnp.linspace(0.15, 0.85, n_classes)
        sigmas = jnp.linspace(0.04, 0.10, n_classes)
        decays = jnp.linspace(0.2, 1.5, n_classes)
        t = jnp.arange(h, dtype=jnp.float32)
        spectral = jnp.exp(
            -((freqs[None, :] - centers[:, None]) ** 2)
            / (2.0 * sigmas[:, None] ** 2)
        )
        temporal = jnp.exp(-decays[:, None] * t[None, :])
        templates = temporal[:, :, None] * spectral[:, None, :]
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        labels = jax.random.randint(k1, (n_samples,), 0, n_classes)
        amp = jnp.exp(0.4 * jax.random.normal(k2, (n_samples, 1, 1)))
        x = amp * templates[labels] + noise * jax.random.normal(
            k3, (n_samples, h, w)
        )
        x = scc.ops.sample_norm_cent(x[..., None])
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, h, w, 1), x.dtype)], axis=0
            )
        return x.reshape(nb, batch_size, h, w, 1)

    xb = gen(0)
    mask = jnp.concatenate(
        [jnp.ones((n_samples,), jnp.float32),
         jnp.zeros((pad,), jnp.float32)]
    ).reshape(nb, batch_size)
    data = BatchedData(
        x=xb, mask=mask, n_samples=n_samples, batch_size=batch_size
    )
    _PREP[key] = data
    return data


def _prep_host_windows(n_samples: int) -> "np.ndarray":
    """Host copy of normalized windows for the streaming metrics (the
    loader streams host->device, so the source must live on the host).
    One device->host fetch, cached across the stream/_bf16/_int8 trio."""
    import numpy as np

    key = ("host", n_samples)
    if key in _PREP:
        return _PREP[key]
    data = _prep_train_data(n_samples, min(n_samples, 4096))
    x = np.asarray(data.x).reshape(-1, *data.x.shape[2:])[:n_samples]
    _PREP[key] = x
    return x


def measure_aec_throughput(
    n_samples: int, batch_size: int, epochs: int = 3, fused: bool = False,
    reps: int = 1, packed: bool = False,
):
    """Steady-state AEC train throughput.

    `fused=True` runs all epochs as ONE device call (the shipped
    `sync_every` on-device loop) — used for --quick, where the workload
    is small enough that a per-epoch dispatch round trip through this
    environment's remote tunnel would dominate and underreport ~4x.
    `packed=True` measures the MXU-packed variant (`arch = packed`,
    models/packed.py) instead of the reference-parity AEC."""
    import jax
    import jax.numpy as jnp
    import spectrogram_cube_clustering_tpu as scc

    data = _prep_train_data(n_samples, batch_size)

    model = scc.models.PackedAEC() if packed else scc.models.AEC()
    state = scc.train.create_train_state(
        model, jax.random.key(0), data.x[0, :4], lr=1e-4
    )
    rates = []
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
            # float() is a VALUE fetch: block_until_ready is not a real
            # sync through this environment's remote tunnel — r4 run 4
            # timed the async dispatch alone and reported an impossible
            # 753 M samples/s (CLAUDE.md). The fetch costs one ~100 ms
            # RTT per rep; epochs-per-rep is sized so that stays <5%.
            return st, float(loop["tra_hist"][-1])

        state, loss = once(state)  # compile + warmup
        for _ in range(reps):
            t0 = time.perf_counter()
            state, loss = once(state)
            rates.append(n_samples * epochs / (time.perf_counter() - t0))
        med, spread = _rep_stats(rates)
        return med, float(loss), spread

    train_epoch, _ = scc.train.aec.make_epoch_fns(model)

    # compile + warmup
    state, loss = train_epoch(state, data.x, data.mask)
    float(loss)

    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(epochs):
            state, loss = train_epoch(state, data.x, data.mask)
        float(loss)  # value fetch = real sync (see fused path note)
        rates.append(n_samples * epochs / (time.perf_counter() - t0))
    med, spread = _rep_stats(rates)
    return med, float(loss), spread


def measure_dec_throughput(
    n_samples: int, batch_size: int, epochs: int = 3, reps: int = 1,
    packed: bool = False,
):
    """DEC refinement segment-scan throughput (the reference's hot loop,
    Cluster/models.py:1089-1163): samples/sec through the jitted
    MSE + gamma*KLD train step, target refresh excluded. `packed=True`
    measures the MXU-packed variant (models.PackedDEC, arch=packed)."""
    import jax
    import jax.numpy as jnp
    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.ops.student_t import target_distribution
    from spectrogram_cube_clustering_tpu.train.dec import (
        _pad_p,
        make_segment_fn,
    )

    data = _prep_train_data(n_samples, batch_size)

    model = (
        scc.models.PackedDEC(n_clusters=5) if packed
        else scc.models.DEC(n_clusters=5)
    )
    state = scc.train.create_train_state(
        model, jax.random.key(0), data.x[0, :4], lr=1e-3
    )
    q, _, _ = scc.train.full_eval(model, state.params, data)
    p_all = _pad_p(target_distribution(q), data.n_batches, batch_size)
    segment = make_segment_fn(model, 0.001, data.n_batches)

    # run all epochs as ONE device call (scan over the jitted segment —
    # nested jit inlines) so the remote tunnel's per-dispatch RTT is
    # amortized out, same rationale as the fused AEC headline
    @jax.jit
    def run_epochs(st, xs, mask, p):
        def body(s, _):
            s2, sums = segment(s, xs, mask, p, jnp.array(0))
            return s2, (sums[0].sum(), sums[3].sum())
        return jax.lax.scan(body, st, None, length=epochs)

    state, (ls, ns) = run_epochs(state, data.x, data.mask, p_all)
    float(ls[-1])
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, (ls, ns) = run_epochs(state, data.x, data.mask, p_all)
        float(ls[-1])  # value fetch = real sync (see fused AEC note)
        rates.append(n_samples * epochs / (time.perf_counter() - t0))
    med, spread = _rep_stats(rates)
    return med, float(ls[-1] / ns[-1]), spread


def measure_stft_throughput(
    n_wave_samples: int = 4_000_000, chain_len: int = 100, reps: int = 3
):
    """Fused Pallas STFT throughput (waveform samples/sec) on this chip
    (ops/pallas_stft.py), low-overhead two-point dependency-chain timing.

    Two hazards shape this harness (validated on-chip,
    benchmarks/stft_harness_tpu.py / stft_isolate_tpu.py):
    1. remote-TPU clients can memoize repeated identical execute calls,
       so executions serialize through a scan whose carry IS the
       waveform, perturbed in place by an epsilon of the previous step's
       output (O(1) — a full-array `x + carry` add plus a full-output
       mean costs ~641us/rep, 4x the 161us kernel, and used to hide 75%
       of the kernel's real rate); the per-step dependency reads a tiny
       output slice (the pallas_call is opaque to XLA, so the whole
       spectrogram still executes). Fresh salt per call.
    2. the tunnel's per-dispatch fixed cost (~30-40ms on bad days) is
       removed exactly by a two-point fit: time chains of length L and
       2L, per-rep rate = n*L / (t2 - t1).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
        spectrogram_pallas,
    )
    from spectrogram_cube_clustering_tpu.signal.stft import spectrogram

    stft = spectrogram_pallas if jax.default_backend() == "tpu" else spectrogram

    def make_chain(length):
        @jax.jit
        def chain(x, salt):
            def body(carry, _):
                xc, acc = carry
                out = stft(xc)
                dep = jnp.sum(out[..., :1, :8]) * 1e-30
                # +1.0+salt keeps the perturbation representable in f32 (a
                # bare epsilon would round away, leaving xc bit-identical)
                xc = xc.at[0].add(dep + salt + 1.0)
                return (xc, acc + dep), None

            (xc, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0.0)), None, length=length
            )
            return acc + xc[0]

        return chain

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_wave_samples,)).astype(
            np.float32
        )
    )
    c1 = make_chain(chain_len)
    c2 = make_chain(2 * chain_len)
    float(c1(x, jnp.float32(0.0)))  # compile + warm
    float(c2(x, jnp.float32(0.0)))
    rates, v = [], 0.0
    for r in range(reps):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(x, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(c2(x, salt + 0.5))
        t2 = time.perf_counter() - t0
        rates.append(n_wave_samples * chain_len / max(t2 - t1, 1e-9))
    med, spread = _rep_stats(rates)
    return med, v, spread


def measure_stream_throughput(
    n_samples: int, batch_size: int, epochs: int = 3, reps: int = 1,
    transfer_dtype=None, deadline: float = None,
):
    """Streaming AEC training throughput (samples/sec): PrefetchLoader
    host IO overlapping the per-batch jitted step — the larger-than-HBM
    tier (train/aec.py::train_aec_stream's hot path). `transfer_dtype`
    measures the half-width wire-cast variant
    (config `stream_transfer_dtype`). `deadline` (perf_counter value)
    stops the rep/epoch loops early on slow-wire days so the driver's
    wall-clock budget holds — the reported median covers whatever epochs
    actually ran (always >= 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import spectrogram_cube_clustering_tpu as scc

    x = _prep_host_windows(n_samples)
    item = min(512, n_samples)  # windows per loader item (zarr-chunk-ish)
    n_items = n_samples // item
    # the loader streams whole items; rate accounting uses what actually
    # streamed, not the requested n_samples (which may not divide evenly)
    streamed = n_items * item

    def make_loader(items=n_items):
        return scc.data.PrefetchLoader(
            lambda i: x[i * item : (i + 1) * item], n_items=items,
            batch_size=batch_size, num_workers=4,
            transfer_dtype=transfer_dtype,
        )

    model = scc.models.AEC()
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
    )
    train_step, _ = scc.train.aec.make_step_fns(model)

    def one_epoch(st, items=n_items):
        losses = []
        for xb, n_valid in make_loader(items):
            st, loss = train_step(st, xb, jnp.float32(n_valid))
            losses.append(loss)
        return st, jax.device_get(losses)[-1]

    # compile + loader warmup on ONE full-size batch instead of a whole
    # epoch: the warmup epoch used to cost as much wire as a timed epoch
    # (~12% of the tier on a slow day), and the compiled step only needs
    # its batch shape seen once — the loader zero-pads every trailing
    # batch to batch_size (prefetch.py batches_host), so one shape
    # covers ragged sample counts too.
    warm_items = min(n_items, -(-batch_size // item))
    state, loss = one_epoch(state, items=warm_items)
    rates = []
    for _ in range(reps):
        # per-epoch rates, median within the rep: a multi-second tunnel
        # stall (the dominant noise source here — each 4096-window batch
        # ships ~6.6 MB host->device over an erratic remote link) lands
        # in ONE epoch instead of poisoning the whole rep, so the
        # reported number tracks steady-state streaming throughput
        epoch_rates = []
        for _ in range(epochs):
            t0 = time.perf_counter()
            state, loss = one_epoch(state)
            epoch_rates.append(streamed / (time.perf_counter() - t0))
            if deadline is not None and time.perf_counter() > deadline:
                break
        rates.append(float(np.median(epoch_rates)))
        if deadline is not None and time.perf_counter() > deadline:
            break
    med, spread = _rep_stats(rates)
    return med, float(loss), spread


def measure_wire_rate(mbytes: float = 8.0, reps: int = 5):
    """Host<->device roundtrip wire rate (Mbytes/s, median of reps):
    device_put a fresh random buffer, run one elementwise op, fetch the
    same-size result back. The streaming and serving tiers are
    transfer-bound (RESULTS.md), so recording the link rate next to
    their throughputs makes cross-day comparisons interpretable — the
    remote tunnel here has been observed anywhere from ~15 to ~90
    Mbytes/s. Fresh data per rep: the tunnel memoizes identical
    executes (CLAUDE.md)."""
    import jax
    import numpy as np

    n = int(mbytes * (1 << 20) // 4)
    rng = np.random.default_rng(0)
    rates = []
    for _ in range(reps):
        x = rng.standard_normal(n).astype(np.float32)
        t0 = time.perf_counter()
        y = np.asarray(jax.device_put(x) + 1.0)  # fetch forces execution
        dt = time.perf_counter() - t0
        assert y.shape == x.shape
        rates.append(2 * x.nbytes / dt / (1 << 20))
    rates.sort()
    return rates[len(rates) // 2]


def _with_retry(measure, deadline: float = None):
    """The remote-TPU tunnel occasionally throws transient backend errors;
    one retry after a short pause rides them out. The retry is skipped
    when the wall-clock budget is nearly spent (a retry can double a
    metric's cost — the exact failure mode that emptied BENCH_r03)."""
    try:
        return measure()
    except Exception as e:  # noqa: BLE001
        if deadline is not None and time.perf_counter() > deadline - 30:
            print(
                f"# failure ({type(e).__name__}) with budget exhausted; "
                "skipping retry",
                file=sys.stderr,
            )
            raise
        print(
            f"# transient failure ({type(e).__name__}); retrying",
            file=sys.stderr,
        )
        time.sleep(15)
        return measure()


def _measure_set(args, deadline: float = None):
    """(name -> thunk) for each requested metric. The aec headline runs
    the fused on-device multi-epoch loop (the shipped `sync_every`
    training mode): all epochs as ONE device call, so the remote tunnel's
    per-dispatch RTT is amortized out of the number (matters most at
    --quick sizes, where per-epoch dispatch underreports ~4x; at full
    size the fused loop is also simply the fastest shipped path, +5%)."""
    # quick mode runs MANY epochs per fused device call: at 16k samples
    # one 16-epoch call is only ~80 ms of device time, so the remote
    # tunnel's ~100 ms dispatch RTT halves the reported number on
    # high-latency days (observed 2.1 vs 3.3 M across rounds); 64 epochs
    # pushes the RTT fraction under ~25%
    # full mode runs 48 epochs/rep (~3.4 s of device time): the per-rep
    # value fetch that forces real execution costs one tunnel RTT, and 16
    # epochs left that at ~10% of the timed window
    aec_epochs = 64 if args.quick else 48
    # STFT: two-point chain fit (L vs 2L) cancels the tunnel's fixed
    # per-dispatch cost exactly; L must still be long enough that the
    # timed difference (L x ~70-280us/rep) dwarfs tunnel jitter — a
    # quick-mode chain of 40 left only ~6ms of timed work and read 160%
    # spread; 240 reps is still <70ms of device time per dispatch
    n_wave = 2_000_000 if args.quick else 4_000_000
    chain = 240 if args.quick else 160
    # streaming caps its sample count: at 8 epochs/rep every window
    # crosses the host wire 8 times, so 262k+ full-mode runs take tens
    # of minutes for no extra signal. Say so instead of silently
    # shrinking a user-requested size.
    stream_samples = min(args.samples, 65536)
    if stream_samples < args.samples and args.metric in (
        "all", "stream", "stream_bf16", "stream_int8"
    ):
        print(
            f"# stream metrics cap --samples at 65536 (requested "
            f"{args.samples}); rates are still per-sample comparable",
            file=sys.stderr,
        )
    return {
        "aec": (
            "aec_train_samples_per_sec",
            lambda: measure_aec_throughput(
                args.samples, args.batch, epochs=aec_epochs, fused=True,
                reps=args.reps,
            ),
        ),
        "aec_packed": (
            "aec_packed_train_samples_per_sec",
            lambda: measure_aec_throughput(
                args.samples, args.batch, epochs=aec_epochs, fused=True,
                reps=args.reps, packed=True,
            ),
        ),
        "dec": (
            "dec_train_samples_per_sec",
            lambda: measure_dec_throughput(
                args.samples, args.batch, epochs=48 if args.quick else 24,
                reps=args.reps,
            ),
        ),
        "dec_packed": (
            "dec_packed_train_samples_per_sec",
            lambda: measure_dec_throughput(
                args.samples, args.batch, epochs=48 if args.quick else 24,
                reps=args.reps, packed=True,
            ),
        ),
        "stft_pallas": (
            "stft_wave_samples_per_sec",
            # each rep is ~2s, so afford extra reps: a single multi-100ms
            # tunnel stall inside one rep's ~40ms timed window skews that
            # rep ~10x — the median over >=5 reps stays put (observed:
            # median stable at 14.5-14.9 G while min reps read 0.2-1.2 G)
            lambda: measure_stft_throughput(
                n_wave, chain, reps=max(args.reps, 5)
            ),
        ),
        # streaming reps dispatch per batch through the tunnel; short
        # (~2.5 s) reps let a single multi-second tunnel stall tank
        # one rep (observed 103% spread in r3, and 68% at full size
        # with only 3 epochs/rep) — 8 epochs/rep at a bounded sample
        # count amortizes stalls into the rate they actually cost.
        # Each stream thunk takes a per-metric deadline (main splits the
        # remaining budget across the wire tiers: on a slow-wire day the
        # f32 tier alone ate the whole tail of the budget in r4 run 3 and
        # the bf16/int8 A/B — the tiers that matter MOST on a slow wire —
        # got skipped; three tiers at fewer epochs beat one at full reps)
        "stream": (
            "stream_train_samples_per_sec",
            lambda deadline=deadline: measure_stream_throughput(
                stream_samples, args.batch, epochs=8, reps=args.reps,
                deadline=deadline,
            ),
        ),
        # int8 runs BEFORE bf16: if the budget truncates the wire tiers,
        # the surviving pair should be the f32-vs-int8 A/B (the 4x-fewer-
        # bytes adoption decision); bf16's ~2x ratio is the best-pinned
        # stream result already (RESULTS.md r3)
        "stream_int8": (
            "stream_int8_train_samples_per_sec",
            # quarter-width wire casts (stream_transfer_dtype=int8,
            # per-batch symmetric quantization, dequant on device):
            # 4x fewer wire bytes than f32 on the transfer-bound tier
            lambda deadline=deadline: measure_stream_throughput(
                stream_samples, args.batch,
                epochs=8, reps=args.reps, transfer_dtype="int8",
                deadline=deadline,
            ),
        ),
        "stream_bf16": (
            "stream_bf16_train_samples_per_sec",
            # half-width wire casts (stream_transfer_dtype=bfloat16):
            # the streaming tier is transfer-bound, so this is the
            # shipped fast path for bandwidth-limited links
            lambda deadline=deadline: measure_stream_throughput(
                stream_samples, args.batch,
                epochs=8, reps=args.reps, transfer_dtype="bfloat16",
                deadline=deadline,
            ),
        ),
    }


def _load_baseline():
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_measured.json",
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            return json.load(f)
    return {}


def _emit(ordered_names, results, baseline, wire=None, skipped=(),
          elapsed=None):
    """Print ONE cumulative JSON line covering everything measured so far.

    Called after EVERY completed metric (BENCH_r03 lesson: the old
    single-print-at-the-end design memorialized nothing when the driver's
    timeout killed the run mid-bench). Each line is a complete,
    driver-parseable record — headline schema (metric/value/unit/
    vs_baseline) from the first completed metric, full table in `extras` —
    so whichever line is last on stdout when the process dies is the most
    complete result.

    Thread-safety: serialized via _EMIT_LOCK (the watchdog thread calls
    this concurrently with the main loop) and iterates over snapshots so
    a mid-iteration insert in the other thread cannot throw."""
    with _EMIT_LOCK:
        _emit_locked(ordered_names, dict(results), baseline, wire=wire,
                     skipped=list(skipped), elapsed=elapsed)


def _emit_locked(ordered_names, results, baseline, wire=None, skipped=(),
                 elapsed=None):
    for name, row in results.items():
        if "vs_baseline" not in row:
            # packed variants train the same task: anchor against the
            # same measured-reference loop as their parity counterpart
            ref = baseline.get(row["metric"].replace("_packed", ""))
            row["vs_baseline"] = (
                round(row["value"] / ref, 2) if ref else None
            )
        if name.startswith("stream") and wire:
            # wire-rate-normalized rate: the absolute stream figure
            # tracks the day's tunnel link (observed 15-90 MB/s swings);
            # samples/s-per-MB/s-of-wire cancels that, so round-over-
            # round regressions in the stream path itself are detectable
            row["samples_per_mbyte"] = round(row["value"] / wire, 1)
    head_name = next(n for n in ordered_names if n in results)
    head = results[head_name]
    out = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": "samples/sec",
        "vs_baseline": head["vs_baseline"],
        "spread": {
            k: head[k] for k in ("reps", "min", "max", "spread_pct")
        },
    }
    if "stalled_reps" in head:
        out["spread"]["stalled_reps"] = head["stalled_reps"]
    if "samples_per_mbyte" in head:
        # single-metric stream runs: the normalized figure must survive
        # into the head row, not just the extras rows
        out["samples_per_mbyte"] = head["samples_per_mbyte"]
    extras = {
        n: r for n, r in results.items() if r["metric"] != head["metric"]
    }
    if extras:
        out["extras"] = extras
    if wire is not None:
        # the stream metrics scale with the host<->device link; record it
        # so a 2x swing between rounds reads as wire, not regression
        out["wire_mbytes_per_sec"] = round(wire, 1)
    if skipped:
        out["skipped"] = list(skipped)
    if elapsed is not None:
        out["elapsed_sec"] = round(elapsed, 1)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument(
        "--samples", type=int, default=262144,
        help="training-set size per rep (stream metrics cap this at "
        "65536 — each window crosses the host wire every epoch)",
    )
    ap.add_argument(
        "--reps", type=int, default=3,
        help="timed repetitions per metric; the JSON carries the median "
        "plus min/max spread",
    )
    ap.add_argument(
        "--budget", type=float, default=480.0,
        help="wall-clock budget in seconds (0 = unlimited): metrics not "
        "started before the budget expires are skipped (listed in the "
        "output's `skipped`), and stream reps stop early at the "
        "deadline — a fresh-compile or slow-wire day degrades to a "
        "partial table instead of a driver timeout with no output. A "
        "watchdog thread hard-exits (emitting the partial table) once "
        "the budget is overrun with no metric completing for "
        "BENCH_WATCHDOG_MARGIN seconds (env var; default 120, or 900 "
        "when .jax_cache is cold — first compiles here run 3 s-17 min)",
    )
    ap.add_argument(
        "--metric",
        choices=[
            "all", "aec", "aec_packed", "dec", "dec_packed", "stft",
            "stft_pallas", "stream", "stream_bf16", "stream_int8",
        ],
        default="all",
        help="all: the full headline table, one cumulative JSON line per "
        "completed metric, cheapest-first (driver default); aec: pretrain "
        "step throughput (primary); aec_packed/dec_packed: the MXU-packed "
        "variants (arch=packed); dec: refinement step; stft_pallas: fused "
        "Pallas spectrogram kernel; stream: prefetch-loader streaming "
        "train step (_bf16/_int8: compressed-wire variants)",
    )
    args = ap.parse_args()

    if args.quick:
        args.samples = min(args.samples, 16384)
    if args.metric == "stft":  # backwards-compatible alias
        args.metric = "stft_pallas"

    t0 = time.perf_counter()
    deadline = t0 + args.budget if args.budget > 0 else None

    _enable_compile_cache()
    measures = _measure_set(args, deadline=deadline)
    names = list(measures) if args.metric == "all" else [args.metric]
    baseline = _load_baseline()

    results = {}
    skipped = []
    wire = None
    failed = []

    if deadline is not None:
        # Hard-abort watchdog: the budget's skip logic only runs BETWEEN
        # metrics, but this environment's remote tunnel can wedge a
        # metric INSIDE an RPC indefinitely (observed r4: a default run
        # made zero progress for >15 min — the driver would have timed
        # out with an empty capture, BENCH_r03 all over again). A daemon
        # thread re-emits whatever completed and exits once the budget is
        # well overrun WITH NO PROGRESS. SIGALRM can't interrupt a wedged
        # C++ RPC wait, hence os._exit from a thread.
        #
        # The margin distinguishes "wedged" from "slow but progressing":
        # a metric completing resets the no-progress clock, and on a cold
        # compile cache the default margin is raised to this
        # environment's documented first-compile band (3 s - 17 min for
        # novel TPU programs) so a legitimate first compile is not
        # misread as a wedge. Override with BENCH_WATCHDOG_MARGIN.
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
        try:
            cache_cold = len(os.listdir(cache_dir)) < 4
        except OSError:
            cache_cold = True
        margin = float(
            os.environ.get(
                "BENCH_WATCHDOG_MARGIN", "900" if cache_cold else "120"
            )
        )

        def _watchdog():
            # Monitoring loop: any exception here must NOT fall through
            # to the abort path (a spurious error minutes into a healthy
            # run would kill it); swallow and keep watching.
            last_done, last_change = -1, time.perf_counter()
            while True:
                time.sleep(5)
                try:
                    now = time.perf_counter()
                    done_n = len(results) + len(skipped) + len(failed)
                    if done_n != last_done:
                        last_done, last_change = done_n, now
                    if now >= deadline + margin and now - last_change >= margin:
                        break
                except Exception:  # noqa: BLE001
                    continue
            # Abort path: snapshot shared state before touching it (the
            # main thread may be mutating results/skipped/failed), emit
            # the partial table, and ALWAYS exit — even if emission
            # itself raises (otherwise the daemon dies silently and the
            # process hangs past the driver timeout, the exact failure
            # this watchdog exists to prevent).
            res = dict(results)
            skp, fld = list(skipped), list(failed)

            def _do_emit():
                print(
                    "# watchdog: budget hard-overrun with no progress "
                    f"for {margin:.0f}s (wedged tunnel RPC?); emitting "
                    "partial table", file=sys.stderr,
                )
                done = set(res) | set(skp) | set(fld)
                if res:
                    _emit(names, {n: dict(r) for n, r in res.items()},
                          baseline, wire=wire,
                          skipped=skp + fld
                          + [n for n in names if n not in done],
                          elapsed=time.perf_counter() - t0)
                else:
                    with _EMIT_LOCK:
                        print(json.dumps({
                            "metric": "none", "value": None,
                            "unit": "samples/sec",
                            "vs_baseline": None, "aborted": "watchdog",
                        }), flush=True)

            try:
                # emission runs in ITS OWN daemon thread with a bounded
                # join: if stdout itself is wedged (full pipe — which
                # also means the main thread may be stuck inside _emit
                # holding the lock), the emit thread blocks but this
                # thread still reaches os._exit. The cumulative lines
                # already on stdout remain the partial capture.
                emitter = threading.Thread(target=_do_emit, daemon=True)
                emitter.start()
                emitter.join(timeout=15)
            finally:
                os._exit(0 if res else 1)

        threading.Thread(target=_watchdog, daemon=True).start()
    for name in names:
        elapsed = time.perf_counter() - t0
        remaining = None if deadline is None else deadline - time.perf_counter()
        # stream metrics dispatch per batch over the wire and can't finish
        # meaningfully in under ~60 s (small warmup + >=1 timed epoch)
        floor = 60 if name.startswith("stream") else 0
        if remaining is not None and not name.startswith("stream"):
            # reserve a floor share of the budget for each wire tier
            # still pending: BENCH_r04 spent the tail of the budget on
            # the compute metrics and skipped stream_int8 outright — the
            # tier the round's adoption decision needed. A non-stream
            # metric that would start inside the reservation is skipped
            # instead (its full-size numbers live in RESULTS.md).
            streams_pending = sum(
                1 for n in names
                if n.startswith("stream") and n not in results
            )
            remaining -= 60.0 * streams_pending
        if remaining is not None and remaining < floor and results:
            skipped.append(name)
            print(f"# budget spent; skipping {name}", file=sys.stderr)
            continue
        if name.startswith("stream") and wire is None:
            # measure the link rate BEFORE the transfer-bound metrics so
            # a partial (budget-cut) table still carries the context that
            # makes its stream numbers interpretable
            wire = _with_retry(measure_wire_rate, deadline)
        metric, thunk = measures[name]
        if name.startswith("stream") and deadline is not None:
            # split the remaining budget evenly across the wire tiers
            # still to run (each tier's epoch loop stops at its own
            # deadline, floored so at least compile + one timed epoch fit)
            streams_left = sum(
                1 for n in names[names.index(name):]
                if n.startswith("stream") and n not in results
            )
            share = (deadline - time.perf_counter()) / max(streams_left, 1)
            thunk_deadline = time.perf_counter() + max(share, 75.0)
            run = lambda: thunk(deadline=thunk_deadline)  # noqa: E731
        else:
            run = thunk
        try:
            value, _loss, spread = _with_retry(run, deadline)
        except Exception as e:  # noqa: BLE001
            # a dead metric must not take the whole table with it
            print(f"# {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            failed.append(name)
            continue
        results[name] = {
            "metric": metric, "value": round(value, 1), **spread
        }
        _emit(names, results, baseline, wire=wire,
              skipped=skipped + failed,
              elapsed=time.perf_counter() - t0)
    if not results:
        print(json.dumps({"metric": "none", "value": None,
                          "unit": "samples/sec", "vs_baseline": None,
                          "failed": failed}), flush=True)
        return 1
    # final combined line (identical schema; last line on stdout is
    # always the most complete — this re-print covers the skip-tail case
    # where the last metric was skipped rather than measured)
    _emit(names, results, baseline, wire=wire, skipped=skipped + failed,
          elapsed=time.perf_counter() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
