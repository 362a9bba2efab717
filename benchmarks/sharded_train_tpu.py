"""Sharded TRAIN steps on the real chip at mesh(1): parity + throughput.

VERDICT r3 weak #2: the sharded AEC/DEC train step — the core multi-chip
claim — had only virtual-CPU-mesh evidence. This runs the SAME protocol
as the mesh(1) SPMD-fused serving check (benchmarks/RESULTS.md): jit the
sharded steps over a 1-device mesh on the v5e (batch-sharded data,
replicated params — the exact layout `train.make_batched_data(mesh=...)`
ships), compare against the unsharded step, and measure throughput.
Expected: losses/params at bit-or-noise parity and throughput within
noise of the unsharded headline (3.6 M parity / 5.2 M packed samples/s),
i.e. the sharding wrapper costs nothing and the multi-chip win is pure
parallel speedup.

Timing mirrors bench.py's RTT-amortized fused loops (all epochs as ONE
device call; value fetch forces execution — block_until_ready is not a
real sync through this tunnel).

Run from /root/repo:  python benchmarks/sharded_train_tpu.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _median(vals):
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=262144)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--cpu", action="store_true",
        help="pin the CPU backend (sitecustomize overrides JAX_PLATFORMS "
        "env here) — logic dry-runs before paying tunnel compiles",
    )
    args = ap.parse_args()
    if args.quick:
        args.samples, args.epochs = 16384, 64

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.ops.student_t import (
        target_distribution,
    )
    from spectrogram_cube_clustering_tpu.train.aec import (
        _init_loop_state,
        make_fused_epochs_fn,
    )
    from spectrogram_cube_clustering_tpu.train.dec import (
        _pad_p,
        make_segment_fn,
    )

    mesh = scc.core.make_data_mesh()
    print(
        f"mesh: {mesh.devices.size} device(s), backend "
        f"{jax.default_backend()}",
        flush=True,
    )

    x, _ = scc.data.synthetic_windows(args.samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    results = {}

    def aec_run(model, mesh_arg, tag):
        """(final losses, final params, median rate) for the fused AEC
        loop over mesh-sharded or unsharded data."""
        data = scc.train.make_batched_data(
            x, batch_size=args.batch, mesh=mesh_arg
        )
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
        )
        if mesh_arg is not None:
            state = jax.device_put(
                state, scc.core.replicated_sharding(mesh_arg)
            )
        run = make_fused_epochs_fn(
            model, args.epochs, patience=args.epochs, early_stopping=False
        )

        def once(st, loop):
            st, loop = run(
                st, data.x, data.mask, None, None, loop,
                jnp.int32(args.epochs),
            )
            float(loop["tra_hist"][-1])  # value fetch = real sync
            return st, loop

        # parity pass: fresh state, one fused call, record the history
        t0 = time.perf_counter()
        st1, loop1 = once(state, _init_loop_state(state, args.epochs))
        print(f"{tag}: compile+first call {time.perf_counter() - t0:.1f}s",
              flush=True)
        hist = np.asarray(loop1["tra_hist"])
        # timed reps continue from st1 (steady state)
        rates = []
        st = st1
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, _ = once(st, _init_loop_state(st, args.epochs))
            rates.append(
                args.samples * args.epochs / (time.perf_counter() - t0)
            )
        rate = _median(rates)
        print(f"{tag}: {rate / 1e6:.2f} Msamples/s "
              f"(min {min(rates)/1e6:.2f} max {max(rates)/1e6:.2f})",
              flush=True)
        return hist, jax.device_get(st1.params), rate

    def dec_run(model, mesh_arg, tag, epochs):
        data = scc.train.make_batched_data(
            x, batch_size=args.batch, mesh=mesh_arg
        )
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )
        if mesh_arg is not None:
            state = jax.device_put(
                state, scc.core.replicated_sharding(mesh_arg)
            )
        q, _, _ = scc.train.full_eval(model, state.params, data)
        p_all = _pad_p(target_distribution(q), data.n_batches, args.batch)
        segment = make_segment_fn(model, 0.001, data.n_batches)

        @jax.jit
        def run_epochs(st, xs, mask, p):
            def body(s, _):
                s2, sums = segment(s, xs, mask, p, jnp.array(0))
                return s2, (sums[0].sum(), sums[3].sum())

            return jax.lax.scan(body, st, None, length=epochs)

        t0 = time.perf_counter()
        st1, (ls, ns) = run_epochs(state, data.x, data.mask, p_all)
        losses = np.asarray(ls) / np.asarray(ns)  # fetch = sync
        print(f"{tag}: compile+first call {time.perf_counter() - t0:.1f}s",
              flush=True)
        rates = []
        st = st1
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, (ls, ns) = run_epochs(st, data.x, data.mask, p_all)
            float(ls[-1])
            rates.append(
                args.samples * epochs / (time.perf_counter() - t0)
            )
        rate = _median(rates)
        print(f"{tag}: {rate / 1e6:.2f} Msamples/s "
              f"(min {min(rates)/1e6:.2f} max {max(rates)/1e6:.2f})",
              flush=True)
        return losses, jax.device_get(st1.params), rate

    def compare(tag, a, b):
        """max abs diff between two (history, params) pairs."""
        hd = float(np.max(np.abs(a[0] - b[0])))
        pd = max(
            float(np.max(np.abs(np.asarray(x1) - np.asarray(x2))))
            for x1, x2 in zip(
                jax.tree.leaves(a[1]), jax.tree.leaves(b[1])
            )
        )
        print(f"{tag}: loss-history max|diff| {hd:.3e}, "
              f"params max|diff| {pd:.3e}", flush=True)
        return hd, pd

    dec_epochs = 48 if args.quick else 8

    for name, model, runner, extra in (
        ("aec", scc.models.AEC(), aec_run, ()),
        ("aec_packed", scc.models.PackedAEC(), aec_run, ()),
        ("dec", scc.models.DEC(n_clusters=5), dec_run, (dec_epochs,)),
        ("dec_packed", scc.models.PackedDEC(n_clusters=5), dec_run,
         (dec_epochs,)),
    ):
        un = runner(model, None, f"{name} unsharded", *extra)
        sh = runner(model, mesh, f"{name} mesh(1) sharded", *extra)
        hd, pd = compare(name, un, sh)
        results[name] = {
            "unsharded_msamples_per_sec": round(un[2] / 1e6, 3),
            "sharded_msamples_per_sec": round(sh[2] / 1e6, 3),
            "loss_hist_max_diff": hd,
            "params_max_diff": pd,
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
