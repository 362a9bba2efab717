"""Batch-size sweep for the MXU-packed architecture.

The parity AEC's optimum was 4096 (RESULTS.md "Tuning notes": larger
batches LOSE throughput). The packed model runs ~3.5x the per-sample
FLOPs at 5x the arithmetic intensity, so its optimum may sit elsewhere.
Sweeps the fused multi-epoch AEC loop (same harness as bench.py) over
batch sizes for PackedAEC, and the DEC segment loop for PackedDEC.

Run from /root/repo:  python benchmarks/packed_batch_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.ops.student_t import (
        target_distribution,
    )
    from spectrogram_cube_clustering_tpu.train.dec import (
        _pad_p,
        make_segment_fn,
    )

    n_samples, epochs, reps = 262_144, 6, 3
    x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    def measure_aec(batch):
        model = scc.models.PackedAEC()
        data = scc.train.make_batched_data(x, batch_size=batch)
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )

        def loss_fn(params, xb):
            out = model.apply({"params": params}, xb)
            d = out[0] - xb
            return jnp.mean(d * d)

        @jax.jit
        def run(state, xs):
            def epoch(st, _):
                def step(s, xb):
                    loss, grads = jax.value_and_grad(loss_fn)(s.params, xb)
                    return s.apply_gradients(grads=grads), loss

                st, losses = jax.lax.scan(step, st, xs)
                return st, losses[-1]

            return jax.lax.scan(epoch, state, None, length=epochs)

        st, losses = run(state, data.x)
        losses.block_until_ready()
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, losses = run(st, data.x)
            losses.block_until_ready()
            rates.append(n_samples * epochs / (time.perf_counter() - t0))
        rates.sort()
        return rates[len(rates) // 2]

    def measure_dec(batch):
        model = scc.models.PackedDEC(n_clusters=5)
        data = scc.train.make_batched_data(x, batch_size=batch)
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )
        q, _, _ = scc.train.full_eval(model, state.params, data)
        p_all = _pad_p(target_distribution(q), data.n_batches, batch)
        segment = make_segment_fn(model, 0.001, data.n_batches)

        @jax.jit
        def run(st, xs, mask, p):
            def body(s, _):
                s2, sums = segment(s, xs, mask, p, jnp.array(0))
                return s2, (sums[0].sum(), sums[3].sum())

            return jax.lax.scan(body, st, None, length=epochs)

        state, (ls, ns) = run(state, data.x, data.mask, p_all)
        ls.block_until_ready()
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, (ls, ns) = run(state, data.x, data.mask, p_all)
            ls.block_until_ready()
            rates.append(n_samples * epochs / (time.perf_counter() - t0))
        rates.sort()
        return rates[len(rates) // 2]

    out = {}
    for batch in (2048, 4096, 8192, 16384):
        out[f"aec_packed_b{batch}"] = round(measure_aec(batch), 1)
        print(f"aec_packed b={batch}: {out[f'aec_packed_b{batch}']:,.0f}",
              flush=True)
    for batch in (2048, 4096, 8192, 16384):
        out[f"dec_packed_b{batch}"] = round(measure_dec(batch), 1)
        print(f"dec_packed b={batch}: {out[f'dec_packed_b{batch}']:,.0f}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
