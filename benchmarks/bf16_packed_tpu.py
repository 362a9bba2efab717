"""bf16-compute experiment on the MXU-packed architecture.

Round 2 measured bf16 at only +6% on the reference-parity AEC and
attributed the small win to tiny contraction dims starving the MXU
either way. The packed architecture (models/packed.py) removed that
bottleneck (32/256-wide contractions, ~54% of f32 peak), so the bf16
question is live again: v5e bf16 MXU peak is ~4x the f32 path, and a
compute-bound step should now see a real multiplier.

Measures the SHIPPED models (models.AEC / models.PackedAEC) under the
shipped precision policies (core/precision.py: f32 params + f32 or bf16
compute), same synthetic task as contraction_width_tpu.py, equal epochs,
loss evaluated in f32. Adoption bar (VERDICT r2 weak #5 convention):
>=15% faster at equal loss ships as a supported config
(`arch = packed` + `precision = bf16` already compose through
workflow/train.py:41-50 — this experiment decides whether to RECOMMEND
it in the docs).

Run from /root/repo:  python benchmarks/bf16_packed_tpu.py
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

    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import spectrogram_cube_clustering_tpu as scc

    def measure(model, x, batch, epochs=6, reps=3):
        data = scc.train.make_batched_data(np.asarray(x), batch_size=batch)
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )

        def loss_fn(params, xb):
            out = model.apply({"params": params}, xb)
            d = out[0].astype(jnp.float32) - xb
            return jnp.mean(d * d)

        @jax.jit
        def epoch(state, xs):
            def step(st, xb):
                loss, grads = jax.value_and_grad(loss_fn)(st.params, xb)
                return st.apply_gradients(grads=grads), loss

            return jax.lax.scan(step, state, xs)

        @jax.jit
        def run(state, xs):
            def body(st, _):
                st, losses = epoch(st, xs)
                return st, losses[-1]

            return jax.lax.scan(body, state, None, length=epochs)

        st, losses = run(state, data.x)  # compile + warm
        losses.block_until_ready()
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, losses = run(st, data.x)
            losses.block_until_ready()
            rates.append(len(x) * epochs / (time.perf_counter() - t0))
        rates.sort()
        # NOTE: the timed reps continue from the warmed state, so this
        # loss is after (1 + reps) * epochs cumulative epochs (24 at the
        # defaults), not `epochs` — the cross-variant comparison is
        # equal-schedule either way
        return rates[len(rates) // 2], float(losses[-1])

    n_samples, batch = 262_144, 4096
    x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    bf16 = jnp.bfloat16
    variants = {
        "aec_f32": scc.models.AEC(),
        "aec_bf16": scc.models.AEC(dtype=bf16),
        "packed_f32": scc.models.PackedAEC(),
        "packed_bf16": scc.models.PackedAEC(dtype=bf16),
    }
    out = {}
    for name, model in variants.items():
        rate, loss = measure(model, x, batch)
        row = {"samples_per_sec": round(rate, 1), "loss": round(loss, 5)}
        base = out.get(name.rsplit("_", 1)[0] + "_f32")
        if base:
            row["speedup_vs_f32"] = round(
                rate / base["samples_per_sec"], 3
            )
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
