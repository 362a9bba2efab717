"""Contraction-width experiment: does packing the window so convs
contract over >=32 channels lift the ~25% MFU ceiling? (VERDICT r2 weak
#5 — the last untested hypothesis behind "bound by tiny contraction
dims".)

The shipped AEC contracts over 1*2*4=8 (first conv) and 8*2*4=64
(later convs) against a 128-wide MXU. The packed variant space-to-depths
the (4, 101) window by (2, 2) into (2, 52, 4) and runs 32-channel convs,
so contractions are 4*2*4=32 and 32*2*4=256. Both train the same task
(reconstruction of normalized spectrogram windows, latent dim 9).

Measures per variant: train-step samples/s (fused epochs, dependency-
chained), analytic fwd FLOPs/sample, and loss after equal epochs on the
same synthetic data — the VERDICT adoption bar is >=15% faster at equal
loss.

Run from /root/repo:  python benchmarks/contraction_width_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = "/root/repo/.jax_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu.models.layers import (
        bias_init,
        xavier_init,
    )

    class PackedAEC(nn.Module):
        """Space-to-depth packed autoencoder: (B,4,101,1) -> pad W to 104
        -> s2d (2,2) -> (B,2,52,4) -> 32-ch conv stack -> Dense(9) ->
        mirrored decode -> depth-to-space -> crop. Same task/latent as
        AEC; contraction dims 32/256 instead of 8/64."""

        features: int = 32

        @nn.compact
        def __call__(self, x):
            b = x.shape[0]
            kw = dict(kernel_init=xavier_init, bias_init=bias_init)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 3), (0, 0)))  # W 101->104
            # space-to-depth (2, 2): (B, 2, 52, 4)
            x = x.reshape(b, 2, 2, 52, 2, 1).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, 2, 52, 4)
            h = nn.relu(nn.Conv(self.features, (2, 4), (1, 2),
                                padding=((1, 1), (1, 1)), **kw)(x))
            h = nn.relu(nn.Conv(self.features, (2, 4), (1, 2),
                                padding=((1, 1), (1, 1)), **kw)(h))
            h = nn.relu(nn.Conv(self.features, (2, 4), (1, 2),
                                padding=((1, 1), (1, 1)), **kw)(h))
            z = nn.relu(nn.Dense(9, **kw)(h.reshape(b, -1)))
            # unflatten to (2, 7, F): three stride-(1,2) ConvTs reach
            # W 7->14->28->56 >= 52, cropped back to the packed grid
            d = nn.relu(nn.Dense(2 * 7 * self.features, **kw)(z))
            d = d.reshape(b, 2, 7, self.features)
            d = nn.relu(nn.ConvTranspose(self.features, (2, 4), (1, 2),
                                         padding="SAME", **kw)(d))
            d = nn.relu(nn.ConvTranspose(self.features, (2, 4), (1, 2),
                                         padding="SAME", **kw)(d))
            d = nn.relu(nn.ConvTranspose(4, (2, 4), (1, 2),
                                         padding="SAME", **kw)(d))
            # decoder spatial may overshoot the packed grid; crop
            d = d[:, :2, :52, :4]
            # depth-to-space back to (B, 4, 104, 1), crop W to 101
            d = d.reshape(b, 2, 52, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
            d = d.reshape(b, 4, 104, 1)[:, :, :101, :]
            return d, z

    def measure(model, x, batch, epochs=6, reps=3):
        data = scc.train.make_batched_data(np.asarray(x), batch_size=batch)
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )

        def loss_fn(params, xb):
            out = model.apply({"params": params}, xb)
            d = out[0] - xb
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
        return rates[len(rates) // 2], float(losses[-1]), st

    n_samples, batch = 262_144, 4096
    x, _ = scc.data.synthetic_windows(n_samples, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    out = {}
    base_rate, base_loss, _ = measure(scc.models.AEC(), x, batch)
    out["baseline_aec"] = {
        "samples_per_sec": round(base_rate, 1), "loss": base_loss,
    }
    print("baseline:", out["baseline_aec"])
    for feats in (32, 64):
        rate, loss, _ = measure(PackedAEC(features=feats), x, batch)
        out[f"packed_{feats}ch"] = {
            "samples_per_sec": round(rate, 1), "loss": loss,
            "speedup_vs_baseline": round(rate / base_rate, 3),
        }
        print(f"packed_{feats}ch:", out[f"packed_{feats}ch"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
