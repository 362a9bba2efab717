"""Measure host-sync amortization: train_aec sync_every=1 vs fused chunks.

One v5e through the remote tunnel; the per-epoch path pays a host round
trip per epoch (float(loss) + dispatch), the fused path one per chunk.
Run from /root/repo:  python benchmarks/sync_every_tpu.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import spectrogram_cube_clustering_tpu as scc

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n, bsz, epochs = 1_000_000, 4096, 8
    x, _ = scc.data.synthetic_windows(n, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    tra = scc.train.make_batched_data(x, batch_size=bsz)
    model = scc.models.AEC()

    def mk():
        return scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
        )

    cfg = scc.train.AECConfig(n_epochs=epochs, early_stopping=True, patience=3)

    for label, kw in [
        ("sync_every=1 (per-epoch)", dict(sync_every=1)),
        ("sync_every=8 (fused)", dict(sync_every=8)),
    ]:
        st = mk()
        # warm compile
        t0 = time.perf_counter()
        out = scc.train.train_aec(model, st, tra, tra, cfg, **kw)
        t1 = time.perf_counter()
        st = mk()
        t2 = time.perf_counter()
        out = scc.train.train_aec(model, st, tra, tra, cfg, **kw)
        t3 = time.perf_counter()
        # early stopping may fire — count the epochs that actually ran,
        # or a stopped run over-reports throughput
        ran = len(out["history"]["train"])
        thr = n * ran / (t3 - t2)
        print(
            f"{label}: cold {t1 - t0:.1f}s, warm {t3 - t2:.2f}s "
            f"({ran}/{epochs} epochs, {thr / 1e6:.2f} M samples/s incl. "
            f"val pass), final train loss {out['history']['train'][-1]:.5f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
