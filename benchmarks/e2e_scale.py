"""Production-scale end-to-end validation on the local accelerator.

Synthesizes N spectrogram windows with planted classes (data.synthetic
windows), then runs the full pipeline exactly as the workflow layer wires
it — AEC pretrain -> latent GMM init -> DEC refinement with target
refreshes and the delta stop — and scores the final labels against the
planted truth (NMI). Reproduces the RESULTS.md "production-scale
end-to-end validation" row.

    python benchmarks/e2e_scale.py [n_windows]   # default 1,000,000
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import spectrogram_cube_clustering_tpu as scc


def main(n_windows: int = 1_000_000, n_classes: int = 5) -> float:
    from sklearn.metrics import normalized_mutual_info_score as nmi

    t_all = time.perf_counter()
    x, y = scc.data.synthetic_windows(n_windows, n_classes=n_classes, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    data = scc.train.make_batched_data(x, batch_size=4096)
    print(f"data: {x.nbytes / 1e9:.2f} GB on device, "
          f"{data.n_batches} batches", flush=True)

    # stage 1: AEC pretrain
    aec = scc.models.AEC()
    st = scc.train.create_train_state(
        aec, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
    )
    t0 = time.perf_counter()
    out = scc.train.train_aec(
        aec, st, data, None,
        scc.train.AECConfig(n_epochs=4, early_stopping=False),
        sync_every=4,  # all 4 epochs in one device call (RESULTS.md)
    )
    print(f"AEC: 4 epochs in {time.perf_counter() - t0:.1f}s, "
          f"loss {out['history']['train'][0]:.4f} -> "
          f"{out['history']['train'][-1]:.4f}", flush=True)

    # stage 2+3: DEC with on-device GMM init + refinement
    dec = scc.models.DEC(n_clusters=n_classes)
    dst = scc.train.create_train_state(
        dec, jax.random.key(1), jnp.asarray(x[:4]), lr=1e-3
    )
    from spectrogram_cube_clustering_tpu.models.dec import (
        load_encoder_decoder_from_aec,
    )

    dst = dst.replace(params=load_encoder_decoder_from_aec(
        dst.params, out["final_params"]
    ))
    t0 = time.perf_counter()
    dout = scc.train.train_dec(
        dec, dst, data,
        scc.train.DECConfig(
            n_clusters=n_classes, n_epochs=4, init="gmm",
            kmeans_n_init=10, kmeans_max_iter=200,
        ),
    )
    score = float(nmi(y, dout["labels"]))
    print(f"DEC: {dout['last_epoch']} epochs in "
          f"{time.perf_counter() - t0:.1f}s "
          f"(stopped_early={dout['stopped_early']}); NMI vs truth = "
          f"{score:.4f}; total {time.perf_counter() - t_all:.1f}s",
          flush=True)
    return score


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    score = main(n)
    assert score > 0.95, f"end-to-end NMI regressed: {score}"
