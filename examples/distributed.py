"""Distributed recipes: data mesh, sharded streaming, multi-host feeding.

Everything here runs on whatever devices JAX sees. To emulate a pod on one
machine:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed.py

On a real multi-host TPU pod, run the same script on every host with
`scc.core.initialize_distributed()` first (auto-discovers on TPU pods) —
the loaders feed each host's addressable shards only.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    # honor the env request even on images whose sitecustomize
    # force-registers a TPU plugin (env vars alone don't win there)
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError as e:
        # backend already initialized: the pin cannot take effect —
        # say so instead of silently running on whatever device won
        print(f"WARNING: could not pin CPU backend ({e}); "
              f"running on {jax.default_backend()}", flush=True)

import numpy as np
import jax.numpy as jnp

import spectrogram_cube_clustering_tpu as scc


def main():
    # On a pod: scc.core.initialize_distributed() here (idempotent).
    mesh = scc.core.make_data_mesh()
    print(f"{len(jax.devices())} devices, mesh axes {mesh.axis_names}")

    x, _ = scc.data.synthetic_windows(512, n_classes=3, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    # 1) Device-resident training sharded over the mesh: batches shard
    #    along the within-batch axis, params replicate, XLA inserts the
    #    gradient psums. Multi-host: make_batched_data feeds only this
    #    process's block automatically.
    model = scc.models.AEC()
    data = scc.train.make_batched_data(x, batch_size=64, mesh=mesh)
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
    )
    out = scc.train.train_aec(
        model, state, data, None,
        scc.train.AECConfig(n_epochs=2, early_stopping=False),
    )
    print("sharded scan-path losses:", [f"{v:.4f}" for v in out["history"]["train"]])

    # 2) Streaming (larger-than-HBM) training, still sharded: the prefetch
    #    loader lands every batch pre-sharded.
    from spectrogram_cube_clustering_tpu.data import PrefetchLoader

    items = [x[i : i + 32] for i in range(0, len(x), 32)]
    state = jax.device_put(
        scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
        ),
        scc.core.replicated_sharding(mesh),
    )
    #    transfer_dtype="bfloat16" halves host->device wire bytes (the
    #    stream tier is transfer-bound; measured +95% on a v5e tunnel,
    #    RESULTS.md) — f32 is restored on device inside the jitted steps.
    #    "int8" quarters them (per-sample symmetric quantization, scales
    #    sharded alongside the codes).
    out = scc.train.train_aec_stream(
        model, state,
        lambda: PrefetchLoader(
            lambda i: items[i], len(items), 64, num_workers=2,
            sharding=scc.core.batch_sharding(mesh, 4),
            transfer_dtype="bfloat16",
        ),
        scc.train.AECConfig(n_epochs=2, early_stopping=False),
    )
    print("sharded stream-path losses:", [f"{v:.4f}" for v in out["history"]["train"]])

    # 3) Distributed clustering: psum-reduced sufficient statistics.
    z = jnp.asarray(np.random.default_rng(1).normal(size=(len(x), 9)), jnp.float32)
    labels, centers = scc.parallel.sharded_kmeans(z, 3, mesh, n_init=10,
                                                  init_subsample=256)
    print("distributed k-means centers:", centers.shape)

    # 4) Sequence-parallel STFT: hop-overlap halo exchange over the mesh.
    wave = jnp.asarray(
        np.random.default_rng(2).normal(size=(len(jax.devices()) * 800,)),
        jnp.float32,
    )
    spec = scc.parallel.sharded_spectrogram(wave, mesh)
    print("halo-exchange spectrogram:", spec.shape)

    # 5) SPMD-fused waveform serving: raw chunk time-sharded (halo STFT)
    # into the batch-resharded data-parallel model pass, one program.
    dec = scc.models.DEC(n_clusters=3)
    dec_params = dec.init(jax.random.key(1), jnp.asarray(x[:2]))["params"]
    pred = scc.serve.DECPredictor(
        dec_params, n_clusters=3, max_batch=8 * mesh.size, mesh=mesh
    )
    frontend = scc.serve.WaveformFrontend(pred, chunk_samples=1, fuse=True)
    served = frontend(np.asarray(wave))
    print("mesh-fused waveform serving:", served["labels"].shape,
          "windows/channel", int(served["windows_per_channel"][0]))


if __name__ == "__main__":
    main()
