"""Streaming-tier throughput on the local accelerator.

Measures the larger-than-HBM path end to end: host-RAM windows ->
PrefetchLoader (threaded, double-buffered device_put) -> per-batch jitted
AEC/DEC steps (`train_aec_stream` / full_eval_stream). This is the tier
the reference's absent dev_ddp branch was meant for (readme.md:65); here
it is the `loadmode=stream` workflow path.

The dataset lives on the host only — every batch pays H2D, so the number
reflects input-pipeline + interconnect reality, not just step math (the
RAM-path numbers in RESULTS.md are the device-resident upper bound).

    python benchmarks/stream_scale.py [n_windows]   # default 1,000,000
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
from spectrogram_cube_clustering_tpu.data import PrefetchLoader


def main(n_windows: int = 1_000_000, batch: int = 4096, workers: int = 4):
    x, _ = scc.data.synthetic_windows(n_windows, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    print(f"host dataset: {x.nbytes / 1e9:.2f} GB, batch {batch}, "
          f"{workers} loader workers", flush=True)

    item = lambda i: x[i * batch:(i + 1) * batch]  # noqa: E731
    n_items = n_windows // batch
    dropped = n_windows - n_items * batch
    if dropped:
        print(f"(streaming {n_items * batch} of {n_windows} windows; "
              f"{dropped} trailing windows not a whole batch)", flush=True)

    def make_loader():
        return PrefetchLoader(item, n_items, batch, num_workers=workers)

    model = scc.models.AEC()
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
    )

    # warm epoch (compile)
    t0 = time.perf_counter()
    out = scc.train.train_aec_stream(
        model, state,
        make_loader,
        scc.train.AECConfig(n_epochs=1, early_stopping=False),
    )
    print(f"warm epoch (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    epochs = 3
    t0 = time.perf_counter()
    out = scc.train.train_aec_stream(
        model, out["state"],
        make_loader,
        scc.train.AECConfig(n_epochs=epochs, early_stopping=False),
    )
    dt = time.perf_counter() - t0
    n = n_items * batch
    print(
        f"streaming AEC train: {n * epochs / dt / 1e6:.3f} M samples/s "
        f"sustained over {epochs} epochs ({dt:.1f}s), "
        f"loss {out['history']['train'][-1]:.5f}",
        flush=True,
    )

    # streaming full eval (the DEC refresh building block)
    _, eval_step = scc.train.dec.make_stream_fns(model=scc.models.DEC(5),
                                                 gamma=0.001)
    dec = scc.models.DEC(5)
    dstate = scc.train.create_train_state(
        dec, jax.random.key(1), jnp.asarray(x[:4]), lr=1e-3
    )
    t0 = time.perf_counter()
    q, labels, z = scc.train.dec.full_eval_stream(
        eval_step, dstate.params, make_loader, n
    )
    dt = time.perf_counter() - t0
    print(f"streaming full_eval: {n / dt / 1e6:.3f} M samples/s ({dt:.1f}s, "
          f"q {q.shape}, z {z.shape})", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
