"""Serving tour: predictors, micro-batched HTTP, raw-waveform routes.

Trains a tiny DEC on synthetic windows (AEC epochs + k-means centroids),
then serves it four ways and prints a one-line latency/result summary
for each:

1. `DECPredictor` — direct fixed-shape jitted calls (bucket ladder,
   never a request-time recompile).
2. `ServingServer` — real localhost HTTP with cross-client
   micro-batching (`POST /predict` with .npy bodies).
3. `POST /predict_waveform`, two-pass route — raw samples windowed on
   device, model pass coalescing with window clients in the batcher.
4. `POST /predict_waveform`, fused route (`scc-serve --fuse-waveform`) —
   STFT + normalize + model as ONE device program per chunk.

    python examples/serving.py

Runs on whatever accelerator JAX finds (TPU or CPU); ~1 minute on CPU.
The serving tier is beyond-reference (the reference's inference is batch
artifact dumps, production.py:65-106).
"""

import io
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu import serve, serve_http

    k = 3
    x, truth = scc.data.synthetic_windows(512, n_classes=k, seed=0)
    xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    # --- tiny DEC: a few AEC epochs, then k-means centroids ---
    aec = scc.models.AEC()
    state = scc.train.create_train_state(
        aec, jax.random.key(0), jnp.asarray(xn[:4]), lr=1e-3
    )
    train_step, _ = scc.train.aec.make_step_fns(aec)
    batches = jnp.asarray(xn).reshape(8, 64, *xn.shape[1:])
    for _ in range(12):
        for xb in batches:
            state, _ = train_step(state, xb, jnp.float32(xb.shape[0]))
    _, z = aec.apply({"params": state.params}, jnp.asarray(xn))
    _, centroids = scc.cluster.kmeans(z, k, n_init=8, max_iter=100)

    dec = scc.models.DEC(n_clusters=k)
    params = dec.init(jax.random.key(1), jnp.asarray(xn[:2]))["params"]
    params = scc.models.load_encoder_decoder_from_aec(params, state.params)
    params = scc.models.replace_centroids(params, centroids)

    # --- 1. direct predictor calls ---
    pred = serve.DECPredictor(params, n_clusters=k, max_batch=256)
    pred.warmup()  # pay every bucket's compile before traffic
    t0 = time.perf_counter()
    out = pred(x[:100])
    ms = (time.perf_counter() - t0) * 1e3
    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(truth[:100], out["labels"])
    print(f"1. DECPredictor        : 100 windows in {ms:6.1f} ms, "
          f"NMI vs planted {nmi:.3f}")

    # --- 2-4. HTTP: window route + both waveform routes ---
    wave = np.random.default_rng(3).normal(size=20_000).astype(np.float32)
    for name, fuse in (("two-pass", False), ("fused   ", None)):
        frontend = serve.WaveformFrontend(
            pred, chunk_samples=1 << 15, fuse=fuse
        )
        frontend.warmup()
        srv = serve_http.make_server(
            pred, host="127.0.0.1", port=0, waveform_frontend=frontend
        )
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            host, port = srv.server_address[:2]
            if fuse is False:  # the window route once is enough
                buf = io.BytesIO()
                np.save(buf, x[:100])
                req = urllib.request.Request(
                    f"http://{host}:{port}/predict",
                    data=buf.getvalue(), method="POST",
                )
                t0 = time.perf_counter()
                with urllib.request.urlopen(req, timeout=120) as resp:
                    got = np.load(io.BytesIO(resp.read()))
                ms = (time.perf_counter() - t0) * 1e3
                match = bool(
                    np.array_equal(got["labels"], out["labels"])
                )
                print(f"2. HTTP /predict       : 100 windows in "
                      f"{ms:6.1f} ms, labels match direct: {match}")
            buf = io.BytesIO()
            np.save(buf, wave)
            req = urllib.request.Request(
                f"http://{host}:{port}/predict_waveform",
                data=buf.getvalue(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as resp:  # warm
                resp.read()
            t0 = time.perf_counter()
            with urllib.request.urlopen(
                urllib.request.Request(
                    f"http://{host}:{port}/predict_waveform",
                    data=buf.getvalue(), method="POST",
                ), timeout=120,
            ) as resp:
                got = np.load(io.BytesIO(resp.read()))
            ms = (time.perf_counter() - t0) * 1e3
            n = 3 if fuse is False else 4
            print(f"{n}. /predict_waveform {name}: "
                  f"{int(got['windows_per_channel'][0])} windows from "
                  f"{wave.shape[0]} samples in {ms:6.1f} ms")
        finally:
            srv.shutdown()
            srv.server_close()
            thread.join(timeout=10)


if __name__ == "__main__":
    main()
