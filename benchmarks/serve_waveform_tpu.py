"""Raw-waveform serving latency on the real chip.

Per-request wall latency (p50/p95) of `serve.WaveformFrontend` around a
DECPredictor at several request lengths — each request pays the
on-device STFT (the Pallas kernel) plus the model pass. Fresh samples
per request (the tunnel memoizes identical executes, CLAUDE.md); wall
numbers include the tunnel's ~100 ms dispatch RTT like
serve_latency_tpu.py, so read the deltas, not the absolutes.

Run from /root/repo: `python benchmarks/serve_waveform_tpu.py`
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    import spectrogram_cube_clustering_tpu as scc
    from spectrogram_cube_clustering_tpu import serve

    rng = np.random.default_rng(0)
    model = scc.models.DEC(n_clusters=5)
    params = model.init(
        jax.random.key(0), np.zeros((1, 4, 101, 1), np.float32)
    )["params"]
    pred = serve.DECPredictor(params, n_clusters=5, max_batch=4096,
                              buckets=True)
    wf = serve.WaveformFrontend(pred, chunk_samples=1 << 20)
    wf.warmup()

    out = {"platform": jax.devices()[0].platform,
           "chunk_samples": wf.chunk}

    # fused (default for direct calls) vs two-pass (the HTTP route) at
    # one representative length — the delta is the D2H/H2D window bounce
    # plus one tunnel RTT
    assert wf.fused
    wf2 = serve.WaveformFrontend(pred, chunk_samples=1 << 20, fuse=False)
    for name, front in (("fused", wf), ("two_pass", wf2)):
        lats = []
        for _ in range(10):
            x = rng.normal(size=(40_000,)).astype(np.float32)
            t0 = time.perf_counter()
            front(x)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        out[f"route_{name}_p50_ms"] = round(lats[len(lats) // 2], 1)
    # 8k samples = 19 windows (one sensor-second-ish), 400k = 999,
    # 4M = 9,999 (a multi-chunk request: 4 STFT chunks + 3 model buckets)
    for t in (8_000, 400_000, 4_000_000):
        reqs = [rng.normal(size=(t,)).astype(np.float32) for _ in range(12)]
        wf(reqs[0])  # touch the path
        lats = []
        for x in reqs:
            t0 = time.perf_counter()
            r = wf(x)
            assert r["labels"].shape[0] == wf.n_windows(t)
            lats.append((time.perf_counter() - t0) * 1e3)
        lats.sort()
        out[f"wave{t}"] = {
            "windows": wf.n_windows(t),
            "p50_ms": round(lats[len(lats) // 2], 1),
            "p95_ms": round(lats[int(len(lats) * 0.95) - 1], 1),
        }

    # fused route with the half-width wire cast (transfer_dtype flows
    # through to raw samples since the fused wire-cast change): same
    # chunk ladder, half the request bytes
    pred16 = serve.DECPredictor(
        params, n_clusters=5, max_batch=4096, buckets=True,
        transfer_dtype="bfloat16",
    )
    wf16 = serve.WaveformFrontend(pred16, chunk_samples=1 << 20)
    assert wf16.fused and wf16._fused_wire is not None
    wf16.warmup()
    lats = []
    for i in range(10):
        x = rng.normal(size=(40_000,)).astype(np.float32)
        t0 = time.perf_counter()
        wf16(x)
        if i:
            lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    out["route_fused_bf16wire_p50_ms"] = round(lats[len(lats) // 2], 1)

    # over REAL localhost HTTP: the two-pass server (default, coalesces
    # across clients) vs --fuse-waveform (one host->device crossing)
    import io
    import threading
    import urllib.request

    from spectrogram_cube_clustering_tpu import serve_http

    for name, front in (("fused", wf), ("two_pass", wf2)):
        srv = serve_http.make_server(
            pred, host="127.0.0.1", port=0, waveform_frontend=front
        )
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        try:
            host, port = srv.server_address[:2]

            def post(x):
                buf = io.BytesIO()
                np.save(buf, x)
                req = urllib.request.Request(
                    f"http://{host}:{port}/predict_waveform",
                    data=buf.getvalue(), method="POST",
                )
                with urllib.request.urlopen(req, timeout=300) as resp:
                    resp.read()

            lats = []
            for i in range(10):
                x = rng.normal(size=(40_000,)).astype(np.float32)
                t0 = time.perf_counter()
                post(x)
                if i:  # first request warms the HTTP/bucket path
                    lats.append((time.perf_counter() - t0) * 1e3)
            lats.sort()
            out[f"http_{name}_p50_ms"] = round(lats[len(lats) // 2], 1)

            # 8 concurrent clients x 4 small (8k-sample, 19-window)
            # requests: where the MicroBatcher's cross-client coalescing
            # should earn its keep vs per-request fused programs
            reqs = [
                [rng.normal(size=(8_000,)).astype(np.float32)
                 for _ in range(4)]
                for _ in range(8)
            ]
            errs = []

            def client(items):
                try:
                    for x in items:
                        post(x)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [
                threading.Thread(target=client, args=(r,)) for r in reqs
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            assert not errs, errs[:1]
            out[f"http_{name}_8client_reqs_per_sec"] = round(32 / wall, 1)
        finally:
            srv.shutdown()
            srv.server_close()
            thread.join(timeout=10)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
