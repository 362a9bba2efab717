"""HTTP serving front-end tests: micro-batching parity + wire protocol.

The reference has no serving tier (inference = batch predict artifacts,
production.py:65-106); serve_http is a beyond-reference addition, tested
end-to-end over real localhost HTTP with concurrent clients.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu import serve, serve_http


@pytest.fixture(scope="module")
def predictor():
    x, _ = scc.data.synthetic_windows(64, n_classes=3, seed=1)
    dec = scc.models.DEC(n_clusters=3)
    xn = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    params = dec.init(jax.random.key(0), jnp.asarray(xn[:2]))["params"]
    pred = serve.DECPredictor(params, n_clusters=3, max_batch=64)
    pred.warmup()
    return pred, x


@pytest.fixture()
def server(predictor):
    pred, _ = predictor
    srv = serve_http.make_server(pred, max_wait_ms=20.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()
    t.join(timeout=10)


def _post(srv, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    host, port = srv.server_address[:2]
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", data=buf.getvalue(), method="POST"
    )
    return urllib.request.urlopen(req, timeout=30)


def _get_json(srv, path):
    host, port = srv.server_address[:2]
    with urllib.request.urlopen(
        f"http://{host}:{port}{path}", timeout=30
    ) as resp:
        return json.loads(resp.read())


class TestMicroBatcher:
    def test_results_match_direct_call(self, predictor):
        pred, x = predictor
        mb = serve_http.MicroBatcher(pred, max_wait_ms=5.0)
        try:
            out = mb(x[:10])
            ref = pred(x[:10])
            np.testing.assert_allclose(out["q"], ref["q"], rtol=1e-6)
            np.testing.assert_array_equal(out["labels"], ref["labels"])
        finally:
            mb.close()

    def test_concurrent_requests_coalesce_and_split_correctly(self, predictor):
        """8 threads each send a distinct slice; every caller gets exactly
        its own rows back, and coalescing ran fewer device batches than
        requests (the whole point of the micro-batcher)."""
        pred, x = predictor
        mb = serve_http.MicroBatcher(pred, max_wait_ms=250.0)
        ref = pred(x)
        results = {}
        errors = []

        def worker(i):
            try:
                results[i] = mb(x[i * 8 : (i + 1) * 8])
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(8)
        ]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
        finally:
            stats = mb.stats()
            mb.close()
        assert not errors
        for i in range(8):
            np.testing.assert_allclose(
                results[i]["z"], ref["z"][i * 8 : (i + 1) * 8],
                rtol=1e-5, atol=1e-7,
            )
            np.testing.assert_array_equal(
                results[i]["labels"], ref["labels"][i * 8 : (i + 1) * 8]
            )
        assert stats["requests"] == 8
        assert stats["windows"] == 64
        # with a 250 ms window, the 8 near-simultaneous requests cannot
        # plausibly each run alone
        assert stats["device_batches"] < 8
        assert stats["coalesced_windows"] == 64

    def test_batch_closes_at_max_rows(self, predictor):
        """A request filling max_batch dispatches immediately (no wait)."""
        pred, x = predictor
        import time

        mb = serve_http.MicroBatcher(pred, max_wait_ms=10_000.0, max_rows=16)
        try:
            start = time.monotonic()
            mb(x[:16])
            assert time.monotonic() - start < 5.0
        finally:
            mb.close()

    def test_empty_request(self, predictor):
        pred, _ = predictor
        mb = serve_http.MicroBatcher(pred, max_wait_ms=5.0)
        try:
            out = mb(np.zeros((0, 4, 101, 1), np.float32))
            assert out["q"].shape == (0, 3)
        finally:
            mb.close()

    def test_error_propagates_to_caller(self, predictor):
        pred, x = predictor

        def broken(_):
            raise RuntimeError("device fell over")

        mb = serve_http.MicroBatcher(broken, max_wait_ms=1.0, max_rows=8)
        try:
            with pytest.raises(RuntimeError, match="device fell over"):
                mb(x[:4])
        finally:
            mb.close()

    def test_closed_batcher_rejects(self, predictor):
        pred, x = predictor
        mb = serve_http.MicroBatcher(pred, max_wait_ms=1.0)
        mb.close()
        with pytest.raises(RuntimeError, match="closed"):
            mb(x[:4])

    def test_mixed_dtype_coalescing_promotes(self, predictor):
        """Coalesced requests promote to the common dtype: a float32
        request is NOT narrowed because a float16 request arrived first
        (results must not depend on batching timing)."""
        pred, x = predictor
        ref = pred(x[8:16].astype(np.float32))
        # generous window: the coalescing assertion below needs thread 1
        # to enqueue within it, and a loaded CI box can stall a thread
        # start well past a 250 ms window (review r3 — timing flake);
        # max_rows=16 closes the batch the moment both requests arrive
        mb = serve_http.MicroBatcher(pred, max_wait_ms=5000.0, max_rows=16)
        results = {}

        def worker(i, arr):
            results[i] = mb(arr)

        threads = [
            threading.Thread(
                target=worker, args=(0, x[:8].astype(np.float16))
            ),
            threading.Thread(
                target=worker, args=(1, x[8:16].astype(np.float32))
            ),
        ]
        try:
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            stats = mb.stats()
        finally:
            mb.close()
        assert stats["device_batches"] == 1  # they really coalesced
        np.testing.assert_allclose(
            results[1]["z"], ref["z"], rtol=1e-6, atol=1e-8
        )
        np.testing.assert_array_equal(results[1]["labels"], ref["labels"])


class TestHTTPServer:
    def test_predict_roundtrip(self, server, predictor):
        pred, x = predictor
        with _post(server, "/predict", x[:10]) as resp:
            assert resp.status == 200
            out = np.load(io.BytesIO(resp.read()))
            ref = pred(x[:10])
            np.testing.assert_allclose(out["q"], ref["q"], rtol=1e-6)
            np.testing.assert_array_equal(out["labels"], ref["labels"])
            np.testing.assert_allclose(out["z"], ref["z"], rtol=1e-6)

    def test_mesh_predictor_over_http(self, predictor):
        """A mesh-sharded predictor behind the HTTP server returns the
        same results as the single-device one (the scc-serve --mesh
        path)."""
        pred, x = predictor
        mesh_pred = serve.DECPredictor(
            pred.params, n_clusters=3, max_batch=64,
            mesh=scc.core.make_data_mesh(),
        )
        srv = serve_http.make_server(mesh_pred, max_wait_ms=1.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            with _post(srv, "/predict", x[:10]) as resp:
                out = np.load(io.BytesIO(resp.read()))
                ref = pred(x[:10])
                np.testing.assert_allclose(
                    out["z"], ref["z"], rtol=1e-5, atol=1e-7
                )
                np.testing.assert_array_equal(out["labels"], ref["labels"])
        finally:
            srv.shutdown()
            srv.server_close()
            t.join(timeout=10)

    def test_3d_body_gets_channel_axis(self, server, predictor):
        _, x = predictor
        with _post(server, "/predict", x[:4, :, :, 0]) as resp:
            out = np.load(io.BytesIO(resp.read()))
            assert out["labels"].shape == (4,)

    def test_fields_filter(self, server, predictor):
        _, x = predictor
        with _post(server, "/predict?fields=labels", x[:4]) as resp:
            out = np.load(io.BytesIO(resp.read()))
            assert set(out.files) == {"labels"}

    def test_unknown_field_400(self, server, predictor):
        _, x = predictor
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, "/predict?fields=nope", x[:4])
        assert exc.value.code == 400
        assert "unknown fields" in json.loads(exc.value.read())["error"]

    def test_bad_body_400(self, server):
        host, port = server.server_address[:2]
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=b"not npy", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_wrong_geometry_400(self, server):
        bad = np.zeros((2, 8, 9, 1), np.float32)
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, "/predict", bad)
        assert exc.value.code == 400
        assert "input_hw" in json.loads(exc.value.read())["error"]

    def test_oversized_request_413(self, predictor):
        pred, x = predictor
        srv = serve_http.make_server(pred, max_wait_ms=1.0,
                                     max_request_mb=0.001)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(srv, "/predict", x[:16])
            assert exc.value.code == 413
        finally:
            srv.shutdown()
            srv.server_close()
            t.join(timeout=10)

    def test_healthz_and_stats(self, server, predictor):
        _, x = predictor
        meta = _get_json(server, "/healthz")
        assert meta["status"] == "ok"
        assert meta["model"] == "DECPredictor"
        assert meta["n_clusters"] == 3
        assert meta["input_hw"] == [4, 101]
        _post(server, "/predict", x[:4]).read()
        stats = _get_json(server, "/stats")
        assert stats["requests"] >= 1
        assert stats["device_batches"] >= 1
        assert stats["p50_ms"] is not None

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get_json(server, "/nope")
        assert exc.value.code == 404

    def test_npz_body_400_not_connection_reset(self, server):
        """A .npz body (the RESPONSE format, a plausible client mistake)
        gets a clear 400, not an AttributeError-driven connection reset."""
        buf = io.BytesIO()
        np.savez(buf, x=np.zeros((2, 4, 101, 1), np.float32))
        host, port = server.server_address[:2]
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400
        assert "npz" in json.loads(exc.value.read())["error"]

    def test_non_numeric_dtype_400(self, server):
        bad = np.full((2, 4, 101, 1), "ab", dtype="U2")
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(server, "/predict", bad)
        assert exc.value.code == 400
        assert "numeric" in json.loads(exc.value.read())["error"]

    def test_keepalive_reuse_and_413_close(self, predictor):
        """Happy path: two posts on one persistent connection both work.
        Error path: a 413 (body never drained) must CLOSE the connection
        instead of misparsing the unread npy bytes as the next request."""
        import http.client

        pred, x = predictor
        srv = serve_http.make_server(pred, max_wait_ms=1.0,
                                     max_request_mb=0.01)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        host, port = srv.server_address[:2]
        try:
            def npy(arr):
                b = io.BytesIO()
                np.save(b, arr)
                return b.getvalue()

            conn = http.client.HTTPConnection(host, port, timeout=30)
            for _ in range(2):  # keep-alive: same socket, two requests
                conn.request("POST", "/predict", body=npy(x[:2]))
                resp = conn.getresponse()
                assert resp.status == 200
                resp.read()
            conn.close()

            conn = http.client.HTTPConnection(host, port, timeout=30)
            conn.request("POST", "/predict", body=npy(x[:64]))  # > 0.01 MB
            resp = conn.getresponse()
            assert resp.status == 413
            resp.read()
            # server must have torn the connection down; a follow-up on
            # the same socket fails cleanly rather than returning a
            # misparsed 400 for a VALID request
            with pytest.raises(
                (http.client.HTTPException, ConnectionError, OSError)
            ):
                conn.request("POST", "/predict", body=npy(x[:2]))
                resp = conn.getresponse()
                assert resp.status == 200  # unreachable if properly closed
            conn.close()
        finally:
            srv.shutdown()
            srv.server_close()
            t.join(timeout=10)

    def test_concurrent_http_clients(self, server, predictor):
        """Concurrent HTTP posts coalesce under the hood and every client
        still receives exactly its own rows."""
        pred, x = predictor
        ref = pred(x)
        results = {}
        errors = []

        def client(i):
            try:
                with _post(server, "/predict", x[i * 8 : (i + 1) * 8]) as r:
                    results[i] = np.load(io.BytesIO(r.read()))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        for i in range(8):
            np.testing.assert_array_equal(
                results[i]["labels"], ref["labels"][i * 8 : (i + 1) * 8]
            )


def test_encoder_server_serves_latents(predictor):
    """AECEncoder (bare-array outputs) serves through the same front end."""
    pred, x = predictor
    enc = serve.AECEncoder(
        {"encoder": pred.params["encoder"], "decoder": pred.params["decoder"]},
        max_batch=64,
    )
    srv = serve_http.make_server(enc, max_wait_ms=5.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        meta = _get_json(srv, "/healthz")
        assert meta["model"] == "AECEncoder"
        assert meta["outputs"] == ["z"]
        with _post(srv, "/predict", x[:6]) as resp:
            out = np.load(io.BytesIO(resp.read()))
            np.testing.assert_allclose(out["z"], enc(x[:6]), rtol=1e-6)
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def test_scc_serve_main(tmp_path, predictor):
    """The scc-serve console entry (serve_http.main): argv parsing,
    checkpoint load, warmup, and live HTTP — run as a real subprocess
    (the installed-script shape) against a saved DEC checkpoint."""
    import os
    import re
    import subprocess
    import sys
    import time

    from spectrogram_cube_clustering_tpu.train.checkpoint import save

    pred, x = predictor
    ckpt = str(tmp_path / "DEC_Params_Final")
    save(ckpt, pred.params)

    # sitecustomize force-registers the TPU plugin; pin CPU inside the
    # child before serve_http imports jax (env vars alone don't win)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from spectrogram_cube_clustering_tpu import serve_http\n"
        f"serve_http.main([{ckpt!r}, '--n-clusters', '3', "
        "'--max-batch', '64', '--port', '0', '--waveform'])\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        url = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                time.sleep(0.2)
                continue
            m = re.search(r"http://([\d.]+):(\d+)", line)
            if m:
                host, port = m.group(1), int(m.group(2))
                if host == "0.0.0.0":
                    host = "127.0.0.1"
                url = f"http://{host}:{port}"
                break
        assert url, "server never announced its address"

        meta = json.loads(
            urllib.request.urlopen(f"{url}/healthz", timeout=30).read()
        )
        assert meta["model"] == "DECPredictor"

        buf = io.BytesIO()
        np.save(buf, x[:5])
        req = urllib.request.Request(
            f"{url}/predict", data=buf.getvalue(), method="POST"
        )
        out = np.load(io.BytesIO(urllib.request.urlopen(req, timeout=60).read()))
        np.testing.assert_array_equal(out["labels"], pred(x[:5])["labels"])

        # --waveform serves through the fused route by default
        # (--no-fuse-waveform restores the two-pass MicroBatcher route)
        assert meta["waveform"] == {
            "nperseg": 200, "hop": 100, "window_rows": 4, "fused": True,
        }
        wave = np.random.default_rng(3).normal(size=2_500).astype(
            np.float32
        )
        buf = io.BytesIO()
        np.save(buf, wave)
        req = urllib.request.Request(
            f"{url}/predict_waveform", data=buf.getvalue(), method="POST"
        )
        out = np.load(
            io.BytesIO(urllib.request.urlopen(req, timeout=60).read())
        )
        direct = serve.WaveformFrontend(pred, fuse=None)(wave)
        np.testing.assert_array_equal(out["labels"], direct["labels"])
        np.testing.assert_array_equal(
            out["windows_per_channel"], direct["windows_per_channel"]
        )
    finally:
        proc.kill()
        proc.wait()


def test_batcher_failure_releases_socket(predictor, monkeypatch):
    """If the MicroBatcher constructor fails, ServingServer must re-raise
    the ORIGINAL error (not an AttributeError from server_close touching
    the never-assigned self.batcher) and release the bound socket."""
    pred, _ = predictor

    def boom(*a, **k):
        raise RuntimeError("batcher init failed")

    # rebinding the SAME port is the proof the failed attempt closed its
    # socket, so port=0 won't do here — grab a free ephemeral port first
    # (unlike a hardcoded port, this can't collide with parallel runs)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    monkeypatch.setattr(serve_http, "MicroBatcher", boom)
    with pytest.raises(RuntimeError, match="batcher init failed"):
        serve_http.make_server(pred, host="127.0.0.1", port=port)
    monkeypatch.undo()

    # the port must be immediately rebindable: the socket was closed
    srv = serve_http.make_server(pred, host="127.0.0.1", port=port)
    srv.server_close()


class TestWaveformEndpoint:
    # both HTTP routes: two-pass (windows -> MicroBatcher, what
    # scc-serve uses by default) and fused (STFT+model in one program,
    # scc-serve --fuse-waveform)
    @pytest.fixture(params=[False, None], ids=["twopass", "fused"])
    def wf_server(self, request, predictor):
        pred, _ = predictor
        frontend = serve.WaveformFrontend(pred, fuse=request.param)
        assert frontend.fused == (request.param is None)
        srv = serve_http.make_server(
            pred, max_wait_ms=5.0, waveform_frontend=frontend
        )
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv, frontend
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)

    def test_predict_waveform_roundtrip(self, wf_server, predictor):
        srv, frontend = wf_server
        pred, _ = predictor
        wave = np.random.default_rng(1).normal(size=(2, 2_500)).astype(
            np.float32
        )
        with _post(srv, "/predict_waveform", wave) as resp:
            out = np.load(io.BytesIO(resp.read()))
            got = {k: out[k] for k in out.files}
        n = frontend.n_windows(2_500)
        np.testing.assert_array_equal(got["windows_per_channel"], [n, n])
        direct = pred(frontend.windows(wave))
        np.testing.assert_array_equal(got["labels"], direct["labels"])
        np.testing.assert_allclose(got["q"], direct["q"], rtol=1e-5)
        # metadata advertises the STFT geometry and the active route
        meta = _get_json(srv, "/healthz")
        assert meta["waveform"] == {
            "nperseg": 200, "hop": 100, "window_rows": 4,
            "fused": frontend.fused,
        }
        # fused requests bypass the batcher; /stats counts them anyway
        stats = _get_json(srv, "/stats")
        assert stats["fused_waveform_requests"] == (
            1 if frontend.fused else 0
        )

    def test_concurrent_waveform_clients(self, wf_server, predictor):
        """Concurrent waveform posts (both routes; the fused one runs the
        jitted STFT+model program from several handler threads at once)
        each get exactly their own windows' outputs."""
        srv, frontend = wf_server
        pred, _ = predictor
        rng = np.random.default_rng(11)
        waves = [
            rng.normal(size=(1_500 + 700 * i,)).astype(np.float32)
            for i in range(6)
        ]
        results = {}
        errors = []

        def client(i):
            try:
                with _post(srv, "/predict_waveform", waves[i]) as r:
                    z = np.load(io.BytesIO(r.read()))
                    results[i] = {k: z[k] for k in z.files}
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        for i, wave in enumerate(waves):
            ref = pred(frontend.windows(wave))
            np.testing.assert_array_equal(
                results[i]["labels"], ref["labels"]
            )
            np.testing.assert_array_equal(
                results[i]["windows_per_channel"],
                [frontend.n_windows(wave.shape[0])],
            )

    def test_frontend_wraps_microbatcher_directly(self, predictor):
        """WaveformFrontend's documented 'or a MicroBatcher around one'
        composition: no ._fn on the batcher so fuse auto-disables, the
        two-pass route feeds windows through the batcher, and outputs
        match wrapping the bare predictor."""
        pred, _ = predictor
        batcher = serve_http.MicroBatcher(pred, max_wait_ms=1.0)
        try:
            wf = serve.WaveformFrontend(batcher)
            assert not wf.fused
            wave = np.random.default_rng(13).normal(size=1_500).astype(
                np.float32
            )
            out = wf(wave)
            ref = serve.WaveformFrontend(pred, fuse=False)(wave)
            np.testing.assert_array_equal(out["labels"], ref["labels"])
            np.testing.assert_allclose(out["q"], ref["q"], rtol=1e-6)
        finally:
            batcher.close()

    def test_fused_route_matches_two_pass_over_http(self, predictor):
        """The two HTTP routes return identical outputs for the same
        waveform (same device backend; only the program structure and
        batching differ)."""
        pred, _ = predictor
        wave = np.random.default_rng(7).normal(size=(2, 2_500)).astype(
            np.float32
        )
        outs = {}
        for fuse in (False, None):
            frontend = serve.WaveformFrontend(pred, fuse=fuse)
            srv = serve_http.make_server(
                pred, max_wait_ms=5.0, waveform_frontend=frontend
            )
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            try:
                with _post(srv, "/predict_waveform", wave) as resp:
                    z = np.load(io.BytesIO(resp.read()))
                    outs[fuse] = {k: z[k] for k in z.files}
            finally:
                srv.shutdown()
                srv.server_close()
                t.join(timeout=10)
        assert set(outs[False]) == set(outs[None])
        np.testing.assert_array_equal(
            outs[False]["labels"], outs[None]["labels"]
        )
        np.testing.assert_allclose(
            outs[False]["q"], outs[None]["q"], rtol=1e-5, atol=1e-7
        )
        np.testing.assert_array_equal(
            outs[False]["windows_per_channel"],
            outs[None]["windows_per_channel"],
        )

    def test_fused_route_fields_filter(self, predictor):
        pred, _ = predictor
        frontend = serve.WaveformFrontend(pred, fuse=None)
        assert frontend.fused
        srv = serve_http.make_server(
            pred, max_wait_ms=5.0, waveform_frontend=frontend
        )
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            wave = np.zeros(2_500, np.float32)
            host, port = srv.server_address[:2]
            buf = io.BytesIO()
            np.save(buf, wave)
            req = urllib.request.Request(
                f"http://{host}:{port}/predict_waveform?fields=labels",
                data=buf.getvalue(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                z = np.load(io.BytesIO(resp.read()))
                files = set(z.files)
        finally:
            srv.shutdown()
            srv.server_close()
            t.join(timeout=10)
        # filtered to labels; windows_per_channel always rides along
        assert files == {"labels", "windows_per_channel"}

    def test_disabled_endpoint_404(self, server):
        wave = np.zeros(1_000, np.float32)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/predict_waveform", wave)
        assert e.value.code == 404
        assert "not enabled" in json.loads(e.value.read())["error"]

    def test_too_short_waveform_400(self, wf_server):
        srv, _ = wf_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/predict_waveform", np.zeros(450, np.float32))
        assert e.value.code == 400
        assert "no complete" in json.loads(e.value.read())["error"]

    def test_bad_waveform_shape_400(self, wf_server):
        srv, _ = wf_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/predict_waveform",
                  np.zeros((2, 3, 600), np.float32))
        assert e.value.code == 400
        assert "(T,) or (channels, T)" in json.loads(e.value.read())["error"]
