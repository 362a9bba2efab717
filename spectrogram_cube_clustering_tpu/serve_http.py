"""HTTP serving front-end with dynamic micro-batching.

The reference has no serving story — its only inference is the batch
`predict` workflow writing `.npy` artifacts (reference
Cluster/production.py:65-106). `serve.py` provides the fixed-shape jitted
predictors; this module adds the production front end around them:

- `MicroBatcher`: coalesces concurrent requests into single device
  passes. TPU serving economics want large batches (the jitted DEC
  forward is batch-insensitive to ~1k windows, RESULTS.md "Serving
  latency"), but individual clients send small requests — cross-request
  batching buys chip occupancy without asking any client to batch.
  Requests wait at most `max_wait_ms` for co-travelers; results are
  split back per request.
- `ServingServer` / `make_server`: a dependency-free stdlib
  `ThreadingHTTPServer` speaking numpy wire formats:

      POST /predict   body = .npy bytes, shape (n, H, W[, 1])
                      -> .npz bytes {q, labels, z} (filter: ?fields=labels)
      GET  /healthz   -> JSON model metadata
      GET  /stats     -> JSON counters (occupancy, latency quantiles)

- `main`: the `scc-serve` console entry point.

Works with any predictor from `serve.py` (`DECPredictor` -> q/labels/z,
`AECEncoder` -> z); bucket ladders, request chunking, and transfer-dtype
handling all compose underneath.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


class _Pending:
    __slots__ = ("x", "event", "result", "error")

    def __init__(self, x: np.ndarray):
        self.x = x
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None

    def wait(self):
        self.event.wait()
        if self.error is not None:
            raise self.error
        return self.result


_STOP = object()


def _as_output_dict(out) -> Dict[str, np.ndarray]:
    """Normalize predictor outputs: DECPredictor returns a dict,
    AECEncoder a bare latent array."""
    return out if isinstance(out, dict) else {"z": out}


class MicroBatcher:
    """Coalesce concurrent predict requests into single device passes.

    A worker thread drains a queue: the first request opens a batch,
    which closes when either `max_wait_ms` elapses or the coalesced row
    count reaches the predictor's `max_batch` (one compiled shape). The
    batch runs as ONE predictor call and the outputs are split back to
    the waiting callers by row range. Thread-safe; exceptions propagate
    to every caller in the failed batch.

    `max_wait_ms=0` disables coalescing (pure pass-through) without
    changing the calling convention.
    """

    def __init__(self, predictor, max_wait_ms: float = 2.0,
                 max_rows: Optional[int] = None):
        self._pred = predictor
        self._max_wait = max(0.0, float(max_wait_ms)) / 1e3
        self._max_rows = int(max_rows or getattr(predictor, "max_batch", 1024))
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0, "windows": 0, "device_batches": 0,
            "coalesced_windows": 0, "max_coalesced": 0,
        }
        self._closed = False
        self._thread = threading.Thread(
            target=self._loop, name="scc-microbatcher", daemon=True
        )
        self._thread.start()

    # -- public API --------------------------------------------------

    def __call__(self, windows: np.ndarray) -> Dict[str, np.ndarray]:
        return self.submit(windows).wait()

    def submit(self, windows: np.ndarray) -> _Pending:
        x = np.asarray(windows)
        item = _Pending(x)
        with self._lock:
            self._stats["requests"] += 1
            self._stats["windows"] += len(x)
        if len(x) == 0:
            # nothing to coalesce; jitted predictor calls are thread-safe
            try:
                item.result = _as_output_dict(self._pred(x))
            except BaseException as e:  # noqa: BLE001 — relay to caller
                item.error = e
            item.event.set()
            return item
        # The closed-check and enqueue must be atomic against close():
        # otherwise an item enqueued after _STOP is never drained and its
        # caller blocks forever in wait().
        with self._lock:
            if self._closed:
                item.error = RuntimeError("MicroBatcher is closed")
                item.event.set()
                return item
            self._queue.put(item)
        return item

    def stats(self) -> Dict[str, float]:
        with self._lock:
            s = dict(self._stats)
        b = s["device_batches"]
        s["mean_coalesced"] = round(s["coalesced_windows"] / b, 2) if b else 0.0
        return s

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_STOP)
        self._thread.join(timeout=10)

    # -- worker ------------------------------------------------------

    def _loop(self) -> None:
        while True:
            first = self._queue.get()
            if first is _STOP:
                return
            batch = [first]
            rows = len(first.x)
            deadline = time.monotonic() + self._max_wait
            stop = False
            while rows < self._max_rows:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop = True
                    break
                batch.append(nxt)
                rows += len(nxt.x)
            self._run(batch)
            if stop:
                return

    def _run(self, batch) -> None:
        try:
            if len(batch) == 1:
                x = batch[0].x
            else:
                # Promote to the common numpy type (e.g. f16+f32 -> f32)
                # so no co-traveler is narrowed by whoever happened to
                # arrive first; the predictor casts to its own compute/
                # wire dtype afterwards either way.
                dtype = np.result_type(*[it.x.dtype for it in batch])
                x = np.concatenate(
                    [np.asarray(it.x, dtype) for it in batch]
                )
            out = _as_output_dict(self._pred(x))
            with self._lock:
                self._stats["device_batches"] += 1
                self._stats["coalesced_windows"] += len(x)
                self._stats["max_coalesced"] = max(
                    self._stats["max_coalesced"], len(x)
                )
            off = 0
            for it in batch:
                n = len(it.x)
                it.result = {k: v[off : off + n] for k, v in out.items()}
                it.event.set()
                off += n
        except BaseException as e:  # noqa: BLE001 — relay to every caller
            for it in batch:
                it.error = e
                it.event.set()


class _LatencyRing:
    """Last-N request latencies -> p50/p95 on demand (lock-protected)."""

    def __init__(self, n: int = 2048):
        self._buf = np.zeros(n, np.float64)
        self._i = 0
        self._count = 0
        self._lock = threading.Lock()

    def add(self, seconds: float) -> None:
        with self._lock:
            self._buf[self._i] = seconds
            self._i = (self._i + 1) % len(self._buf)
            self._count += 1

    def quantiles(self) -> Dict[str, Optional[float]]:
        with self._lock:
            n = min(self._count, len(self._buf))
            vals = np.sort(self._buf[:n]) if n else None
        if vals is None:
            return {"p50_ms": None, "p95_ms": None}
        return {
            "p50_ms": round(1e3 * float(vals[int(0.50 * (n - 1))]), 3),
            "p95_ms": round(1e3 * float(vals[int(0.95 * (n - 1))]), 3),
        }


class ServingServer(ThreadingHTTPServer):
    """ThreadingHTTPServer wired to a predictor through a MicroBatcher."""

    daemon_threads = True

    def __init__(self, address, predictor, max_wait_ms: float = 2.0,
                 max_request_mb: float = 256.0, waveform_frontend=None):
        self.predictor = predictor
        # serve.WaveformFrontend (or None): enables POST /predict_waveform
        # with raw (T,)/(C, T) sample payloads windowed on device. A
        # frontend built with fuse=False routes the model pass through
        # the shared MicroBatcher (waveform and window clients coalesce
        # into the same device batches); a fused frontend serves waveform
        # requests through its single-program STFT+model path instead
        # (lower latency, no cross-client coalescing)
        self.waveform_frontend = waveform_frontend
        # fused waveform requests bypass the MicroBatcher, so its
        # counters never see them; count them here for /stats
        self.fused_waveform_requests = 0
        self._fused_count_lock = threading.Lock()
        self.latency = _LatencyRing()
        self.max_request_bytes = int(max_request_mb * (1 << 20))
        self.started = time.time()
        # bind the socket BEFORE spawning the batcher worker: a bind
        # failure (port in use) must not leak a live thread pinning the
        # predictor's compiled executables
        super().__init__(address, _Handler)
        try:
            self.batcher = MicroBatcher(predictor, max_wait_ms=max_wait_ms)
        except Exception:
            self.server_close()
            raise

    def metadata(self) -> Dict:
        p = self.predictor
        meta = {
            "status": "ok",
            "model": type(p).__name__,
            "input_hw": list(getattr(p, "input_hw", ())),
            "max_batch": getattr(p, "max_batch", None),
            "buckets": list(getattr(p, "sizes", ())),
            "outputs": ["q", "labels", "z"]
            if hasattr(p, "model") and hasattr(p.model, "n_clusters")
            else ["z"],
        }
        n_clusters = getattr(getattr(p, "model", None), "n_clusters", None)
        if n_clusters is not None:
            meta["n_clusters"] = int(n_clusters)
        wf = self.waveform_frontend
        if wf is not None:
            meta["waveform"] = {
                "nperseg": wf.nperseg, "hop": wf.hop,
                "window_rows": wf.window_rows,
                # which route serves /predict_waveform: fused STFT+model
                # (--fuse-waveform) or two-pass through the MicroBatcher
                "fused": wf.fused,
            }
        return meta

    def server_close(self) -> None:
        # getattr: reachable from __init__'s except path BEFORE
        # self.batcher exists — an AttributeError here would mask the
        # original failure and leak the bound socket
        batcher = getattr(self, "batcher", None)
        if batcher is not None:
            batcher.close()
        super().server_close()


class _Handler(BaseHTTPRequestHandler):
    server_version = "scc-serve/0.1"
    protocol_version = "HTTP/1.1"

    # quiet by default: per-request stderr lines are not useful at
    # serving rates, and /stats carries the aggregate picture
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj) -> None:
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self) -> None:  # noqa: N802 — http.server API
        path = urlparse(self.path).path
        if path == "/healthz":
            self._send_json(200, self.server.metadata())
        elif path == "/stats":
            stats = self.server.batcher.stats()
            stats.update(self.server.latency.quantiles())
            stats["uptime_s"] = round(time.time() - self.server.started, 1)
            if self.server.waveform_frontend is not None:
                # batcher counters exclude fused-route traffic
                stats["fused_waveform_requests"] = (
                    self.server.fused_waveform_requests
                )
            self._send_json(200, stats)
        else:
            self._send_json(404, {"error": f"unknown path {path!r}"})

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        url = urlparse(self.path)
        if url.path not in ("/predict", "/predict_waveform"):
            self.close_connection = True  # body left unread
            self._send_json(404, {"error": f"unknown path {url.path!r}"})
            return
        is_waveform = url.path == "/predict_waveform"
        if is_waveform and self.server.waveform_frontend is None:
            self.close_connection = True  # body left unread
            self._send_json(404, {
                "error": "waveform serving is not enabled; start the "
                "server with a WaveformFrontend (scc-serve --waveform)",
            })
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            length = -1
        if length <= 0:
            # body length unknown/unread: the keep-alive connection would
            # misparse the leftover bytes as the next request line
            self.close_connection = True
            self._send_json(400, {"error": "missing/invalid Content-Length"})
            return
        if length > self.server.max_request_bytes:
            # replying without draining `length` bytes corrupts the
            # persistent connection — close it instead of reading them
            self.close_connection = True
            self._send_json(413, {
                "error": f"request of {length} bytes exceeds the "
                f"{self.server.max_request_bytes}-byte limit; chunk the "
                "payload client-side",
            })
            return
        body = self.rfile.read(length)
        try:
            x = np.load(io.BytesIO(body), allow_pickle=False)
        except Exception as e:  # noqa: BLE001 — malformed wire data
            self._send_json(400, {"error": f"body is not .npy bytes: {e}"})
            return
        if not isinstance(x, np.ndarray):
            # e.g. a .npz body (the RESPONSE format) loads as NpzFile
            self._send_json(400, {
                "error": "body must be a single .npy array "
                f"(got {type(x).__name__}; note the response is .npz, "
                "the request is .npy)",
            })
            return
        if is_waveform:
            err = self._waveform_shape_error(x)
        else:
            err = self._shape_error(x)
        if err:
            self._send_json(400, {"error": err})
            return
        if not is_waveform and x.ndim == 3:
            x = x[..., None]

        fields = None
        q = parse_qs(url.query).get("fields")
        if q:
            fields = [f for part in q for f in part.split(",") if f]
            # reject typo'd field names BEFORE paying the device pass —
            # the valid set is statically known from the predictor
            available = self.server.metadata()["outputs"]
            unknown = [f for f in fields if f not in available]
            if unknown:
                self._send_json(400, {
                    "error": f"unknown fields {unknown}; "
                    f"available: {sorted(available)}",
                })
                return

        t0 = time.monotonic()
        extra = {}
        if is_waveform and self.server.waveform_frontend.fused:
            # fused route (scc-serve --fuse-waveform): STFT + normalize +
            # model run as ONE device program per chunk, so raw samples
            # cross host->device once — measured ~2x lower p50 than the
            # two-pass bounce (RESULTS.md). The trade: it bypasses the
            # MicroBatcher, so the model pass cannot coalesce with other
            # clients' windows.
            try:
                out = self.server.waveform_frontend(x)
            except ValueError as e:  # too-short waveform etc.
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — 500, keep serving
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            with self.server._fused_count_lock:
                self.server.fused_waveform_requests += 1
            extra["windows_per_channel"] = out.pop("windows_per_channel")
        else:
            if is_waveform:
                wf = self.server.waveform_frontend
                try:
                    # device STFT in the handler thread; the MODEL pass
                    # below still coalesces with window clients in the
                    # MicroBatcher
                    windows = wf.windows(x)
                except ValueError as e:  # too-short waveform etc.
                    self._send_json(400, {"error": str(e)})
                    return
                except Exception as e:  # noqa: BLE001 — 500, keep serving
                    self._send_json(
                        500, {"error": f"{type(e).__name__}: {e}"}
                    )
                    return
                channels = 1 if x.ndim == 1 else x.shape[0]
                extra["windows_per_channel"] = np.full(
                    channels, wf.n_windows(x.shape[-1]), np.int64
                )
                x = windows
            try:
                out = self.server.batcher(x)
            except Exception as e:  # noqa: BLE001 — 500, keep serving
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
        self.server.latency.add(time.monotonic() - t0)

        if fields:
            out = {k: out[k] for k in fields if k in out}
        out.update(extra)
        buf = io.BytesIO()
        np.savez(buf, **out)
        self._send(200, buf.getvalue(), "application/octet-stream")

    def _waveform_shape_error(self, x: np.ndarray) -> Optional[str]:
        if not np.issubdtype(x.dtype, np.number) or np.issubdtype(
                x.dtype, np.complexfloating):
            return f"waveform must be real-numeric; got dtype {x.dtype}"
        if x.ndim not in (1, 2):
            return (
                f"waveform must have shape (T,) or (channels, T); "
                f"got {x.shape}"
            )
        # validate length HERE so the 400 class is fully decided before
        # the frontend call — the fused route runs jit tracing and the
        # whole model pass, whose internal ValueErrors must surface as
        # 500s, not masquerade as client errors
        wf = self.server.waveform_frontend
        min_t = (wf.window_rows - 1) * wf.hop + wf.nperseg
        if x.shape[-1] < min_t:
            return (
                f"waveform length {x.shape[-1]} yields no complete "
                f"({wf.window_rows}, nfreq) window (needs >= {min_t} "
                f"samples)"
            )
        return None

    def _shape_error(self, x: np.ndarray) -> Optional[str]:
        hw = tuple(getattr(self.server.predictor, "input_hw", ()))
        if not np.issubdtype(x.dtype, np.number) or np.issubdtype(
                x.dtype, np.complexfloating):
            return f"windows must be real-numeric; got dtype {x.dtype}"
        if x.ndim not in (3, 4) or (x.ndim == 4 and x.shape[-1] != 1):
            return (
                f"windows must have shape (n, H, W) or (n, H, W, 1); "
                f"got {x.shape}"
            )
        if hw and tuple(x.shape[1:3]) != hw:
            return (
                f"window geometry {tuple(x.shape[1:3])} does not match the "
                f"served model's input_hw {hw}"
            )
        return None


def make_server(
    predictor,
    host: str = "127.0.0.1",
    port: int = 0,
    max_wait_ms: float = 2.0,
    max_request_mb: float = 256.0,
    waveform_frontend=None,
) -> ServingServer:
    """A ready-to-run ServingServer (port 0 = ephemeral; the bound port is
    `server.server_address[1]`). Call `serve_forever()` (blocking) or run
    it on a thread; `server_close()` tears down the batcher too. Passing
    a `serve.WaveformFrontend` enables POST /predict_waveform (raw
    (T,)/(channels, T) sample payloads, windowed on device)."""
    return ServingServer(
        (host, port), predictor, max_wait_ms=max_wait_ms,
        max_request_mb=max_request_mb, waveform_frontend=waveform_frontend,
    )


def main(argv=None) -> int:
    """`scc-serve`: serve a trained checkpoint over HTTP."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="scc-serve",
        description="HTTP serving for trained AEC/DEC checkpoints "
        "(fixed-shape jitted predictors + cross-request micro-batching)",
    )
    ap.add_argument("checkpoint", help="orbax checkpoint dir (e.g. "
                    ".../Run_*/DEC_Params_Final)")
    ap.add_argument("--model", choices=["DEC", "AEC"], default="DEC",
                    help="DEC: q/labels/z; AEC: encoder latents only")
    ap.add_argument("--n-clusters", type=int, default=None,
                    help="required for --model DEC")
    ap.add_argument("--arch", default="AEC", choices=["AEC", "packed"])
    ap.add_argument("--attention-faithful",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="must match the checkpoint's training config "
                    "(it changes the encoder head width)")
    ap.add_argument("--input-hw", type=int, nargs=2, default=(4, 101),
                    metavar=("H", "W"))
    ap.add_argument("--transform", default="sample_norm_cent")
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument("--buckets",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="compile a power-of-two bucket ladder so small "
                    "(or small-coalesced) requests run a small compiled "
                    "shape instead of padding to --max-batch over the "
                    "wire (a 64-window request against max_batch=4096 "
                    "would otherwise ship 6.6 MB of zeros; RESULTS.md). "
                    "--no-buckets compiles only the full shape")
    ap.add_argument("--transfer-dtype", default=None,
                    choices=["bfloat16", "float16", "int8"],
                    help="host->device wire encoding: half-width floats "
                         "or per-sample symmetric int8 (quarter bytes; "
                         "core.precision.quantize_wire)")
    ap.add_argument("--max-wait-ms", type=float, default=2.0,
                    help="micro-batching window (0 disables coalescing)")
    ap.add_argument("--max-request-mb", type=float, default=256.0,
                    help="reject request bodies above this size (413); "
                    "clients should chunk windows instead")
    ap.add_argument("--mesh", action="store_true",
                    help="serve data-parallel over ALL local devices "
                    "(params replicate, request batches shard)")
    ap.add_argument("--waveform", action="store_true",
                    help="also accept raw-sample payloads on "
                    "/predict_waveform (windowed on device; geometry from "
                    "--nperseg/--hop and --input-hw's window_rows)")
    ap.add_argument("--fuse-waveform",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="serve /predict_waveform through the fused "
                    "STFT+model program (one host->device crossing; "
                    "measured ~2x lower p50 AND ~8x higher throughput "
                    "under 8 concurrent clients through a remote "
                    "attachment — RESULTS.md). --no-fuse-waveform "
                    "restores the two-pass route, whose model pass "
                    "coalesces with window clients in the MicroBatcher; "
                    "mesh predictors always use two-pass")
    ap.add_argument("--nperseg", type=int, default=200,
                    help="waveform-mode STFT segment length")
    ap.add_argument("--hop", type=int, default=100,
                    help="waveform-mode STFT hop")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8477)
    args = ap.parse_args(argv)

    from spectrogram_cube_clustering_tpu import serve as _serve

    mesh = None
    if args.mesh:
        from spectrogram_cube_clustering_tpu.core.mesh import (
            make_data_mesh, pad_to_multiple,
        )

        mesh = make_data_mesh()
        rounded = pad_to_multiple(args.max_batch, mesh.size)
        if rounded != args.max_batch:
            # compiled batch shapes must divide over the mesh; round up
            # rather than crash at predictor construction
            print(f"scc-serve: --max-batch {args.max_batch} rounded up "
                  f"to {rounded} ({mesh.size} mesh devices)")
            args.max_batch = rounded

    if args.model == "DEC":
        if args.n_clusters is None:
            ap.error("--model DEC requires --n-clusters")
        predictor = _serve.DECPredictor.from_checkpoint(
            args.checkpoint, n_clusters=args.n_clusters,
            max_batch=args.max_batch, transform=args.transform,
            buckets=args.buckets or None, arch=args.arch,
            input_hw=tuple(args.input_hw),
            transfer_dtype=args.transfer_dtype, mesh=mesh,
            attention_faithful=args.attention_faithful,
        )
    else:
        predictor = _serve.AECEncoder.from_checkpoint(
            args.checkpoint, max_batch=args.max_batch,
            transform=args.transform, buckets=args.buckets or None,
            input_hw=tuple(args.input_hw),
            transfer_dtype=args.transfer_dtype, mesh=mesh,
            arch=args.arch,
            attention_faithful=args.attention_faithful,
        )
    frontend = None
    if args.waveform:
        # fused by default: one STFT+model program per chunk, one
        # host->device crossing per request — measured faster than the
        # two-pass route both solo and under concurrent clients
        # (RESULTS.md "fused vs two-pass over HTTP"). fuse=None lets the
        # frontend auto-disable it for mesh predictors (which cannot
        # fuse); --no-fuse-waveform forces the two-pass route, whose
        # model pass coalesces with window clients in the MicroBatcher.
        frontend = _serve.WaveformFrontend(
            predictor, nperseg=args.nperseg, hop=args.hop,
            window_rows=int(args.input_hw[0]),
            fuse=None if args.fuse_waveform else False,
        )
        if args.fuse_waveform and not frontend.fused:
            print("scc-serve: mesh predictors serve waveforms through "
                  "the two-pass route by default (the SPMD-fused "
                  "composition is available via "
                  "serve.WaveformFrontend(pred, fuse=True))")
    if frontend is not None:
        frontend.warmup()  # covers the predictor's buckets too
    elif hasattr(predictor, "warmup"):
        predictor.warmup()  # pay every bucket's compile before traffic

    server = make_server(
        predictor, host=args.host, port=args.port,
        max_wait_ms=args.max_wait_ms, max_request_mb=args.max_request_mb,
        waveform_frontend=frontend,
    )
    host, port = server.server_address[:2]
    mesh_note = f", mesh x{mesh.size}" if mesh is not None else ""
    print(f"scc-serve: {args.model} on http://{host}:{port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms"
          f"{mesh_note})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
