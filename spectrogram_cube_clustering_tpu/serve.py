"""Serving: low-latency online inference over trained models.

The reference has no serving story — inference is the batch `predict`
workflow writing `.npy` artifacts (production.py:65-106). For production
deployment this module wraps trained params in a fixed-shape jitted
predictor: requests of any size run through compiled fixed shapes — small
requests pad to the smallest bucket (`buckets=True` compiles a
power-of-two ladder), oversized requests chunk through max_batch — so no
shape ever recompiles at request time and tail latency stays stable. All
three outputs (soft assignments, labels, latents) come from one device
pass per chunk. Passing a `jax.sharding.Mesh` (`mesh=`) serves each
request data-parallel across the mesh's chips: params replicate, the
batch axis shards, and bucket sizes round up so every chip gets an equal
slice.

    predictor = serve.DECPredictor.from_checkpoint(path, n_clusters=5)
    out = predictor(windows)            # dict with q, labels, z
    z = serve.AECEncoder.from_checkpoint(path)(windows)
    big = serve.DECPredictor.from_checkpoint(
        path, n_clusters=5, mesh=core.make_data_mesh())   # all chips
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_cube_clustering_tpu import models as _models
from spectrogram_cube_clustering_tpu.core.precision import (
    dequant_wire as _dequant_wire,
    quantize_wire as _quantize_wire,
    wire_array as _wire_array,
)
from spectrogram_cube_clustering_tpu.ops.normalize import make_normalizer


def _host_transfer_dtype(transfer_dtype: Optional[str]):
    """Numpy dtype requests are re-encoded to before the host->device
    copy (shared policy: core.precision.wire_dtype — the streaming
    loader offers the same knob). Serving is transfer-bound on
    bandwidth-limited links (measured: the sustained 4096-window rate
    here tracks the wire, RESULTS.md "Serving latency"); half-width
    (bfloat16/float16) transfer doubles it and the int8 wire
    (per-sample symmetric quantization, core.precision.quantize_wire)
    quarters the bytes. The jitted path restores f32 before
    normalization, so the only effect is input quantization — well
    inside the noise floor for per-window-normalized spectrograms."""
    from spectrogram_cube_clustering_tpu.core.precision import wire_dtype

    return wire_dtype(transfer_dtype)


def _pad_to(x: np.ndarray, batch: int) -> tuple:
    n = len(x)
    if n > batch:
        raise ValueError(f"request of {n} windows exceeds max_batch {batch}")
    if n < batch:
        x = np.concatenate(
            [x, np.zeros((batch - n, *x.shape[1:]), x.dtype)], axis=0
        )
    return x, n


def _bucket_ladder(max_batch: int, buckets, multiple: int = 1) -> tuple:
    """Sorted compiled sizes. `buckets=True` -> powers of two up to
    max_batch (small requests run a small compiled shape instead of
    padding to the full batch); a sequence -> explicit sizes. With
    `multiple` > 1 (mesh serving) every size is rounded up to a multiple
    so the batch axis divides evenly over the mesh."""
    if max_batch % multiple:
        raise ValueError(
            f"max_batch {max_batch} must be a multiple of the mesh "
            f"device count {multiple}"
        )
    if buckets is True:
        sizes, b = [], multiple
        while b < max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(max_batch)
        return tuple(sizes)
    if buckets:
        from spectrogram_cube_clustering_tpu.core.mesh import (
            pad_to_multiple,
        )

        sizes = sorted(
            set(pad_to_multiple(int(b), multiple) for b in buckets)
            | {max_batch}
        )
        if sizes[-1] > max_batch:
            # max_batch is the compiled-shape/HBM contract the operator
            # sized for — a larger bucket would silently violate it
            raise ValueError(
                f"bucket {sizes[-1]} exceeds max_batch {max_batch}"
            )
        return tuple(sizes)
    return (max_batch,)


def _mesh_setup(params, mesh, max_batch: int, buckets) -> tuple:
    """Shared mesh plumbing for both predictors: replicate params over
    the mesh (no-op without one) and build the bucket ladder with sizes
    divisible by the mesh device count. Returns (params, sizes)."""
    if mesh is not None:
        from spectrogram_cube_clustering_tpu.core.mesh import (
            replicated_sharding,
        )

        params = jax.device_put(params, replicated_sharding(mesh))
    sizes = _bucket_ladder(
        max_batch, buckets, multiple=mesh.size if mesh is not None else 1
    )
    return params, sizes


def _make_put(mesh):
    """Host wire payload -> device: plain `device_put` single-device, or a
    batch-axis-sharded `device_put` over a mesh (each chip runs its slice
    of the request; XLA SPMD splits the compiled program — serving-side
    data parallelism the reference's single-GPU inference path has no
    analog of, production.py:65-106). Payloads may be int8 wire pytrees
    ({'q','scale'}, both rank-matched so one batch sharding covers both
    leaves)."""
    if mesh is None:
        return jax.device_put
    from spectrogram_cube_clustering_tpu.core.mesh import batch_sharding

    return lambda xb: jax.device_put(
        xb, batch_sharding(mesh, _wire_array(xb).ndim)
    )


def _build_model(
    kind: str, arch: str, input_hw, attention_faithful: bool,
    n_clusters: int = None,
):
    """Arch dispatch shared by __init__ and from_checkpoint of BOTH
    predictor classes — the one place to extend when an arch is added
    (four hand-kept copies drifted before)."""
    hw = (int(input_hw[0]), int(input_hw[1]))
    if arch == "packed":
        if hw != (4, 101):
            raise ValueError(
                "arch='packed' serves only the (4, 101) geometry"
            )
        if kind == "DEC":
            return _models.PackedDEC(n_clusters=n_clusters)
        return _models.PackedAEC()
    if arch != "AEC":
        raise ValueError(f"unknown arch {arch!r} ('AEC' or 'packed')")
    if kind == "DEC":
        return _models.DEC(
            n_clusters=n_clusters, input_hw=hw,
            attention_faithful=attention_faithful,
        )
    return _models.AEC(input_hw=hw, attention_faithful=attention_faithful)


def _run_chunked(fn, params, x: np.ndarray, sizes: tuple, put=jnp.asarray):
    """Run a fixed-shape jitted fn over a request of ANY length: chunks of
    the largest compiled size, the tail through the smallest bucket that
    fits. Returns the list of (outputs, n_valid) per chunk."""
    full = sizes[-1]
    if len(x) == 0:
        # empty request: one all-pad pass through the smallest bucket so
        # callers still get correctly-shaped zero-row outputs
        xb, _ = _pad_to(x, sizes[0])
        return [(fn(params, put(xb)), 0)]
    outs = []
    i = 0
    while i < len(x):
        n = min(full, len(x) - i)
        size = next(s for s in sizes if s >= n)
        xb, _ = _pad_to(x[i : i + n], size)
        outs.append((fn(params, put(xb)), n))
        i += n
    return outs


class DECPredictor:
    """Fixed-shape jitted DEC inference: windows -> (q, labels, z).

    `max_batch` fixes the compiled shape; smaller requests zero-pad (one
    compile at construction, none at request time). `transform` applies
    the training normalizer on device as part of the same jit.
    """

    def __init__(
        self,
        params,
        n_clusters: int,
        max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
        buckets=None,
        arch: str = "AEC",
        input_hw=(4, 101),
        transfer_dtype: Optional[str] = None,
        mesh=None,
        attention_faithful: bool = True,
        _model=None,
    ):
        self.input_hw = (int(input_hw[0]), int(input_hw[1]))
        self._wire_dtype = _host_transfer_dtype(transfer_dtype)
        self.mesh = mesh
        self._put = _make_put(mesh)
        self.model = _model if _model is not None else _build_model(
            "DEC", arch, self.input_hw, attention_faithful, n_clusters
        )
        self.params, self.sizes = _mesh_setup(
            params, mesh, max_batch, buckets
        )
        self.max_batch = max_batch
        normalize = make_normalizer(transform)

        @jax.jit
        def fn(params, x):
            # restores f32 from any wire encoding (incl. the int8
            # {'q','scale'} pytree) BEFORE the on-device normalizer
            x = _dequant_wire(x)
            q, _, z = self.model.apply({"params": params}, normalize(x))
            return q, jnp.argmax(q, axis=1), z

        self._fn = fn

    @classmethod
    def from_checkpoint(
        cls, path: str, n_clusters: int, max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
        buckets=None,
        arch: str = "AEC",
        input_hw=(4, 101),
        transfer_dtype: Optional[str] = None,
        mesh=None,
        attention_faithful: bool = True,
    ) -> "DECPredictor":
        from spectrogram_cube_clustering_tpu.train.checkpoint import (
            check_restored_shapes,
            restore,
        )

        h, w = int(input_hw[0]), int(input_hw[1])
        model = _build_model(
            "DEC", arch, (h, w), attention_faithful, n_clusters
        )
        template = model.init(
            jax.random.key(0), jnp.zeros((1, h, w, 1))
        )["params"]
        params = restore(path, template)
        # orbax restore is shape-lenient: a checkpoint trained with a
        # different arch/input_hw/attention_faithful would otherwise die
        # with an opaque dot_general error at the first request
        check_restored_shapes(params, template, type(model).__name__)
        return cls(
            params, n_clusters, max_batch, transform,
            buckets=buckets, arch=arch, input_hw=(h, w),
            transfer_dtype=transfer_dtype, mesh=mesh,
            attention_faithful=attention_faithful, _model=model,
        )

    def _encode_put(self, xb: np.ndarray):
        """Wire-encode a host chunk (cast or int8-quantize) and transfer."""
        return self._put(_quantize_wire(xb, self._wire_dtype))

    def warmup(self) -> None:
        """Pay every bucket's compile before serving traffic."""
        for size in self.sizes:
            x = np.zeros((size, *self.input_hw, 1), np.float32)
            q, _, _ = self._fn(self.params, self._encode_put(x))
            q.block_until_ready()

    def __call__(self, windows: np.ndarray) -> Dict[str, np.ndarray]:
        """Requests of ANY size: chunks of max_batch, tail through the
        smallest compiled bucket that fits — never a recompile."""
        x = np.asarray(windows, np.float32)
        chunks = _run_chunked(
            self._fn, self.params, x, self.sizes, put=self._encode_put
        )
        return {
            "q": np.concatenate([np.asarray(q[:n]) for (q, _, _), n in chunks]),
            "labels": np.concatenate(
                [np.asarray(l[:n]) for (_, l, _), n in chunks]
            ),
            "z": np.concatenate([np.asarray(z[:n]) for (_, _, z), n in chunks]),
        }


class AECEncoder:
    """Fixed-shape jitted encoder: windows -> latents (M, 9)."""

    def __init__(
        self,
        params,
        max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
        buckets=None,
        input_hw=(4, 101),
        transfer_dtype: Optional[str] = None,
        mesh=None,
        arch: str = "AEC",
        attention_faithful: bool = True,
        _model=None,
    ):
        self.input_hw = (int(input_hw[0]), int(input_hw[1]))
        self._wire_dtype = _host_transfer_dtype(transfer_dtype)
        self.mesh = mesh
        self._put = _make_put(mesh)
        self.model = _model if _model is not None else _build_model(
            "AEC", arch, self.input_hw, attention_faithful
        )
        self.params, self.sizes = _mesh_setup(
            params, mesh, max_batch, buckets
        )
        self.max_batch = max_batch
        normalize = make_normalizer(transform)

        @jax.jit
        def fn(params, x):
            # restores f32 from any wire encoding (incl. the int8
            # {'q','scale'} pytree) BEFORE the on-device normalizer
            return self.model.apply(
                {"params": params}, normalize(_dequant_wire(x)),
                method="encode",
            )

        self._fn = fn

    @classmethod
    def from_checkpoint(
        cls, path: str, max_batch: int = 1024,
        transform: Optional[str] = "sample_norm_cent",
        buckets=None,
        input_hw=(4, 101),
        transfer_dtype: Optional[str] = None,
        mesh=None,
        arch: str = "AEC",
        attention_faithful: bool = True,
    ) -> "AECEncoder":
        from spectrogram_cube_clustering_tpu.train.checkpoint import (
            check_restored_shapes,
            restore,
        )

        h, w = int(input_hw[0]), int(input_hw[1])
        model = _build_model("AEC", arch, (h, w), attention_faithful)
        template = model.init(
            jax.random.key(0), jnp.zeros((1, h, w, 1))
        )["params"]
        params = restore(path, template)
        check_restored_shapes(params, template, type(model).__name__)
        return cls(params, max_batch, transform,
                   buckets=buckets, input_hw=(h, w),
                   transfer_dtype=transfer_dtype, mesh=mesh, arch=arch,
                   attention_faithful=attention_faithful, _model=model)

    def _encode_put(self, xb: np.ndarray):
        """Wire-encode a host chunk (cast or int8-quantize) and transfer."""
        return self._put(_quantize_wire(xb, self._wire_dtype))

    def warmup(self) -> None:
        """Pay every bucket's compile before serving traffic."""
        for size in self.sizes:
            x = np.zeros((size, *self.input_hw, 1), np.float32)
            self._fn(self.params, self._encode_put(x)).block_until_ready()

    def __call__(self, windows: np.ndarray) -> np.ndarray:
        x = np.asarray(windows, np.float32)
        chunks = _run_chunked(
            self._fn, self.params, x, self.sizes, put=self._encode_put
        )
        return np.concatenate([np.asarray(z[:n]) for z, n in chunks])


class WaveformFrontend:
    """Raw waveform -> windows front-stage for a serving predictor.

    A deployed DAS/seismic model receives raw samples, not precomputed
    spectrogram windows; this wraps a `DECPredictor`/`AECEncoder` (or a
    `MicroBatcher` around one) so requests are `(T,)` or `(channels, T)`
    waveforms. Windows are computed ON DEVICE (the fused Pallas kernel on
    TPU backends, `signal.stft.spectrogram_windows`) in fixed-size
    chunks drawn from a compiled LADDER (/8 steps from `chunk_samples`
    down to one window span, all paid by `warmup()`): each request runs
    through the smallest rung that covers it, so short requests don't
    ship a zero-padded full chunk over the wire — chunk c covers samples
    [c*chunk, c*chunk + chunk + nperseg - hop) (the hop-overlap halo, so
    no frame straddles a chunk), the zero-padded tail's surplus windows
    are sliced off, and the resulting window stack feeds the predictor's
    own bucket ladder.
    Normalization stays inside the predictor's jit, identical to
    window-payload requests.

    Calls on a bare single-device predictor take the FUSED path
    (`fuse=None` auto): STFT + normalize + model compiled as one program
    per chunk, so raw samples cross host->device once and windows never
    leave the device — measured faster than two-pass both solo and
    under concurrent HTTP clients (RESULTS.md). On a MESH predictor an
    explicit `fuse=True` builds the SPMD composition instead: the raw
    chunk shards along time (halo STFT via ppermute), the resulting
    windows reshard along batch for the data-parallel model pass, all
    in one program. `fuse=None` keeps mesh predictors on the two-pass
    path (`windows()` + predictor) — also what `fuse=False` deployments
    (scc-serve --no-fuse-waveform) use so the MicroBatcher can coalesce
    waveform model passes with window clients' batches.
    """

    def __init__(
        self,
        predictor,
        nperseg: int = 200,
        hop: int = 100,
        window_rows: int = 4,
        chunk_samples: int = 1 << 20,
        input_hw=None,
        fuse: Optional[bool] = None,
    ):
        if nperseg % hop or nperseg < hop:
            # the window span below assumes the frame grid tiles chunks
            raise ValueError(
                f"waveform serving requires nperseg % hop == 0 "
                f"(got {nperseg}/{hop})"
            )
        self.predictor = predictor
        self.nperseg, self.hop = int(nperseg), int(hop)
        self.window_rows = int(window_rows)
        span = self.window_rows * self.hop
        self._span = span
        self.chunk = max(_round_up_int(int(chunk_samples), span), span)
        self._seg_len = self.chunk + self.nperseg - self.hop
        self._win_per_chunk = self.chunk // span
        nfreq = self.nperseg // 2 + 1
        hw = tuple(input_hw) if input_hw is not None else tuple(
            getattr(predictor, "input_hw", (self.window_rows, nfreq))
        )
        if hw != (self.window_rows, nfreq):
            raise ValueError(
                f"STFT geometry produces ({self.window_rows}, {nfreq}) "
                f"windows but the served model expects input_hw {hw}"
            )

        from spectrogram_cube_clustering_tpu.signal.stft import (
            spectrogram_windows,
        )

        self._window_fn = lambda seg: spectrogram_windows(
            seg, nperseg=self.nperseg, hop=self.hop,
            window_rows=self.window_rows, transform=None,
        )

        # Fused direct path: STFT + normalize + model in ONE jitted
        # program per chunk — raw samples cross host->device once and the
        # windows never leave the device (the two-pass `windows()` +
        # predictor path round-trips them D2H then H2D, which through a
        # remote attachment costs a full extra request's worth of wire).
        # Auto-on for bare single-device predictors; mesh predictors and
        # MicroBatcher wrappers (no ._fn) keep the two-pass path, whose
        # host windows are what the batcher coalesces across clients.
        if fuse is None:
            fuse = (
                hasattr(predictor, "_fn")
                and hasattr(predictor, "params")
                and getattr(predictor, "mesh", None) is None
            )
        self.fused = bool(fuse)
        cap = getattr(predictor, "max_batch", None)
        if self.fused and cap is not None and self._win_per_chunk > cap:
            # the fused route feeds each chunk's windows through
            # predictor._fn in ONE pass, so the chunk ladder must respect
            # the predictor's compiled-shape/HBM contract (max_batch) —
            # which the window path enforces loudly (_pad_to raises).
            # Default chunk_samples (1<<20, span 400) is ~2621 windows vs
            # the default max_batch 1024: cap the top rung and let
            # multi-chunk iteration cover longer waveforms.
            self._win_per_chunk = int(cap)
            self.chunk = self._win_per_chunk * span
            self._seg_len = self.chunk + self.nperseg - self.hop
        # Chunk ladder: a request smaller than the full chunk would still
        # ship the whole zero-padded chunk over the wire (a 19-window
        # request under the default 2^20 chunk pays a ~4 MB transfer for
        # 160 kB of samples — measured 2x the p50 of a 999-window request
        # through the tunnel, RESULTS.md). Like the predictor's window
        # buckets, compile a few chunk sizes (/8 steps down to one window
        # span) and run each request through the smallest rung that
        # covers it; multi-chunk requests keep the full rung.
        rungs = {self._win_per_chunk}
        rw = self._win_per_chunk
        while rw > 1:
            rw = max(1, rw // 8)
            rungs.add(rw)
        self._rung_wins = sorted(rungs)  # window counts, ascending
        if self.fused:
            # honor the predictor's transfer_dtype on the fused wire too:
            # raw samples carry the same bytes as the window stack they
            # become (window_rows*hop samples ~ window_rows*nfreq values),
            # so the half-width cast halves — and the int8 wire (one
            # symmetric scale per rank-1 segment) quarters — fused
            # request bytes exactly like window payloads; f32 is
            # restored on device before the STFT
            self._fused_wire = getattr(predictor, "_wire_dtype", None)
            if getattr(predictor, "mesh", None) is not None:
                # explicit fuse=True on a mesh predictor: SPMD end-to-end
                # — halo-sharded STFT (time axis over the mesh) feeding
                # the batch-sharded model pass in ONE program; XLA
                # inserts the frame->window resharding collective
                self._fused_fn = self._build_mesh_fused(predictor)
            else:
                self._fused_fn = jax.jit(
                    lambda params, seg: predictor._fn(
                        params, self._window_fn(_dequant_wire(seg))
                    )
                )

    def _build_mesh_fused(self, predictor):
        """One jitted SPMD program per chunk rung: raw samples sharded
        along TIME across the mesh (hop-overlap halo via ppermute, the
        per-device spectrogram through the Pallas kernel where eligible),
        frames regrouped into windows and resharded along BATCH for the
        predictor's data-parallel model pass — samples cross host->device
        once and windows never leave the devices."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spectrogram_cube_clustering_tpu.core.mesh import DATA_AXIS
        from spectrogram_cube_clustering_tpu.parallel.halo import (
            _mapped_local_spec,
        )
        from spectrogram_cube_clustering_tpu.signal.stft import (
            pallas_eligible,
        )

        mesh = predictor.mesh
        n_dev = mesh.devices.size
        platform = next(iter(mesh.devices.flat)).platform
        mapped = _mapped_local_spec(
            mesh, nperseg=self.nperseg, hop=self.hop, log=True, eps=1e-12,
            use_pallas=pallas_eligible(
                self.nperseg, self.hop, platform=platform
            ),
            batch_dims=0,
        )
        nfreq = self.nperseg // 2 + 1
        # the time axis shards in hop-aligned equal pieces, each at least
        # one halo long (halo_exchange_1d reaches one right neighbor)
        quantum = n_dev * self.hop
        min_t = n_dev * max(self.nperseg - self.hop, self.hop)

        def fused(params, seg):
            seg = _dequant_wire(seg)
            t = seg.shape[0]  # static per rung
            t_pad = max(_round_up_int(t, quantum), min_t)
            x = jnp.pad(seg, (0, t_pad - t))
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(DATA_AXIS))
            )
            spec = mapped(x)  # (t_pad // hop, nfreq), time-sharded
            n_win = self.n_windows(t)
            w = spec[: n_win * self.window_rows].reshape(
                n_win, self.window_rows, nfreq
            )[..., None]
            w = jax.lax.with_sharding_constraint(
                w, NamedSharding(mesh, P(DATA_AXIS))
            )
            return predictor._fn(params, w)

        return jax.jit(fused)

    def warmup(self) -> None:
        """Pay every chunk rung's STFT compile (and, on the fused path,
        the fused programs; plus the predictor's buckets)."""
        for w in self._rung_wins:
            seg = np.zeros(self._rung_seg_len(w), np.float32)
            np.asarray(self._window_fn(seg))
            if self.fused:
                # the wire payload may be an int8 {'q','scale'} pytree;
                # jit device-puts the numpy leaves itself
                jax.block_until_ready(
                    self._fused_fn(self.predictor.params, self._cast_wire(seg))
                )
        if hasattr(self.predictor, "warmup"):
            self.predictor.warmup()

    def _cast_wire(self, seg: np.ndarray):
        """Fused-route host-side wire encode (predictor transfer_dtype):
        plain cast for float wires, {'q','scale'} with one symmetric
        scale per segment for the int8 wire."""
        return _quantize_wire(seg, self._fused_wire)

    def _rung_seg_len(self, rung_wins: int) -> int:
        return rung_wins * self._span + self.nperseg - self.hop

    def _pick_rung(self, n_win: int) -> int:
        """Smallest ladder rung (window count) covering the request; the
        full chunk for anything larger (multi-chunk requests)."""
        for w in self._rung_wins:
            if w >= n_win:
                return w
        return self._rung_wins[-1]

    def n_windows(self, t: int) -> int:
        """Windows one channel of length-t samples yields."""
        n_frames = (t - self.nperseg) // self.hop + 1
        return max(n_frames, 0) // self.window_rows

    def windows(self, wave: np.ndarray) -> np.ndarray:
        """(T,) | (C, T) -> (total_windows, window_rows, nfreq, 1) f32,
        channel-major like `spectrogram_windows` and the streaming tier."""
        w = np.asarray(wave, np.float32)
        if w.ndim == 1:
            w = w[None]
        if w.ndim != 2:
            raise ValueError(
                f"waveform must be (T,) or (channels, T); got {wave.shape}"
            )
        n_win = self.n_windows(w.shape[1])
        if n_win < 1:
            raise ValueError(
                f"waveform length {w.shape[1]} yields no complete "
                f"({self.window_rows}, nfreq) window (needs >= "
                f"{(self.window_rows - 1) * self.hop + self.nperseg} samples)"
            )
        # dispatch every chunk before fetching any: jax dispatch is
        # async, so chunk c+1 computes while chunk c's windows cross
        # device->host (a per-chunk asarray would serialize the two)
        staged = [
            (self._window_fn(seg), n)
            for seg, n in self._iter_segments(w, n_win)
        ]
        return np.concatenate(
            [np.asarray(g)[:n] for g, n in staged], axis=0
        )

    def _iter_segments(self, w: np.ndarray, n_win: int):
        """(channel-major) fixed-length zero-padded chunk segments plus
        the count of REAL windows each carries. The segment length is the
        smallest compiled ladder rung covering the request."""
        rung = self._pick_rung(n_win)
        chunk, seg_len = rung * self._span, self._rung_seg_len(rung)
        for ch in range(w.shape[0]):
            remaining = n_win
            for c in range(-(-n_win // rung)):
                seg = w[ch, c * chunk : c * chunk + seg_len]
                if seg.shape[0] < seg_len:
                    seg = np.pad(seg, (0, seg_len - seg.shape[0]))
                yield seg, min(remaining, rung)
                remaining -= rung

    def __call__(self, wave: np.ndarray) -> Dict[str, np.ndarray]:
        """Predictor outputs over the waveform's windows, plus
        `windows_per_channel` so clients map labels back to time/channel
        (window i of channel c starts at sample i*window_rows*hop)."""
        w = np.asarray(wave, np.float32)
        if w.ndim not in (1, 2):
            raise ValueError(
                f"waveform must be (T,) or (channels, T); got {wave.shape}"
            )
        channels = 1 if w.ndim == 1 else w.shape[0]
        if self.fused:
            w2 = w[None] if w.ndim == 1 else w
            n_win = self.n_windows(w2.shape[1])
            if n_win < 1:
                raise ValueError(
                    f"waveform length {w2.shape[1]} yields no complete "
                    f"({self.window_rows}, nfreq) window (needs >= "
                    f"{(self.window_rows - 1) * self.hop + self.nperseg} "
                    f"samples)"
                )
            params = self.predictor.params
            chunks = [
                (self._fused_fn(params, self._cast_wire(seg)), n)
                for seg, n in self._iter_segments(w2, n_win)
            ]
            first = chunks[0][0]
            if isinstance(first, tuple):  # DEC: (q, labels, z)
                out = {
                    k: np.concatenate(
                        [np.asarray(o[i][:n]) for o, n in chunks]
                    )
                    for i, k in enumerate(("q", "labels", "z"))
                }
            else:  # AEC encoder: latents only
                out = {"z": np.concatenate(
                    [np.asarray(o[:n]) for o, n in chunks]
                )}
        else:
            out = self.predictor(self.windows(w))
            if not isinstance(out, dict):
                out = {"z": out}  # AECEncoder returns the latent array
        out["windows_per_channel"] = np.full(
            channels, self.n_windows(w.shape[-1]), np.int64
        )
        return out


def _round_up_int(x: int, m: int) -> int:
    return -(-x // m) * m
