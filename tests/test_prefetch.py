"""Prefetch loader tests: ordering, batching, padding, profiling timer."""

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu.data import (
    CubeSpec,
    PrefetchLoader,
    ZarrCubeDataset,
    make_synthetic_cube,
    zarr_prefetch_loader,
)
from spectrogram_cube_clustering_tpu.utils import profiling


def _item_fn(i):
    # item i yields 3 windows tagged with its index
    return np.full((3, 2, 4, 1), float(i), np.float32)


class TestPrefetchLoader:
    def test_order_and_batching(self):
        loader = PrefetchLoader(_item_fn, n_items=5, batch_size=4, num_workers=3)
        batches = list(loader)
        # 15 windows -> 3 full batches of 4 + 1 padded batch
        assert len(batches) == 4
        flat = np.concatenate([np.asarray(b[0]) for b in batches], axis=0)
        want = np.repeat(np.arange(5, dtype=np.float32), 3)
        np.testing.assert_array_equal(flat[:15, 0, 0, 0], want)
        # last batch: 3 valid + 1 zero pad
        assert batches[-1][1] == 3
        np.testing.assert_array_equal(np.asarray(batches[-1][0])[3], 0.0)
        for b in batches[:-1]:
            assert b[1] == 4

    def test_custom_indices(self):
        loader = PrefetchLoader(
            _item_fn, n_items=5, batch_size=3, num_workers=2, indices=[4, 1]
        )
        batches = list(loader)
        flat = np.concatenate([np.asarray(b[0]) for b in batches], axis=0)
        np.testing.assert_array_equal(
            flat[:6, 0, 0, 0], [4, 4, 4, 1, 1, 1]
        )

    def test_multiple_epochs(self):
        loader = PrefetchLoader(_item_fn, n_items=2, batch_size=6, num_workers=2)
        first = [np.asarray(b[0]) for b in loader]
        second = [np.asarray(b[0]) for b in loader]
        assert len(first) == len(second) == 1
        np.testing.assert_array_equal(first[0], second[0])

    def test_item_error_surfaces_instead_of_hanging(self):
        """A failing item_fn used to kill the reader thread silently and
        leave the consumer blocked on the queue forever (review r2)."""
        def bad_item(i):
            if i == 3:
                raise IOError("corrupt chunk")
            return _item_fn(i)

        loader = PrefetchLoader(bad_item, n_items=5, batch_size=4,
                                num_workers=2)
        with pytest.raises(RuntimeError, match="prefetch reader failed"):
            list(loader)

    def test_over_zarr_cube(self, tmp_path):
        spec = CubeSpec(chunk_size=16, window_rows=4, channel_start=1,
                        channel_stride=2)
        path = str(tmp_path / "cube")
        make_synthetic_cube(
            path, n_time=16 * 11, n_channels=5, n_freq=31,
            n_classes=2, chunk_rows=16, seed=0, spec=spec,
        )
        ds = ZarrCubeDataset(path, spec=spec)
        loader = zarr_prefetch_loader(ds, batch_size=8, num_workers=2)
        batches = list(loader)
        total_windows = sum(b[1] for b in batches)
        assert total_windows == ds.n_windows
        flat = np.concatenate([np.asarray(b[0]) for b in batches], axis=0)
        np.testing.assert_allclose(flat[:4], ds.item(0), rtol=1e-6)


class TestProfiling:
    def test_step_timer(self):
        timer = profiling.StepTimer(warmup=1)
        for _ in range(5):
            with timer:
                pass
        stats = timer.stats(items_per_step=100)
        assert stats["steps"] == 4  # warmup skipped
        assert stats["items_per_sec"] > 0
        assert stats["p95_s"] >= stats["p50_s"]

    def test_annotate_runs(self):
        with profiling.annotate("test-span"):
            pass

    def test_p95_nearest_rank(self):
        """Nearest-rank p95 over 20 samples is the 19th value, not the
        max (review r3: int(0.95*n) overshot by one rank)."""
        timer = profiling.StepTimer(warmup=0)
        timer.times = [float(i) for i in range(1, 21)]  # 1..20
        stats = timer.stats()
        assert stats["p95_s"] == 19.0
        timer.times = [float(i) for i in range(1, 101)]
        assert timer.stats()["p95_s"] == 95.0


class TestStreamingTraining:
    def test_train_aec_stream_matches_loss_decrease(self, rng):
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc

        x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=1)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

        def make_loader():
            return scc.data.PrefetchLoader(
                lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
                num_workers=2,
            )

        model = scc.models.AEC()
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
        )
        out = scc.train.train_aec_stream(
            model, state, make_loader,
            scc.train.AECConfig(n_epochs=5, early_stopping=False),
        )
        hist = out["history"]["train"]
        assert hist[-1] < hist[0]
        assert len(hist) == 5

    def test_train_dec_stream_matches_scan_path(self, rng):
        """Streaming DEC reaches the same clustering as the device-resident
        scan path on the same data."""
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc
        from sklearn.metrics import normalized_mutual_info_score as nmi

        x, y = scc.data.synthetic_windows(192, n_classes=3, seed=4)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.DEC(n_clusters=3)
        cfg = scc.train.DECConfig(
            n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
            kmeans_n_init=4, kmeans_max_iter=50,
        )

        def fresh_state():
            return scc.train.create_train_state(
                model, jax.random.key(7), jnp.asarray(x[:2]), lr=5e-4
            )

        data = scc.train.make_batched_data(x, batch_size=64)
        scan_out = scc.train.train_dec(model, fresh_state(), data, cfg)

        def make_loader():
            return scc.data.PrefetchLoader(
                lambda i: x[i * 16 : (i + 1) * 16], n_items=12,
                batch_size=64, num_workers=2,
            )

        stream_out = scc.train.train_dec_stream(
            model, fresh_state(), make_loader, len(x), cfg
        )
        assert stream_out["labels"].shape == (len(x),)
        # encoder is untrained here, so absolute clustering quality is
        # meaningless — the contract is that both paths agree
        assert nmi(scan_out["labels"], stream_out["labels"]) > 0.95
        assert len(stream_out["history"]["total"]) > 0


def test_abandoned_iteration_does_not_wedge_reader():
    """Breaking out of iteration early must release the reader thread."""
    import threading
    import time

    # track thread IDENTITIES, not active_count(): an unrelated daemon
    # exiting during the wait would mask exactly one wedged reader
    # (review r3 — count-delta oracles can both false-pass and flake)
    before = set(threading.enumerate())
    loader = PrefetchLoader(_item_fn, n_items=50, batch_size=3,
                            num_workers=2, queue_depth=2)
    for i, _ in enumerate(loader):
        if i == 1:
            break

    def new_threads():
        return [t for t in threading.enumerate()
                if t not in before and t.is_alive()]

    deadline = time.time() + 10
    while new_threads() and time.time() < deadline:
        time.sleep(0.05)
    assert not new_threads(), f"leftover threads: {new_threads()}"


class TestTransferDtype:
    """Half-width wire casts (PrefetchLoader transfer_dtype): loader
    yields bf16 device batches; jitted stream steps restore f32 and the
    training outcome stays within quantization distance of the f32 run."""

    def test_loader_yields_wire_dtype(self):
        import jax.numpy as jnp

        loader = PrefetchLoader(
            _item_fn, n_items=5, batch_size=4, num_workers=2,
            transfer_dtype="bfloat16",
        )
        batches = list(loader)
        assert all(b[0].dtype == jnp.bfloat16 for b in batches)
        flat = np.concatenate(
            [np.asarray(b[0], np.float32) for b in batches], axis=0
        )
        want = np.repeat(np.arange(5, dtype=np.float32), 3)
        # integer-valued items survive bf16 exactly
        np.testing.assert_array_equal(flat[:15, 0, 0, 0], want)

    def test_unknown_transfer_dtype_rejected(self):
        with pytest.raises(ValueError, match="transfer_dtype"):
            PrefetchLoader(
                _item_fn, n_items=2, batch_size=4, transfer_dtype="int4"
            )

    def test_int8_wire_roundtrip_error_bound(self):
        """quantize_wire/dequant_wire: per-sample symmetric int8 — the
        roundtrip error is bounded by half a quantization step of each
        sample's own absmax (scale = absmax/127)."""
        import jax
        import jax.numpy as jnp
        from spectrogram_cube_clustering_tpu.core.precision import (
            dequant_wire, quantize_wire,
        )

        rng = np.random.default_rng(0)
        # wildly different per-sample amplitudes: a per-BATCH scale would
        # crush the small samples to zero; per-sample must not
        x = rng.normal(size=(8, 4, 101, 1)).astype(np.float32)
        x *= (10.0 ** rng.integers(-3, 4, size=(8, 1, 1, 1)))
        enc = quantize_wire(x, np.dtype(np.int8))
        assert enc["q"].dtype == np.int8
        assert enc["scale"].shape == (8, 1, 1, 1)
        back = np.asarray(dequant_wire(jax.tree.map(jnp.asarray, enc)))
        absmax = np.max(np.abs(x), axis=(1, 2, 3), keepdims=True)
        bound = np.broadcast_to(0.5 * absmax / 127.0 + 1e-12, x.shape)
        np.testing.assert_array_less(np.abs(back - x), bound)
        # full-width passthrough
        np.testing.assert_array_equal(
            np.asarray(dequant_wire(jnp.asarray(x))), x
        )

    def test_loader_yields_int8_wire_format(self):
        loader = PrefetchLoader(
            _item_fn, n_items=5, batch_size=4, num_workers=2,
            transfer_dtype="int8",
        )
        batches = list(loader)
        for b, _ in batches:
            assert set(b) == {"q", "scale"}
            assert b["q"].dtype == np.int8
            assert b["scale"].shape == (4, 1, 1, 1)

    def test_aec_stream_int8_wire_matches_f32(self, rng):
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc

        x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=1)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

        def make_loader(wire=None):
            return lambda: scc.data.PrefetchLoader(
                lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
                num_workers=2, transfer_dtype=wire,
            )

        model = scc.models.AEC()

        def run(wire):
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            return scc.train.train_aec_stream(
                model, state, make_loader(wire),
                scc.train.AECConfig(n_epochs=3, early_stopping=False),
            )["history"]["train"]

        h32 = run(None)
        h8 = run("int8")
        assert h8[-1] < h8[0]  # still trains
        # int8 keeps ~2.4 digits on normalized windows; per-epoch losses
        # track the f32 run at input-quantization distance
        np.testing.assert_allclose(h8, h32, rtol=0.03)

    def test_dec_stream_int8_wire_label_parity(self, rng):
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc
        from sklearn.metrics import normalized_mutual_info_score as nmi

        x, y = scc.data.synthetic_windows(192, n_classes=3, seed=4)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.DEC(n_clusters=3)
        cfg = scc.train.DECConfig(
            n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
            kmeans_n_init=4, kmeans_max_iter=50,
        )

        def run(wire):
            state = scc.train.create_train_state(
                model, jax.random.key(7), jnp.asarray(x[:2]), lr=5e-4
            )
            loader = lambda: scc.data.PrefetchLoader(  # noqa: E731
                lambda i: x[i * 16 : (i + 1) * 16], n_items=12,
                batch_size=64, num_workers=2, transfer_dtype=wire,
            )
            return scc.train.train_dec_stream(
                model, state, loader, len(x), cfg
            )["labels"]

        l32, l8 = run(None), run("int8")
        # untrained encoder + 2 epochs -> fragile cluster boundaries;
        # int8's uniform step flips a few more edge windows than bf16
        # (~4% here), concentrated in a near-collapsed cluster, so raw
        # label-NMI between the runs is uninformative. The checks that
        # matter: near-total agreement, and identical clustering QUALITY
        # against ground truth. Convergence-level parity is measured in
        # the on-chip A/B (benchmarks/RESULTS.md int8 wire experiment).
        assert np.mean(l32 == l8) > 0.94
        assert abs(nmi(y, l32) - nmi(y, l8)) < 0.05

    def test_aec_stream_bf16_wire_matches_f32(self, rng):
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc

        x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=1)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

        def make_loader(wire=None):
            return lambda: scc.data.PrefetchLoader(
                lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
                num_workers=2, transfer_dtype=wire,
            )

        model = scc.models.AEC()

        def run(wire):
            state = scc.train.create_train_state(
                model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
            )
            return scc.train.train_aec_stream(
                model, state, make_loader(wire),
                scc.train.AECConfig(n_epochs=3, early_stopping=False),
            )["history"]["train"]

        h32 = run(None)
        h16 = run("bfloat16")
        assert h16[-1] < h16[0]  # still trains
        # input quantization only: per-epoch losses track the f32 run
        np.testing.assert_allclose(h16, h32, rtol=0.02)

    def test_dec_stream_bf16_wire_label_parity(self, rng):
        import jax
        import jax.numpy as jnp
        import spectrogram_cube_clustering_tpu as scc
        from sklearn.metrics import normalized_mutual_info_score as nmi

        x, _ = scc.data.synthetic_windows(192, n_classes=3, seed=4)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.DEC(n_clusters=3)
        cfg = scc.train.DECConfig(
            n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
            kmeans_n_init=4, kmeans_max_iter=50,
        )

        def run(wire):
            state = scc.train.create_train_state(
                model, jax.random.key(7), jnp.asarray(x[:2]), lr=5e-4
            )
            loader = lambda: scc.data.PrefetchLoader(  # noqa: E731
                lambda i: x[i * 16 : (i + 1) * 16], n_items=12,
                batch_size=64, num_workers=2, transfer_dtype=wire,
            )
            return scc.train.train_dec_stream(
                model, state, loader, len(x), cfg
            )["labels"]

        l32, l16 = run(None), run("bfloat16")
        # same init seed -> labels are directly comparable; allow a few
        # boundary windows to flip under input quantization (the encoder
        # is untrained here, so cluster boundaries are fragile)
        assert np.mean(l32 == l16) > 0.97
        assert nmi(l32, l16) > 0.9
