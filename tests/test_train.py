"""Training-loop tests: AEC loss descent + early stopping, DEC refinement
mechanics (target refresh, delta stop, stale-p slicing), full_eval contract,
checkpoint roundtrip, batched layout (SURVEY.md §4 items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import models, ops, train
from spectrogram_cube_clustering_tpu.data import synthetic_windows


@pytest.fixture(scope="module")
def windows():
    x, y = synthetic_windows(240, n_classes=3, seed=1)
    x = np.asarray(ops.sample_norm_cent(jnp.asarray(x)))
    return x, y


@pytest.fixture(scope="module")
def aec_model():
    return models.AEC()


class TestLayout:
    def test_pad_and_mask(self):
        x = np.ones((10, 4, 101, 1), np.float32)
        d = train.make_batched_data(x, batch_size=4)
        assert d.x.shape == (3, 4, 4, 101, 1)
        assert d.n_samples == 10
        m = np.asarray(d.mask)
        assert m.sum() == 10 and m[2, 2:].sum() == 0

    def test_empty_array_rejected(self):
        """m=0 used to fabricate one all-padding batch that trained on
        nothing and reported a silent 0.0 loss (review r3.2)."""
        x = np.ones((0, 4, 101, 1), np.float32)
        with pytest.raises(ValueError, match="empty"):
            train.make_batched_data(x, batch_size=4)

    def test_mesh_divisibility_error(self):
        from spectrogram_cube_clustering_tpu.core import make_data_mesh

        mesh = make_data_mesh()  # 8 virtual devices
        x = np.ones((10, 4, 101, 1), np.float32)
        with pytest.raises(ValueError):
            train.make_batched_data(x, batch_size=6, mesh=mesh)

    def test_sharded_layout(self):
        from spectrogram_cube_clustering_tpu.core import make_data_mesh

        mesh = make_data_mesh()
        x = np.arange(16 * 4 * 101, dtype=np.float32).reshape(16, 4, 101, 1)
        d = train.make_batched_data(x, batch_size=8, mesh=mesh)
        assert d.x.shape == (2, 8, 4, 101, 1)
        np.testing.assert_array_equal(
            np.asarray(d.x).reshape(16, 4, 101, 1), x
        )


class TestAEC:
    def test_loss_decreases(self, windows, aec_model):
        x, _ = windows
        tra = train.make_batched_data(x[:180], batch_size=36)
        val = train.make_batched_data(x[180:], batch_size=36)
        state = train.create_train_state(
            aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=3e-3
        )
        out = train.train_aec(
            aec_model, state, tra, val,
            train.AECConfig(n_epochs=15, early_stopping=False),
        )
        h = out["history"]
        assert h["train"][-1] < h["train"][0] * 0.9
        assert len(h["epoch"]) == 15

    def test_early_stopping_strikes(self, windows, aec_model):
        x, _ = windows
        tra = train.make_batched_data(x[:72], batch_size=36)
        # lr=0 -> validation never improves after epoch 1 -> strikes grow.
        state = train.create_train_state(
            aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
        )
        out = train.train_aec(
            aec_model, state, tra, tra,
            train.AECConfig(n_epochs=20, early_stopping=True, patience=2),
        )
        assert out["stopped_early"]
        assert out["last_epoch"] == 4  # epoch>patience and strikes>patience
        assert out["final_params"] is not None

    def test_fused_sync_every_matches_per_epoch(self, windows, aec_model):
        """sync_every>1 (on-device multi-epoch while_loop) must reproduce
        the per-epoch Python loop: histories, stop epoch, final params."""
        x, _ = windows
        tra = train.make_batched_data(x[:180], batch_size=36)
        val = train.make_batched_data(x[180:], batch_size=36)
        cfg = train.AECConfig(n_epochs=9, early_stopping=True, patience=3)

        def run(sync_every):
            state = train.create_train_state(
                aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=3e-3
            )
            return train.train_aec(
                aec_model, state, tra, val, cfg, sync_every=sync_every
            )

        ref, fused = run(1), run(4)  # 4 does not divide 9: ragged last chunk
        assert fused["history"]["epoch"] == ref["history"]["epoch"]
        np.testing.assert_allclose(
            fused["history"]["train"], ref["history"]["train"], rtol=1e-5
        )
        np.testing.assert_allclose(
            fused["history"]["validation"], ref["history"]["validation"],
            rtol=1e-5,
        )
        assert fused["last_epoch"] == ref["last_epoch"]
        assert fused["best_val"] == pytest.approx(ref["best_val"], rel=1e-5)
        for a, b in zip(
            jax.tree.leaves(fused["final_params"]),
            jax.tree.leaves(ref["final_params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_fused_early_stop_epoch_matches(self, windows, aec_model):
        x, _ = windows
        tra = train.make_batched_data(x[:72], batch_size=36)
        cfg = train.AECConfig(n_epochs=20, early_stopping=True, patience=2)

        def run(sync_every):
            state = train.create_train_state(
                aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
            )
            return train.train_aec(
                aec_model, state, tra, tra, cfg, sync_every=sync_every
            )

        ref, fused = run(1), run(7)
        assert fused["stopped_early"] and fused["last_epoch"] == ref["last_epoch"] == 4

    def test_fused_resume_after_early_stop_stays_stopped(
        self, windows, aec_model, tmp_path
    ):
        """A fused-path snapshot written AT the early stop carries
        done=True; resuming from it must not train past the stopping
        point (round-3 review: the flag wasn't persisted, so a resume
        after preemption-at-stop appended extra epochs)."""
        x, _ = windows
        tra = train.make_batched_data(x[:72], batch_size=36)
        cfg = train.AECConfig(n_epochs=20, early_stopping=True, patience=2)
        snap = str(tmp_path / "SNAP")
        state = train.create_train_state(
            aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
        )
        stopped = train.train_aec(
            aec_model, state, tra, tra, cfg,
            snapshot_path=snap, sync_every=7,
        )
        assert stopped["stopped_early"]
        for sync_every in (1, 7):  # per-epoch and fused resume paths
            res = train.train_aec(
                aec_model,
                train.create_train_state(
                    aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
                ),
                tra, tra, cfg,
                snapshot_path=snap, resume=True, sync_every=sync_every,
            )
            assert res["stopped_early"]
            assert res["last_epoch"] == stopped["last_epoch"]
            assert res["history"]["epoch"] == stopped["history"]["epoch"]
        # the PER-EPOCH path writes done=True at its stop too (review r3
        # second pass: it broke out before the snapshot block)
        snap2 = str(tmp_path / "SNAP2")
        stopped2 = train.train_aec(
            aec_model,
            train.create_train_state(
                aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
            ),
            tra, tra, cfg, snapshot_path=snap2, sync_every=1,
        )
        assert stopped2["stopped_early"]
        res2 = train.train_aec(
            aec_model,
            train.create_train_state(
                aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=0.0
            ),
            tra, tra, cfg, snapshot_path=snap2, resume=True, sync_every=7,
        )
        assert res2["stopped_early"]
        assert res2["history"]["epoch"] == stopped2["history"]["epoch"]

    def test_fused_snapshot_resume_interop(self, windows, aec_model, tmp_path):
        """A snapshot written by the fused path resumes in the per-epoch
        path (and the result matches an uninterrupted run)."""
        x, _ = windows
        tra = train.make_batched_data(x[:180], batch_size=36)
        val = train.make_batched_data(x[180:], batch_size=36)
        snap = str(tmp_path / "SNAP")

        def mk():
            return train.create_train_state(
                aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=3e-3
            )

        full = train.train_aec(
            aec_model, mk(), tra, val,
            train.AECConfig(n_epochs=6, early_stopping=True, patience=3),
        )
        train.train_aec(
            aec_model, mk(), tra, val,
            train.AECConfig(n_epochs=4, early_stopping=True, patience=3),
            snapshot_path=snap, sync_every=2,
        )
        res = train.train_aec(
            aec_model, mk(), tra, val,
            train.AECConfig(n_epochs=6, early_stopping=True, patience=3),
            snapshot_path=snap, resume=True,
        )
        assert res["history"]["epoch"] == full["history"]["epoch"]
        np.testing.assert_allclose(
            res["history"]["train"], full["history"]["train"], rtol=1e-5
        )

    def test_fused_snapshot_fires_on_boundary_crossing(
        self, windows, aec_model, tmp_path, monkeypatch
    ):
        """sync points rarely land exactly on a snapshot_every multiple;
        the fused path must snapshot whenever a boundary was CROSSED
        since the last sync, not only on exact divisibility (review r3:
        sync_every=8 + snapshot_every=10 used to skip everything until
        epoch 40)."""
        from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

        x, _ = windows
        tra = train.make_batched_data(x[:72], batch_size=36)
        snap_epochs = []
        real = ckpt.save_snapshot

        def spy(path, state, meta, **kw):
            snap_epochs.append(meta["epoch"])
            return real(path, state, meta, **kw)

        monkeypatch.setattr(ckpt, "save_snapshot", spy)
        state = train.create_train_state(
            aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=3e-3
        )
        train.train_aec(
            aec_model, state, tra, None,
            train.AECConfig(n_epochs=18, early_stopping=False),
            snapshot_path=str(tmp_path / "SNAP"),
            snapshot_every=10, sync_every=8,
        )
        # syncs at 8, 16, 18: epoch 16 crosses the 10-boundary, 18 is
        # final; 8 crosses nothing
        assert snap_epochs == [16, 18]

    def test_epoch_loss_matches_direct_mse(self, windows, aec_model):
        x, _ = windows
        tra = train.make_batched_data(x[:70], batch_size=32)  # padded case
        state = train.create_train_state(
            aec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
        )
        _, eval_epoch = train.aec.make_epoch_fns(aec_model)
        got = float(eval_epoch(state.params, tra.x, tra.mask))
        x_rec, _ = aec_model.apply({"params": state.params}, jnp.asarray(x[:70]))
        want = float(ops.mse(x_rec, jnp.asarray(x[:70])))
        assert got == pytest.approx(want, rel=1e-4)


class TestFullEval:
    def test_contract(self, windows):
        x, _ = windows
        dec_model = models.DEC(n_clusters=3)
        data = train.make_batched_data(x, batch_size=64)
        params = dec_model.init(jax.random.key(0), jnp.asarray(x[:4]))["params"]
        q, labels, z = train.full_eval(dec_model, params, data)
        assert q.shape == (240, 3) and labels.shape == (240,) and z.shape == (240, 9)
        # q rounded to 5dp like batch_eval (models.py:94); jnp.round and
        # np.round differ in the last ulp, hence the tiny atol
        np.testing.assert_allclose(
            np.asarray(q), np.round(np.asarray(q), 5), atol=1e-7
        )
        # matches a direct forward pass
        q_direct, _, _ = dec_model.apply({"params": params}, jnp.asarray(x[:240]))
        np.testing.assert_allclose(
            np.asarray(q), np.round(np.asarray(q_direct), 5), atol=2e-5
        )


class TestDEC:
    def test_refinement_runs_and_stops(self, windows):
        x, y = windows
        dec_model = models.DEC(n_clusters=3)
        data = train.make_batched_data(x, batch_size=40)
        state = train.create_train_state(
            dec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )
        cfg = train.DECConfig(
            n_clusters=3, n_epochs=3, tol=2.0,  # tol=2 -> stop at 1st refresh
            init="kmeans", kmeans_n_init=4, kmeans_max_iter=50,
        )
        out = train.train_dec(dec_model, state, data, cfg)
        assert out["stopped_early"]
        assert out["labels"].shape == (240,)
        assert len(out["deltas"]["delta"]) == 1
        assert out["centroids"].shape == (3, 9)

    def test_history_one_row_per_batch_scan_and_stream(self, windows):
        """VERDICT r1 #9: scan and stream DEC paths emit identical
        per-batch DEC_history shapes (reference logs per batch,
        models.py:1150-1161)."""
        x, _ = windows
        nb, bsz, n_epochs = 6, 40, 2
        dec_model = models.DEC(n_clusters=3)
        cfg = train.DECConfig(
            n_clusters=3, n_epochs=n_epochs, tol=0.0, init="load",
        )
        init = (
            np.zeros(len(x), np.int64),
            np.full((3, 9), 0.5, np.float32),
        )

        data = train.make_batched_data(x, batch_size=bsz)
        state = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        out_scan = train.train_dec(dec_model, state, data, cfg, initial=init)

        items = [x[i : i + bsz] for i in range(0, len(x), bsz)]
        from spectrogram_cube_clustering_tpu.data import PrefetchLoader

        state2 = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        out_stream = train.train_dec_stream(
            dec_model, state2,
            lambda: PrefetchLoader(
                lambda i: items[i], len(items), bsz, num_workers=2
            ),
            len(x), cfg, initial=init,
        )

        h_scan, h_stream = out_scan["history"], out_stream["history"]
        assert len(h_scan["total"]) == nb * n_epochs
        assert h_scan["iteration"] == h_stream["iteration"]
        np.testing.assert_allclose(
            h_scan["total"], h_stream["total"], rtol=1e-4
        )
        np.testing.assert_allclose(
            h_scan["reconstruction"], h_stream["reconstruction"], rtol=1e-4
        )

    def test_snapshot_cb_receives_initial_snapshot(self, windows):
        """Comparative snapshot figures need the PRE-refinement baseline
        (reference passes z_array0/labels_prev/initial centroids to
        plotter_mp, models.py:1176-1181): both DEC paths must hand the
        callback the init-time snapshot, not the current one twice."""
        x, _ = windows
        bsz = 40
        dec_model = models.DEC(n_clusters=3)
        cfg = train.DECConfig(n_clusters=3, n_epochs=2, tol=0.0, init="load")
        init = (
            np.arange(len(x), dtype=np.int64) % 3,
            np.full((3, 9), 0.5, np.float32),
        )
        seen = []

        def cb(epoch, labels, z, centroids, initial=None):
            seen.append((epoch, labels, z, centroids, initial))

        data = train.make_batched_data(x, batch_size=bsz)
        state = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        train.train_dec(
            dec_model, state, data, cfg, initial=init,
            snapshot_cb=cb, snapshot_every=2,
        )

        items = [x[i : i + bsz] for i in range(0, len(x), bsz)]
        from spectrogram_cube_clustering_tpu.data import PrefetchLoader

        state2 = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        train.train_dec_stream(
            dec_model, state2,
            lambda: PrefetchLoader(
                lambda i: items[i], len(items), bsz, num_workers=2
            ),
            len(x), cfg, initial=init,
            snapshot_cb=cb, snapshot_every=2,
        )

        assert len(seen) == 2  # one snapshot per path
        for epoch, labels, z, centroids, initial in seen:
            assert epoch == 2
            z0, labels0, cen0 = initial
            np.testing.assert_array_equal(labels0, init[0])
            np.testing.assert_allclose(cen0, init[1])
            assert z0.shape == z.shape
            # two optimizer epochs moved the latents: the baseline must
            # be the init-time eval, not a re-eval of current params
            assert not np.allclose(z0, z)

    def test_update_interval_counts_batches(self, windows):
        """An explicit update_interval is BATCHES between target refreshes
        (reference models.py:1093 gates batch_num % update_interval), not
        a refreshes-per-epoch count (round-3 review). nb=6, interval=2,
        2 epochs -> refreshes at batch 0/2/4 each epoch minus the skipped
        first batch of epoch 0 = 5, in BOTH the scan and stream paths."""
        x, _ = windows
        nb, bsz, n_epochs = 6, 40, 2
        dec_model = models.DEC(n_clusters=3)
        cfg = train.DECConfig(
            n_clusters=3, n_epochs=n_epochs, tol=0.0, init="load",
            update_interval=2,
        )
        init = (
            np.zeros(len(x), np.int64),
            np.full((3, 9), 0.5, np.float32),
        )
        data = train.make_batched_data(x, batch_size=bsz)
        state = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        out_scan = train.train_dec(dec_model, state, data, cfg, initial=init)
        assert len(out_scan["deltas"]["iteration"]) == 5

        from spectrogram_cube_clustering_tpu.data import PrefetchLoader

        items = [x[i : i + bsz] for i in range(0, len(x), bsz)]
        state2 = train.create_train_state(
            dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
        )
        out_stream = train.train_dec_stream(
            dec_model, state2,
            lambda: PrefetchLoader(
                lambda i: items[i], len(items), bsz, num_workers=2
            ),
            len(x), cfg, initial=init,
        )
        assert len(out_stream["deltas"]["iteration"]) == 5

    def test_stream_init_rand_and_unknown(self, windows):
        """The stream path supports init='rand' like initialize_clusters
        and rejects unknown init names instead of silently running a GMM
        (round-3 review)."""
        from spectrogram_cube_clustering_tpu.data import PrefetchLoader

        x, _ = windows
        bsz = 40
        items = [x[i : i + bsz] for i in range(0, len(x), bsz)]
        dec_model = models.DEC(n_clusters=3)

        def mk_loader():
            return PrefetchLoader(
                lambda i: items[i], len(items), bsz, num_workers=2
            )

        def mk_state():
            return train.create_train_state(
                dec_model, jax.random.key(3), jnp.asarray(x[:4]), lr=1e-3
            )

        cfg = train.DECConfig(
            n_clusters=3, n_epochs=1, tol=0.0, init="rand", seed=7,
        )
        out = train.train_dec_stream(
            dec_model, mk_state(), mk_loader, len(x), cfg
        )
        rng = np.random.default_rng(7)
        want_labels = rng.integers(0, 3, size=len(x))
        want_centroids = rng.uniform(size=(3, 9)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(out["initial_params"]["centroids"]), want_centroids
        )
        del want_labels  # labels only seed the delta criterion

        with pytest.raises(ValueError, match="unknown init"):
            train.train_dec_stream(
                dec_model, mk_state(), mk_loader, len(x),
                train.DECConfig(n_clusters=3, n_epochs=1, init="gm"),
            )

    def test_losses_accumulate_and_improve(self, windows):
        x, _ = windows
        dec_model = models.DEC(n_clusters=3)
        data = train.make_batched_data(x, batch_size=40)
        state = train.create_train_state(
            dec_model, jax.random.key(1), jnp.asarray(x[:4]), lr=1e-3
        )
        cfg = train.DECConfig(
            n_clusters=3, n_epochs=4, tol=0.0,  # never stop on delta
            init="kmeans", kmeans_n_init=4, kmeans_max_iter=50,
        )
        out = train.train_dec(dec_model, state, data, cfg)
        h = out["history"]
        assert len(h["total"]) >= 4
        assert h["total"][-1] < h["total"][0]
        assert not out["stopped_early"]

    def test_load_init_uses_given_centroids(self, windows):
        x, _ = windows
        dec_model = models.DEC(n_clusters=3)
        data = train.make_batched_data(x, batch_size=40)
        state = train.create_train_state(
            dec_model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
        )
        labels0 = np.zeros(240, np.int64)
        cents0 = np.full((3, 9), 0.5, np.float32)
        cfg = train.DECConfig(n_clusters=3, n_epochs=1, tol=2.0, init="load")
        out = train.train_dec(
            dec_model, state, data, cfg, initial=(labels0, cents0)
        )
        np.testing.assert_allclose(
            np.asarray(out["initial_params"]["centroids"]), cents0
        )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, windows, aec_model):
        x, _ = windows
        params = aec_model.init(jax.random.key(0), jnp.asarray(x[:4]))["params"]
        path = str(tmp_path / "ckpt" / "AEC_Params_Final")
        train.checkpoint.save(path, params)
        restored = train.checkpoint.restore(path, template=params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, restored,
        )
