"""Checkpoint/resume tests: preemption-safe training snapshots."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt


@pytest.fixture
def setup(rng):
    x, _ = scc.data.synthetic_windows(64, n_classes=3, seed=2)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.AEC()
    data = scc.train.make_batched_data(x, batch_size=32)

    def fresh_state():
        return scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
        )

    return model, data, fresh_state


def test_snapshot_roundtrip(tmp_path, setup):
    model, data, fresh_state = setup
    state = fresh_state()
    train_epoch, _ = scc.train.aec.make_epoch_fns(model)
    state, _ = train_epoch(state, data.x, data.mask)
    path = str(tmp_path / "snap")
    ckpt.save_snapshot(path, state, {"epoch": 1, "note": "x"})
    restored, meta, _ = ckpt.restore_snapshot(path, fresh_state())
    assert meta["epoch"] == 1
    assert int(restored.step) == int(state.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    # optimizer moments restored too
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(restored.opt_state), jax.device_get(state.opt_state),
    )


def test_resume_matches_uninterrupted(tmp_path, setup):
    model, data, fresh_state = setup
    cfg_full = scc.train.AECConfig(n_epochs=6, early_stopping=False)

    # uninterrupted run
    full = scc.train.train_aec(model, fresh_state(), data, None, cfg_full)

    # interrupted: 3 epochs with snapshots, then resume to 6
    snap = str(tmp_path / "snap")
    cfg_half = scc.train.AECConfig(n_epochs=3, early_stopping=False)
    scc.train.train_aec(
        model, fresh_state(), data, None, cfg_half,
        snapshot_path=snap, snapshot_every=1,
    )
    assert os.path.exists(snap)
    resumed = scc.train.train_aec(
        model, fresh_state(), data, None, cfg_full,
        snapshot_path=snap, resume=True,
    )
    assert resumed["history"]["epoch"] == full["history"]["epoch"]
    np.testing.assert_allclose(
        resumed["history"]["train"], full["history"]["train"], rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        resumed["state"].params, full["state"].params,
    )


def test_snapshot_overwrites_stale_tmp(tmp_path, setup):
    """A crash mid-save leaves SNAPSHOT.tmp; the next save must recover."""
    model, data, fresh_state = setup
    state = fresh_state()
    path = str(tmp_path / "snap")
    # simulate an interrupted writer
    os.makedirs(path + ".tmp")
    with open(os.path.join(path + ".tmp", "garbage"), "w") as f:
        f.write("partial")
    ckpt.save_snapshot(path, state, {"epoch": 2})
    restored, meta, _ = ckpt.restore_snapshot(path, fresh_state())
    assert meta["epoch"] == 2
    assert not os.path.exists(path + ".tmp")


def test_snapshot_rotation_never_leaves_a_gap(tmp_path, setup):
    """save_snapshot must never have a moment with no complete snapshot:
    the old copy rotates to SNAPSHOT.old before the new one renames in
    (review r3: rmtree-then-rename silently restarted training from
    epoch 0 when a preemption landed in the window), and resume falls
    back to the .old copy."""
    model, data, fresh_state = setup
    state = fresh_state()
    path = str(tmp_path / "snap")
    ckpt.save_snapshot(path, state, {"epoch": 1})
    ckpt.save_snapshot(path, state, {"epoch": 2})
    assert not os.path.exists(path + ".old")  # rotation cleaned up
    restored, meta, _ = ckpt.restore_snapshot(path, fresh_state())
    assert meta["epoch"] == 2

    # simulate a crash BETWEEN the two renames: old rotated aside, new
    # not yet in place
    os.rename(path, path + ".old")
    assert ckpt.snapshot_exists(path)
    restored, meta, _ = ckpt.restore_snapshot(path, fresh_state())
    assert meta["epoch"] == 2
    assert int(restored.step) == int(state.step)
    # and the next save rotates the orphan away
    ckpt.save_snapshot(path, state, {"epoch": 3})
    assert os.path.exists(path) and not os.path.exists(path + ".old")


def test_training_resumes_from_old_fallback(tmp_path, setup):
    """A crash between save_snapshot's two renames leaves only the .old
    copy; train_aec(resume=True) must pick it up instead of silently
    restarting from epoch 0."""
    model, data, fresh_state = setup
    snap = str(tmp_path / "snap")
    cfg_half = scc.train.AECConfig(n_epochs=3, early_stopping=False)
    scc.train.train_aec(
        model, fresh_state(), data, None, cfg_half,
        snapshot_path=snap, snapshot_every=1,
    )
    os.rename(snap, snap + ".old")  # crash window between the renames
    cfg_full = scc.train.AECConfig(n_epochs=6, early_stopping=False)
    full = scc.train.train_aec(model, fresh_state(), data, None, cfg_full)
    resumed = scc.train.train_aec(
        model, fresh_state(), data, None, cfg_full,
        snapshot_path=snap, resume=True,
    )
    assert resumed["history"]["epoch"] == full["history"]["epoch"]
    np.testing.assert_allclose(
        resumed["history"]["train"], full["history"]["train"], rtol=1e-5
    )


def test_sigkill_preemption_then_resume(tmp_path):
    """Real process death between epochs; resume continues from the
    snapshot (the reference restarts from scratch, SURVEY.md §5)."""
    import subprocess
    import sys
    import textwrap

    snap = str(tmp_path / "snap")
    script = textwrap.dedent(f"""
        import os
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp, numpy as np
        import spectrogram_cube_clustering_tpu as scc

        x, _ = scc.data.synthetic_windows(64, n_classes=3, seed=2)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.AEC()
        data = scc.train.make_batched_data(x, batch_size=32)
        state = scc.train.create_train_state(
            model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
        )

        def die_after_2(tag, value, step):
            if step == 2 and tag == "Validation MSE":
                os._exit(137)   # simulated preemption

        scc.train.train_aec(
            model, state, data, None,
            scc.train.AECConfig(n_epochs=5, early_stopping=False),
            log_scalar=die_after_2,
            snapshot_path={snap!r}, snapshot_every=1,
        )
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, cwd="/root/repo"
    )
    assert proc.returncode == 137, proc.stderr.decode()[-500:]
    assert os.path.exists(snap)

    # resume in-process to completion
    import jax
    import jax.numpy as jnp

    x, _ = scc.data.synthetic_windows(64, n_classes=3, seed=2)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.AEC()
    data = scc.train.make_batched_data(x, batch_size=32)
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
    )
    out = scc.train.train_aec(
        model, state, data, None,
        scc.train.AECConfig(n_epochs=5, early_stopping=False),
        snapshot_path=snap, resume=True,
    )
    assert out["history"]["epoch"] == [1, 2, 3, 4, 5]


def test_aec_stream_resume_after_early_stop_stays_stopped(tmp_path, rng):
    """The stream path writes done=True at the early stop and honors it
    on resume — in any combination with the scan/fused paths (the
    formats are interchangeable; review r3: the stream resume ignored
    the flag and trained on past the stop)."""
    x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=5)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.AEC()

    def make_loader():
        return scc.data.PrefetchLoader(
            lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
            num_workers=2,
        )

    def fresh():
        return scc.train.create_train_state(
            model, jax.random.key(7), jnp.asarray(x[:2]), lr=0.0
        )

    snap = str(tmp_path / "stopsnap")
    cfg = scc.train.AECConfig(n_epochs=20, early_stopping=True, patience=2)
    stopped = scc.train.train_aec_stream(
        model, fresh(), make_loader, cfg, make_val_loader=make_loader,
        snapshot_path=snap,
    )
    assert stopped["stopped_early"]
    # stream resume stays stopped
    res = scc.train.train_aec_stream(
        model, fresh(), make_loader, cfg, make_val_loader=make_loader,
        snapshot_path=snap, resume=True,
    )
    assert res["stopped_early"]
    assert res["history"]["epoch"] == stopped["history"]["epoch"]
    # scan-path resume of the stream snapshot stays stopped too
    data = scc.train.make_batched_data(x, batch_size=32)
    res2 = scc.train.train_aec(
        model, fresh(), data, data, cfg, snapshot_path=snap, resume=True,
    )
    assert res2["stopped_early"]
    assert res2["history"]["epoch"] == stopped["history"]["epoch"]


def test_aec_stream_resume_matches_uninterrupted(tmp_path, rng):
    """Streaming AEC (the larger-than-HBM tier, where preemption hurts
    most) carries the same epoch-granular snapshot contract as the scan
    path: state + history + early-stop carry, interchangeable format."""
    x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=5)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.AEC()

    def make_loader():
        return scc.data.PrefetchLoader(
            lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
            num_workers=2,
        )

    def fresh():
        return scc.train.create_train_state(
            model, jax.random.key(7), jnp.asarray(x[:2]), lr=1e-3
        )

    cfg4 = scc.train.AECConfig(n_epochs=4, early_stopping=False)
    full = scc.train.train_aec_stream(model, fresh(), make_loader, cfg4)

    snap = str(tmp_path / "asnap")
    cfg2 = scc.train.AECConfig(n_epochs=2, early_stopping=False)
    scc.train.train_aec_stream(
        model, fresh(), make_loader, cfg2, snapshot_path=snap
    )
    assert os.path.exists(snap)
    resumed = scc.train.train_aec_stream(
        model, fresh(), make_loader, cfg4, snapshot_path=snap, resume=True
    )
    assert resumed["history"]["epoch"] == full["history"]["epoch"]
    np.testing.assert_allclose(
        resumed["history"]["train"], full["history"]["train"], rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        resumed["state"].params, full["state"].params,
    )


def test_aec_stream_sigkill_mid_epoch_then_resume(tmp_path):
    """Real process death MID-epoch (inside the loader); the stream path
    resumes from the last completed-epoch snapshot."""
    import subprocess
    import sys
    import textwrap

    snap = str(tmp_path / "asnap")
    script = textwrap.dedent(f"""
        import os
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp, numpy as np
        import spectrogram_cube_clustering_tpu as scc

        x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=5)
        x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
        model = scc.models.AEC()
        calls = [0]

        def item_fn(i):
            calls[0] += 1
            if calls[0] == 30:   # mid-epoch 3 (12 items/epoch)
                os._exit(137)    # simulated preemption
            return x[i * 8 : (i + 1) * 8]

        def make_loader():
            return scc.data.PrefetchLoader(
                item_fn, n_items=12, batch_size=32, num_workers=1,
            )

        state = scc.train.create_train_state(
            model, jax.random.key(7), jnp.asarray(x[:2]), lr=1e-3
        )
        scc.train.train_aec_stream(
            model, state, make_loader,
            scc.train.AECConfig(n_epochs=5, early_stopping=False),
            snapshot_path={snap!r}, snapshot_every=1,
        )
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, cwd="/root/repo"
    )
    assert proc.returncode == 137, proc.stderr.decode()[-500:]
    assert os.path.exists(snap)

    x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=5)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.AEC()

    def make_loader():
        return scc.data.PrefetchLoader(
            lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
            num_workers=2,
        )

    state = scc.train.create_train_state(
        model, jax.random.key(7), jnp.asarray(x[:2]), lr=1e-3
    )
    out = scc.train.train_aec_stream(
        model, state, make_loader,
        scc.train.AECConfig(n_epochs=5, early_stopping=False),
        snapshot_path=snap, resume=True,
    )
    assert out["history"]["epoch"] == [1, 2, 3, 4, 5]


def test_dec_resume_matches_uninterrupted(tmp_path, rng):
    """DEC epoch-granular resume continues the run with the snapshotted
    target distribution and labels."""
    x, _ = scc.data.synthetic_windows(128, n_classes=3, seed=9)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.DEC(n_clusters=3)
    data = scc.train.make_batched_data(x, batch_size=32)

    def fresh():
        return scc.train.create_train_state(
            model, jax.random.key(3), jnp.asarray(x[:2]), lr=5e-4
        )

    cfg6 = scc.train.DECConfig(
        n_clusters=3, n_epochs=6, tol=0.0, init="kmeans",
        kmeans_n_init=2, kmeans_max_iter=20,
    )
    full = scc.train.train_dec(model, fresh(), data, cfg6)

    snap = str(tmp_path / "dsnap")
    cfg3 = scc.train.DECConfig(
        n_clusters=3, n_epochs=3, tol=0.0, init="kmeans",
        kmeans_n_init=2, kmeans_max_iter=20,
    )
    scc.train.train_dec(model, fresh(), data, cfg3, snapshot_path=snap)
    assert os.path.exists(snap)
    resumed = scc.train.train_dec(
        model, fresh(), data, cfg6, snapshot_path=snap, resume=True
    )
    assert resumed["last_epoch"] == 6
    # resumed runs must NOT report mid-training params as the pre-
    # refinement initialization (review r3)
    assert resumed["initial_params"] is None
    assert full["initial_params"] is not None
    np.testing.assert_array_equal(resumed["labels"], full["labels"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        resumed["state"].params, full["state"].params,
    )


def test_dec_stream_resume(tmp_path, rng):
    """Streaming DEC resumes from the epoch snapshot."""
    x, _ = scc.data.synthetic_windows(96, n_classes=3, seed=12)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    model = scc.models.DEC(n_clusters=3)

    def make_loader():
        return scc.data.PrefetchLoader(
            lambda i: x[i * 8 : (i + 1) * 8], n_items=12, batch_size=32,
            num_workers=2,
        )

    def fresh():
        return scc.train.create_train_state(
            model, jax.random.key(4), jnp.asarray(x[:2]), lr=5e-4
        )

    snap = str(tmp_path / "ssnap")
    cfg2 = scc.train.DECConfig(
        n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
        kmeans_n_init=2, kmeans_max_iter=20,
    )
    scc.train.train_dec_stream(
        model, fresh(), make_loader, len(x), cfg2, snapshot_path=snap
    )
    assert os.path.exists(snap)

    cfg4 = scc.train.DECConfig(
        n_clusters=3, n_epochs=4, tol=0.0, init="kmeans",
        kmeans_n_init=2, kmeans_max_iter=20,
    )
    full = scc.train.train_dec_stream(model, fresh(), make_loader, len(x), cfg4)
    resumed = scc.train.train_dec_stream(
        model, fresh(), make_loader, len(x), cfg4,
        snapshot_path=snap, resume=True,
    )
    assert resumed["last_epoch"] == 4
    np.testing.assert_array_equal(resumed["labels"], full["labels"])


def test_final_epoch_always_snapshots(tmp_path, setup):
    """Both AEC paths snapshot at the final epoch even off the
    snapshot_every grid (fused-path parity, review r3.2): a post-run
    resume=True is then a no-op instead of re-training the tail."""
    model, data, fresh_state = setup
    cfg = scc.train.AECConfig(n_epochs=6, early_stopping=False)
    path = str(tmp_path / "snap")
    out = scc.train.train_aec(
        model, fresh_state(), data, None, cfg,
        snapshot_path=path, snapshot_every=4,
    )
    st = fresh_state()
    _, meta, _ = ckpt.restore_snapshot(path, st, extra_template=st.params)
    assert meta["epoch"] == 6
    resumed = scc.train.train_aec(
        model, fresh_state(), data, None, cfg,
        snapshot_path=path, snapshot_every=4, resume=True,
    )
    np.testing.assert_allclose(
        resumed["history"]["train"], out["history"]["train"]
    )
