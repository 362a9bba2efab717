"""Integration test: the 3-stage AEC -> GMM -> DEC workflow driven through
the .ini config surface on a synthetic Zarr cube (SURVEY.md §4 item 2).

Asserts: losses decrease, artifact tree matches the reference layout
(Exp/Run/GMM/Prediction, SURVEY.md §5 Checkpoint), the delta-label stop
criterion machinery runs, and final clustering recovers the planted classes
(NMI).
"""

import glob
import os

import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import utils as scc_utils
from spectrogram_cube_clustering_tpu import workflow
from spectrogram_cube_clustering_tpu.data import CubeSpec, make_synthetic_cube

N_CLASSES = 3
SPEC = CubeSpec(chunk_size=64, window_rows=4, channel_start=1, channel_stride=2)


@pytest.fixture(scope="module")
def cube(tmp_path_factory):
    root = tmp_path_factory.mktemp("wf")
    cube_path = str(root / "cube.zarr")
    labels = make_synthetic_cube(
        cube_path, n_time=64 * 11, n_channels=25, n_freq=101,
        n_classes=N_CLASSES, chunk_rows=64, seed=3, spec=SPEC,
    )  # 2 usable chunks x 12 channels x 16 windows = 384 samples
    return root, cube_path, labels


def _make_config(root, cube_path, model, mode, parameters=None, hp=None):
    universal = {
        "fname_dataset": cube_path,
        "savepath": str(root / "Outputs"),
        "configpath": str(root / "Config"),
        "transform": "sample_norm_cent",
        "chunk_size": SPEC.chunk_size,
        "channel_start": SPEC.channel_start,
        "channel_stride": SPEC.channel_stride,
    }
    params = {"model": model, "mode": mode, "tb": "False", "show": "False"}
    params.update(parameters or {})
    ini = scc_utils.config_training(universal, params, hp)
    config = scc_utils.load_config(ini)
    config.init_exp_env()
    config.save_exp_config()
    return config


def test_config_roundtrips_percent_in_values(tmp_path):
    """Literal '%' in config values (e.g. URL-encoded paths) used to hit
    ConfigParser's BasicInterpolation and crash load_config (review r2)."""
    ini = scc_utils.config_training(
        {"fname_dataset": str(tmp_path / "runs%2Ffoo.zarr"),
         "savepath": str(tmp_path), "configpath": str(tmp_path / "Config")},
        {"model": "AEC", "mode": "train", "n_epochs": 1},
        {"batch_size": "8", "lr": "0.001"},
    )
    config = scc_utils.Configuration(ini)
    config.load_config()
    assert "%2F" in config.fname_dataset


def test_bool_hyperparameter_sweep_coerces(tmp_path):
    """A bool-typed HYPERPARAMETERS sweep list parses to real booleans —
    the raw strings 'true'/'false' are both truthy (review r3)."""
    ini = scc_utils.config_training(
        {"fname_dataset": str(tmp_path / "c.zarr"),
         "savepath": str(tmp_path), "configpath": str(tmp_path / "Config")},
        # DEC: the AEC path intentionally filters hp to batch_size/lr
        # (reference utils.py:167-168)
        {"model": "DEC", "mode": "train", "n_epochs": 1},
        {"batch_size": "8", "lr": "0.001", "early_stopping": "true,false"},
    )
    config = scc_utils.load_config(ini)
    assert config.hp["early_stopping"] == [True, False]
    with pytest.raises(ValueError, match="not a boolean"):
        scc_utils.load_config(
            scc_utils.config_training(
                {"fname_dataset": str(tmp_path / "c.zarr"),
                 "savepath": str(tmp_path),
                 "configpath": str(tmp_path / "Config2")},
                {"model": "DEC", "mode": "train", "n_epochs": 1},
                {"batch_size": "8", "lr": "0.001",
                 "early_stopping": "yes,maybe"},
            )
        )


def test_train_rejects_gmm_model_clearly(tmp_path):
    """model='GMM' with mode='train' must hit the explicit unknown-model
    error, not an unpack ValueError from load_data's single latent array
    (review r3)."""
    import types

    from spectrogram_cube_clustering_tpu import workflow

    config = types.SimpleNamespace(
        model="GMM", mode="train", loadmode="ram",
        fname_dataset=str(tmp_path / "c.zarr"),
    )
    with pytest.raises(ValueError, match="unknown model 'GMM'"):
        workflow.train(config)


def test_full_workflow(cube):
    root, cube_path, true_labels = cube

    # ---- stage 1: AEC pretrain (sweep of one) --------------------------
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 25, "early_stopping": "True", "patience": 10},
        {"batch_size": "64", "lr": "0.001"},
    )
    assert config.runs == 1
    [aec_out] = workflow.train(config)
    hist = aec_out["history"]["train"]
    assert hist[-1] < hist[0], "AEC training loss must decrease"
    run_dir = aec_out["savepath_run"]
    assert os.path.basename(run_dir) == "Run_BatchSz=64_LR=0.001"
    assert os.path.isdir(os.path.join(run_dir, "AEC_Params_Final"))
    assert os.path.exists(os.path.join(run_dir, "AEC_history.csv"))
    assert glob.glob(os.path.join(os.path.dirname(run_dir), "ExpConfig*.ini"))
    saved_weights = os.path.join(run_dir, "AEC_Params_Final")

    # ---- stage 1b: AEC predict -> Z_AEC.npy ----------------------------
    config = _make_config(
        root, cube_path, "AEC", "predict", {"saved_weights": saved_weights}
    )
    out = workflow.predict(config)
    pred_dir = os.path.join(run_dir, "Prediction")
    assert os.path.exists(os.path.join(pred_dir, "Z_AEC.npy"))
    assert os.path.exists(os.path.join(pred_dir, "Xr_AEC.npy"))
    assert os.path.exists(os.path.join(pred_dir, "MSE.txt"))
    z = np.load(os.path.join(pred_dir, "Z_AEC.npy"))
    assert z.shape == (len(true_labels), 9)
    xr = np.load(os.path.join(pred_dir, "Xr_AEC.npy"))
    assert xr.shape == (len(true_labels), 1, 4, 101)  # reference NCHW layout
    assert np.isfinite(out["loss"])

    # ---- stage 2: GMM fit in latent space ------------------------------
    config = _make_config(
        root, cube_path, "GMM", "fit",
        {"saved_weights": saved_weights, "km_n_init": 10, "km_max_iter": 100},
        {"n_clusters": str(N_CLASSES)},
    )
    [gmm_out] = workflow.gmm_fit(config, figures=False)
    gmm_dir = os.path.join(run_dir, "GMM", f"n_clusters={N_CLASSES}")
    assert os.path.exists(os.path.join(gmm_dir, "labels.npy"))
    assert os.path.exists(os.path.join(gmm_dir, "centroids.npy"))
    assert os.path.exists(os.path.join(gmm_dir, "Labels.csv"))
    assert gmm_out["centroids"].shape == (N_CLASSES, 9)

    # ---- stage 3: DEC refine with loaded GMM init ----------------------
    config = _make_config(
        root, cube_path, "DEC", "train",
        {
            "n_epochs": 5, "saved_weights": saved_weights, "init": "load",
            "update_interval": -1,
        },
        {
            "batch_size": "64", "lr": "0.0005",
            "n_clusters": str(N_CLASSES), "gamma": "0.01", "tol": "0.001",
        },
    )
    [dec_out] = workflow.train(config)
    dec_run = dec_out["savepath_run"]
    assert os.path.basename(dec_run) == (
        f"Run_Clusters={N_CLASSES}_BatchSz=64_LR=0.0005_gamma=0.01_tol=0.001"
    )
    assert os.path.isdir(os.path.join(dec_run, "DEC_Params_Initial"))
    assert os.path.isdir(os.path.join(dec_run, "DEC_Params_Final"))
    assert os.path.exists(os.path.join(dec_run, "DEC_history.csv"))
    assert dec_out["labels"].shape == (len(true_labels),)
    assert dec_out["centroids"].shape == (N_CLASSES, 9)

    # init=load records the GMM provenance inside the DEC run — the CLI
    # workflow's predict stage can only resolve the comparative-figure
    # context from there (saved_weights points at DEC params by then)
    prov = os.path.join(dec_run, "GMM", f"n_clusters={N_CLASSES}")
    for fname in ("labels.npy", "centroids.npy", "Z_AEC.path"):
        assert os.path.exists(os.path.join(prov, fname)), fname
    # the provenance latents are a pointer (not a copy) resolving back to
    # the AEC prediction's Z_AEC.npy (review r3)
    from spectrogram_cube_clustering_tpu.workflow.train import (
        resolve_z_aec_path,
    )

    assert resolve_z_aec_path(prov) == os.path.join(pred_dir, "Z_AEC.npy")

    # clustering quality: DEC labels must recover the planted classes
    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(true_labels, dec_out["labels"])
    assert nmi > 0.5, f"DEC NMI vs planted classes too low: {nmi:.3f}"

    # ---- stage 3b: DEC predict -----------------------------------------
    config = _make_config(
        root, cube_path, "DEC", "predict",
        {"saved_weights": os.path.join(dec_run, "DEC_Params_Final")},
    )
    assert config.n_clusters == N_CLASSES  # parsed from the run-dir name
    out = workflow.predict(config, figures=False)
    dec_pred = os.path.join(dec_run, "Prediction")
    for fname in (
        "q_DEC.npy", "Z_DEC.npy", "Xr_DEC.npy", "labels_DEC.npy",
        "centroids_DEC.npy", "Labels.csv", "cluster_performance.csv",
        "silh_scores_Z.npy", "silh_scores_X.npy",
    ):
        assert os.path.exists(os.path.join(dec_pred, fname)), fname
    q = np.load(os.path.join(dec_pred, "q_DEC.npy"))
    assert q.shape == (len(true_labels), N_CLASSES)
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=2e-4)
    # predict labels match training's final labels (same params, same data)
    labels_pred = np.load(os.path.join(dec_pred, "labels_DEC.npy"))
    assert np.mean(labels_pred == dec_out["labels"]) > 0.99

    # the comparative-figure context resolves to the REAL GMM artifacts
    # via the DEC run's provenance copy (no DEC-vs-DEC fallback): the
    # returned AEC-space pieces are byte-identical to the GMM fit's
    from spectrogram_cube_clustering_tpu.workflow.predict import (
        _gmm_figure_context,
    )

    z_a, labels_a, cents_a = _gmm_figure_context(
        config, N_CLASSES, out["z"], out["labels"], out["centroids"]
    )
    assert np.array_equal(z_a, np.load(resolve_z_aec_path(gmm_dir)))
    assert np.array_equal(
        labels_a, np.load(os.path.join(gmm_dir, "labels.npy"))
    )
    assert np.array_equal(
        cents_a, np.load(os.path.join(gmm_dir, "centroids.npy"))
    )


def test_stream_loadmode_aec(cube):
    """loadmode='stream' trains AEC through the prefetch loader and writes
    the same artifact names."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 3, "early_stopping": "False", "loadmode": "stream",
         "workers": "2"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    run_dir = out["savepath_run"]
    assert os.path.isdir(os.path.join(run_dir, "AEC_Params_Final"))
    assert os.path.exists(os.path.join(run_dir, "AEC_history.csv"))
    assert os.path.exists(os.path.join(run_dir, "AEC_reconstructions.png"))
    hist = out["history"]["train"]
    assert hist[-1] < hist[0]


def test_stream_transfer_dtype_bf16(cube):
    """stream_transfer_dtype='bfloat16' ships half-width wire batches
    through the prefetch loader; training still converges and writes the
    same artifacts (the jitted steps restore f32 on device)."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 3, "early_stopping": "False", "loadmode": "stream",
         "workers": "2", "stream_transfer_dtype": "bfloat16"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    run_dir = out["savepath_run"]
    assert os.path.isdir(os.path.join(run_dir, "AEC_Params_Final"))
    hist = out["history"]["train"]
    assert hist[-1] < hist[0]


def test_stream_loadmode_predict(cube):
    """loadmode='stream' predict writes the same artifacts as the ram path
    (AEC mode: Z_AEC/Xr_AEC/MSE)."""
    root, cube_path, labels = cube
    # train a quick AEC first
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    weights = os.path.join(out["savepath_run"], "AEC_Params_Final")

    config = _make_config(
        root, cube_path, "AEC", "predict",
        {"saved_weights": weights, "loadmode": "stream", "workers": "2"},
    )
    res = workflow.predict(config)
    pred = config.savepath_exp
    z = np.load(os.path.join(pred, "Z_AEC.npy"))
    assert z.shape == (len(labels), 9)
    assert np.load(os.path.join(pred, "Xr_AEC.npy")).shape == (
        len(labels), 1, 4, 101
    )
    assert np.isfinite(res["loss"])

    # ram-path predict on the same weights must produce identical latents
    config2 = _make_config(
        root, cube_path, "AEC", "predict", {"saved_weights": weights}
    )
    res2 = workflow.predict(config2)
    np.testing.assert_allclose(res["z"], res2["z"], atol=1e-5)


def test_stream_predict_bf16_wire_artifact_parity(cube):
    """stream_transfer_dtype on PREDICT halves both wire directions (bf16
    input batches up, bf16 reconstructions down, f32 restored host-side);
    the written artifacts must stay within quantization distance of the
    f32-wire stream predict."""
    root, cube_path, labels = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    weights = os.path.join(out["savepath_run"], "AEC_Params_Final")

    def predict(extra):
        cfg = _make_config(
            root, cube_path, "AEC", "predict",
            {"saved_weights": weights, "loadmode": "stream",
             "workers": "2", **extra},
        )
        workflow.predict(cfg)
        pred = cfg.savepath_exp
        return (np.load(os.path.join(pred, "Z_AEC.npy")),
                np.load(os.path.join(pred, "Xr_AEC.npy")))

    z32, xr32 = predict({})
    z16, xr16 = predict({"stream_transfer_dtype": "bfloat16"})
    assert xr16.dtype == np.float32  # artifact contract: f32 on disk
    # bf16 keeps ~3 significant digits; reconstructions are O(0.1)
    np.testing.assert_allclose(z16, z32, atol=5e-3)
    np.testing.assert_allclose(xr16, xr32, atol=5e-3)


def test_dec_figure_snapshots(cube):
    """figures=True triggers the every-4-epochs snapshot figure set
    (reference models.py:1166-1192)."""
    root, cube_path, _ = cube
    # reuse any AEC weights from an earlier quick train
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")

    config = _make_config(
        root, cube_path, "DEC", "train",
        {"n_epochs": 4, "saved_weights": weights, "init": "kmeans",
         "km_n_init": 2, "figures": "True", "update_interval": 1},
        {"batch_size": "64", "lr": "0.0005", "n_clusters": "3",
         "gamma": "0.001", "tol": "0.0"},
    )
    [out] = workflow.train(config)
    import time

    deadline = time.time() + 60  # figures save on a background thread
    wanted = [
        os.path.join(out["savepath_run"], name, f"{name}_004.png")
        for name in ("T-SNE", "Gallery", "LatentSpace", "CDF", "PDF")
    ]
    while not all(os.path.exists(w) for w in wanted) and time.time() < deadline:
        time.sleep(0.5)
    for w in wanted:
        assert os.path.exists(w), w


def test_predict_on_mesh_rounds_batch_to_device_multiple(cube):
    """Ram-mode predict on a mesh with a batch size that does not divide
    over the devices (e.g. dataset smaller than PREDICT_BATCH) must round
    the batch up, not crash (review r3)."""
    import spectrogram_cube_clustering_tpu as scc

    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")
    mesh = scc.core.make_data_mesh()
    config = _make_config(
        root, cube_path, "AEC", "predict",
        {"saved_weights": weights, "batch_size_predict": "60"},
    )
    res = workflow.predict(config, mesh=mesh)
    assert res["z"].shape[0] == 384


def test_gmm_fit_on_mesh(cube):
    """gmm_fit with a mesh runs the distributed EM and matches artifacts."""
    root, cube_path, _ = cube
    import spectrogram_cube_clustering_tpu as scc

    # need Z_AEC.npy: quick AEC train + predict
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")
    workflow.predict(
        _make_config(root, cube_path, "AEC", "predict",
                     {"saved_weights": weights})
    )

    config = _make_config(
        root, cube_path, "GMM", "fit",
        {"saved_weights": weights, "km_n_init": 4, "km_max_iter": 50},
        {"n_clusters": "3"},
    )
    mesh = scc.core.make_data_mesh()
    [out] = workflow.gmm_fit(config, figures=False, mesh=mesh)
    assert out["centroids"].shape == (3, 9)
    assert os.path.exists(os.path.join(out["savepath_run"], "labels.npy"))


def test_gmm_km_metrics_diagnostics(cube):
    """km_metrics=True sweeps K diagnostics: cluster_stats.csv + .png in
    the GMM exp dir (VERDICT r1 #8; reference knob utils.py:43)."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")
    workflow.predict(
        _make_config(root, cube_path, "AEC", "predict",
                     {"saved_weights": weights})
    )

    config = _make_config(
        root, cube_path, "GMM", "fit",
        {"saved_weights": weights, "km_n_init": 4, "km_max_iter": 50,
         "km_metrics": "True"},
        {"n_clusters": "2, 3"},
    )
    outs = workflow.gmm_fit(config, figures=True)
    assert len(outs) == 2
    import pandas as pd

    csv = os.path.join(config.savepath_exp, "cluster_stats.csv")
    assert os.path.exists(csv)
    df = pd.read_csv(csv)
    assert list(df["n_clusters"]) == [2, 3]
    assert set(df.columns) >= {
        "inertia", "silhouette", "gap_gaussian", "gap_uniform"
    }
    assert np.isfinite(df[["inertia", "silhouette"]].to_numpy()).all()
    assert os.path.exists(
        os.path.join(config.savepath_exp, "cluster_stats.png")
    )


def test_gmm_figure_context_loads_artifacts(tmp_path, capsys):
    """DEC-predict comparative figures load the GMM run's labels/centroids
    + the AEC prediction's Z_AEC (reference models.py:659-695), falling
    back to self-comparison when artifacts are missing."""
    import types

    from spectrogram_cube_clustering_tpu.workflow.predict import (
        _gmm_figure_context,
    )

    rng = np.random.default_rng(0)
    m, k, d = 50, 3, 9
    z_dec = rng.normal(size=(m, d)).astype(np.float32)
    labels_dec = rng.integers(0, k, m)
    cents_dec = rng.normal(size=(k, d)).astype(np.float32)

    run_dir = tmp_path / "Run_x"
    weights = run_dir / "AEC_Params_Final"
    weights.mkdir(parents=True)
    config = types.SimpleNamespace(saved_weights=str(weights))

    # no artifacts -> self-comparison fallback, announced loudly (the
    # reference crashes here; a silent degrade would hide a mis-pointed
    # saved_weights behind plausible single-model figures)
    z_a, labels_a, cents_a = _gmm_figure_context(
        config, k, z_dec, labels_dec, cents_dec
    )
    np.testing.assert_array_equal(z_a, z_dec)
    assert "fall back" in capsys.readouterr().out

    # real artifacts -> loaded
    gmm_dir = run_dir / "GMM" / f"n_clusters={k}"
    gmm_dir.mkdir(parents=True)
    labels_gmm = rng.integers(0, k, m)
    cents_gmm = rng.normal(size=(k, d)).astype(np.float32)
    z_aec = rng.normal(size=(m, d)).astype(np.float32)
    np.save(gmm_dir / "labels.npy", labels_gmm)
    np.save(gmm_dir / "centroids.npy", cents_gmm)
    pred_dir = run_dir / "Prediction"
    pred_dir.mkdir()
    np.save(pred_dir / "Z_AEC.npy", z_aec)
    z_a, labels_a, cents_a = _gmm_figure_context(
        config, k, z_dec, labels_dec, cents_dec
    )
    np.testing.assert_array_equal(z_a, z_aec)
    np.testing.assert_array_equal(labels_a, labels_gmm)
    np.testing.assert_array_equal(cents_a, cents_gmm)

    # mismatched lengths -> fallback, not a crash
    np.save(gmm_dir / "labels.npy", labels_gmm[: m - 5])
    z_a, labels_a, _ = _gmm_figure_context(
        config, k, z_dec, labels_dec, cents_dec
    )
    assert len(labels_a) == m

    # GMM artifacts present but Z_AEC missing -> WHOLE fallback: pairing
    # AEC-space GMM labels/centroids with DEC latents would draw
    # meaningless distances
    np.save(gmm_dir / "labels.npy", labels_gmm)
    os.remove(pred_dir / "Z_AEC.npy")
    z_a, labels_a, cents_a = _gmm_figure_context(
        config, k, z_dec, labels_dec, cents_dec
    )
    np.testing.assert_array_equal(z_a, z_dec)
    np.testing.assert_array_equal(labels_a, labels_dec)
    np.testing.assert_array_equal(cents_a, cents_dec)


def test_attention_faithful_config_key(cube):
    """`attention_faithful = False` in the .ini opts out of the
    reference's conv*sigmoid(conv) attention quirk (networks.py:163-168)
    for both AEC and DEC model construction."""
    from spectrogram_cube_clustering_tpu.workflow.train import make_model

    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1, "attention_faithful": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    assert make_model(config).attention_faithful is False
    assert make_model(config, n_clusters=3).attention_faithful is False
    # default stays the weight-port-parity quirk
    config2 = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1},
        {"batch_size": "64", "lr": "0.001"},
    )
    assert make_model(config2).attention_faithful is True
    # (the two variants' functional difference — 1-channel vs 8-channel
    # gating, 84- vs 672-wide Dense — is pinned in test_torch_parity.py)


def test_z_pointer_roundtrip_and_relocation(tmp_path):
    """GMM latent provenance is a Z_AEC.path pointer, not a multi-MB copy
    (review r3); the relative pointer survives relocating the whole tree."""
    from spectrogram_cube_clustering_tpu.workflow.train import (
        resolve_z_aec_path, write_z_pointer,
    )

    tree = tmp_path / "Outputs"
    src_dir = tree / "Run" / "Prediction"
    gmm_dir = tree / "Run" / "GMM" / "n_clusters=3"
    src_dir.mkdir(parents=True)
    gmm_dir.mkdir(parents=True)
    z = np.arange(18, dtype=np.float32).reshape(2, 9)
    np.save(src_dir / "Z_AEC.npy", z)

    write_z_pointer(str(gmm_dir), str(src_dir / "Z_AEC.npy"))
    resolved = resolve_z_aec_path(str(gmm_dir))
    np.testing.assert_array_equal(np.load(resolved), z)

    # relocate the whole tree: the relative pointer still resolves
    moved = tmp_path / "Elsewhere"
    tree.rename(moved)
    resolved = resolve_z_aec_path(str(moved / "Run" / "GMM" / "n_clusters=3"))
    assert resolved is not None
    np.testing.assert_array_equal(np.load(resolved), z)

    # an old-layout local copy wins over the pointer
    local_dir = moved / "Run" / "GMM" / "n_clusters=3"
    np.save(local_dir / "Z_AEC.npy", z + 1)
    np.testing.assert_array_equal(
        np.load(resolve_z_aec_path(str(local_dir))), z + 1
    )


def test_attention_faithful_checkpoint_roundtrip(cube):
    """An AEC pretrained with attention_faithful=False transfers into a
    matching DEC (672- vs 84-wide encoder head), and a flag mismatch at
    load time raises a clear error instead of an opaque jitted shape
    failure (review r3)."""
    from spectrogram_cube_clustering_tpu.workflow.train import (
        load_aec_params, make_model,
    )

    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1, "early_stopping": "False",
         "attention_faithful": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    saved = os.path.join(out["savepath_run"], "AEC_Params_Final")

    # consistent flag: encoder/decoder transfer into the 672-wide DEC
    dec_config = _make_config(
        root, cube_path, "DEC", "train",
        {"saved_weights": saved, "attention_faithful": "False"},
        {"batch_size": "64", "lr": "0.001", "n_clusters": "3",
         "gamma": "0.01", "tol": "0.001"},
    )
    model = make_model(dec_config, n_clusters=3)
    params = load_aec_params(dec_config, model)
    assert params["encoder"]["Dense_0"]["kernel"].shape[0] == 672

    # mismatched flag (checkpoint False, config default True): loud error
    bad_config = _make_config(
        root, cube_path, "DEC", "train",
        {"saved_weights": saved},
        {"batch_size": "64", "lr": "0.001", "n_clusters": "3",
         "gamma": "0.01", "tol": "0.001"},
    )
    bad_model = make_model(bad_config, n_clusters=3)
    with pytest.raises(ValueError, match="attention_faithful"):
        load_aec_params(bad_config, bad_model)


def test_unet_arch_workflow(cube):
    """arch=UNet trains and predicts end-to-end (16-d latent); the DEC
    stage intentionally rejects UNet weights (SURVEY.md §2.3 defect 2)."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1, "early_stopping": "False", "arch": "UNet"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    assert np.isfinite(out["history"]["train"][0])
    weights = os.path.join(out["savepath_run"], "AEC_Params_Final")
    assert os.path.isdir(weights)
    # 16-d bottleneck latent without paying a second UNet compile:
    # checkpoint restores into the UNet template (the predict path's core)
    import jax

    from spectrogram_cube_clustering_tpu import models as _m
    from spectrogram_cube_clustering_tpu.train.checkpoint import restore

    import jax.numpy as jnp

    template = _m.UNet().init(
        jax.random.key(0), jnp.zeros((1, 4, 101, 1))
    )["params"]
    params = restore(weights, template)
    assert params["Dense_3"]["kernel"].shape[1] == 16

    # DEC must refuse to inherit UNet weights with a clear error
    config = _make_config(
        root, cube_path, "DEC", "train",
        {"n_epochs": 1, "saved_weights": weights, "init": "rand",
         "arch": "UNet"},
        {"batch_size": "64", "lr": "0.001", "n_clusters": "3",
         "gamma": "0.001", "tol": "0.0"},
    )
    with pytest.raises(ValueError, match="arch must be 'AEC'"):
        workflow.train(config)


def test_stream_dec_train_artifacts(cube, capsys):
    """Streaming DEC training writes the same artifact set as the ram
    path — including DEC_Params_Initial (review r3). n_clusters sits at
    the PARAMETERS (config) level, not in the hp sweep: the stream path
    must honor the same fallback chain as the ram path (review r3 —
    it previously hardcoded 5)."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 1, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")
    config = _make_config(
        root, cube_path, "DEC", "train",
        {"n_epochs": 1, "saved_weights": weights, "init": "kmeans",
         "km_n_init": 2, "loadmode": "stream", "workers": "2",
         "n_clusters": 3, "show": "True"},
        {"batch_size": "64", "lr": "0.001", "gamma": "0.001", "tol": "0.0"},
    )
    [dec] = workflow.train(config)
    run = dec["savepath_run"]
    for name in ("DEC_Params_Initial", "DEC_Params_Final"):
        assert os.path.isdir(os.path.join(run, name)), name
    assert os.path.exists(os.path.join(run, "DEC_history.csv"))
    assert dec["state"].params["centroids"].shape[0] == 3
    # show=True must reach the stream loop's verbose flag (review r3.2:
    # the workflow dropped it, so multi-hour stream runs printed nothing)
    assert "Epoch [1/1]" in capsys.readouterr().out


def test_stream_dec_predict_with_figures(cube):
    """Streaming DEC predict generates subsample metrics and figures."""
    root, cube_path, _ = cube
    # quick AEC -> DEC weights
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")
    config = _make_config(
        root, cube_path, "DEC", "train",
        {"n_epochs": 1, "saved_weights": weights, "init": "kmeans",
         "km_n_init": 2},
        {"batch_size": "64", "lr": "0.001", "n_clusters": "3",
         "gamma": "0.001", "tol": "0.0"},
    )
    [dec] = workflow.train(config)
    dec_weights = os.path.join(dec["savepath_run"], "DEC_Params_Final")

    config = _make_config(
        root, cube_path, "DEC", "predict",
        {"saved_weights": dec_weights, "loadmode": "stream",
         "workers": "2", "silh_max_samples": 100},
    )
    res = workflow.predict(config)
    pred = config.savepath_exp
    for f in ("q_DEC.npy", "labels_DEC.npy", "cluster_performance.csv",
              "silh_score_Z.png"):
        assert os.path.exists(os.path.join(pred, f)), f
    assert res["labels"].shape[0] == 384
    # figure filenames are IDENTICAL to the ram path's (review r3: stream
    # used to write Gallery/Gallery.png etc. via save_figures defaults)
    for d, f in (("T-SNE", "t-SNE.png"), ("Gallery", "gallery.png"),
                 ("LatentSpace", "latent.png"), ("CDF", "cdf.png"),
                 ("PDF", "pdf.png")):
        assert os.path.exists(os.path.join(pred, d, f)), f"{d}/{f}"
    # Xr is streamed into an on-disk .npy, not accumulated in host RAM
    xr = np.load(os.path.join(pred, "Xr_DEC.npy"), mmap_mode="r")
    assert xr.shape == (384, 1, 4, 101)
    assert np.isfinite(np.asarray(xr[:4])).all()


# ---- H5 event-catalog workflow (datafiletype='h5') ------------------------

H5_M, H5_CLASSES = 96, 3


@pytest.fixture(scope="module")
def h5_catalog(tmp_path_factory):
    """Synthetic RIS-style catalog: raw 88x101 spectrograms (row 87 = time
    vector, col 0 = freq vector) with 3 planted classes as distinct
    frequency-band energies, plus per-event waveform traces."""
    import json

    import h5py

    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("h5wf")
    path = str(root / "catalog.h5")
    labels = np.arange(H5_M) % H5_CLASSES
    spec = rng.normal(scale=0.1, size=(H5_M, 88, 101))
    for i, lab in enumerate(labels):
        band = slice(5 + 25 * lab, 25 + 25 * lab)
        spec[i, band, 1:] += 3.0 + rng.normal(scale=0.2)
    spec[:, 87, 1:] = np.arange(100)
    spec[:, 0:87, 0] = np.linspace(0, 10, 87)
    trace = rng.normal(size=(H5_M, 200))
    meta = [
        json.dumps({"Station": "DR01", "StartTime": "2015-01-01 00:00:00.0"})
        for _ in range(H5_M)
    ]
    with h5py.File(path, "w") as f:
        g = f.require_group("/4.0")
        g.create_dataset("Spectrogram", data=spec)
        g.create_dataset("Trace", data=trace)
        g.create_dataset(
            "Catalogue", data=np.array(meta, dtype=h5py.string_dtype())
        )
    return root, path, labels


def test_h5_catalog_workflow(h5_catalog, monkeypatch):
    """The reference's SeismicDataset flow (utils.py:211-287, dormant in
    production.py:29-34) runs end-to-end: AEC train/predict, GMM fit, DEC
    train/predict on (87, 100) event windows, with the gallery's waveform
    rows read from /4.0/Trace (plotting.py:369-380)."""
    root, h5_path, true_labels = h5_catalog

    def mk(model, mode, parameters=None, hp=None):
        params = dict(parameters or {})
        params["datafiletype"] = "h5"
        universal = {
            "fname_dataset": h5_path,
            "savepath": str(root / "Outputs"),
            "configpath": str(root / "Config"),
            "transform": "sample_norm_cent",
        }
        p = {"model": model, "mode": mode, "tb": "False", "show": "False"}
        p.update(params)
        ini = scc_utils.config_training(universal, p, hp)
        config = scc_utils.load_config(ini)
        config.init_exp_env()
        return config

    # ---- AEC pretrain on (87, 100) windows -----------------------------
    config = mk(
        "AEC", "train",
        {"n_epochs": 15, "early_stopping": "False"},
        {"batch_size": "32", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    assert tuple(config.input_hw) == (87, 100)
    hist = aec["history"]["train"]
    assert hist[-1] < hist[0]
    run_dir = aec["savepath_run"]
    weights = os.path.join(run_dir, "AEC_Params_Final")

    # ---- AEC predict: artifacts carry the H5 geometry ------------------
    config = mk("AEC", "predict", {"saved_weights": weights})
    workflow.predict(config)
    pred = os.path.join(run_dir, "Prediction")
    assert np.load(os.path.join(pred, "Z_AEC.npy")).shape == (H5_M, 9)
    assert np.load(os.path.join(pred, "Xr_AEC.npy")).shape == (
        H5_M, 1, 87, 100
    )

    # ---- GMM fit -------------------------------------------------------
    config = mk(
        "GMM", "fit",
        {"saved_weights": weights, "km_n_init": 4, "km_max_iter": 100},
        {"n_clusters": str(H5_CLASSES)},
    )
    workflow.gmm_fit(config, figures=False)

    # ---- DEC refine (init=load) ---------------------------------------
    config = mk(
        "DEC", "train",
        {"n_epochs": 3, "saved_weights": weights, "init": "load",
         "update_interval": -1},
        {"batch_size": "32", "lr": "0.0005", "n_clusters": str(H5_CLASSES),
         "gamma": "0.01", "tol": "0.0"},
    )
    [dec] = workflow.train(config)
    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(true_labels, dec["labels"])
    assert nmi > 0.5, f"DEC NMI vs planted classes too low: {nmi:.3f}"
    dec_weights = os.path.join(dec["savepath_run"], "DEC_Params_Final")

    # ---- DEC predict with figures: gallery gets waveform rows ---------
    from spectrogram_cube_clustering_tpu.analysis import plotting

    seen = {}
    orig_gallery = plotting.cluster_gallery

    def spy(*args, **kwargs):
        seen["traces"] = kwargs.get("traces")
        return orig_gallery(*args, **kwargs)

    monkeypatch.setattr(plotting, "cluster_gallery", spy)
    config = mk("DEC", "predict", {"saved_weights": dec_weights})
    out = workflow.predict(config, figures=True)
    assert out["labels"].shape == (H5_M,)
    gallery = os.path.join(
        dec["savepath_run"], "Prediction", "Gallery", "gallery.png"
    )
    assert os.path.exists(gallery)
    # the trace reader was handed to the gallery and reads /4.0/Trace
    assert seen["traces"] is not None
    assert seen["traces"](0).shape == (200,)


def test_h5_np_catalog_load(h5_catalog, tmp_path):
    """h5_ftype='np' loads convert_h5_to_np dumps (M, 1, 87, 100) directly
    — no second crop pass (round-3 review: the np path re-ran the crop
    pipeline, yielding 5-D windows and input_hw=(1, 86))."""
    import types

    from spectrogram_cube_clustering_tpu.data.h5 import convert_h5_to_np
    from spectrogram_cube_clustering_tpu.workflow.data import load_windows

    _, h5_path, _ = h5_catalog
    dest = str(tmp_path / "cat.npy")
    convert_h5_to_np(h5_path, dest)
    config = types.SimpleNamespace(
        fname_dataset=dest, datafiletype="h5", h5_ftype="np"
    )
    tra, val = load_windows(config, split=True)
    assert tra.shape[1:] == (87, 100, 1)
    assert len(tra) + len(val) == H5_M
    assert tuple(config.input_hw) == (87, 100)

    # anything not shaped like a catalog dump is rejected loudly
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((4, 87, 100), np.float32))
    config.fname_dataset = bad
    with pytest.raises(ValueError, match="h5_ftype='np'"):
        load_windows(config, split=False)


def test_packed_arch_workflow(cube):
    """arch=packed (MXU-packed AEC/DEC, models/packed.py — 1.42x the
    parity AEC on v5e) runs the full AEC->DEC train/predict flow with
    weight transfer and artifacts intact."""
    root, cube_path, true_labels = cube
    config = _make_config(
        root, cube_path, "AEC", "train",
        {"n_epochs": 8, "early_stopping": "False", "arch": "packed"},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    assert aec["history"]["train"][-1] < aec["history"]["train"][0]
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")

    config = _make_config(
        root, cube_path, "DEC", "train",
        {"n_epochs": 2, "saved_weights": weights, "init": "kmeans",
         "km_n_init": 2, "km_max_iter": 20, "arch": "packed"},
        {"batch_size": "64", "lr": "0.0005", "n_clusters": str(N_CLASSES),
         "gamma": "0.01", "tol": "0.0"},
    )
    [dec] = workflow.train(config)
    assert dec["labels"].shape == (len(true_labels),)
    dec_weights = os.path.join(dec["savepath_run"], "DEC_Params_Final")

    config = _make_config(
        root, cube_path, "DEC", "predict",
        {"saved_weights": dec_weights, "arch": "packed"},
    )
    out = workflow.predict(config, figures=False)
    assert out["q"].shape == (len(true_labels), N_CLASSES)
    assert os.path.exists(
        os.path.join(dec["savepath_run"], "Prediction", "labels_DEC.npy")
    )


def test_h5_stream_loadmode(h5_catalog):
    """loadmode='stream' over an H5 catalog: blocks stream through the
    prefetch loader (data.h5.H5StreamDataset) for both training and
    prediction, with the same artifact names as the ram path."""
    root, h5_path, _ = h5_catalog
    universal = {
        "fname_dataset": h5_path,
        "savepath": str(root / "Outputs"),
        "configpath": str(root / "Config"),
        "transform": "sample_norm_cent",
    }

    def mk(model, mode, parameters=None, hp=None):
        p = {"model": model, "mode": mode, "tb": "False", "show": "False",
             "datafiletype": "h5", "loadmode": "stream", "workers": "2",
             "h5_stream_block": "16"}
        p.update(parameters or {})
        ini = scc_utils.config_training(universal, p, hp)
        config = scc_utils.load_config(ini)
        config.init_exp_env()
        return config

    config = mk(
        "AEC", "train",
        {"n_epochs": 2, "early_stopping": "False"},
        {"batch_size": "32", "lr": "0.001"},
    )
    [out] = workflow.train(config)
    assert tuple(config.input_hw) == (87, 100)
    assert np.isfinite(out["history"]["train"]).all()
    run_dir = out["savepath_run"]
    assert os.path.isdir(os.path.join(run_dir, "AEC_Params_Final"))

    config = mk(
        "AEC", "predict",
        {"saved_weights": os.path.join(run_dir, "AEC_Params_Final"),
         "silh_max_samples": 50},
    )
    res = workflow.predict(config, figures=False)
    assert res["z"].shape == (H5_M, 9)
    assert os.path.exists(
        os.path.join(run_dir, "Prediction", "Z_AEC.npy")
    )


def test_waveform_workflow(tmp_path):
    """datafiletype='waveform' end-to-end: raw .npy waveform -> on-device
    STFT windows (signal.stft.spectrogram_windows; the Pallas kernel on
    TPU backends, XLA here) -> AEC train/predict -> GMM -> DEC recovers
    planted band-limited-noise classes. On-chip twin:
    benchmarks/waveform_workflow_tpu.py (NMI 1.0000)."""
    seg, n_seg, k = 4_000, 30, 3
    rng = np.random.default_rng(11)
    segs, seg_labels = [], []
    for s in range(n_seg):
        c = s % k
        spec = np.zeros(seg // 2 + 1, np.complex128)
        lo, hi = (10 + 25 * c) * seg // 200, (10 + 25 * c + 15) * seg // 200
        spec[lo:hi] = rng.normal(size=hi - lo) + 1j * rng.normal(size=hi - lo)
        w = np.fft.irfft(spec, n=seg).astype(np.float32)
        segs.append(w / (np.abs(w).max() + 1e-9))
        seg_labels.append(c)
    wave = np.concatenate(segs)
    wave_path = str(tmp_path / "wave.npy")
    np.save(wave_path, wave)
    n_windows = ((len(wave) - 200) // 100 + 1) // 4
    truth = np.asarray([seg_labels[(400 * w) // seg] for w in range(n_windows)])

    def mk(model, mode, parameters=None, hp=None):
        params = dict(parameters or {})
        params["datafiletype"] = "waveform"
        universal = {
            "fname_dataset": wave_path,
            "savepath": str(tmp_path / "Outputs"),
            "configpath": str(tmp_path / "Config"),
            "transform": "sample_norm_cent",
        }
        p = {"model": model, "mode": mode, "tb": "False", "show": "False"}
        p.update(params)
        ini = scc_utils.config_training(universal, p, hp)
        config = scc_utils.load_config(ini)
        config.init_exp_env()
        return config

    config = mk(
        "AEC", "train",
        {"n_epochs": 10, "early_stopping": "False"},
        {"batch_size": "32", "lr": "0.001"},
    )
    [aec] = workflow.train(config)
    assert tuple(config.input_hw) == (4, 101)
    assert aec["history"]["train"][-1] < aec["history"]["train"][0]
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")

    config = mk("AEC", "predict", {"saved_weights": weights})
    workflow.predict(config)
    pred = os.path.join(aec["savepath_run"], "Prediction")
    assert np.load(os.path.join(pred, "Z_AEC.npy")).shape == (n_windows, 9)

    config = mk(
        "GMM", "fit",
        {"saved_weights": weights, "km_n_init": 4, "km_max_iter": 100},
        {"n_clusters": str(k)},
    )
    workflow.gmm_fit(config, figures=False)

    config = mk(
        "DEC", "train",
        {"n_epochs": 3, "saved_weights": weights, "init": "load",
         "update_interval": -1},
        {"batch_size": "32", "lr": "0.0005", "n_clusters": str(k),
         "gamma": "0.01", "tol": "0.0"},
    )
    [dec] = workflow.train(config)
    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(truth, dec["labels"])
    assert nmi > 0.9, f"waveform DEC NMI vs planted bands too low: {nmi:.3f}"


def test_waveform_stream_loadmode_matches_ram(tmp_path):
    """loadmode='stream' over a raw waveform (WaveformStreamDataset's
    host-STFT items) trains AEC to losses matching the ram path's
    on-device-STFT windows. Window values are bit-level-pinned by
    TestWaveformStreamDataset's item-parity test; here the train/val
    SPLITS differ by design (ram permutes windows, stream permutes
    stream items — same as the zarr tier), so losses agree at the
    few-percent level, not bitwise."""
    rng = np.random.default_rng(5)
    wave = rng.normal(size=(60_000,)).astype(np.float32)
    wave_path = str(tmp_path / "wave.npy")
    np.save(wave_path, wave)

    def run(loadmode, sub):
        universal = {
            "fname_dataset": wave_path,
            "savepath": str(tmp_path / sub / "Outputs"),
            "configpath": str(tmp_path / sub / "Config"),
            "transform": "sample_norm_cent",
        }
        params = {
            "model": "AEC", "mode": "train", "tb": "False", "show": "False",
            "datafiletype": "waveform", "n_epochs": 3,
            "early_stopping": "False", "loadmode": loadmode,
        }
        if loadmode == "stream":
            params["workers"] = "2"
            params["waveform_stream_block"] = "32"
        ini = scc_utils.config_training(
            universal, params, {"batch_size": "32", "lr": "0.001"}
        )
        config = scc_utils.load_config(ini)
        config.init_exp_env()
        [out] = workflow.train(config)
        return out["history"]["train"]

    ram = run("ram", "ram")
    stream = run("stream", "stream")
    assert len(ram) == len(stream) == 3
    assert stream[-1] <= stream[0]
    np.testing.assert_allclose(stream, ram, rtol=0.02)


def test_waveform_stream_predict_matches_ram(tmp_path):
    """Stream predict over a raw waveform: identical latents and window
    count to the ram path (the host-STFT items equal the on-device
    windows, so PREDICT — no split involved — must match bitwise-close)."""
    rng = np.random.default_rng(6)
    wave = rng.normal(size=(40_000,)).astype(np.float32)
    wave_path = str(tmp_path / "wave.npy")
    np.save(wave_path, wave)

    def mk(mode, parameters):
        universal = {
            "fname_dataset": wave_path,
            "savepath": str(tmp_path / "Outputs"),
            "configpath": str(tmp_path / "Config"),
            "transform": "sample_norm_cent",
        }
        p = {"model": "AEC", "mode": mode, "tb": "False", "show": "False",
             "datafiletype": "waveform"}
        p.update(parameters)
        ini = scc_utils.config_training(
            universal, p, {"batch_size": "32", "lr": "0.001"}
        )
        config = scc_utils.load_config(ini)
        config.init_exp_env()
        return config

    config = mk("train", {"n_epochs": 2, "early_stopping": "False"})
    [out] = workflow.train(config)
    weights = os.path.join(out["savepath_run"], "AEC_Params_Final")

    res_stream = workflow.predict(mk("predict", {
        "saved_weights": weights, "loadmode": "stream", "workers": "2",
        "waveform_stream_block": "16",
    }))
    res_ram = workflow.predict(mk("predict", {"saved_weights": weights}))
    n_windows = ((40_000 - 200) // 100 + 1) // 4
    assert res_stream["z"].shape == (n_windows, 9)
    np.testing.assert_allclose(res_stream["z"], res_ram["z"], atol=1e-4)


def test_gallery_traces_np_catalog_returns_none():
    """h5_ftype='np' sources are .npy dumps with no /4.0/Trace — the
    gallery must omit the waveform row instead of crashing predict after
    the full forward pass (review r3.2)."""
    from types import SimpleNamespace

    from spectrogram_cube_clustering_tpu.workflow.predict import (
        _gallery_traces,
    )

    cfg = SimpleNamespace(
        datafiletype="h5", h5_ftype="np", fname_dataset="catalog.npy"
    )
    assert _gallery_traces(cfg) is None
    cfg_zarr = SimpleNamespace(datafiletype="zarr", fname_dataset="c.zarr")
    assert _gallery_traces(cfg_zarr) is None


def test_predict_rejects_gmm_model(cube):
    """mode='predict' with model='GMM' fails with a clear error instead
    of feeding the (M, 9) latent array into the image pipeline (same
    guard train() has — review r3.2)."""
    root, cube_path, _ = cube
    config = _make_config(
        root, cube_path, "GMM", "predict",
        {"saved_weights": str(root / "nope")},
    )
    with pytest.raises(ValueError, match="mode='predict'"):
        workflow.predict(config)
