"""CLI tests: run-dc end-to-end from an .ini file, console tools."""

import json
import os

import h5py
import numpy as np
import pytest

from spectrogram_cube_clustering_tpu import cli, utils as scc_utils
from spectrogram_cube_clustering_tpu.data import CubeSpec, make_synthetic_cube

SPEC = CubeSpec(chunk_size=32, window_rows=4, channel_start=1, channel_stride=2)


def test_run_dc_aec_train(tmp_path, capsys):
    cube_path = str(tmp_path / "cube.zarr")
    make_synthetic_cube(
        cube_path, n_time=32 * 11, n_channels=9, n_freq=101,
        n_classes=3, chunk_rows=32, seed=5, spec=SPEC,
    )
    ini = scc_utils.config_training(
        {
            "fname_dataset": cube_path,
            "savepath": str(tmp_path / "Outputs"),
            "configpath": str(tmp_path / "Config"),
            "transform": "sample_norm_cent",
            "chunk_size": SPEC.chunk_size,
            "channel_start": SPEC.channel_start,
            "channel_stride": SPEC.channel_stride,
        },
        {
            "model": "AEC", "mode": "train", "n_epochs": 2,
            "early_stopping": "False", "tb": "False", "show": "False",
            "send_message": "True",
        },
        {"batch_size": "32", "lr": "0.001"},
    )
    config = cli.run_dc(init_path=ini)
    out = capsys.readouterr().out
    assert "Executing training mode for AEC" in out
    assert "completed" in out
    # notify fix: completion file written (reference's notify is broken)
    assert os.path.exists(os.path.join(config.savepath_exp, "COMPLETED.txt"))
    runs = [d for d in os.listdir(config.savepath_exp) if d.startswith("Run_")]
    assert len(runs) == 1


def test_run_dc_missing_dataset(tmp_path):
    ini = scc_utils.config_training(
        {
            "fname_dataset": str(tmp_path / "nope.zarr"),
            "savepath": str(tmp_path / "Outputs"),
            "configpath": str(tmp_path / "Config"),
        },
        {"model": "AEC", "mode": "train", "n_epochs": 1, "tb": "False"},
        {"batch_size": "8", "lr": "0.001"},
    )
    with pytest.raises(ValueError, match="Dataset file not found"):
        cli.run_dc(init_path=ini)


def test_console_tools(tmp_path, capsys):
    path = str(tmp_path / "cat.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        g = f.require_group("/4.0")
        g.create_dataset("Spectrogram", data=rng.normal(size=(6, 88, 101)))
        g.create_dataset("Trace", data=rng.normal(size=(6, 50)))
        g.create_dataset(
            "Catalogue",
            data=np.array(
                [json.dumps({"Station": "DR01"})] * 6,
                dtype=h5py.string_dtype(),
            ),
        )
    cli.query_h5size([path])
    assert "6 samples with dimensions [88,101]" in capsys.readouterr().out

    cli.generate_sample_index(["4", path, str(tmp_path)])
    assert os.path.exists(os.path.join(str(tmp_path), "TraValIndex_M=4.pkl"))

    dest = str(tmp_path / "cat.npy")
    cli.convert_h5_to_np([path, "--dest", dest])
    assert np.load(dest).shape == (6, 1, 87, 100)

    sub = str(tmp_path / "sub.h5")
    cli.extract_h5dataset([path, sub, "--include", '["DR01"]'])
    with h5py.File(sub, "r") as f:
        assert f["/4.0/Spectrogram"].shape[0] == 5  # indices 1..5


def test_run_dc_full_pipeline(tmp_path):
    """All three stages dispatched through run-dc .ini configs."""
    cube_path = str(tmp_path / "cube.zarr")
    make_synthetic_cube(
        cube_path, n_time=32 * 11, n_channels=9, n_freq=101,
        n_classes=3, chunk_rows=32, seed=6, spec=SPEC,
    )
    universal = {
        "fname_dataset": cube_path,
        "savepath": str(tmp_path / "Outputs"),
        "configpath": str(tmp_path / "Config"),
        "transform": "sample_norm_cent",
        "chunk_size": SPEC.chunk_size,
        "channel_start": SPEC.channel_start,
        "channel_stride": SPEC.channel_stride,
    }

    def run(params, hp):
        p = {"tb": "False", "show": "False"}
        p.update(params)
        ini = scc_utils.config_training(universal, p, hp)
        return cli.run_dc(init_path=ini)

    cfg = run(
        {"model": "AEC", "mode": "train", "n_epochs": 2,
         "early_stopping": "False"},
        {"batch_size": "32", "lr": "0.001"},
    )
    runs = [d for d in os.listdir(cfg.savepath_exp) if d.startswith("Run_")]
    weights = os.path.join(cfg.savepath_exp, runs[0], "AEC_Params_Final")

    cfg = run({"model": "AEC", "mode": "predict", "saved_weights": weights}, None)
    assert os.path.exists(os.path.join(cfg.savepath_exp, "Z_AEC.npy"))

    cfg = run(
        {"model": "GMM", "mode": "fit", "saved_weights": weights,
         "km_n_init": 4, "km_max_iter": 50},
        {"n_clusters": "3"},
    )
    gmm_dir = os.path.join(cfg.savepath_exp, "n_clusters=3")
    assert os.path.exists(os.path.join(gmm_dir, "centroids.npy"))

    cfg = run(
        {"model": "DEC", "mode": "train", "n_epochs": 1,
         "saved_weights": weights, "init": "load"},
        {"batch_size": "32", "lr": "0.0005", "n_clusters": "3",
         "gamma": "0.001", "tol": "0.0"},
    )
    runs = [d for d in os.listdir(cfg.savepath_exp) if d.startswith("Run_")]
    assert os.path.isdir(os.path.join(cfg.savepath_exp, runs[0], "DEC_Params_Final"))


def test_driver_chain(tmp_path):
    """The console drivers (reference root scripts AEC_train.py /
    GMM_centroids.py / DEC_train.py) drive the whole 3-stage workflow
    through their argparse surface, incl. the cube-geometry flags."""
    from spectrogram_cube_clustering_tpu.cli import drivers

    cube_path = str(tmp_path / "cube.zarr")
    make_synthetic_cube(
        cube_path, n_time=32 * 11, n_channels=9, n_freq=101,
        n_classes=3, chunk_rows=32, seed=9, spec=SPEC,
    )
    geom = [
        "--chunk-size", "32", "--channel-start", "1",
        "--channel-stride", "2", "--project", str(tmp_path),
    ]

    drivers.aec_train(
        [cube_path, *geom, "--epochs", "2", "--batch-size", "32",
         "--lr", "0.001", "--no-early-stopping"]
    )
    aec_exp = _latest_exp(tmp_path, "AEC")
    runs = [d for d in os.listdir(aec_exp) if d.startswith("Run_")]
    weights = os.path.join(aec_exp, runs[0], "AEC_Params_Final")
    assert os.path.isdir(weights)

    run_dir = os.path.dirname(weights)
    drivers.aec_predict([cube_path, *geom, weights])
    # predictions nest under the weights' run dir (utils.py:67-69)
    assert os.path.exists(
        os.path.join(run_dir, "Prediction", "Z_AEC.npy")
    )

    drivers.gmm_centroids(
        [cube_path, *geom, weights, "--n-clusters", "3",
         "--km-n-init", "4", "--km-max-iter", "50"]
    )
    # GMM artifacts nest under the AEC run (utils.py:70-72)
    assert os.path.exists(
        os.path.join(run_dir, "GMM", "n_clusters=3", "centroids.npy")
    )

    drivers.dec_train(
        [cube_path, *geom, weights, "--epochs", "1", "--batch-size", "32",
         "--lr", "0.0005", "--n-clusters", "3", "--tol", "0.0",
         "--init", "load"]
    )
    dec_exp = _latest_exp(tmp_path, "DEC")
    runs = [d for d in os.listdir(dec_exp) if d.startswith("Run_")]
    dec_weights = os.path.join(dec_exp, runs[0], "DEC_Params_Final")
    assert os.path.isdir(dec_weights)

    drivers.dec_predict([cube_path, *geom, dec_weights])
    assert os.path.exists(
        os.path.join(os.path.dirname(dec_weights), "Prediction",
                     "labels_DEC.npy")
    )


def test_driver_resume_reuses_run_tree(tmp_path):
    """aec-train --resume must land in the EXISTING Exp tree where the
    snapshot lives (review r3.2: init_exp_env minted a fresh Exp dir, so
    --resume silently restarted from epoch 0)."""
    from spectrogram_cube_clustering_tpu.cli import drivers

    cube_path = str(tmp_path / "cube.zarr")
    make_synthetic_cube(
        cube_path, n_time=32 * 11, n_channels=9, n_freq=101,
        n_classes=3, chunk_rows=32, seed=13, spec=SPEC,
    )
    geom = [
        "--chunk-size", "32", "--channel-start", "1",
        "--channel-stride", "2", "--project", str(tmp_path),
    ]
    common = [cube_path, *geom, "--batch-size", "32", "--lr", "0.001",
              "--no-early-stopping"]

    drivers.aec_train([*common, "--epochs", "1"])
    base = os.path.join(str(tmp_path), "Outputs", "Models", "AEC")
    exps = [d for d in os.listdir(base) if d.startswith("Exp")]
    assert len(exps) == 1
    run = [d for d in os.listdir(os.path.join(base, exps[0]))
           if d.startswith("Run_")][0]
    snap = os.path.join(base, exps[0], run, "tmp", "SNAPSHOT")
    assert os.path.isdir(snap)  # epoch-1 snapshot on disk

    drivers.aec_train([*common, "--epochs", "3", "--resume"])
    exps_after = [d for d in os.listdir(base) if d.startswith("Exp")]
    assert exps_after == exps  # reused, not re-minted
    import pandas as pd

    hist = pd.read_csv(os.path.join(base, exps[0], run, "AEC_history.csv"))
    assert len(hist) == 3  # epoch 1 from run 1 + epochs 2-3 resumed


def _latest_exp(project, model):
    """Newest Exp* dir for a model under the driver project tree."""
    base = os.path.join(str(project), "Outputs", "Models", model)
    exps = sorted(os.listdir(base))
    return os.path.join(base, exps[-1])


def test_run_dc_main_argv(tmp_path):
    """run-dc's argv branch (the installed console script path)."""
    cube_path = str(tmp_path / "cube.zarr")
    make_synthetic_cube(
        cube_path, n_time=32 * 11, n_channels=9, n_freq=101,
        n_classes=3, chunk_rows=32, seed=4, spec=SPEC,
    )
    ini = scc_utils.config_training(
        {
            "fname_dataset": cube_path,
            "savepath": str(tmp_path / "Outputs"),
            "configpath": str(tmp_path / "Config"),
            "transform": "sample_norm_cent",
            "chunk_size": SPEC.chunk_size,
            "channel_start": SPEC.channel_start,
            "channel_stride": SPEC.channel_stride,
        },
        {"model": "AEC", "mode": "train", "n_epochs": 1,
         "early_stopping": "False", "tb": "False", "show": "False",
         "send_message": "True"},
        {"batch_size": "32", "lr": "0.001"},
    )
    config = cli.run_dc(argv=[ini])
    assert os.path.exists(os.path.join(config.savepath_exp, "COMPLETED.txt"))


def test_build_cube_roundtrip(tmp_path, rng):
    """build-cube writes a Zarr cube the window reader can consume."""
    from spectrogram_cube_clustering_tpu.data import CubeSpec, ZarrCubeDataset

    # 8900 samples -> 88 frames: a whole number of 44-row chunks (the
    # reader rejects geometries the wrap formula would mis-map)
    wave = rng.normal(size=(3, 8_900)).astype(np.float32)
    wpath = str(tmp_path / "wave.npy")
    np.save(wpath, wave)
    dest = str(tmp_path / "built.zarr")
    cli.build_cube([wpath, dest, "--chunk-rows", "44"])
    spec = CubeSpec(chunk_size=44, window_rows=4, channel_start=0,
                    channel_stride=1, time_num=1, time_den=1)
    ds = ZarrCubeDataset(dest, spec=spec)
    n_frames = (8_900 - 200) // 100 + 1
    assert ds.shape == (n_frames, 3, 101)
    assert len(ds) == 2 * 3  # 2 chunks per channel x 3 channels
    item = ds.item(0)
    assert item.shape == (11, 4, 101, 1)
    # item -> (start, channel) mapping round-trips without wrap artifacts
    np.testing.assert_allclose(
        np.asarray(ds.item(2)).reshape(44, 101),
        np.asarray(ds.array[0:44, 1, :]), rtol=1e-6,
    )
