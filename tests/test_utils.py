"""Utils unit tests: history CSVs, config edge cases, project env."""

import os

import numpy as np
import pandas as pd
import pytest

from spectrogram_cube_clustering_tpu import utils as scc_utils


class TestHistory:
    def test_add_to_history(self):
        h = {}
        scc_utils.add_to_history(h, {"epoch": 1, "loss": 0.5})
        scc_utils.add_to_history(h, {"epoch": 2, "loss": 0.25})
        assert h == {"epoch": [1, 2], "loss": [0.5, 0.25]}

    def test_save_history_first_key_is_index(self, tmp_path):
        path = str(tmp_path / "h.csv")
        df = scc_utils.save_history(
            {"Epoch": [1, 2], "Training MSE": [0.5, 0.25]}, path
        )
        assert df.index.name == "Epoch"
        loaded = pd.read_csv(path, index_col=0)
        np.testing.assert_allclose(loaded["Training MSE"], [0.5, 0.25])

    def test_save_labels_overwrites_on_rerun(self, tmp_path):
        """Deliberate fix vs the reference's append mode (utils.py:
        1199-1209): re-running predict into the same artifact dir must
        not duplicate rows while labels_*.npy overwrite (review r3.2)."""
        rows = [{"idx": 0, "label": 2}, {"idx": 1, "label": 0}]
        fname = scc_utils.save_labels(rows, str(tmp_path))
        scc_utils.save_labels(rows, str(tmp_path))
        df = pd.read_csv(fname)
        assert len(df) == 2
        assert list(df.columns) == ["idx", "label"]

    def test_save_labels_array_form_matches_dict_form(self, tmp_path):
        """The array fast path (no per-window dict spike at cube scale)
        writes byte-compatible idx,label CSV."""
        labels = np.array([2, 0, 1, 1], np.int64)
        fname = scc_utils.save_labels(labels, str(tmp_path))
        df = pd.read_csv(fname)
        assert list(df.columns) == ["idx", "label"]
        np.testing.assert_array_equal(df["idx"], np.arange(4))
        np.testing.assert_array_equal(df["label"], labels)
        # overwrite applies to the array form too
        scc_utils.save_labels(labels[:2], str(tmp_path))
        assert len(pd.read_csv(fname)) == 2

    def test_save_labels_serial_suffix(self, tmp_path):
        fname = scc_utils.save_labels(
            [{"idx": 0, "label": 1}], str(tmp_path), serial="20260101T000000"
        )
        assert fname.endswith("Labels20260101T000000.csv")

    def test_save_labels_empty_rows(self, tmp_path):
        """Empty rows are a no-op instead of IndexError on the
        coordinator (review r3 — the one process owning file artifacts
        dying would hang the next multi-process barrier)."""
        import os

        fname = scc_utils.save_labels([], str(tmp_path))
        assert not os.path.exists(fname)


class TestConfigEdges:
    def test_parse_nclusters(self):
        assert scc_utils.parse_nclusters(
            "Outputs/Models/DEC/Exp1/Run_Clusters=7_BatchSz=64/DEC_Params_Final"
        ) == 7
        with pytest.raises(ValueError):
            scc_utils.parse_nclusters("no-clusters-here")

    def test_calc_tuning_runs_and_sweep(self, tmp_path):
        ini = scc_utils.config_training(
            {"configpath": str(tmp_path), "fname_dataset": "x",
             "savepath": str(tmp_path)},
            {"model": "DEC", "mode": "train", "tb": "False"},
            {"batch_size": "32, 64", "lr": "0.001",
             "n_clusters": "3, 5, 7", "gamma": "0.001", "tol": "0.001"},
        )
        config = scc_utils.load_config(ini)
        assert config.runs == 6
        combos = list(config.sweep())
        assert len(combos) == 6
        assert combos[0]["batch_size"] == 32
        assert {c["n_clusters"] for c in combos} == {3, 5, 7}

    def test_aec_sweep_restricted_to_batch_lr(self, tmp_path):
        ini = scc_utils.config_training(
            {"configpath": str(tmp_path), "fname_dataset": "x",
             "savepath": str(tmp_path)},
            {"model": "AEC", "mode": "train", "tb": "False"},
            {"batch_size": "32", "lr": "0.001", "n_clusters": "3, 5",
             "gamma": "0.1", "tol": "0.1"},
        )
        config = scc_utils.load_config(ini)
        # reference drops non-(batch_size, lr) hp for AEC (utils.py:167-168)
        assert set(config.hp) == {"batch_size", "lr"}
        assert config.runs == 1

    def test_bool_coercion_false_string(self, tmp_path):
        ini = scc_utils.config_training(
            {"configpath": str(tmp_path), "fname_dataset": "x",
             "savepath": str(tmp_path)},
            {"model": "AEC", "mode": "train", "tb": "False",
             "resume": "False", "figures": "False",
             "early_stopping": "True"},
            {"batch_size": "8", "lr": "0.001"},
        )
        config = scc_utils.load_config(ini)
        assert config.resume is False
        assert config.figures is False
        assert config.early_stopping is True

    def test_init_project_env(self, tmp_path, capsys):
        a = str(tmp_path / "A")
        scc_utils.init_project_env(a, a)
        out = capsys.readouterr().out
        assert os.path.isdir(a)
        assert "created" in out and "exists" in out
