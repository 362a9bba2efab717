"""Analysis tests: LabelCatalogue statistics, math utils, figure smoke."""

import numpy as np
import pandas as pd
import pytest

from spectrogram_cube_clustering_tpu import utils as scc_utils
from spectrogram_cube_clustering_tpu.analysis import LabelCatalogue, plotting


@pytest.fixture
def catalogue(tmp_path, rng):
    n = 60
    times = pd.date_range("2015-01-01", "2016-09-01", periods=n)
    det = pd.DataFrame(
        {
            "Index": np.arange(n),
            "network": "XH",
            "station": [["DR01", "DR02", "RS01"][i % 3] for i in range(n)],
            "channel": "HHZ",
            "dt_on": times - pd.Timedelta(seconds=5),
            "dt_peak": times,
            "dt_off": times + pd.Timedelta(seconds=5),
            "fs": 100.0,
            "delta": 0.01,
            "npts": 1000,
            "STA": 1.0,
            "LTA": 10.0,
            "on": 2.5,
            "off": 1.0,
            "spec_start": 0,
            "spec_stop": 100,
            "peak": rng.lognormal(size=n),
            "unit": "m/s",
            "idx": np.arange(n),
        }
    )
    lab = pd.DataFrame({"label": np.arange(n) % 4})
    det_path = str(tmp_path / "detections.csv")
    lab_path = str(tmp_path / "labels.csv")
    det.to_csv(det_path, index=False)
    lab.to_csv(lab_path, index=False)
    return LabelCatalogue([det_path, lab_path])


class TestLabelCatalogue:
    def test_build_df(self, catalogue):
        assert list(catalogue.label_list) == [0, 1, 2, 3]
        assert set(catalogue.station_list) == {"DR01", "DR02", "RS01"}
        # merge drops detection internals, keeps analysis columns
        for col in ("station", "label", "peak", "idx"):
            assert col in catalogue.df.columns
        assert "STA" not in catalogue.df.columns
        assert catalogue.df.index.name == "time"

    def test_amplitude_statistics(self, catalogue):
        stats = catalogue.amplitude_statistics()
        assert list(stats.index) == [1, 2, 3, 4]
        assert (stats["Maximum"] >= stats["Median"]).all()

    def test_gather_counts(self, catalogue):
        counts = catalogue.gather_counts("DR01", freq="month")
        assert counts.values.sum() == (catalogue.df["station"] == "DR01").sum()
        with pytest.raises(ValueError):
            catalogue.gather_counts("DR01", freq="minute")

    def test_gather_counts_honors_label_subset(self, catalogue):
        """The label_list argument used to be validated then discarded
        (review r3)."""
        counts = catalogue.gather_counts("DR01", freq="month",
                                         label_list=[0, 2])
        assert list(counts.columns) == ["1", "3"]

    def test_apply_threshold_accepts_int(self, catalogue):
        """An integer threshold used to silently skip filtering
        (review r3)."""
        n_all = len(catalogue.df)
        thr = int(np.ceil(catalogue.df["peak"].median()))
        filtered = catalogue.apply_threshold(thr)
        assert 0 < len(filtered) < n_all
        assert (filtered["peak"] >= thr).all()

    def test_seasonal_statistics(self, catalogue):
        s = catalogue.seasonal_statistics()
        assert set(s.columns) == {"JFM", "JJA"}
        full = catalogue.seasonal_statistics(mode="full")
        assert full["total"].sum() == len(catalogue.df)

    def test_station_statistics(self, catalogue):
        s = catalogue.station_statistics()
        assert s["N"].sum() == len(catalogue.df)
        assert s["percent"].sum() == pytest.approx(100.0)

    def test_threshold(self, catalogue):
        n_before = len(catalogue.df)
        catalogue.apply_threshold(float(catalogue.df["peak"].median()))
        assert 0 < len(catalogue.df) < n_before


class TestMathUtils:
    def test_fractional_distance(self, rng):
        x = rng.normal(size=(5, 3))
        y = rng.normal(size=(5, 3))
        d2 = scc_utils.fractional_distance(x, y, 2.0)
        np.testing.assert_allclose(d2, np.linalg.norm(x - y, axis=1), rtol=1e-12)

    def test_distance_matrix(self, rng):
        x = rng.normal(size=(4, 3))
        d = scc_utils.distance_matrix(x, x, 2.0)
        assert d.shape == (4, 4)
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-12)
        np.testing.assert_allclose(d, d.T, rtol=1e-12)

    def test_measure_class_inertia(self, rng):
        z = rng.normal(size=(10, 2))
        c = np.zeros((2, 2))
        inertia = scc_utils.measure_class_inertia(z, c, 2)
        want = np.sum(z**2)
        np.testing.assert_allclose(inertia, [want, want], rtol=1e-12)

    def test_measure_label_change(self):
        l1 = np.array([0, 0, 1, 1, 2, 2])
        l2 = np.array([0, 1, 1, 2, 2, 0])
        df = scc_utils.measure_label_change(l1, l2)
        assert df.loc[0, "N_j"] == 1       # one 0 -> 1
        assert df.loc["total", "N_j"] == 3  # three changes total
        # Reference layout (utils.py:1045-1051): column "Class j+1" holds
        # the migration histogram FROM original class j, indexed by
        # destination: class 1 -> class 2 lands at row 2 of "Class 2".
        assert df.loc[2, "Class 2"] == 1
        assert df.loc[1, "Class 1"] == 1  # class 0 -> class 1

    def test_measure_label_change_gapped_labels(self):
        """Gapped label values (an empty class) used to misalign the
        histogram bins with the class columns and drop out-of-range
        destinations (review r2)."""
        l1 = np.array([0, 0, 1, 3])
        l2 = np.array([0, 3, 1, 3])  # one migration: 0 -> 3
        df = scc_utils.measure_label_change(l1, l2)
        assert df.loc["total", "N_j"] == 1
        # column "Class 1" = FROM class 0, destination row label 3
        assert df.loc[3, "Class 1"] == 1
        assert df.loc[3, "Class 4"] == 0


class TestFigures:
    """Smoke tests: every figure family renders and returns a Figure."""

    def test_all_families(self, rng):
        m, k, d = 40, 3, 9
        z = rng.normal(size=(m, d)).astype(np.float32)
        labels = rng.integers(0, k, size=m)
        centroids = rng.normal(size=(k, d)).astype(np.float32)
        x = rng.normal(size=(m, 4, 101, 1)).astype(np.float32)
        emb = rng.normal(size=(m, 2)).astype(np.float32)
        scores = rng.uniform(-1, 1, size=m)

        figs = [
            plotting.view_tsne(emb, labels, "t"),
            plotting.view_silhscore(scores, labels, k, "DEC"),
            plotting.view_history_aec(
                {"epoch": [1, 2], "train": [1.0, 0.5], "validation": [1.1, 0.6]}
            ),
            plotting.view_history_dec(
                {"iteration": [1, 2], "total": [1, 0.5],
                 "reconstruction": [0.9, 0.4], "clustering": [0.1, 0.1]},
                {"iteration": [1, 2], "delta": [0.5, 0.1]},
            ),
            plotting.view_specgram_training(x[:4], x[:4]),
            plotting.view_latent_space(z, labels),
            plotting.view_centroid_output(rng.normal(size=(k, 4, 101, 1))),
            plotting.cluster_gallery(
                x, z, labels, centroids,
                centroid_decodes=rng.normal(size=(k, 4, 101, 1)),
            ),
            plotting.view_class_cdf(z, labels, centroids),
            plotting.view_class_pdf(z, labels, centroids),
            plotting.view_cluster_stats([2, 3, 4], [10, 5, 3], [0.3, 0.5, 0.4]),
            plotting.view_dec_output(x[0], labels[0], x[0], z[0]),
        ]
        for fig in figs:
            assert fig is not None
            assert len(fig.axes) >= 1

    def test_reference_fidelity_families(self, rng):
        """VERDICT r1 #5: comparative view_latent_space, cluster_gallery
        percentile ranks + waveform rows, view_class_pdf_paper,
        label_offset, gap-statistic cluster stats."""
        m, k, d = 60, 4, 9
        z_a = rng.normal(size=(m, d)).astype(np.float32)
        z_b = rng.normal(size=(m, d)).astype(np.float32)
        labels_a = rng.integers(0, k, size=m)
        labels_b = rng.integers(0, k, size=m)
        cents_a = rng.normal(size=(k, d)).astype(np.float32)
        cents_b = rng.normal(size=(k, d)).astype(np.float32)
        x = rng.normal(size=(m, 4, 101, 1)).astype(np.float32)
        traces = rng.normal(size=(m, 199)).astype(np.float32)

        fig = plotting.view_latent_space(
            z_a, labels_a, z_b, labels_b, cents_a, cents_b
        )
        # per class: 2 models x (centroid strip + sorted Z) + 2 colorbars
        assert len(fig.axes) >= 4 * k + 2

        fig = plotting.view_class_pdf_paper(
            z_a, z_b, labels_a, labels_b, cents_a, cents_b, k
        )
        assert len(fig.axes) == 4 * k  # broken-axis quad per centroid

        fig = plotting.view_class_pdf(
            z_a, labels_a, z_b, labels_b, cents_a, cents_b
        )
        assert len(fig.axes) == 2 * k  # GMM-over-DEC pair per centroid

        fig = plotting.view_class_cdf(
            z_a, labels_a, z_b, labels_b, cents_a, cents_b
        )
        assert len(fig.axes) == k
        assert all(len(ax.lines) == 2 for ax in fig.axes)  # GMM + DEC

        fig = plotting.cluster_gallery(
            x, z_b, labels_b, cents_b,
            centroid_decodes=rng.normal(size=(k, 4, 101, 1)),
            traces=traces,
        )
        # k centroid cells (3 axes) + k*6 sample cells (3 axes) + colorbars
        assert len(fig.axes) >= k * 3 + 2
        # waveform row actually drawn: some axes contain a Line2D
        assert any(len(ax.lines) for ax in fig.axes)

        fig = plotting.view_cluster_stats(
            [2, 3, 4], [10, 5, 3], [0.3, 0.5, 0.4],
            gap_g=[0.1, 0.4, 0.3], gap_u=[0.2, 0.5, 0.35],
        )
        assert len(fig.axes) == 3  # host + silhouette + gap twin axes

        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot([0, 1], [0, 1e-6])
        ax.set_ylabel("Loss")
        plotting.label_offset(ax, "y")
        assert "1e" in ax.get_ylabel() or "e-" in ax.get_ylabel()
        plt.close(fig)

    def test_empty_class_does_not_crash_figures(self, rng):
        """A class that argmax(q) never assigns (collapsed cluster) must
        not crash the comparative figures — the class panels are drawn
        per CENTROID, empty selections just render empty."""
        m, k, d = 40, 4, 9
        z_a = rng.normal(size=(m, d)).astype(np.float32)
        z_b = rng.normal(size=(m, d)).astype(np.float32)
        # class 2 has zero samples in both labelings
        labels_a = rng.choice([0, 1, 3], size=m)
        labels_b = rng.choice([0, 1, 3], size=m)
        cents_a = rng.normal(size=(k, d)).astype(np.float32)
        cents_b = rng.normal(size=(k, d)).astype(np.float32)
        x = rng.normal(size=(m, 4, 101, 1)).astype(np.float32)

        fig = plotting.view_latent_space(
            z_a, labels_a, z_b, labels_b, cents_a, cents_b
        )
        assert len(fig.axes) >= 4 * k + 2
        for f in (
            plotting.view_class_cdf(z_a, labels_a, z_b, labels_b,
                                    cents_a, cents_b),
            plotting.view_class_pdf(z_a, labels_a, z_b, labels_b,
                                    cents_a, cents_b),
            plotting.view_class_pdf_paper(z_a, z_b, labels_a, labels_b,
                                          cents_a, cents_b, k),
            plotting.cluster_gallery(
                x, z_b, labels_b, cents_b,
                centroid_decodes=rng.normal(size=(k, 4, 101, 1)),
            ),
        ):
            assert f is not None

    def test_gallery_centroids_indexed_by_label_not_column(self, rng):
        """With class 1 empty, column 2 shows class 2: its centroid strip
        must be centroids[2], not centroids[1] (column position)."""
        m, k, d = 20, 3, 9
        z = rng.normal(size=(m, d)).astype(np.float32)
        labels = rng.choice([0, 2], size=m)
        centroids = np.arange(k * d, dtype=np.float32).reshape(k, d)
        x = rng.normal(size=(m, 4, 101, 1)).astype(np.float32)
        fig = plotting.cluster_gallery(x, z, labels, centroids)
        # first image of each top cell is the centroid strip (1, d);
        # collect the strips actually drawn in the top row
        strips = [
            im.get_array().data.reshape(-1)
            for ax in fig.axes
            for im in ax.get_images()
            if im.get_array().shape[:2] == (1, d)
        ]
        assert any(np.allclose(s, centroids[2]) for s in strips)
        assert not any(np.allclose(s, centroids[1]) for s in strips)

    def test_percentile_rank_indices_reference_ladder(self):
        np.testing.assert_array_equal(
            plotting._percentile_rank_indices(25000, 6),
            [0, 4999, 9999, 14999, 19999, 24999],
        )
        small = plotting._percentile_rank_indices(10, 6)
        assert small[0] == 0 and small[-1] == 9 and len(small) == 6
        tiny = plotting._percentile_rank_indices(3, 6)
        assert tiny.tolist() == [0, 1, 2]

    def test_extended_families(self, rng, tmp_path):
        m, k, d = 30, 3, 9
        z = rng.normal(size=(m, d)).astype(np.float32)
        labels = rng.integers(0, k, size=m)
        centroids = rng.normal(size=(k, d)).astype(np.float32)
        x = rng.normal(size=(m, 4, 101, 1)).astype(np.float32)
        scores = rng.uniform(-1, 1, size=m)

        assert plotting.compare_silhscore(scores, scores, labels, k) is not None
        assert plotting.centroid_dashboard(z, labels, centroids) is not None
        assert plotting.view_specgram(
            x[0], tvec=np.arange(101), fvec=np.arange(4)
        ) is not None

        figs = plotting.analyze_dec(
            x, z, z, labels, labels, centroids, centroids,
            rng.normal(size=(m, 2)), epoch=4,
        )
        assert set(figs) == {"T-SNE", "Gallery", "LatentSpace", "CDF", "PDF"}
        paths = plotting.save_figures(figs, str(tmp_path), epoch=4)
        import os

        assert len(paths) == 5
        for p in paths:
            assert os.path.exists(p) and p.endswith("_004.png")
        t = plotting.plotter_async(figs, str(tmp_path / "async"))
        # non-daemon: the interpreter must join the writer at shutdown so
        # final-epoch PNGs can't be truncated by process exit
        assert not t.daemon
        t.join(timeout=30)
        assert not t.is_alive()

    def test_view_detections(self, rng, tmp_path):
        import json

        import h5py

        path = str(tmp_path / "cat.h5")
        with h5py.File(path, "w") as f:
            g = f.require_group("/4.0")
            g.create_dataset("Spectrogram", data=rng.normal(size=(4, 88, 101)))
            g.create_dataset("Trace", data=rng.normal(size=(4, 100)))
            g.create_dataset(
                "Catalogue",
                data=np.array(
                    [json.dumps({"Station": "DR01"})] * 4,
                    dtype=h5py.string_dtype(),
                ),
            )
        fig = plotting.view_detections(path, [0, 2])
        assert fig is not None


class TestEnvironmentCatalogue:
    @pytest.fixture
    def env_tree(self, tmp_path, rng):
        """Synthetic environment data tree matching the reference layout
        (environment.py:33-52)."""
        from scipy.io import savemat

        root = tmp_path / "env"
        for sub in ("Tide", "Ice", "Meteo", "ERA5", "Seismo"):
            (root / sub).mkdir(parents=True)
        # tide: (stations, T) at 10-min cadence over the deployment
        n_t = len(pd.date_range("2014-12-01", "2016-12-01", freq="10min"))
        savemat(
            str(root / "Tide" / "RIS_Tides.mat"),
            {"z": rng.normal(size=(34, n_t))},
        )
        # sea ice: daily concentration
        days = pd.date_range("2014-12-01", "2016-11-30", freq="D")
        savemat(
            str(root / "Ice" / "NSIDC-0051.mat"),
            {
                "C": rng.uniform(0, 1, size=(len(days), 1)),
                "date": np.array(
                    [d.strftime("%Y-%m-%d") for d in days], dtype=object
                ),
            },
        )
        # meteo: AWS-format space-separated file
        rows = ["Year JulianDay Month Day Time temp x wind_spd"]
        for d in days[:100]:
            rows.append(
                f"{d.year} {d.dayofyear} {d.month:02d} {d.day:02d} "
                f"{d.strftime('%H%M')} {rng.normal():.1f} 0 "
                f"{abs(rng.normal()):.1f}"
            )
        (root / "Meteo" / "AWS01.txt").write_text("\n".join(rows) + "\n")
        # ERA5 csv
        pd.DataFrame(
            {
                "time": days[:50],
                "net_sfc_melt_energy": rng.uniform(0, 5, size=50),
            }
        ).to_csv(root / "ERA5" / "SDM_ERA5.csv", index=False)
        # KPDR wave amplitude .mat with MATLAB datenums
        dn0 = 735934.0  # ~2014-12-02
        savemat(
            str(root / "Seismo" / "KPDR_0.001_0.04.mat"),
            {
                "t": dn0 + np.arange(0, 10, 1 / 144.0),
                "a": rng.uniform(size=1440),
            },
        )
        return str(root)

    def test_build_df(self, env_tree):
        from spectrogram_cube_clustering_tpu.analysis import (
            EnvironmentCatalogue,
        )

        cat = EnvironmentCatalogue("DR02", "AWS01", env_tree)
        for col in ("tide", "sea_ice_conc", "temp", "wind_spd",
                    "net_sfc_melt_energy", "wave_ampl"):
            assert col in cat.df.columns, col
        assert cat.df["tide"].notna().sum() > 1000
        # interpolation filled the daily ice series between samples
        assert cat.df["sea_ice_conc"].notna().sum() > len(
            cat.df["sea_ice_conc"].dropna().index.normalize().unique()
        )

    def test_view_series(self, env_tree, tmp_path, rng):
        from spectrogram_cube_clustering_tpu.analysis import plotting

        n = 50
        times = pd.date_range("2015-01-01", "2015-06-01", periods=n)
        det = pd.DataFrame(
            {
                "network": "XH", "station": "DR02", "dt_peak": times,
                "peak": rng.lognormal(size=n), "unit": "m/s",
                "idx": np.arange(n),
            }
        )
        lab = pd.DataFrame({"label": np.arange(n) % 3})
        det_path = str(tmp_path / "det.csv")
        lab_path = str(tmp_path / "lab.csv")
        det.to_csv(det_path, index=False)
        lab.to_csv(lab_path, index=False)
        fig = plotting.view_series(
            "DR02", "AWS01", env_tree, det_path, lab_path, freq="month"
        )
        assert fig is not None and len(fig.axes) >= 2


def test_remaining_figure_variants(rng):
    x = rng.normal(size=(5, 4, 101, 1)).astype(np.float32)
    z = rng.normal(size=(30, 9)).astype(np.float32)
    labels = rng.integers(0, 3, size=30)
    centroids = rng.normal(size=(3, 9)).astype(np.float32)
    assert plotting.compare_images(x, x, idx=1) is not None
    assert plotting.centroid_distances(z, labels, centroids) is not None
