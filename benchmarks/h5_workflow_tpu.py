"""End-to-end workflow from an H5 EVENT CATALOG on the local chip.

Closes the source matrix on real hardware: the zarr-cube and raw-waveform
5-stage CLI runs are chip-validated (benchmarks/RESULTS.md; NMI 0.991 /
1.0000) — this runs the SAME protocol from a synthetic `.h5` catalog at
the reference's RIS geometry (`datafiletype='h5'`, 88x101 raw rows crop
to (87, 100) event windows; Cluster/utils.py:211-287 SeismicDataset,
reference flow utils.py:211-287 + production.py:29-34), planting classes
as frequency-band energies and scoring the final DEC labels against the
planted truth.

    python benchmarks/h5_workflow_tpu.py [workdir]
"""

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from spectrogram_cube_clustering_tpu import cli
from spectrogram_cube_clustering_tpu import utils as scc_utils

N_EVENTS = 4096
N_CLASSES = 5


def build_catalog(path: str):
    """Synthetic RIS-style catalog: raw 88x101 spectrograms (row 87 = the
    embedded time vector, col 0 = the freq vector — cropped off by
    data.h5.crop_specgram exactly like the reference's SpecgramCrop,
    utils.py:233-236) with planted classes as distinct frequency-band
    energies, plus per-event traces for the gallery."""
    import h5py

    rng = np.random.default_rng(11)
    labels = np.arange(N_EVENTS) % N_CLASSES
    spec = rng.normal(scale=0.1, size=(N_EVENTS, 88, 101)).astype(np.float64)
    for i, lab in enumerate(labels):
        band = slice(4 + 16 * lab, 18 + 16 * lab)
        spec[i, band, 1:] += 3.0 + rng.normal(scale=0.2)
    spec[:, 87, 1:] = np.arange(100)
    spec[:, 0:87, 0] = np.linspace(0, 10, 87)
    trace = rng.normal(size=(N_EVENTS, 200))
    meta = [
        json.dumps({"Station": "DR01", "StartTime": "2015-01-01 00:00:00.0"})
        for _ in range(N_EVENTS)
    ]
    with h5py.File(path, "w") as f:
        g = f.require_group("/4.0")
        g.create_dataset("Spectrogram", data=spec)
        g.create_dataset("Trace", data=trace)
        g.create_dataset(
            "Catalogue", data=np.array(meta, dtype=h5py.string_dtype())
        )
    return labels


def ini_for(workdir, h5_path, model, mode, extra_p, hp):
    universal = {
        "fname_dataset": h5_path,
        "savepath": os.path.join(workdir, "Outputs"),
        "configpath": os.path.join(workdir, "Config"),
        "transform": "sample_norm_cent",
    }
    params = {"model": model, "mode": mode, "tb": "False", "show": "False",
              "datafiletype": "h5"}
    params.update(extra_p)
    return scc_utils.config_training(universal, params, hp)


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="h5_workflow_")
    h5_path = os.path.join(workdir, "catalog.h5")
    t_all = time.perf_counter()
    truth = build_catalog(h5_path)
    print(f"catalog: {N_EVENTS} events x (87, 100) windows, "
          f"{N_CLASSES} planted classes", flush=True)

    def stage(name, ini):
        t0 = time.perf_counter()
        config = cli.run_dc(init_path=ini)
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return config

    c = stage("AEC train", ini_for(
        workdir, h5_path, "AEC", "train",
        {"n_epochs": 12, "early_stopping": "False"},
        {"batch_size": "512", "lr": "0.001"},
    ))
    [aec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    aec_w = os.path.join(aec_run, "AEC_Params_Final")

    stage("AEC predict", ini_for(
        workdir, h5_path, "AEC", "predict", {"saved_weights": aec_w},
        {"batch_size": "512", "lr": "0.001"},
    ))

    stage("GMM fit", ini_for(
        workdir, h5_path, "GMM", "fit",
        {"saved_weights": aec_w, "figures": "False"},
        {"n_clusters": str(N_CLASSES)},
    ))

    c = stage("DEC train", ini_for(
        workdir, h5_path, "DEC", "train",
        {"n_epochs": 12, "saved_weights": aec_w, "init": "load"},
        {"batch_size": "512", "lr": "0.0005", "n_clusters": str(N_CLASSES),
         "gamma": "0.01", "tol": "0.001"},
    ))
    [dec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    dec_w = os.path.join(dec_run, "DEC_Params_Final")

    c = stage("DEC predict", ini_for(
        workdir, h5_path, "DEC", "predict",
        {"saved_weights": dec_w, "tsne_backend": "jax"},
        {"batch_size": "512", "lr": "0.001"},
    ))
    pred = c.savepath_exp
    labels = np.load(os.path.join(pred, "labels_DEC.npy"))
    assert len(labels) == len(truth), (len(labels), len(truth))

    from sklearn.metrics import normalized_mutual_info_score as nmi

    score = float(nmi(truth, labels))
    print(f"NMI vs planted truth: {score:.4f}; "
          f"total {time.perf_counter() - t_all:.1f}s; artifacts in {workdir}",
          flush=True)
    assert score > 0.9, f"h5 workflow NMI regressed: {score}"
    return score


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
