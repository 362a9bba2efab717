"""Quickstart: the full 3-stage workflow on a synthetic cube.

Builds a small synthetic spectrogram Zarr cube with planted classes, then
runs AEC pretrain -> AEC predict -> GMM centroid fit -> DEC refine -> DEC
predict through the same `.ini` config surface the CLI uses, and prints
the clustering quality against the planted labels.

    python examples/quickstart.py [workdir]

Runs on whatever accelerator JAX finds (TPU or CPU); a few minutes on CPU.
"""

import os
import sys
import tempfile

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu.data import CubeSpec, make_synthetic_cube

K = 3
SPEC = CubeSpec(chunk_size=64, window_rows=4, channel_start=1, channel_stride=2)


def make_config(root, cube, model, mode, parameters=None, hp=None):
    universal = {
        "fname_dataset": cube,
        "savepath": os.path.join(root, "Outputs"),
        "configpath": os.path.join(root, "Config"),
        "transform": "sample_norm_cent",
        "chunk_size": SPEC.chunk_size,
        "channel_start": SPEC.channel_start,
        "channel_stride": SPEC.channel_stride,
    }
    params = {"model": model, "mode": mode, "tb": "False", "show": "True"}
    params.update(parameters or {})
    ini = scc.utils.config_training(universal, params, hp)
    config = scc.utils.load_config(ini)
    config.init_exp_env()
    config.save_exp_config()
    return config


def main(root):
    cube = os.path.join(root, "cube.zarr")
    truth = make_synthetic_cube(
        cube, n_time=64 * 11, n_channels=25, n_freq=101,
        n_classes=K, chunk_rows=64, seed=3, spec=SPEC,
    )
    print(f"Synthetic cube with {len(truth)} windows, {K} planted classes.")

    # 1) AEC pretrain
    config = make_config(
        root, cube, "AEC", "train",
        {"n_epochs": 25, "early_stopping": "True", "patience": 10},
        {"batch_size": "64", "lr": "0.001"},
    )
    [aec] = scc.workflow.train(config)
    weights = os.path.join(aec["savepath_run"], "AEC_Params_Final")

    # 1b) AEC predict -> Z_AEC.npy
    scc.workflow.predict(
        make_config(root, cube, "AEC", "predict", {"saved_weights": weights})
    )

    # 2) GMM centroid fit
    scc.workflow.gmm_fit(
        make_config(
            root, cube, "GMM", "fit",
            {"saved_weights": weights, "km_n_init": 10, "km_max_iter": 200},
            {"n_clusters": str(K)},
        )
    )

    # 3) DEC refine with the GMM init
    config = make_config(
        root, cube, "DEC", "train",
        {"n_epochs": 20, "saved_weights": weights, "init": "load"},
        {"batch_size": "64", "lr": "0.0005", "n_clusters": str(K),
         "gamma": "0.01", "tol": "0.001"},
    )
    [dec] = scc.workflow.train(config)

    from sklearn.metrics import normalized_mutual_info_score

    nmi = normalized_mutual_info_score(truth, dec["labels"])
    print(f"\nDEC labels vs planted classes: NMI = {nmi:.3f}")
    print(f"Artifacts under {os.path.join(root, 'Outputs')}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="scc_"))
