"""Workflow driver entry points: `aec-train`, `gmm-centroids`, `dec-train`.

Parity targets: the reference's root scripts AEC_train.py / GMM_centroids.py
/ DEC_train.py, which build UNIVERSAL/PARAMETERS/HYPERPARAMETERS dicts,
write `Config/init_<mode>.ini`, and call production (AEC_train.py:30-77,
GMM_centroids.py:96-119, DEC_train.py:58-90). These drivers expose the same
knobs through argparse and run the same 3-stage workflow.

Batch sizes here count spectrogram *windows*, not Zarr items: the
reference's AEC default bsz=5 means 5 chunks x 1439 windows = 7195 windows
per optimizer step (ZarrDataLoader.py:72, models.py:147-148). Window-level
batching is what the TPU layout wants; defaults are lane-friendly
equivalents.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from spectrogram_cube_clustering_tpu import utils as _utils
from spectrogram_cube_clustering_tpu import workflow


def _common(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("dataset", help="path to the Zarr cube")
    parser.add_argument(
        "--project", default=".", help="project folder for Config/ + Outputs/"
    )
    parser.add_argument("--transform", default="sample_norm_cent")
    parser.add_argument("--tb", action="store_true", help="start TensorBoard")
    parser.add_argument("--tbport", type=int, default=6999)
    parser.add_argument("--verbose", action="store_true")
    # cube geometry (defaults = the reference cube's 5758-row chunking,
    # ZarrDataLoader.py:46-57); exposed so non-reference cubes — e.g.
    # build-cube output with custom chunking — work without a full .ini
    parser.add_argument("--chunk-size", type=int, default=None)
    parser.add_argument("--window-rows", type=int, default=None)
    parser.add_argument("--channel-start", type=int, default=None)
    parser.add_argument("--channel-stride", type=int, default=None)


def _universal(args) -> dict:
    out = {
        "fname_dataset": args.dataset,
        "savepath": os.path.join(args.project, "Outputs"),
        "configpath": os.path.join(args.project, "Config"),
        "transform": args.transform,
    }
    for key in ("chunk_size", "window_rows", "channel_start",
                "channel_stride"):
        val = getattr(args, key)
        if val is not None:
            out[key] = val
    return out


def _run(universal, parameters, hp) -> None:
    parameters.setdefault("send_message", "False")
    ini = _utils.config_training(universal, parameters, hp)
    print(f"Config written to {os.path.abspath(ini)}")
    config = _utils.load_config(ini)
    config.init_exp_env()
    config.save_exp_config()
    if getattr(config, "tb", False):
        config.start_tensorboard()
    if config.mode == "train":
        workflow.train(config)
    elif config.mode == "fit":
        workflow.gmm_fit(config)
    elif config.mode == "predict":
        workflow.predict(config)


def aec_train(argv: Optional[list] = None) -> None:
    """AEC pretraining (reference AEC_train.py: 20 epochs, lr 1e-4,
    early stopping patience 10)."""
    parser = argparse.ArgumentParser(description=aec_train.__doc__)
    _common(parser)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", default="4096",
                        help="comma-separated sweep list (windows)")
    parser.add_argument("--lr", default="0.0001", help="sweep list")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--no-early-stopping", action="store_true")
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the run's tmp/SNAPSHOT after preemption",
    )
    args = parser.parse_args(argv)
    _run(
        _universal(args),
        {
            "model": "AEC", "mode": "train", "n_epochs": args.epochs,
            "early_stopping": str(not args.no_early_stopping),
            "patience": args.patience, "tb": str(args.tb),
            "tbport": args.tbport, "show": str(args.verbose),
            "resume": str(args.resume),
        },
        {"batch_size": args.batch_size, "lr": args.lr},
    )


def aec_predict(argv: Optional[list] = None) -> None:
    """AEC inference: writes Prediction/Z_AEC.npy consumed by the GMM stage
    (reference production.predict, production.py:65-106)."""
    parser = argparse.ArgumentParser(description=aec_predict.__doc__)
    _common(parser)
    parser.add_argument("weights", help="path to AEC_Params_Final checkpoint")
    args = parser.parse_args(argv)
    _run(
        _universal(args),
        {
            "model": "AEC", "mode": "predict",
            "saved_weights": args.weights,
            "tb": str(args.tb), "tbport": args.tbport,
            "show": str(args.verbose),
        },
        None,
    )


def gmm_centroids(argv: Optional[list] = None) -> None:
    """GMM centroid fitting over AEC latents (reference GMM_centroids.py:
    K sweep, KMeans n_init=100/max_iter=1000, seed 2009)."""
    parser = argparse.ArgumentParser(description=gmm_centroids.__doc__)
    _common(parser)
    parser.add_argument("weights", help="path to AEC_Params_Final checkpoint")
    parser.add_argument("--n-clusters", default="5", help="sweep list")
    parser.add_argument("--km-n-init", type=int, default=100)
    parser.add_argument("--km-max-iter", type=int, default=1000)
    args = parser.parse_args(argv)
    _run(
        _universal(args),
        {
            "model": "GMM", "mode": "fit", "saved_weights": args.weights,
            "km_n_init": args.km_n_init, "km_max_iter": args.km_max_iter,
            "tb": str(args.tb), "tbport": args.tbport,
            "show": str(args.verbose),
        },
        {"n_clusters": args.n_clusters},
    )


def dec_train(argv: Optional[list] = None) -> None:
    """DEC joint refinement (reference DEC_train.py: 400 epochs max, K=5,
    gamma 1e-3, tol 3e-3, target refresh 2x/epoch)."""
    parser = argparse.ArgumentParser(description=dec_train.__doc__)
    _common(parser)
    parser.add_argument("weights", help="path to AEC_Params_Final checkpoint")
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--batch-size", default="1024", help="sweep list")
    parser.add_argument("--lr", default="0.001", help="sweep list")
    parser.add_argument("--n-clusters", default="5", help="sweep list")
    parser.add_argument("--gamma", default="0.001", help="sweep list")
    parser.add_argument("--tol", default="0.003", help="sweep list")
    parser.add_argument(
        "--init", default="gmm", choices=["load", "rand", "kmeans", "gmm"]
    )
    parser.add_argument("--update-interval", type=int, default=-1)
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the run's tmp/SNAPSHOT after preemption",
    )
    args = parser.parse_args(argv)
    _run(
        _universal(args),
        {
            "model": "DEC", "mode": "train", "n_epochs": args.epochs,
            "saved_weights": args.weights, "init": args.init,
            "update_interval": args.update_interval, "tb": str(args.tb),
            "tbport": args.tbport, "show": str(args.verbose),
            "resume": str(args.resume),
        },
        {
            "batch_size": args.batch_size, "lr": args.lr,
            "n_clusters": args.n_clusters, "gamma": args.gamma,
            "tol": args.tol,
        },
    )


def dec_predict(argv: Optional[list] = None) -> None:
    """DEC full-catalog inference: q/Z/Xr/labels/centroids artifacts +
    metrics + figures (reference production.predict for model=DEC)."""
    parser = argparse.ArgumentParser(description=dec_predict.__doc__)
    _common(parser)
    parser.add_argument(
        "weights",
        help="path to DEC_Params_Final (run dir name carries Clusters=K)",
    )
    parser.add_argument("--silh-max-samples", type=int, default=None)
    args = parser.parse_args(argv)
    params = {
        "model": "DEC", "mode": "predict", "saved_weights": args.weights,
        "tb": str(args.tb), "tbport": args.tbport,
            "show": str(args.verbose),
    }
    if args.silh_max_samples:
        params["silh_max_samples"] = args.silh_max_samples
    _run(_universal(args), params, None)
