"""The reference user's complete workflow, end to end, on the local chip.

Reproduces exactly what a Julia310/Spectrogram-Cube-Clustering user does
(readme.md:41-59) against a BLOSC-compressed Zarr v2 cube (the zarr
default framing a real Cube_chunked_5758.zarr ships with):

    run-dc init_aec.ini      AEC pretrain          (AEC_train.py)
    run-dc init_pred.ini     AEC latent dump       (Z_AEC.npy)
    run-dc init_gmm.ini      GMM centroid fit      (GMM_centroids.py)
    run-dc init_dec.ini      DEC refinement        (DEC_train.py, init=load)
    run-dc init_dpred.ini    DEC prediction + figures

driven through the installed CLI surface (`cli.run_dc`), scoring the
final labels against the cube's planted classes (NMI). Chunk geometry is
the reference's 5758-row chunking.

    python benchmarks/full_workflow_tpu.py [workdir] [--arch packed]

--arch packed runs the same 5 stages on the MXU-packed AEC/DEC variants
(models/packed.py, 1.42x the parity model's train throughput) to pin
end-to-end NMI parity for the fast path, not just its unit tests.
"""

import glob
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
from spectrogram_cube_clustering_tpu.data import CubeSpec, cube as cube_mod
from spectrogram_cube_clustering_tpu.data import zarrlite

SPEC = CubeSpec(chunk_size=5758, window_rows=4, channel_start=2,
                channel_stride=5)


def build_blosc_cube(path: str):
    """Reference-geometry cube (5758-row chunks), blosc-lz4 compressed."""
    labels = cube_mod.make_synthetic_cube(
        path, n_time=5758 * 11 // 2, n_channels=30, n_freq=101,
        n_classes=5, chunk_rows=5758, seed=3, spec=SPEC,
    )
    # re-write with the zarr v2 DEFAULT compressor (blosc-lz4+shuffle):
    # the decode path under test is the one a real reference cube needs
    grp = zarrlite.open_group(path)
    data = grp["cube"][:, :, :]
    import shutil

    shutil.rmtree(path)
    zarrlite.write_group(
        path, {"cube": data}, chunks=(5758, 1, 101), compressor="blosc"
    )
    comp = zarrlite.open_group(path)["cube"].compressor_id
    assert comp == "blosc", comp
    return labels


def ini_for(workdir, cube_path, model, mode, extra_p, hp):
    universal = {
        "fname_dataset": cube_path,
        "savepath": os.path.join(workdir, "Outputs"),
        "configpath": os.path.join(workdir, "Config"),
        "transform": "sample_norm_cent",
        "chunk_size": SPEC.chunk_size,
        "channel_start": SPEC.channel_start,
        "channel_stride": SPEC.channel_stride,
    }
    params = {"model": model, "mode": mode, "tb": "False", "show": "False"}
    params.update(extra_p)
    return scc_utils.config_training(universal, params, hp)


def main(workdir=None, arch=None):
    workdir = workdir or tempfile.mkdtemp(prefix="full_workflow_")
    cube_path = os.path.join(workdir, "Cube_chunked_5758.zarr")
    t_all = time.perf_counter()
    truth = build_blosc_cube(cube_path)
    print(f"blosc cube: {len(truth)} windows at {cube_path}"
          + (f" (arch={arch})" if arch else ""), flush=True)
    arch_p = {"arch": arch} if arch else {}

    def stage(name, ini):
        t0 = time.perf_counter()
        config = cli.run_dc(init_path=ini)
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return config

    # 1) AEC pretrain
    c = stage("AEC train", ini_for(
        workdir, cube_path, "AEC", "train",
        {"n_epochs": 5, "early_stopping": "False", **arch_p},
        {"batch_size": "512", "lr": "0.001"},
    ))
    [aec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    aec_w = os.path.join(aec_run, "AEC_Params_Final")

    # 2) AEC predict -> Z_AEC.npy
    stage("AEC predict", ini_for(
        workdir, cube_path, "AEC", "predict", {"saved_weights": aec_w, **arch_p},
        {"batch_size": "512", "lr": "0.001"},
    ))

    # 3) GMM centroid fit on the frozen latents
    stage("GMM fit", ini_for(
        workdir, cube_path, "GMM", "fit",
        {"saved_weights": aec_w, "figures": "False"},
        {"n_clusters": "5"},
    ))

    # 4) DEC refinement, initialized from the GMM artifacts (init=load)
    c = stage("DEC train", ini_for(
        workdir, cube_path, "DEC", "train",
        {"n_epochs": 20, "saved_weights": aec_w, "init": "load",
         **arch_p},
        {"batch_size": "512", "lr": "0.001", "n_clusters": "5",
         "gamma": "0.001", "tol": "0.003"},
    ))
    [dec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    dec_w = os.path.join(dec_run, "DEC_Params_Final")

    # 5) DEC prediction + full artifact/figure tree
    c = stage("DEC predict", ini_for(
        workdir, cube_path, "DEC", "predict",
        {"saved_weights": dec_w, "tsne_backend": "jax", **arch_p},
        {"batch_size": "512", "lr": "0.001"},
    ))
    pred = c.savepath_exp
    labels = np.load(os.path.join(pred, "labels_DEC.npy"))
    for f in ("q_DEC.npy", "Z_DEC.npy", "Xr_DEC.npy", "centroids_DEC.npy",
              "Labels.csv", "cluster_performance.csv"):
        assert os.path.exists(os.path.join(pred, f)), f

    from sklearn.metrics import normalized_mutual_info_score as nmi

    score = float(nmi(truth, labels))
    print(f"NMI vs planted truth: {score:.4f}; "
          f"total {time.perf_counter() - t_all:.1f}s; artifacts in {workdir}",
          flush=True)
    assert score > 0.95, f"workflow NMI regressed: {score}"
    return score


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("workdir", nargs="?", default=None)
    ap.add_argument("--arch", choices=("AEC", "packed", "UNet"), default=None)
    ns = ap.parse_args()
    main(ns.workdir, arch=ns.arch)
