"""End-to-end workflow from a RAW WAVEFORM on the local chip.

The reference consumes precomputed spectrogram cubes; this repo's
`datafiletype = waveform` extension runs the upstream STFT on-device
(workflow/data.py::_waveform_windows -> signal.stft.spectrogram_windows,
which routes through the fused Pallas kernel on TPU). This benchmark
drives the full 5-stage CLI workflow (run-dc, same stages as
full_workflow_tpu.py) from a synthetic waveform with planted spectral
classes, proving the Pallas STFT inside the real product path — not just
its unit tests — and scoring the final DEC labels against the planted
truth.

The waveform plants 5 classes as band-limited noise segments: segment s
(40,000 samples = 100 windows) carries white noise bandpassed to class
band (s mod 5). Window w spans samples [400w, 400w+500); segments align
to the 400-sample window stride, so only the one window straddling each
boundary sees ~20% foreign samples.

    python benchmarks/waveform_workflow_tpu.py [workdir]
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

SEG = 40_000          # samples per class segment (100 windows of 400)
N_SEG = 50            # 2M samples -> ~5,000 windows
N_CLASSES = 5


def build_waveform(path: str):
    """Concatenated band-limited-noise segments; per-window truth labels."""
    rng = np.random.default_rng(7)
    nfreq = SEG // 2 + 1
    bands = [(8 + 18 * k, 8 + 18 * k + 14) for k in range(N_CLASSES)]
    segs, seg_labels = [], []
    for s in range(N_SEG):
        k = s % N_CLASSES
        spec = np.zeros(nfreq, np.complex128)
        lo = bands[k][0] * SEG // 200  # scale window-bin band to segment bins
        hi = bands[k][1] * SEG // 200
        spec[lo:hi] = rng.normal(size=hi - lo) + 1j * rng.normal(size=hi - lo)
        seg = np.fft.irfft(spec, n=SEG).astype(np.float32)
        seg /= np.abs(seg).max() + 1e-9
        segs.append(seg)
        seg_labels.append(k)
    wave = np.concatenate(segs)
    np.save(path, wave)
    # window w spans samples [400w, 400w+500): label by its first sample
    n_frames = (len(wave) - 200) // 100 + 1
    n_windows = n_frames // 4
    truth = np.asarray([seg_labels[(400 * w) // SEG] for w in range(n_windows)])
    return truth


def ini_for(workdir, wave_path, model, mode, extra_p, hp):
    universal = {
        "fname_dataset": wave_path,
        "savepath": os.path.join(workdir, "Outputs"),
        "configpath": os.path.join(workdir, "Config"),
        "transform": "sample_norm_cent",
    }
    params = {"model": model, "mode": mode, "tb": "False", "show": "False",
              "datafiletype": "waveform"}
    params.update(extra_p)
    return scc_utils.config_training(universal, params, hp)


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp(prefix="waveform_workflow_")
    wave_path = os.path.join(workdir, "wave.npy")
    t_all = time.perf_counter()
    truth = build_waveform(wave_path)
    print(f"waveform: {len(truth)} windows from {N_SEG} band-noise segments",
          flush=True)

    def stage(name, ini):
        t0 = time.perf_counter()
        config = cli.run_dc(init_path=ini)
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
        return config

    c = stage("AEC train", ini_for(
        workdir, wave_path, "AEC", "train",
        {"n_epochs": 5, "early_stopping": "False"},
        {"batch_size": "512", "lr": "0.001"},
    ))
    [aec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    aec_w = os.path.join(aec_run, "AEC_Params_Final")

    stage("AEC predict", ini_for(
        workdir, wave_path, "AEC", "predict", {"saved_weights": aec_w},
        {"batch_size": "512", "lr": "0.001"},
    ))

    stage("GMM fit", ini_for(
        workdir, wave_path, "GMM", "fit",
        {"saved_weights": aec_w, "figures": "False"},
        {"n_clusters": str(N_CLASSES)},
    ))

    c = stage("DEC train", ini_for(
        workdir, wave_path, "DEC", "train",
        {"n_epochs": 20, "saved_weights": aec_w, "init": "load"},
        {"batch_size": "512", "lr": "0.001", "n_clusters": str(N_CLASSES),
         "gamma": "0.001", "tol": "0.003"},
    ))
    [dec_run] = glob.glob(os.path.join(c.savepath_exp, "Run_*"))
    dec_w = os.path.join(dec_run, "DEC_Params_Final")

    c = stage("DEC predict", ini_for(
        workdir, wave_path, "DEC", "predict",
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
    assert score > 0.95, f"waveform workflow NMI regressed: {score}"
    return score


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
