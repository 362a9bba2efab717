"""Loose-precision STFT variant: throughput + clustering-consequence A/B.

The roofline measurement (RESULTS.md "STFT roofline") showed the shipped
kernel sits at ~87% of its HIGHEST-precision matmul ceiling while the
same dot at DEFAULT precision runs >=4x faster — a gap locked behind the
parity contract (DEFAULT has O(1) log10 errors at near-zero bins). This
measures what the opt-in `precision="default"` variant
(ops/pallas_stft.py) actually buys and costs on chip:

  1. throughput A/B, highest vs default, same harness same run;
  2. parity error vs the HIGHEST kernel (max + p99.9) on random and
     structured (planted-class) waveforms;
  3. the consequence that matters to this framework's users: cluster a
     planted-class waveform's windows from each variant (AEC pretrain ->
     k-means on latents, shared seeds) and compare NMI vs truth + label
     agreement between the variants.

Run from /root/repo:  python benchmarks/stft_loose_precision_tpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu.ops.pallas_stft import (
    spectrogram_pallas,
)

NPERSEG, HOP, WROWS = 200, 100, 4
N_CLASSES = 5
SEG = 40_000           # samples per class segment
N_SEGS = 50            # -> 2M-sample waveform


def _median(v):
    s = sorted(v)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def planted_waveform(seed=0):
    """Band-limited-noise segments planting N_CLASSES spectral classes
    (the waveform_workflow_tpu.py recipe, self-contained)."""
    rng = np.random.default_rng(seed)
    t = np.arange(SEG)
    segs, labels = [], []
    for i in range(N_SEGS):
        lab = i % N_CLASSES
        f0 = 0.05 + 0.08 * lab
        carrier = np.sin(
            2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi)
        )
        am = 1.0 + 0.5 * np.sin(2 * np.pi * t / SEG * (2 + lab))
        segs.append((carrier * am + 0.3 * rng.standard_normal(SEG)))
        labels.append(lab)
    return (
        np.concatenate(segs).astype(np.float32), np.asarray(labels)
    )


def measure_throughput(precision, n=4_000_000, chain=160, reps=5):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), jnp.float32
    )

    def make(length):
        @jax.jit
        def run(xw, salt):
            def body(carry, _):
                xc, acc = carry
                out = spectrogram_pallas(xc, precision=precision)
                dep = jnp.sum(out[..., :1, :8]) * 1e-30
                xc = xc.at[0].add(dep + salt + 1.0)
                return (xc, acc + dep), None

            (xc, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0.0)), None, length=length
            )
            return acc + xc[0]

        return run

    c1, c2 = make(chain), make(2 * chain)
    float(c1(x, jnp.float32(0.0)))
    float(c2(x, jnp.float32(0.0)))
    rates = []
    for r in range(reps):
        salt = jnp.float32(1.0 + r)
        t0 = time.perf_counter()
        float(c1(x, salt))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(c2(x, salt + 0.5))
        t2 = time.perf_counter() - t0
        if t2 - t1 > 1e-6:
            rates.append(n * chain / (t2 - t1))
    from bench import _rep_stats

    return _rep_stats(rates)


def windows_for(wave, precision):
    spec = spectrogram_pallas(jnp.asarray(wave), precision=precision)
    n_frames = spec.shape[0]
    nwin = n_frames // WROWS
    w = spec[: nwin * WROWS].reshape(nwin, WROWS, spec.shape[1], 1)
    return np.asarray(scc.ops.sample_norm_cent(w))


def cluster_score(x, win_labels, tag):
    model = scc.models.AEC()
    data = scc.train.make_batched_data(x, batch_size=2048)
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-3
    )
    from spectrogram_cube_clustering_tpu.train.aec import (
        _init_loop_state,
        make_fused_epochs_fn,
    )

    run = make_fused_epochs_fn(model, 8, patience=8, early_stopping=False)
    t0 = time.perf_counter()
    state, loop = run(
        state, data.x, data.mask, None, None,
        _init_loop_state(state, 8), jnp.int32(8),
    )
    loss = float(loop["tra_hist"][-1])
    dec = scc.models.DEC(n_clusters=N_CLASSES)
    base = dec.init(
        jax.random.key(1), jnp.zeros((1, WROWS, 101, 1), jnp.float32)
    )["params"]
    params = dict(base)
    for k in state.params:
        if k in params:
            params[k] = state.params[k]
    _, _, z = scc.train.full_eval(dec, params, data)
    lab, _ = scc.cluster.kmeans(np.asarray(z), N_CLASSES, n_init=10,
                                max_iter=300)
    from sklearn.metrics import normalized_mutual_info_score as nmi

    score = float(nmi(win_labels, np.asarray(lab)))
    print(f"{tag}: loss {loss:.5f}, NMI {score:.4f}, "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    return np.asarray(lab), score, loss


def main():
    out = {"platform": jax.devices()[0].platform}

    for name in ("highest", "default"):
        med, spread = measure_throughput(name)
        out[f"throughput_{name}_gsamples"] = round(med / 1e9, 2)
        out[f"throughput_{name}_spread"] = spread
        print(f"{name}: {med / 1e9:.2f} Gsamples/s {spread}", flush=True)
    out["speedup"] = round(
        out["throughput_default_gsamples"]
        / out["throughput_highest_gsamples"], 2,
    )

    # parity error vs the HIGHEST kernel
    for tag, wav in (
        ("random", np.random.default_rng(3).standard_normal(400_000)
         .astype(np.float32)),
        ("planted", planted_waveform()[0][:400_000]),
    ):
        hi = np.asarray(spectrogram_pallas(jnp.asarray(wav)))
        lo = np.asarray(
            spectrogram_pallas(jnp.asarray(wav), precision="default")
        )
        d = np.abs(hi - lo)
        out[f"err_{tag}_max"] = round(float(d.max()), 4)
        out[f"err_{tag}_p999"] = round(
            float(np.quantile(d, 0.999)), 6
        )

    # clustering consequence
    wave, seg_labels = planted_waveform()
    frames_per_seg = SEG // HOP
    # per-window labels: windows are WROWS consecutive frames; windows
    # straddling a segment boundary get the majority segment
    n_frames = (len(wave) - NPERSEG) // HOP + 1
    frame_seg = np.minimum(
        (np.arange(n_frames) * HOP + NPERSEG // 2) // SEG, N_SEGS - 1
    )
    nwin = n_frames // WROWS
    win_labels = seg_labels[
        frame_seg[: nwin * WROWS].reshape(nwin, WROWS)[:, WROWS // 2]
    ]

    labs = {}
    for name in ("highest", "default"):
        x = windows_for(wave, name)
        labs[name], score, loss = cluster_score(
            x, win_labels, f"cluster_{name}"
        )
        out[f"cluster_{name}_nmi"] = round(score, 4)
        out[f"cluster_{name}_loss"] = round(loss, 6)

    from sklearn.metrics import normalized_mutual_info_score as nmi

    out["cluster_label_agreement_nmi"] = round(
        float(nmi(labs["highest"], labs["default"])), 4
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
