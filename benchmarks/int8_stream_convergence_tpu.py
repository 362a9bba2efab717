"""int8-wire convergence A/B at workflow scale on the real chip.

VERDICT r4 next #6: the int8 wire's parity contract
(`core.precision.quantize_wire` — per-batch symmetric scales, dequant on
device) is pinned by unit tests at small sizes; this runs the adoption-
level check: a full streaming AEC pretrain (the transfer-bound tier the
int8 wire exists for, train/aec.py::train_aec_stream) with f32 wire vs
int8 wire to a fixed epoch count, then compares

  1. the loss curves (input quantization is the only numerics effect —
     curves must track within a small absolute band), and
  2. downstream labels: k-means on each run's frozen latents vs the
     planted classes (NMI) and against each other (label agreement),
     i.e. does a whole campaign trained over the int8 wire land in the
     same clustering.

Reference context: the reference streams f64 over PCIe and has no wire
narrowing at all (Cluster/production.py:72-77 DataLoader pin_memory);
this is rebuild-only machinery for remote/bandwidth-limited attachments.

Run from /root/repo:  python benchmarks/int8_stream_convergence_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import spectrogram_cube_clustering_tpu as scc
from spectrogram_cube_clustering_tpu.train.aec import (
    AECConfig,
    train_aec_stream,
)

M = 65_536
EPOCHS = 8
BATCH = 4096
ITEM = 512


def run_one(x, transfer_dtype):
    model = scc.models.AEC()
    state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:4]), lr=1e-4
    )
    n_items = M // ITEM

    def make_loader():
        return scc.data.PrefetchLoader(
            lambda i: x[i * ITEM: (i + 1) * ITEM], n_items=n_items,
            batch_size=BATCH, num_workers=4, transfer_dtype=transfer_dtype,
        )

    t0 = time.perf_counter()
    res = train_aec_stream(
        model, state, make_loader,
        AECConfig(n_epochs=EPOCHS, early_stopping=False),
    )
    wall = time.perf_counter() - t0
    # frozen-latent eval on the FULL-PRECISION data: the question is what
    # the trained encoder learned, not what the wire did at eval time
    data = scc.train.make_batched_data(x, batch_size=BATCH)
    _, _, z = scc.train.full_eval(
        scc.models.DEC(n_clusters=5), _dec_wrap(model, res["final_params"]),
        data,
    )
    return res["history"]["train"], np.asarray(z), wall


def _dec_wrap(model, params):
    """full_eval expects DEC-shaped params; graft the trained AEC
    encoder/decoder into a fresh DEC the way workflow/train.py hands
    weights over (reference models.py:977-979 strict=False load)."""
    dec = scc.models.DEC(n_clusters=5)
    base = dec.init(
        jax.random.key(1), jnp.zeros((1, 4, 101, 1), jnp.float32)
    )["params"]
    out = dict(base)
    for k in params:
        if k in out:
            out[k] = params[k]
    return out


def main():
    x, truth = scc.data.synthetic_windows(M, n_classes=5, seed=0)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))

    from sklearn.metrics import normalized_mutual_info_score as nmi

    out = {"m": M, "epochs": EPOCHS, "batch": BATCH}
    hists, labels = {}, {}
    for wire in ("float32", "int8"):
        hist, z, wall = run_one(x, None if wire == "float32" else wire)
        lab, _ = scc.cluster.kmeans(z, 5, n_init=10, max_iter=300)
        labels[wire] = np.asarray(lab)
        hists[wire] = hist
        out[wire] = {
            "final_loss": round(float(hist[-1]), 6),
            "loss_curve": [round(float(v), 6) for v in hist],
            "wall_sec": round(wall, 1),
            "nmi_vs_truth": round(float(nmi(truth, labels[wire])), 4),
        }
        print(f"{wire}: loss {hist[-1]:.6f}, "
              f"NMI {out[wire]['nmi_vs_truth']}, {wall:.1f}s", flush=True)

    curve_diff = float(
        np.max(np.abs(np.asarray(hists["float32"]) - np.asarray(hists["int8"])))
    )
    out["loss_curve_max_abs_diff"] = round(curve_diff, 6)
    out["label_agreement_nmi"] = round(
        float(nmi(labels["float32"], labels["int8"])), 4
    )
    print(json.dumps(out), flush=True)
    # adoption contract: curves track within a small band of the f32
    # loss scale and the clusterings agree
    assert curve_diff < 0.05 * abs(hists["float32"][-1]) + 1e-3, curve_diff
    assert out["label_agreement_nmi"] > 0.95, out["label_agreement_nmi"]


if __name__ == "__main__":
    main()
