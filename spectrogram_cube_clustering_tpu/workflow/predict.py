"""Workflow: full-catalog inference.

Parity target: `predict` (Cluster/production.py:65-106) +
`model_prediction` (models.py:577-733):
- batched full-dataset forward pass (batch 4096, production.py:68);
- DEC artifacts: q_DEC / Z_DEC / Xr_DEC / labels_DEC / centroids_DEC `.npy`
  + Labels.csv, cluster metrics (cluster_performance.csv + 7 .npy),
  silhouette figures, t-SNE figure (models.py:622-701);
- AEC artifacts: Loss_AEC / Z_AEC / Xr_AEC `.npy` + MSE.txt
  (models.py:705-733).

Saved spectrogram arrays keep the reference's NCHW layout (M, 1, 4, W) so
downstream consumers of the artifact tree see identical shapes
(models.py:612).

TPU-first mechanics: the forward pass is one jitted scan over
device-resident batches (train.full_eval / the AEC eval scan) instead of a
per-batch H2D/D2H loop.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spectrogram_cube_clustering_tpu import cluster as _cluster
from spectrogram_cube_clustering_tpu import train as _train
from spectrogram_cube_clustering_tpu import utils as _utils
from spectrogram_cube_clustering_tpu.analysis import plotting
from spectrogram_cube_clustering_tpu.workflow.data import load_data
from spectrogram_cube_clustering_tpu.workflow.train import (
    _normalize,
    load_aec_params,
    make_model,
)

PREDICT_BATCH = 4096  # reference production.py:68


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def _aec_eval_scan(apply_fn, params, xb, maskb):
    def step(_, batch):
        x, mask = batch
        x_rec, z = apply_fn({"params": params}, x)
        d = x_rec - x
        per = jnp.mean(d * d, axis=tuple(range(1, x.ndim)))
        return None, (z, x_rec, jnp.sum(per * mask))

    _, (z, xr, loss_sums) = lax.scan(step, None, (xb, maskb))
    return (
        z.reshape(-1, z.shape[-1]),
        xr.reshape(-1, *xr.shape[2:]),
        jnp.sum(loss_sums) / jnp.maximum(jnp.sum(maskb), 1.0),
    )


def _to_nchw_np(x) -> np.ndarray:
    """NHWC -> the reference's NCHW artifact layout (CLAUDE.md boundary
    convention). Works on host or device arrays without a device round
    trip for the former."""
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _gallery_traces(config):
    """Waveform rows for the cluster gallery: when the source is an H5
    event catalog the reference reads `/4.0/Trace` per displayed sample
    (plotting.py:369-380); other sources carry no waveforms -> None and
    the gallery omits the trace row. Returned as a lazy idx -> (L,)
    callable so only the ~n_examples*K displayed traces are read."""
    if getattr(config, "datafiletype", None) != "h5":
        return None
    if getattr(config, "h5_ftype", "h5") == "np":
        # the .npy dump (convert-h5-to-np) carries spectrograms only —
        # opening it with h5py would crash the gallery after the full
        # forward pass; omit the trace row like other traceless sources
        return None

    from spectrogram_cube_clustering_tpu.data import h5 as _h5

    fname = config.fname_dataset

    def read_trace(idx):
        with _h5._h5py().File(fname, "r") as f:
            return np.asarray(f[_h5.TRACE_PATH][int(idx)]).ravel()

    return read_trace


# canonical predict-figure filenames (identical for ram and stream paths)
_FIGURE_FILES = {
    "T-SNE": "t-SNE.png",
    "Gallery": "gallery.png",
    "LatentSpace": "latent.png",
    "CDF": "cdf.png",
    "PDF": "pdf.png",
}


def _save_predict_figures(figs: Dict, savepath: str) -> None:
    """Write an analyze_dec figure dict into the reference's Prediction
    directory layout with ONE set of filenames, whichever loadmode
    produced it (models.py:663-701)."""
    for name, fig in figs.items():
        d = os.path.join(savepath, name)
        os.makedirs(d, exist_ok=True)
        fig.savefig(
            os.path.join(d, _FIGURE_FILES.get(name, f"{name}.png")),
            dpi=300, facecolor="w",
        )


def _gmm_figure_context(config, n_clusters: int, z_dec, labels_dec,
                        centroids_dec):
    """(z_a, labels_a, centroids_a) for the comparative GMM-vs-DEC figures.

    The reference's DEC prediction loads Z_AEC.npy plus the GMM run's
    labels/centroids and draws GMM-vs-DEC comparisons (models.py:659-695).
    Here the same artifacts are searched relative to `saved_weights`; when
    any piece is missing (e.g. DEC was initialized with rand/kmeans), the
    DEC outputs compare against themselves, which degrades the figures to
    single-model views rather than failing.
    """
    from spectrogram_cube_clustering_tpu.workflow.train import (
        _gmm_artifacts_dir,
    )

    try:
        gmm_dir = _gmm_artifacts_dir(config, n_clusters)
        labels_a = np.load(os.path.join(gmm_dir, "labels.npy"))
        centroids_a = np.load(os.path.join(gmm_dir, "centroids.npy"))
        run_dir = os.path.abspath(
            os.path.join(config.saved_weights, os.pardir)
        )
        from spectrogram_cube_clustering_tpu.workflow.train import (
            resolve_z_aec_path,
        )

        z_a = None
        # the DEC run's own provenance record (copy or Z_AEC.path pointer,
        # written at init=load time by _record_gmm_provenance) is the only
        # candidate that resolves for the CLI workflow's dir layout
        candidates = [resolve_z_aec_path(gmm_dir)] + [
            os.path.join(d, "Z_AEC.npy")
            for d in (
                run_dir,
                os.path.join(run_dir, "Prediction"),
                os.path.join(run_dir, os.pardir, "Prediction"),
            )
        ]
        for cand in candidates:
            if cand and os.path.exists(cand):
                z_a = np.load(cand)
                break
        if z_a is None or len(z_a) != len(z_dec):
            # Z_AEC.npy missing/mismatched: the GMM labels/centroids live
            # in the AEC latent space, so pairing them with DEC latents
            # would draw meaningless distances — fall back wholesale to
            # the single-model DEC-vs-DEC view instead
            raise FileNotFoundError
        if len(labels_a) != len(z_a) or len(centroids_a) != n_clusters:
            raise FileNotFoundError
        return z_a, labels_a, centroids_a
    except (FileNotFoundError, OSError, ValueError):
        # Loud fallback: the reference crashes here (models.py:659-695);
        # we degrade gracefully, but a silent degrade hides a mis-pointed
        # `saved_weights` behind plausible single-model figures.
        print(
            "[predict] GMM comparison artifacts missing or mismatched "
            f"(looked near {getattr(config, 'saved_weights', '?')}); "
            "comparative figures fall back to DEC-vs-DEC views"
        )
        return np.asarray(z_dec), np.asarray(labels_dec), np.asarray(centroids_dec)


def _predict_stream(config, figures: bool, mesh=None) -> Dict:
    """loadmode='stream' inference: windows never materialize at once.

    q/z/labels/Xr accumulate on host while batches stream through jitted
    forwards (sharded over `mesh` when given); clustering metrics and
    figures run on a seeded subsample (config `silh_max_samples`, default
    20000) whose windows are re-read from the cube — the only honest
    option when X exceeds host RAM.
    """
    from spectrogram_cube_clustering_tpu.workflow.train import (
        _np_normalizer,
        _stream_dataset,
        _stream_sharding,
    )

    ds = _stream_dataset(config)
    normalize = _np_normalizer(config)
    item_fn = lambda i: normalize(ds.item(i))  # noqa: E731
    m = ds.n_windows
    savepath = config.savepath_exp
    batch = int(getattr(config, "batch_size_predict", PREDICT_BATCH))
    sharding = _stream_sharding(config, mesh, batch)

    from spectrogram_cube_clustering_tpu.data import PrefetchLoader

    # One read of the wire knob drives BOTH transfer directions (loader
    # up-casts and xr fetch down-casts) so they can't diverge.
    wire = getattr(config, "stream_transfer_dtype", None) or None

    def make_loader():
        return PrefetchLoader(
            item_fn, len(ds), batch,
            num_workers=int(getattr(config, "workers", None) or 4),
            sharding=sharding,
            item_windows=ds.windows_per_item,
            item_meta=(ds.window_shape, np.float32),
            # half-width wire casts for transfer-bound links; `step`
            # below restores f32 on device
            transfer_dtype=wire,
        )

    model = make_model(config)
    params = load_aec_params(config, model)

    # Half-width wire casts cut BOTH directions of the streaming
    # transfer: the loader ships bf16 batches up (see make_loader), and
    # the reconstructions — the dominant fetch, as large as the dataset —
    # come back half-width too, restored to f32 on host before the .npy
    # memmap write. Compute stays f32 end to end; q/z (tiny) stay f32.
    from spectrogram_cube_clustering_tpu.core.precision import wire_dtype

    xr_wire = wire_dtype(wire)

    if config.model == "DEC":
        @jax.jit
        def step(x):
            x = x.astype(jnp.float32)  # restore half-width wire batches
            q, xr, z = model.apply({"params": params}, x)
            if xr_wire is not None:
                xr = xr.astype(xr_wire)
            return jnp.round(q, 5), xr, z
    else:
        @jax.jit
        def step(x):
            x = x.astype(jnp.float32)  # restore half-width wire batches
            xr, z = model.apply({"params": params}, x)
            d = xr - x
            per = jnp.mean(d * d, axis=tuple(range(1, x.ndim)))
            if xr_wire is not None:
                xr = xr.astype(xr_wire)
            return per, xr, z

    proc0 = jax.process_index() == 0
    xr_name = "Xr_DEC.npy" if config.model == "DEC" else "Xr_AEC.npy"
    firsts, zs = [], []
    # Reconstructions are as large as the full dataset X — the reason the
    # stream path exists. They go straight into an on-disk .npy memmap
    # (process 0 only) so the host-RAM peak stays at one batch.
    xr_mm = None
    xr_off = 0
    seen = 0
    # lag buffer: fetch batch i-k to host while i..i-1 are still in
    # flight, so the device never idles on the fetch round trip (the
    # reconstructions are too large to defer wholesale — that would
    # re-materialize the full dataset on device and defeat streaming)
    from collections import deque

    inflight: deque = deque()

    def materialize(item):
        # fetch_global: on a multi-process mesh the outputs are sharded
        # across hosts and a bare np.asarray would raise
        nonlocal xr_mm, xr_off
        (a, xr, z), take = item
        a, xr, z = _train.fetch_global((a, xr, z))
        firsts.append(np.asarray(a[:take]))
        zs.append(np.asarray(z[:take], np.float32))
        if proc0:
            # restore f32 on host when the fetch was half-width (xr_wire)
            block = _to_nchw_np(xr[:take]).astype(np.float32, copy=False)
            if xr_mm is None:
                xr_mm = np.lib.format.open_memmap(
                    os.path.join(savepath, xr_name), mode="w+",
                    dtype=np.float32, shape=(m, *block.shape[1:]),
                )
            xr_mm[xr_off : xr_off + take] = block
            xr_off += take

    for x, n_valid in make_loader():
        out = step(x)
        take = min(n_valid, m - seen)
        seen += take
        inflight.append((out, take))
        if len(inflight) > 4:
            materialize(inflight.popleft())
    while inflight:
        materialize(inflight.popleft())
    z_np = np.concatenate(zs, axis=0)
    if xr_mm is not None:
        xr_mm.flush()

    if config.model == "DEC":
        q_np = np.concatenate(firsts, axis=0).astype(np.float32)
        labels_np = q_np.argmax(axis=1)
        centroids_np = np.asarray(params["centroids"], np.float32)
        if proc0:
            # artifact writes gate on process 0 (same contract as
            # checkpoint.save_snapshot): every host holds the full
            # fetched arrays. Array form: no per-window dict spike on
            # the tier that exists because X exceeds host RAM.
            _utils.save_labels(labels_np, savepath)
            np.save(os.path.join(savepath, "q_DEC"), q_np)
            np.save(os.path.join(savepath, "Z_DEC"), z_np)
            np.save(os.path.join(savepath, "labels_DEC"), labels_np)
            np.save(os.path.join(savepath, "centroids_DEC"), centroids_np)

        cap = int(getattr(config, "silh_max_samples", None) or 20000)
        sel = np.sort(
            np.random.default_rng(2009).choice(
                m, min(cap, m), replace=False
            )
        )
        # group the selection by item: one read+normalize per unique item
        # instead of one per WINDOW (~windows_per_item x less IO on the
        # path that exists because X exceeds host RAM). For H5 blocks
        # (ragged last item) the scalar block size still maps window ->
        # (item, offset) correctly: item i covers rows [i*b, (i+1)*b).
        wpi = getattr(ds, "block", None) or ds.windows_per_item
        rows = []
        for item_idx in np.unique(sel // wpi):
            item = item_fn(int(item_idx))
            rows.append(item[sel[sel // wpi == item_idx] % wpi])
        x_sub = np.concatenate(rows, axis=0)  # sel is sorted -> aligned
        metrics = _cluster.cluster_metrics(
            savepath, labels_np[sel],
            _to_nchw_np(x_sub), z_np[sel], save=proc0,
        )
        if figures and proc0:
            # figure families on the same metrics subsample
            from spectrogram_cube_clustering_tpu.workflow.fit import _tsne

            k = int(config.n_clusters)
            z_a, labels_a, cents_a = _gmm_figure_context(
                config, k, z_np, labels_np, centroids_np
            )
            # centroid decodes + H5 waveform rows: same gallery content
            # as the ram path (traces re-index the metrics subsample back
            # to dataset indices)
            dec_out = model.bind({"params": params}).decoder(
                jnp.asarray(centroids_np)
            )
            read_trace = _gallery_traces(config)
            traces = (
                (lambda i: read_trace(sel[int(i)]))
                if read_trace is not None else None
            )
            figs = plotting.analyze_dec(
                x_sub, z_a[sel], z_np[sel], labels_a[sel], labels_np[sel],
                cents_a, centroids_np, _tsne(config, z_np[sel]),
                centroid_decodes=np.asarray(dec_out), traces=traces,
            )
            _save_predict_figures(figs, savepath)
            for scores, name in (
                (metrics["silh_scores_Z"], "silh_score_Z"),
                (metrics["silh_scores_X"], "silh_score_X"),
            ):
                fig = plotting.view_silhscore(
                    scores, labels_np[sel], k, config.model
                )
                fig.savefig(
                    os.path.join(savepath, f"{name}.png"), dpi=300,
                    facecolor="w",
                )
        return {
            "q": q_np, "z": z_np, "labels": labels_np,
            "centroids": centroids_np, "metrics": metrics,
        }

    per = np.concatenate(firsts, axis=0)
    total_loss = float(per.mean())
    print(f"Dataset MSE = {total_loss:.4e}")
    if proc0:
        with open(os.path.join(savepath, "MSE.txt"), "w") as f:
            f.write(f"MSE = {total_loss:.4e}")
        np.save(os.path.join(savepath, "Loss_AEC"), total_loss)
        np.save(os.path.join(savepath, "Z_AEC"), z_np)
    # x_rec is the on-disk memmap (None off process 0) — loading it fully
    # would defeat the streaming tier's RAM budget
    return {"z": z_np, "x_rec": xr_mm, "loss": total_loss}


def predict(config, mesh=None, figures: bool = True) -> Dict:
    """Run inference and write the artifact tree. Returns the arrays."""
    if config.model not in ("AEC", "DEC"):
        # same guard as workflow.train: model='GMM' would load the
        # (M, 9) latent array as image windows and die in jit with an
        # opaque shape error (GMM inference = workflow.gmm_fit)
        raise ValueError(
            f"unknown model {config.model!r} for mode='predict' "
            "(GMM fitting/inference runs via mode='fit' / workflow.gmm_fit)"
        )
    if getattr(config, "loadmode", "ram") == "stream":
        return _predict_stream(config, figures, mesh=mesh)
    x_np = _normalize(config, load_data(config))
    print(f"Dataset has {len(x_np)} samples.")
    savepath = config.savepath_exp
    batch = int(getattr(config, "batch_size_predict", PREDICT_BATCH))
    batch = min(batch, len(x_np))
    if mesh is not None:
        # the batch axis shards over the mesh — round UP to a device
        # multiple (the trailing pad rows are masked out)
        from spectrogram_cube_clustering_tpu.core import pad_to_multiple

        batch = pad_to_multiple(batch, mesh.devices.size)
    data = _train.make_batched_data(x_np, batch_size=batch, mesh=mesh)
    m = data.n_samples

    model = make_model(config)
    params = load_aec_params(config, model)

    proc0 = jax.process_index() == 0
    if config.model == "DEC":
        q, labels, z, xr = _train.full_eval(model, params, data, with_xr=True)
        # fetch_global: sharded outputs span hosts on a multi-process mesh
        q, labels, z, xr = _train.fetch_global((q, labels, z, xr))
        q_np = np.asarray(q, np.float32)
        z_np = np.asarray(z, np.float32)
        labels_np = np.asarray(labels)
        centroids_np = np.asarray(params["centroids"], np.float32)

        if proc0:
            # writes gate on process 0: every host holds the full fetched
            # arrays (np.save/figure writes would otherwise race)
            _utils.save_labels(labels_np, savepath)
            np.save(os.path.join(savepath, "q_DEC"), q_np)
            np.save(os.path.join(savepath, "Z_DEC"), z_np)
            np.save(os.path.join(savepath, "Xr_DEC"), _to_nchw_np(xr))
            np.save(os.path.join(savepath, "labels_DEC"), labels_np)
            np.save(os.path.join(savepath, "centroids_DEC"), centroids_np)

        silh_cap = getattr(config, "silh_max_samples", None)
        metrics = _cluster.cluster_metrics(
            savepath, labels_np, _to_nchw_np(x_np), z_np,
            save=proc0,
            silh_max_samples=int(silh_cap) if silh_cap else None,
        )
        if figures and proc0:
            k = int(config.n_clusters)
            for scores, name in (
                (metrics["silh_scores_Z"], "silh_score_Z"),
                (metrics["silh_scores_X"], "silh_score_X"),
            ):
                # with silh_max_samples, unsampled rows are NaN — draw
                # only the scored rows (like the stream path) or the
                # figure's mean line and y extent are NaN/garbage
                scored = np.isfinite(np.asarray(scores))
                fig = plotting.view_silhscore(
                    np.asarray(scores)[scored], labels_np[scored], k,
                    config.model,
                )
                fig.savefig(
                    os.path.join(savepath, f"{name}.png"), dpi=300,
                    facecolor="w",
                )
            from spectrogram_cube_clustering_tpu.workflow.fit import _tsne

            # comparative GMM-vs-DEC figures when the GMM artifacts +
            # Z_AEC are findable (reference models.py:659-695); centroid
            # decodes through the trained model's own decoder submodule
            # (works for any arch/geometry: AEC, packed, H5)
            z_a, labels_a, cents_a = _gmm_figure_context(
                config, k, z_np, labels_np, centroids_np
            )
            dec_out = model.bind({"params": params}).decoder(
                jnp.asarray(centroids_np)
            )
            figs = plotting.analyze_dec(
                x_np, z_a, z_np, labels_a, labels_np,
                cents_a, centroids_np, _tsne(config, z_np),
                centroid_decodes=np.asarray(dec_out),
                traces=_gallery_traces(config),
            )
            _save_predict_figures(figs, savepath)
        return {
            "q": q_np, "z": z_np, "labels": labels_np,
            "centroids": centroids_np, "metrics": metrics,
        }

    # AEC mode (models.py:705-733)
    z, xr, total_loss = _aec_eval_scan(model.apply, params, data.x, data.mask)
    z, xr = _train.fetch_global((z, xr))
    z_np = np.asarray(z[:m], np.float32)
    xr_np = _to_nchw_np(xr[:m])
    total_loss = float(total_loss)
    print(f"Dataset MSE = {total_loss:.4e}")
    if proc0:
        with open(os.path.join(savepath, "MSE.txt"), "w") as f:
            f.write(f"MSE = {total_loss:.4e}")
        np.save(os.path.join(savepath, "Loss_AEC"), total_loss)
        np.save(os.path.join(savepath, "Z_AEC"), z_np)
        np.save(os.path.join(savepath, "Xr_AEC"), xr_np)
    return {"z": z_np, "x_rec": xr_np, "loss": total_loss}
