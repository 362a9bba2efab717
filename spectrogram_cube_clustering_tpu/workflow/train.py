"""Workflow: hyperparameter-sweep training (AEC pretrain / DEC refine).

Parity target: `train` (Cluster/production.py:109-181) + the engine entry
`model_training` (models.py:736-1268):
- cartesian hp sweep (production.py:120) with per-run output dirs
  `Run_<hp-string>/` and `tmp/` checkpoints (utils.py:84-100);
- AEC: MSE + Adam, early stopping on validation, best-weights final
  (models.py:761-926); artifacts AEC_history.csv, AEC_Params_Final,
  tmp/AEC_Best_Weights;
- DEC: loads AEC weights, cluster init, Student-t refinement with
  delta-label stop (models.py:929-1231); artifacts DEC_Params_Initial,
  DEC_Params_Final, DEC_history.csv, Delta_history.csv;
- TensorBoard scalars per run when config.tb.

Deviations (deliberate, SURVEY.md §2.3 defect 2): the architecture AEC-mode
trains is the one AEC-mode predicts and DEC inherits — config key `arch`
('AEC' default | 'UNet') picks it globally; the reference trains UNet but
predicts AEC, silently discarding pretraining. Checkpoints are orbax
directories (optimizer state included for the final state), not .pt files.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_cube_clustering_tpu import models as _models
from spectrogram_cube_clustering_tpu import ops as _ops
from spectrogram_cube_clustering_tpu import train as _train
from spectrogram_cube_clustering_tpu import utils as _utils
from spectrogram_cube_clustering_tpu.train.checkpoint import (
    check_restored_shapes as _check_restored_shapes,
    restore,
    save,
)
from spectrogram_cube_clustering_tpu.workflow.data import load_data


def make_model(config, n_clusters: Optional[int] = None):
    """Instantiate the configured architecture under the configured
    precision policy (config key `precision` in {default, bf16}; params
    stay f32 either way — core.precision)."""
    from spectrogram_cube_clustering_tpu import core as _core

    policy = {
        "default": _core.DEFAULT, "bf16": _core.BF16, None: _core.DEFAULT,
    }.get(getattr(config, "precision", None))
    if policy is None:
        raise ValueError(f"unknown precision {config.precision!r}")
    kw = dict(dtype=policy.compute_dtype, param_dtype=policy.param_dtype)

    # window geometry: set by the data path (config.input_hw) when the
    # source isn't the default (4, 101) Zarr window — e.g. the H5 event
    # catalog's (87, 100) spectrograms (SURVEY.md C3)
    hw = getattr(config, "input_hw", None)
    if hw is not None:
        kw["input_hw"] = (int(hw[0]), int(hw[1]))

    def require_default_hw(arch_name):
        # UNet/packed are fixed to the reference's (4, 101) Zarr window;
        # geometry-general sources (the H5 catalog) must use arch='AEC'
        if kw.pop("input_hw", (4, 101)) != (4, 101):
            raise ValueError(
                f"arch={arch_name!r} supports only the (4, 101) Zarr "
                "window geometry; use arch='AEC' for other sources"
            )

    arch = getattr(config, "arch", None) or "AEC"
    # reference attention quirk (networks.py:163-168 returns
    # conv*sigmoid(conv), discarding its input): replicated by default
    # for weight-port parity; `attention_faithful = False` opts into the
    # textbook input*sigmoid(attention) form (AEC/DEC only — UNet has no
    # attention module and packed uses none)
    faithful = bool(getattr(config, "attention_faithful", True))
    if config.model == "DEC" or n_clusters is not None:
        k = int(n_clusters or config.n_clusters)
        if arch == "packed":
            require_default_hw(arch)
            return _models.PackedDEC(n_clusters=k, **kw)
        if arch != "AEC":
            # reject rather than silently building the AEC-based DEC: a
            # typo'd knob (or arch='UNet', which has no DEC variant — the
            # reference's DEC is always AEC-encoder-based) must not pass
            # unnoticed into predict/serve paths
            raise ValueError(
                f"DEC arch must be 'AEC' or 'packed', got {arch!r}"
            )
        return _models.DEC(n_clusters=k, attention_faithful=faithful, **kw)
    if arch == "UNet":
        require_default_hw(arch)
        return _models.UNet(**kw)
    if arch == "packed":
        # MXU-packed variant: 1.42x the parity AEC's train throughput on
        # v5e at equal loss (benchmarks/RESULTS.md contraction-width
        # experiment); different latent space, so not the default
        require_default_hw(arch)
        return _models.PackedAEC(**kw)
    if arch == "AEC":
        return _models.AEC(attention_faithful=faithful, **kw)
    raise ValueError(f"unknown arch {arch!r}")


def _tb_writer(config, logdir):
    # process 0 only: on a multi-host run every process reaches this, but
    # competing event writers in one shared logdir corrupt the TB stream
    # (same gating as checkpoint saves and history CSVs)
    if not getattr(config, "tb", False) or jax.process_index() != 0:
        return None, None
    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(log_dir=logdir)

    def log_scalar(tag, value, step):
        writer.add_scalar(tag, value, step)

    return writer, log_scalar


def sample_input(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x[: min(2, len(x))])


def _save_aec_artifacts(config, model, out, sample_x, writer=None):
    """AEC run artifacts shared by the ram and stream paths: history CSV,
    final params, reconstruction panel, TB figure + weights breadcrumb.

    History/checkpoint writers gate on process 0 internally; the figure
    and TB writes are gated here — on a multi-host run every process
    executes the training loop, but concurrent writers into one shared
    run dir tear the PNG/event files.
    """
    _utils.save_history(
        {"Epoch": out["history"]["epoch"],
         "Training MSE": out["history"]["train"],
         "Validation MSE": out["history"]["validation"]},
        os.path.join(config.savepath_run, "AEC_history.csv"),
    )
    final_path = os.path.join(config.savepath_run, "AEC_Params_Final")
    save(final_path, out["final_params"])
    # all-gather BEFORE the proc-0 gate: fetch_global is a collective,
    # and an eager apply on process-spanning params would raise on the
    # one process that proceeds past the gate while the others hang the
    # next collective
    from spectrogram_cube_clustering_tpu.train.layout import fetch_global

    host_params = fetch_global(out["final_params"])
    if jax.process_index() != 0:
        return final_path
    # final reconstruction panel (the reference's TB figure hook is
    # commented out, models.py:810-841; here it lands in the run dir)
    from spectrogram_cube_clustering_tpu.analysis import plotting

    n_show = min(4, len(sample_x))
    xr, _ = model.apply(
        {"params": host_params}, jnp.asarray(sample_x[:n_show])
    )
    fig = plotting.view_specgram_training(
        sample_x[:n_show], np.asarray(xr), n_samples=n_show,
        figtitle=f"AEC reconstructions (epoch {out['last_epoch']})",
    )
    fig.savefig(
        os.path.join(config.savepath_run, "AEC_reconstructions.png"),
        dpi=200, facecolor="w",
    )
    if writer is not None:
        writer.add_figure("Reconstructions", fig)
        # breadcrumb (reference models.py:924)
        writer.add_text("Path to Saved Weights", final_path)
        writer.close()
    return final_path


def _normalize(config, x: Optional[np.ndarray]) -> Optional[np.ndarray]:
    if x is None or len(x) == 0:
        return x
    fn = _ops.make_normalizer(getattr(config, "transform", None))
    return np.asarray(fn(jnp.asarray(x)))


def _init_template(model, input_hw=None) -> dict:
    h, w = input_hw or (_models.INPUT_HEIGHT, _models.INPUT_WIDTH)
    return model.init(
        jax.random.key(0), jnp.zeros((1, int(h), int(w), 1))
    )["params"]


# (the restored-shape guard lives with the restore machinery in
# train/checkpoint.py — imported above — so the serving tier reuses it)


def load_aec_params(config, model) -> dict:
    """Restore params from config.saved_weights (an orbax checkpoint dir).

    For a DEC model in train mode the checkpoint holds *AEC* params
    (pretraining output) and the encoder/decoder transfer into a fresh DEC
    template (reference load_state_dict strict=False, models.py:977-979).
    In every other case (AEC predict, DEC predict) the checkpoint's
    structure matches the model itself.
    """
    hw = getattr(config, "input_hw", None)
    template = _init_template(model, hw)
    if (isinstance(model, (_models.DEC, _models.PackedDEC))
            and config.mode == "train"):
        arch = getattr(config, "arch", "AEC") or "AEC"
        if arch == "packed":
            src = _models.PackedAEC()
        elif arch == "AEC":
            src = _models.AEC(
                input_hw=tuple(hw) if hw else (4, 101),
                attention_faithful=getattr(
                    model, "attention_faithful", True
                ),
            )
        else:
            raise ValueError(
                "DEC inherits the AEC encoder/decoder; arch must be 'AEC' "
                "or 'packed' (the reference's UNet-pretrain/AEC-refine "
                "mismatch transfers no weights, SURVEY.md §2.3 defect 2)"
            )
        src_template = _init_template(src, hw)
        aec_params = restore(config.saved_weights, src_template)
        _check_restored_shapes(aec_params, src_template, "AEC")
        from spectrogram_cube_clustering_tpu.models.dec import (
            load_encoder_decoder_from_aec,
        )

        return load_encoder_decoder_from_aec(template, aec_params)
    restored = restore(config.saved_weights, template)
    _check_restored_shapes(restored, template, type(model).__name__)
    return restored


def _gmm_artifacts_dir(config, n_clusters: int) -> str:
    run_dir = os.path.abspath(os.path.join(config.saved_weights, os.pardir))
    return os.path.join(run_dir, "GMM", f"n_clusters={n_clusters}")


def write_z_pointer(dirpath: str, src: str) -> None:
    """Record where this dir's GMM init latents live (`Z_AEC.path`)
    instead of duplicating the multi-MB Z_AEC.npy into every swept-K and
    DEC run dir (review r3: a K x hp sweep at cube scale stored hundreds
    of MB of identical copies). The path is stored relative to the
    pointer's own dir so a relocated experiment tree still resolves."""
    with open(os.path.join(dirpath, "Z_AEC.path"), "w") as fh:
        fh.write(os.path.relpath(os.path.abspath(src), dirpath))


def resolve_z_aec_path(dirpath: str) -> Optional[str]:
    """The latents file a GMM artifact dir refers to: its own Z_AEC.npy
    copy (old layout) or the target of its Z_AEC.path pointer (relative
    to the pointer's dir; absolute also accepted)."""
    local = os.path.join(dirpath, "Z_AEC.npy")
    if os.path.exists(local):
        return local
    pointer = os.path.join(dirpath, "Z_AEC.path")
    if os.path.exists(pointer):
        with open(pointer) as fh:
            target = fh.read().strip()
        if target:
            if not os.path.isabs(target):
                target = os.path.normpath(os.path.join(dirpath, target))
            if os.path.exists(target):
                return target
    return None


def _record_gmm_provenance(config, n_clusters: int, gmm_dir: str) -> None:
    """Copy the GMM init artifacts (labels/centroids plus a pointer to the
    AEC latents they were fit on) into the DEC run dir under
    GMM/n_clusters=K/.

    At train time `saved_weights` points at the AEC params, so
    `_gmm_artifacts_dir` resolves; at predict time it points at the DEC
    params, where the same relative search can only succeed if the DEC
    run carries its own copy — without this, the CLI workflow's
    comparative GMM-vs-DEC figures (reference models.py:659-695) always
    fell back to DEC-vs-DEC views (observed in the round-3 on-chip
    full-workflow run)."""
    import shutil

    if jax.process_index() != 0:  # same gating as checkpoint saves
        return
    dst = os.path.join(
        config.savepath_run, "GMM", f"n_clusters={n_clusters}"
    )
    if os.path.abspath(dst) == os.path.abspath(gmm_dir):
        return
    os.makedirs(dst, exist_ok=True)
    for name in ("labels.npy", "centroids.npy"):
        shutil.copyfile(
            os.path.join(gmm_dir, name), os.path.join(dst, name)
        )
    aec_run = os.path.abspath(os.path.join(config.saved_weights, os.pardir))
    for cand in (
        resolve_z_aec_path(gmm_dir),
        os.path.join(aec_run, "Z_AEC.npy"),
        os.path.join(aec_run, "Prediction", "Z_AEC.npy"),
    ):
        if cand and os.path.exists(cand):
            write_z_pointer(dst, cand)
            break


def _np_normalizer(config):
    """Host-side per-window normalizer over NHWC stacks for the streaming
    item path (same semantics as ops.normalize)."""
    name = getattr(config, "transform", None)
    if name is None:
        return lambda x: x
    from spectrogram_cube_clustering_tpu.data.h5 import normalize_specgram

    def fn(x):  # (n, H, W, 1): stats over (H, W)
        return normalize_specgram(
            np.moveaxis(x, -1, 1), name
        ).transpose(0, 2, 3, 1).astype(np.float32)

    return fn


def _stream_sharding(config, mesh, batch_size: int):
    """Batch sharding for streamed loaders: leading axis over every mesh
    axis (PrefetchLoader's device_put lands each batch pre-sharded, so the
    per-batch jitted steps run data-parallel with psum'd gradients — the
    dev_ddp north star, reference readme.md:65, at the larger-than-HBM
    scale tier that actually needs it)."""
    if mesh is None:
        return None
    from spectrogram_cube_clustering_tpu import core as _core

    n_dev = mesh.devices.size
    if batch_size % n_dev != 0:
        raise ValueError(
            f"loadmode=stream on a {n_dev}-device mesh needs batch_size "
            f"divisible by {n_dev} (got {batch_size})"
        )
    return _core.batch_sharding(mesh, 4)


def _stream_dataset(config):
    """The streaming item source for loadmode='stream': the Zarr cube by
    default, the H5 event catalog (`datafiletype='h5'`,
    data.h5.H5StreamDataset block reader), or a raw memory-mapped
    waveform (`datafiletype='waveform'`, data.waveform's host-STFT
    block reader). Sets `config.input_hw` so make_model builds the
    matching geometry (same contract as workflow.data.load_windows)."""
    from spectrogram_cube_clustering_tpu.data import ZarrCubeDataset
    from spectrogram_cube_clustering_tpu.workflow.data import _cube_spec

    ftype = getattr(config, "datafiletype", None)
    if ftype == "h5":
        from spectrogram_cube_clustering_tpu.data.h5 import H5StreamDataset

        ds = H5StreamDataset(
            config.fname_dataset,
            block=int(getattr(config, "h5_stream_block", None) or 256),
        )
    elif ftype == "waveform":
        from spectrogram_cube_clustering_tpu.data import WaveformStreamDataset

        ds = WaveformStreamDataset(
            config.fname_dataset,
            nperseg=int(getattr(config, "nperseg", None) or 200),
            hop=int(getattr(config, "hop", None) or 100),
            window_rows=int(getattr(config, "window_rows", None) or 4),
            block=int(getattr(config, "waveform_stream_block", None) or 256),
        )
    else:
        ds = ZarrCubeDataset(config.fname_dataset, spec=_cube_spec(config))
    config.input_hw = tuple(int(v) for v in ds.window_shape[:2])
    return ds


def _replicate_state(state, mesh):
    """Pin train state replicated on the mesh (deterministic placement for
    the per-batch jitted steps; on one device this is a no-op)."""
    if mesh is None:
        return state
    from spectrogram_cube_clustering_tpu import core as _core

    return jax.device_put(state, _core.replicated_sharding(mesh))


def _train_stream(config, mesh=None):
    """loadmode='stream': windows never materialize in host RAM at once —
    Zarr cube items (or H5 catalog blocks, `datafiletype='h5'`) stream
    through the prefetch loader into per-batch jitted steps (reference
    `loadmode` knob, AEC_train.py:55 / production.py 'ram' path; the
    reference only ever loads to RAM). With a mesh, each streamed batch
    arrives sharded over it (see _stream_sharding)."""
    from spectrogram_cube_clustering_tpu.data import train_val_split

    ds = _stream_dataset(config)
    normalize = _np_normalizer(config)
    item_fn = lambda i: normalize(ds.item(i))  # noqa: E731

    results = []
    for run_count, hp in enumerate(config.sweep(), start=1):
        print("-" * 80)
        print(
            f"Hyperparameter Tuning Run {run_count}/{config.runs} "
            f"(stream): {hp}"
        )
        config.init_output_env(**hp)
        batch_size, lr = int(hp["batch_size"]), float(hp["lr"])
        sample = jnp.asarray(item_fn(0)[:2])
        sharding = _stream_sharding(config, mesh, batch_size)

        def make_loader(indices=None, n_items=len(ds)):
            from spectrogram_cube_clustering_tpu.data import PrefetchLoader

            return PrefetchLoader(
                item_fn, n_items, batch_size,
                num_workers=int(getattr(config, "workers", None) or 4),
                sharding=sharding,
                indices=indices,
                item_windows=ds.windows_per_item,
                item_meta=(ds.window_shape, np.float32),
                # compressed wire for transfer-bound links (bfloat16/
                # float16 half-width casts or per-sample symmetric int8);
                # the jitted steps restore f32 on device
                transfer_dtype=getattr(
                    config, "stream_transfer_dtype", None
                ) or None,
            )

        if config.model == "AEC":
            idx_tra, idx_val = train_val_split(len(ds))
            model = make_model(config)
            state = _replicate_state(
                _train.create_train_state(
                    model, jax.random.key(getattr(config, "seed", 0) or 0),
                    sample, lr=lr,
                ),
                mesh,
            )
            out = _train.train_aec_stream(
                model, state,
                lambda: make_loader(list(idx_tra)),
                _train.AECConfig(
                    n_epochs=int(config.n_epochs),
                    early_stopping=bool(getattr(config, "early_stopping", True)),
                    patience=int(getattr(config, "patience", 10)),
                    verbose=bool(getattr(config, "show", False)),
                ),
                make_val_loader=lambda: make_loader(list(idx_val)),
                # preemption-safe like the ram path: full-state snapshot
                # in tmp/, resumable via config `resume = True`
                snapshot_path=os.path.join(config.savepath_chkpnt, "SNAPSHOT"),
                resume=bool(getattr(config, "resume", False)),
            )
            # same artifacts as the ram path; TB scalars replayed from the
            # history (the stream loop has no live log_scalar hook)
            writer, log_scalar = _tb_writer(config, config.savepath_run)
            if log_scalar is not None:
                for e, tr, va in zip(out["history"]["epoch"],
                                     out["history"]["train"],
                                     out["history"]["validation"]):
                    log_scalar("Training MSE", tr, e)
                    log_scalar("Validation MSE", va, e)
            _save_aec_artifacts(
                config, model, out, item_fn(0)[:4], writer=writer
            )
        elif config.model == "DEC":
            # same fallback chain as the ram path (_train_dec_run):
            # hp sweep value, else config-level n_clusters, else 5
            n_clusters = int(
                hp.get("n_clusters", getattr(config, "n_clusters", 5))
            )
            model = make_model(config, n_clusters=n_clusters)
            state = _train.create_train_state(
                model, jax.random.key(getattr(config, "seed", 0) or 0),
                sample, lr=lr,
            )
            state = _replicate_state(
                state.replace(params=load_aec_params(config, model)), mesh
            )
            init_mode = getattr(config, "init", "gmm")
            initial = None
            if init_mode == "load":
                gmm_dir = _gmm_artifacts_dir(config, n_clusters)
                initial = (
                    np.load(os.path.join(gmm_dir, "labels.npy")),
                    np.load(os.path.join(gmm_dir, "centroids.npy")),
                )
                _record_gmm_provenance(config, n_clusters, gmm_dir)
            out = _train.train_dec_stream(
                model, state, make_loader, ds.n_windows,
                _train.DECConfig(
                    n_clusters=n_clusters, n_epochs=int(config.n_epochs),
                    gamma=float(hp.get("gamma", 0.001)),
                    tol=float(hp.get("tol", 0.003)),
                    update_interval=int(getattr(config, "update_interval", -1)),
                    init=init_mode,
                    kmeans_n_init=int(getattr(config, "km_n_init", 100)),
                    kmeans_max_iter=int(getattr(config, "km_max_iter", 1000)),
                    seed=int(getattr(config, "seed", 2009) or 2009),
                    verbose=bool(getattr(config, "show", False)),
                ),
                initial=initial,
                snapshot_path=os.path.join(config.savepath_chkpnt, "SNAPSHOT"),
                resume=bool(getattr(config, "resume", False)),
            )
            # same artifacts + TB output as the ram path; scalars replayed
            # from the histories (the stream loop has no live hook)
            writer, log_scalar = _tb_writer(config, config.savepath_run)
            if log_scalar is not None:
                h = out["history"]
                for i, t, r, c in zip(h["iteration"], h["total"],
                                      h["reconstruction"], h["clustering"]):
                    log_scalar("Loss", t, i)
                    log_scalar("MSE", r, i)
                    log_scalar("KLD", c, i)
                for i, dl in zip(out["deltas"]["iteration"],
                                 out["deltas"]["delta"]):
                    log_scalar("delta", dl, i)
            _save_dec_artifacts(
                config, out, writer, batch_size=batch_size, lr=lr,
                n_clusters=n_clusters,
                gamma=float(hp.get("gamma", 0.001)),
                tol=float(hp.get("tol", 0.003)),
            )
        else:
            raise ValueError(f"unknown model {config.model!r}")
        out["savepath_run"] = config.savepath_run
        results.append(out)
    return results


def train(config, mesh=None):
    """Run the full hp sweep. Returns a list of per-run result dicts."""
    if config.model not in ("AEC", "DEC"):
        # before load_data: model='GMM' loads a single latent array whose
        # unpack below would raise a confusing 'too many values' instead
        # of this error (GMM runs through workflow.gmm_fit / mode='fit')
        raise ValueError(
            f"unknown model {config.model!r} for mode='train' "
            "(GMM fitting runs via mode='fit' / workflow.gmm_fit)"
        )
    if getattr(config, "loadmode", "ram") == "stream":
        return _train_stream(config, mesh)
    tra_x, val_x = load_data(config)
    tra_x = _normalize(config, tra_x)
    val_x = _normalize(config, val_x)
    print(
        f"Dataset has {len(tra_x) + (len(val_x) if val_x is not None else 0)}"
        " samples."
    )

    results = []
    for run_count, hp in enumerate(config.sweep(), start=1):
        print("-" * 80)
        print(f"Hyperparameter Tuning Run {run_count}/{config.runs}: {hp}")
        config.init_output_env(**hp)
        if config.model == "AEC":
            out = _train_aec_run(config, hp, tra_x, val_x, mesh)
        elif config.model == "DEC":
            out = _train_dec_run(config, hp, tra_x, mesh)
        else:
            raise ValueError(f"unknown model {config.model!r}")
        results.append(out)
    return results


def _train_aec_run(config, hp, tra_x, val_x, mesh):
    batch_size, lr = int(hp["batch_size"]), float(hp["lr"])
    model = make_model(config)
    tra = _train.make_batched_data(tra_x, batch_size=batch_size, mesh=mesh)
    val = (
        _train.make_batched_data(val_x, batch_size=batch_size, mesh=mesh)
        if val_x is not None and len(val_x)
        else None
    )
    state = _train.create_train_state(
        model, jax.random.key(getattr(config, "seed", 0) or 0),
        sample_input(tra_x), lr=lr,
    )
    writer, log_scalar = _tb_writer(config, config.savepath_run)

    def save_checkpoint(name, params):
        path = os.path.join(config.savepath_chkpnt, name)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        save(path, params)

    out = _train.train_aec(
        model, state, tra, val,
        _train.AECConfig(
            n_epochs=int(config.n_epochs),
            early_stopping=bool(getattr(config, "early_stopping", True)),
            patience=int(getattr(config, "patience", 10)),
            verbose=bool(getattr(config, "show", False)),
        ),
        log_scalar=log_scalar,
        save_checkpoint=save_checkpoint,
        # preemption-safe: full-state snapshot in tmp/, resumable via
        # config `resume = True` pointing the run dir at the same place
        snapshot_path=os.path.join(config.savepath_chkpnt, "SNAPSHOT"),
        resume=bool(getattr(config, "resume", False)),
        # epochs per device call: >1 keeps the early-stopping state on
        # device and amortizes host round trips (train_aec docstring)
        sync_every=int(getattr(config, "sync_every", None) or 1),
    )
    _save_aec_artifacts(config, model, out, tra_x, writer=writer)
    out["savepath_run"] = config.savepath_run
    return out


def _save_dec_artifacts(config, out, writer, *, batch_size, lr, n_clusters,
                        gamma, tol):
    """DEC run artifacts shared by the ram and stream paths: initial/final
    params, history CSVs, TB breadcrumbs + hparams summary (reference
    models.py:992-998, 1213-1229). One writer — the stream path used to
    carry a drifting copy that silently dropped the TB output."""
    if out["initial_params"] is not None:
        # absent exactly when resuming: the restored params are
        # mid-training, and the original run already saved the real
        # initialization (reference artifact DEC_Params_Initial,
        # models.py:1009-1012)
        save(
            os.path.join(config.savepath_run, "DEC_Params_Initial"),
            out["initial_params"],
        )
    save(
        os.path.join(config.savepath_run, "DEC_Params_Final"),
        out["state"].params,
    )
    _utils.save_history(
        {"Iteration": out["history"]["iteration"],
         "Loss": out["history"]["total"],
         "MSE": out["history"]["reconstruction"],
         "KLD": out["history"]["clustering"]},
        os.path.join(config.savepath_run, "DEC_history.csv"),
    )
    if out["deltas"]["iteration"]:
        _utils.save_history(
            {"Iteration": out["deltas"]["iteration"],
             "Delta": out["deltas"]["delta"]},
            os.path.join(config.savepath_run, "Delta_history.csv"),
        )
    if writer is not None:
        # breadcrumbs (reference models.py:992-998, 1229)
        writer.add_text("Pretrained AEC Weights", str(config.saved_weights))
        writer.add_text(
            "Path to Saved Weights",
            os.path.join(config.savepath_run, "DEC_Params_Final"),
        )
        # run summary as TB hparams (reference models.py:1213-1225)
        final = out["history"]
        writer.add_hparams(
            {"batch_size": batch_size, "lr": lr, "n_clusters": n_clusters,
             "gamma": gamma, "tol": tol},
            {"hparam/final_loss": final["total"][-1] if final["total"] else 0.0,
             "hparam/epochs": out["last_epoch"],
             "hparam/stopped_early": int(out["stopped_early"])},
        )
        writer.close()


def _train_dec_run(config, hp, tra_x, mesh):
    batch_size, lr = int(hp["batch_size"]), float(hp["lr"])
    n_clusters = int(hp.get("n_clusters", getattr(config, "n_clusters", 5)))
    gamma = float(hp.get("gamma", 0.001))
    tol = float(hp.get("tol", 0.003))

    model = make_model(config, n_clusters=n_clusters)
    data = _train.make_batched_data(tra_x, batch_size=batch_size, mesh=mesh)
    state = _train.create_train_state(
        model, jax.random.key(getattr(config, "seed", 0) or 0),
        sample_input(tra_x), lr=lr,
    )
    # Inherit the pretrained autoencoder (reference models.py:977-979).
    params = load_aec_params(config, model)
    state = state.replace(params=params)

    init_mode = getattr(config, "init", "gmm")
    initial = None
    if init_mode == "load":
        gmm_dir = _gmm_artifacts_dir(config, n_clusters)
        initial = (
            np.load(os.path.join(gmm_dir, "labels.npy")),
            np.load(os.path.join(gmm_dir, "centroids.npy")),
        )
        _record_gmm_provenance(config, n_clusters, gmm_dir)

    writer, log_scalar = _tb_writer(config, config.savepath_run)

    snapshot_cb = None
    if bool(getattr(config, "figures", False)):
        from spectrogram_cube_clustering_tpu.analysis import plotting

        def snapshot_cb(epoch, labels, z, centroids, initial=None):
            # t-SNE + figure families on the training snapshot, persisted
            # off-thread (reference models.py:1166-1192); honors
            # `tsne_backend=jax` the same as fit/predict do. The callback
            # stays non-None on every process (its presence gates the
            # snapshot eval inside train_dec, which all processes must
            # issue), but the host-side t-SNE + figure writes run on
            # process 0 only.
            if jax.process_index() != 0:
                return
            from spectrogram_cube_clustering_tpu.workflow.fit import _tsne

            # comparative figures baseline = the pre-refinement snapshot
            # (reference passes z_array0/labels_prev/initial centroids,
            # models.py:1176-1181); on a resumed run the original
            # initialization is gone, so current-vs-current is the
            # honest fallback
            z0, labels0, cen0 = (
                initial if initial is not None else (z, labels, centroids)
            )
            figs = plotting.analyze_dec(
                tra_x, z0, z, labels0, labels, cen0, centroids,
                _tsne(config, z), epoch=epoch,
            )
            plotting.plotter_async(figs, config.savepath_run, epoch=epoch)

    out = _train.train_dec(
        model, state, data,
        _train.DECConfig(
            n_clusters=n_clusters,
            n_epochs=int(config.n_epochs),
            gamma=gamma,
            tol=tol,
            update_interval=int(getattr(config, "update_interval", -1)),
            init=init_mode,
            kmeans_n_init=int(getattr(config, "km_n_init", 100)),
            kmeans_max_iter=int(getattr(config, "km_max_iter", 1000)),
            # same seed source as gmm_fit: init='gmm' here and a prior
            # gmm_fit run must produce the same initialization
            seed=int(getattr(config, "seed", 2009) or 2009),
            verbose=bool(getattr(config, "show", False)),
        ),
        initial=initial,
        log_scalar=log_scalar,
        snapshot_cb=snapshot_cb,
        snapshot_path=os.path.join(config.savepath_chkpnt, "SNAPSHOT"),
        resume=bool(getattr(config, "resume", False)),
    )
    _save_dec_artifacts(
        config, out, writer, batch_size=batch_size, lr=lr,
        n_clusters=n_clusters, gamma=gamma, tol=tol,
    )
    out["savepath_run"] = config.savepath_run
    return out
