"""AEC pretraining loop.

Reference semantics (Cluster/models.py:761-926 AEC_training):
- per-epoch training pass (MSE, Adam) + validation pass;
- early stopping: track best validation loss, stop after `patience`
  consecutive non-improvements once epoch > patience (models.py:857-874);
- final weights are the best-validation checkpoint when early stopping is on
  (models.py:916-923);
- history of (epoch, train, validation) losses.

TPU-first mechanics: one jitted `lax.scan` per epoch over device-resident
batches (train/layout.py); epoch losses are exact means over real samples
(padding masked), matching the reference's running_loss/running_size
accounting (models.py:160-167).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from spectrogram_cube_clustering_tpu.train.layout import BatchedData


@dataclasses.dataclass
class AECConfig:
    n_epochs: int = 20
    early_stopping: bool = True
    patience: int = 10
    verbose: bool = False


def _masked_mse_per_sample(x_rec, x):
    d = x_rec - x
    return jnp.mean(d * d, axis=tuple(range(1, x.ndim)))  # (B,)


def _make_epoch_bodies(model):
    """Un-jitted (train_epoch, eval_epoch) scan bodies — the single
    source of the masked-MSE epoch accounting, shared by the per-epoch
    jitted fns and the fused `sync_every` while_loop (which must stay
    bitwise identical to each other)."""

    def loss_sum(params, x, mask):
        out = model.apply({"params": params}, x)
        x_rec = out[0]
        per = _masked_mse_per_sample(x_rec, x)
        nvalid = jnp.maximum(jnp.sum(mask), 1.0)
        batch_loss = jnp.sum(per * mask) / nvalid
        return batch_loss, nvalid

    def train_epoch(state, xb, maskb):
        def step(state, batch):
            x, mask = batch

            def lf(params):
                batch_loss, nvalid = loss_sum(params, x, mask)
                return batch_loss, nvalid

            (batch_loss, nvalid), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params
            )
            state = state.apply_gradients(grads=grads)
            return state, batch_loss * nvalid

        state, sums = lax.scan(step, state, (xb, maskb))
        return state, jnp.sum(sums) / jnp.maximum(jnp.sum(maskb), 1.0)

    def eval_epoch(params, xb, maskb):
        def step(_, batch):
            x, mask = batch
            batch_loss, nvalid = loss_sum(params, x, mask)
            return None, batch_loss * nvalid

        _, sums = lax.scan(step, None, (xb, maskb))
        return jnp.sum(sums) / jnp.maximum(jnp.sum(maskb), 1.0)

    return train_epoch, eval_epoch


def make_epoch_fns(model):
    """Build (train_epoch, eval_epoch), each one jitted scan over batches."""
    train_epoch, eval_epoch = _make_epoch_bodies(model)
    return jax.jit(train_epoch), jax.jit(eval_epoch)


def make_fused_epochs_fn(model, n_epochs: int, patience: int,
                         early_stopping: bool):
    """Multi-epoch training entirely on device.

    Returns a jitted fn running epochs [epoch0, epoch_end) as one
    `lax.while_loop` — training scan, validation scan, and the reference's
    early-stopping bookkeeping (best-val params, strike counting,
    models.py:857-874) all live in the loop carry, so the host syncs once
    per *call* instead of once per epoch. On a remote-attached TPU the
    per-epoch host round trip costs more than a whole 1M-sample epoch
    (benchmarks/RESULTS.md); this amortizes it by `sync_every`.

    The carry tracks (state, best_val, best_params, have_best, strikes,
    epoch, done); histories are written into fixed (n_epochs,) buffers at
    the epoch index. Calling it repeatedly with the returned loop state
    chunks training without changing semantics — histories/stopping are
    bitwise identical to the per-epoch Python loop.
    """

    train_epoch_body, eval_epoch_body = _make_epoch_bodies(model)

    @jax.jit
    def run(state, tra_x, tra_mask, val_x, val_mask, loop, epoch_end):
        # loop: dict(best_val f32, best_params, have_best bool, strikes i32,
        #            epoch i32, done bool, tra_hist (E,), val_hist (E,))
        def cond(c):
            return jnp.logical_and(c["epoch"] < epoch_end,
                                   jnp.logical_not(c["done"]))

        def body(c):
            state = c["state"]
            epoch = c["epoch"]
            state, tra_loss = train_epoch_body(state, tra_x, tra_mask)
            val_loss = (
                eval_epoch_body(state.params, val_x, val_mask)
                if val_x is not None else tra_loss
            )
            c = dict(c)
            c["state"] = state
            c["tra_hist"] = c["tra_hist"].at[epoch].set(tra_loss)
            c["val_hist"] = c["val_hist"].at[epoch].set(val_loss)
            if early_stopping:
                improved = val_loss < c["best_val"]
                c["best_params"] = jax.tree.map(
                    lambda b, p: jnp.where(improved, p, b),
                    c["best_params"], state.params,
                )
                c["have_best"] = jnp.logical_or(c["have_best"], improved)
                c["best_val"] = jnp.where(improved, val_loss, c["best_val"])
                # strikes: 0 on improvement; else 1 at epoch 0, +1 after
                # (reference models.py:866-871)
                c["strikes"] = jnp.where(
                    improved, 0,
                    jnp.where(epoch == 0, 1, c["strikes"] + 1),
                )
                c["done"] = jnp.logical_and(
                    epoch > patience, c["strikes"] > patience
                )
            c["epoch"] = epoch + 1
            return c

        init = dict(loop)
        init["state"] = state
        out = lax.while_loop(cond, body, init)
        state = out.pop("state")
        return state, out

    return run


def _init_loop_state(state, n_epochs: int):
    """Fresh loop-state pytree for `make_fused_epochs_fn` chunk calls."""
    return {
        "best_val": jnp.float32(jnp.inf),
        "best_params": jax.tree.map(lambda a: a, state.params),
        "have_best": jnp.bool_(False),
        "strikes": jnp.int32(0),
        "epoch": jnp.int32(0),
        "done": jnp.bool_(False),
        "tra_hist": jnp.full((n_epochs,), jnp.nan, jnp.float32),
        "val_hist": jnp.full((n_epochs,), jnp.nan, jnp.float32),
    }


def make_step_fns(model):
    """Per-batch (train_step, eval_step) for the streaming path — same
    masked-MSE semantics as the scan epoch, one jitted step per device
    batch fed by data.prefetch.PrefetchLoader."""

    from spectrogram_cube_clustering_tpu.core.precision import dequant_wire

    def loss_fn(params, x, n_valid):
        # restore full width on device when the loader shipped
        # reduced-width wire batches (PrefetchLoader transfer_dtype,
        # incl. the int8 {'q','scale'} format) — free inside the jitted
        # step, and keeps model/loss compute in f32
        x = dequant_wire(x)
        out = model.apply({"params": params}, x)
        per = _masked_mse_per_sample(out[0], x)
        mask = (jnp.arange(x.shape[0]) < n_valid).astype(x.dtype)
        return jnp.sum(per * mask) / jnp.maximum(n_valid, 1.0)

    @jax.jit
    def train_step(state, x, n_valid):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, n_valid)
        return state.apply_gradients(grads=grads), loss

    @jax.jit
    def eval_step(params, x, n_valid):
        return loss_fn(params, x, n_valid)

    return train_step, eval_step


def train_aec_stream(
    model, state, make_loader, config: AECConfig, make_val_loader=None,
    snapshot_path=None, snapshot_every: int = 1, resume: bool = False,
):
    """AEC pretraining over a streaming loader (windows exceed HBM).

    `make_loader()` returns an iterable of (device_batch, n_valid) per
    epoch (data.prefetch.PrefetchLoader). Host IO overlaps the jitted
    step; epoch losses weight batches by valid count. Early-stopping and
    history semantics match `train_aec`.

    With `snapshot_path`, a full train-state snapshot (optimizer state +
    early-stop carry + history) is written every `snapshot_every` epochs;
    `resume=True` picks training up from it after preemption — the same
    epoch-granular contract as `train_aec` and `train_dec_stream`, and
    the snapshot format is interchangeable with the scan path's.
    """
    import numpy as np

    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    train_step, eval_step = make_step_fns(model)
    best_val = float("inf")
    best_params = None
    strikes = 0
    history = {"epoch": [], "train": [], "validation": []}
    start_epoch = 0
    finished = False
    if resume and snapshot_path is not None and ckpt.snapshot_exists(snapshot_path):
        state, meta, extra = ckpt.restore_snapshot(
            snapshot_path, state, extra_template=state.params
        )
        start_epoch = meta["epoch"]
        history = meta["history"]
        best_val = meta["best_val"]
        strikes = meta["strikes"]
        if meta.get("have_best"):
            best_params = extra
        # honor an early-stop snapshot (written by any path — the formats
        # are interchangeable): resuming past the stopping point would
        # burn the epoch budget the stop existed to save
        finished = bool(meta.get("done", False))
    last_epoch = start_epoch
    for epoch in () if finished else range(start_epoch, config.n_epochs):
        last_epoch = epoch + 1
        # losses stay on device until epoch end: a float() per batch would
        # serialize every step on the dispatch round trip (disastrous on
        # remote-attached devices — benchmarks/RESULTS.md streaming notes)
        losses, ns = [], []
        for x, n_valid in make_loader():
            state, loss = train_step(state, x, jnp.float32(n_valid))
            losses.append(loss)
            ns.append(n_valid)
        ln = np.asarray(jax.device_get(losses), np.float64)
        nn = np.asarray(ns, np.float64)
        tra_loss = float((ln * nn).sum() / max(nn.sum(), 1))
        if make_val_loader is not None:
            vl, vn = [], []
            for x, n_valid in make_val_loader():
                vl.append(eval_step(state.params, x, jnp.float32(n_valid)))
                vn.append(n_valid)
            vla = np.asarray(jax.device_get(vl), np.float64)
            vna = np.asarray(vn, np.float64)
            val_loss = float((vla * vna).sum() / max(vna.sum(), 1))
        else:
            val_loss = tra_loss
        history["epoch"].append(epoch + 1)
        history["train"].append(tra_loss)
        history["validation"].append(val_loss)
        if config.early_stopping:
            if val_loss < best_val:
                strikes = 0
                best_val = val_loss
                best_params = jax.tree.map(lambda a: a, state.params)
            else:
                strikes += 1
            if epoch > config.patience and strikes > config.patience:
                finished = True
        if snapshot_path is not None and (
            (epoch + 1) % snapshot_every == 0 or finished
            or epoch + 1 == config.n_epochs
        ):
            # a snapshot written AT the early stop carries done=True so
            # any later resume (this path or the scan/fused ones) doesn't
            # train past the stopping point; the final epoch always
            # snapshots (fused-path parity)
            ckpt.save_snapshot(
                snapshot_path, state,
                {"epoch": epoch + 1, "history": history,
                 "best_val": best_val, "strikes": strikes,
                 "have_best": best_params is not None,
                 "done": finished},
                extra=best_params if best_params is not None else state.params,
            )
        if finished:
            break
    final = best_params if (config.early_stopping and best_params is not None) else state.params
    return {
        "state": state, "final_params": final, "best_val": best_val,
        "history": history,
        # same result contract as train_aec (the workflow's shared
        # artifact writer keys on last_epoch)
        "stopped_early": finished,
        "last_epoch": last_epoch,
    }


def train_aec(
    model,
    state,
    tra: BatchedData,
    val: Optional[BatchedData],
    config: AECConfig,
    log_scalar: Optional[Callable[[str, float, int], None]] = None,
    save_checkpoint: Optional[Callable[[str, object], None]] = None,
    snapshot_path: Optional[str] = None,
    snapshot_every: int = 1,
    resume: bool = False,
    sync_every: int = 1,
) -> Dict:
    """Run AEC pretraining. Returns dict with final state, best params,
    history, and the stop epoch.

    With `snapshot_path`, a full train-state snapshot (optimizer state +
    loop metadata) is written every `snapshot_every` epochs; `resume=True`
    picks training up from it after preemption (the reference restarts
    from scratch — it never saves optimizer state, SURVEY.md §5).

    `sync_every > 1` runs that many epochs per device call (one jitted
    `lax.while_loop` holding the early-stopping state on device,
    `make_fused_epochs_fn`) and replays logging/snapshots from the history
    buffers at each sync point — same histories, stop epoch, and artifacts,
    ~`sync_every`× fewer host round trips. Checkpoint callbacks fire at
    sync granularity (the final best/last params are identical).
    """
    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    if sync_every > 1:
        return _train_aec_fused(
            model, state, tra, val, config,
            log_scalar=log_scalar, save_checkpoint=save_checkpoint,
            snapshot_path=snapshot_path, snapshot_every=snapshot_every,
            resume=resume, sync_every=sync_every,
        )

    train_epoch, eval_epoch = make_epoch_fns(model)

    best_val = float("inf")
    best_params = None
    strikes = 0
    finished = False
    history: Dict[str, List[float]] = {"epoch": [], "train": [], "validation": []}
    start_epoch = 0

    if resume and snapshot_path is not None and ckpt.snapshot_exists(snapshot_path):
        state, meta, extra = ckpt.restore_snapshot(
            snapshot_path, state, extra_template=state.params
        )
        start_epoch = meta["epoch"]
        history = meta["history"]
        best_val = meta["best_val"]
        strikes = meta["strikes"]
        if meta.get("have_best"):
            best_params = extra
        # a fused-path snapshot written at the early stop carries done=True;
        # honor it instead of training past the stopping point
        finished = bool(meta.get("done", False))
        if config.verbose:
            print(f"Resumed from {snapshot_path} at epoch {start_epoch}")

    epoch = start_epoch - 1
    for epoch in (
        () if finished else range(start_epoch, config.n_epochs)
    ):
        state, tra_loss = train_epoch(state, tra.x, tra.mask)
        tra_loss = float(tra_loss)
        val_loss = (
            float(eval_epoch(state.params, val.x, val.mask))
            if val is not None
            else tra_loss
        )
        history["epoch"].append(epoch + 1)
        history["train"].append(tra_loss)
        history["validation"].append(val_loss)
        if log_scalar is not None:
            log_scalar("Training MSE", tra_loss, epoch + 1)
            log_scalar("Validation MSE", val_loss, epoch + 1)
        if config.verbose:
            print(
                f"Epoch [{epoch + 1}/{config.n_epochs}] "
                f"train={tra_loss:.4e} val={val_loss:.4e}"
            )

        if config.early_stopping:
            if val_loss < best_val:
                strikes = 0
                best_val = val_loss
                best_params = jax.tree.map(lambda a: a, state.params)
                if save_checkpoint is not None:
                    save_checkpoint("AEC_Best_Weights", best_params)
            else:
                strikes = 1 if epoch == 0 else strikes + 1
            if epoch > config.patience and strikes > config.patience:
                finished = True
        elif save_checkpoint is not None:
            save_checkpoint(f"AEC_Params_{epoch + 1:03d}", state.params)

        if snapshot_path is not None and (
            (epoch + 1) % snapshot_every == 0 or finished
            or epoch + 1 == config.n_epochs
        ):
            # a snapshot written AT the early stop carries done=True so a
            # resume (this path or the fused/stream ones — interchangeable
            # formats) doesn't train past the stopping point; the final
            # epoch always snapshots (fused-path parity) so a post-run
            # resume=True is a no-op instead of re-training the tail
            ckpt.save_snapshot(
                snapshot_path, state,
                {"epoch": epoch + 1, "history": history,
                 "best_val": best_val, "strikes": strikes,
                 "have_best": best_params is not None,
                 "done": finished},
                extra=best_params if best_params is not None else state.params,
            )
        if finished:
            break

    # Final = best-validation params when early stopping (models.py:916-923).
    final_params = (
        best_params
        if (config.early_stopping and best_params is not None)
        else state.params
    )
    return {
        "state": state,
        "final_params": final_params,
        "best_val": best_val,
        "history": history,
        "stopped_early": finished,
        "last_epoch": epoch + 1,
    }


def _train_aec_fused(
    model, state, tra, val, config,
    log_scalar=None, save_checkpoint=None,
    snapshot_path=None, snapshot_every=1, resume=False, sync_every=8,
):
    """Chunked on-device AEC training (see `train_aec(sync_every=...)`).

    Runs `sync_every` epochs per jitted call with early stopping evaluated
    on device; at each sync point replays the per-epoch history into the
    logging/snapshot callbacks. Snapshot format is interchangeable with the
    per-epoch path, so resume works across both.
    """
    import numpy as np

    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    n_epochs = int(config.n_epochs)
    run = make_fused_epochs_fn(
        model, n_epochs, int(config.patience), bool(config.early_stopping)
    )
    loop = _init_loop_state(state, n_epochs)
    history: Dict[str, List[float]] = {
        "epoch": [], "train": [], "validation": []
    }

    if resume and snapshot_path is not None and ckpt.snapshot_exists(snapshot_path):
        state, meta, extra = ckpt.restore_snapshot(
            snapshot_path, state, extra_template=state.params
        )
        history = meta["history"]
        loop["epoch"] = jnp.int32(meta["epoch"])
        loop["best_val"] = jnp.float32(meta["best_val"])
        loop["strikes"] = jnp.int32(meta["strikes"])
        loop["have_best"] = jnp.bool_(bool(meta.get("have_best")))
        loop["done"] = jnp.bool_(bool(meta.get("done", False)))
        if meta.get("have_best"):
            loop["best_params"] = extra
        for e, t, v in zip(history["epoch"], history["train"],
                           history["validation"]):
            loop["tra_hist"] = loop["tra_hist"].at[e - 1].set(t)
            loop["val_hist"] = loop["val_hist"].at[e - 1].set(v)
        if config.verbose:
            print(f"Resumed from {snapshot_path} at epoch {meta['epoch']}")

    epoch = int(loop["epoch"])
    prev_best = float(loop["best_val"])
    val_x, val_mask = (val.x, val.mask) if val is not None else (None, None)
    while epoch < n_epochs and not bool(loop["done"]):
        epoch_end = min(epoch + int(sync_every), n_epochs)
        state, loop = run(
            state, tra.x, tra.mask, val_x, val_mask, loop,
            jnp.int32(epoch_end),
        )
        new_epoch = int(loop["epoch"])
        done = bool(loop["done"])
        tra_hist = np.asarray(loop["tra_hist"])
        val_hist = np.asarray(loop["val_hist"])
        for e in range(epoch, new_epoch):
            history["epoch"].append(e + 1)
            history["train"].append(float(tra_hist[e]))
            history["validation"].append(float(val_hist[e]))
            if log_scalar is not None:
                log_scalar("Training MSE", float(tra_hist[e]), e + 1)
                log_scalar("Validation MSE", float(val_hist[e]), e + 1)
            if config.verbose:
                print(
                    f"Epoch [{e + 1}/{n_epochs}] "
                    f"train={float(tra_hist[e]):.4e} "
                    f"val={float(val_hist[e]):.4e}"
                )
        if save_checkpoint is not None:
            if config.early_stopping:
                best_val = float(loop["best_val"])
                if best_val < prev_best:
                    save_checkpoint("AEC_Best_Weights", loop["best_params"])
                    prev_best = best_val
            elif new_epoch > epoch:
                save_checkpoint(f"AEC_Params_{new_epoch:03d}", state.params)
        # snapshot when a snapshot_every boundary was CROSSED since the
        # last sync (sync points rarely land exactly on a multiple), at
        # the final epoch, or on early stop
        snap = max(int(snapshot_every), 1)
        if snapshot_path is not None and (
            new_epoch // snap > epoch // snap or new_epoch == n_epochs
            or done
        ):
            have_best = bool(loop["have_best"])
            ckpt.save_snapshot(
                snapshot_path, state,
                {"epoch": new_epoch, "history": history,
                 "best_val": float(loop["best_val"]),
                 "strikes": int(loop["strikes"]), "have_best": have_best,
                 # early-stop flag: without it, resuming from a snapshot
                 # written AT the stop would train past the stopping point
                 "done": done},
                extra=loop["best_params"] if have_best else state.params,
            )
        epoch = new_epoch
        if done:
            break

    have_best = bool(loop["have_best"])
    final_params = (
        loop["best_params"]
        if (config.early_stopping and have_best)
        else state.params
    )
    return {
        "state": state,
        "final_params": final_params,
        "best_val": float(loop["best_val"]),
        "history": history,
        "stopped_early": bool(loop["done"]),
        "last_epoch": epoch,
    }
