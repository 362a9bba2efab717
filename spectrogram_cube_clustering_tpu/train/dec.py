"""DEC refinement loop.

Reference semantics (Cluster/models.py:929-1231 DEC_training):
- cluster initialization via load/rand/kmeans/gmm on the frozen latent space
  (initialize_clusters, models.py:498-543), centroids copied into the model
  (models.py:1006-1008);
- update_interval batches between target-distribution refreshes; -1 means 2
  refreshes per epoch: ceil(M / (batch * 2)) (models.py:986-989);
- each refresh runs a full-dataset eval -> q -> p = target_distribution(q),
  computes delta = fraction of changed labels, and stops when delta < tol
  (models.py:1093-1111);
- per-batch loss = MSE + gamma * KL(p_slice || q) / batch with p sliced by
  the running sample offset (models.py:1113-1126) — valid because loaders
  never shuffle;
- histories of per-iteration accumulated losses and per-refresh deltas.

TPU-first mechanics: the full-dataset eval is one jitted scan (`full_eval`);
the batches between refreshes run as one jitted "segment" scan indexing the
device-resident dataset, so the only host sync per segment is the delta
scalar — the reference instead pays a D2H copy per batch (models.py:89-90).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spectrogram_cube_clustering_tpu.core.precision import wire_array
from spectrogram_cube_clustering_tpu.models.dec import replace_centroids
from spectrogram_cube_clustering_tpu.ops.student_t import target_distribution
from spectrogram_cube_clustering_tpu.train.layout import BatchedData


@dataclasses.dataclass
class DECConfig:
    n_clusters: int = 5
    n_epochs: int = 400
    gamma: float = 0.001
    tol: float = 0.003
    update_interval: int = -1       # -1 => 2 refreshes/epoch (models.py:986-989)
    init: str = "gmm"               # load | rand | kmeans | gmm
    kmeans_n_init: int = 100
    kmeans_max_iter: int = 1000
    seed: int = 2009
    verbose: bool = False


@functools.partial(jax.jit, static_argnames=("apply_fn", "with_xr"))
def _full_eval_jit(apply_fn, params, xb, with_xr=False):
    def step(_, x):
        q, x_rec, z = apply_fn({"params": params}, x)
        return None, (q, z, x_rec if with_xr else None)

    _, (q, z, xr) = lax.scan(step, None, xb)
    q = q.reshape(-1, q.shape[-1])
    z = z.reshape(-1, z.shape[-1])
    # reference rounds q to 5 dp before use (models.py:94)
    q = jnp.round(q, 5)
    labels = jnp.argmax(q, axis=1)
    if with_xr:
        xr = xr.reshape(-1, *xr.shape[2:])
    return q, labels, z, xr


def full_eval(model, params, data: BatchedData, with_xr: bool = False):
    """Full-dataset inference: (q (M,K), labels (M,), z (M,D)) — plus the
    reconstructions (M, H, W, C) when `with_xr`.

    Reference: batch_eval (models.py:41-103), minus the per-batch D2H copies.
    """
    q, labels, z, xr = _full_eval_jit(model.apply, params, data.x, with_xr)
    m = data.n_samples
    if with_xr:
        return q[:m], labels[:m], z[:m], xr[:m]
    return q[:m], labels[:m], z[:m]


def _pad_p(p: jnp.ndarray, n_batches: int, batch: int) -> jnp.ndarray:
    k = p.shape[-1]
    flat = jnp.zeros((n_batches * batch, k), p.dtype).at[: p.shape[0]].set(p)
    return flat.reshape(n_batches, batch, k)


def _dec_loss(model, gamma: float, params, x, mask, p):
    """Masked DEC loss: per-sample MSE over valid rows + gamma * KL(p‖q)
    normalized by the valid count (reference models.py:1121-1128).

    Delegates to the exported `ops.losses.dec_loss` — the single loss
    body shared by the segment-scan and streaming step builders AND the
    public API, so loss-reproduction built on the export can never drift
    from what training optimized."""
    from spectrogram_cube_clustering_tpu.ops.losses import dec_loss

    q, x_rec, _ = model.apply({"params": params}, x)
    loss, (rec, clust) = dec_loss(x_rec, x, q, p, gamma, mask=mask)
    nvalid = jnp.maximum(jnp.sum(mask), 1.0)
    return loss, (rec, clust, nvalid)


def _dec_batch_step(model, gamma: float):
    """Single DEC train step (shared by the segment scans): returns
    (state, (loss*nv, rec*nv, clust*nv, nv)) for one (x, mask, p) batch."""

    def step(state, batch):
        x, mask, p = batch

        def lf(params):
            return _dec_loss(model, gamma, params, x, mask, p)

        (loss, (rec, clust, nvalid)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        return state, (loss * nvalid, rec * nvalid, clust * nvalid, nvalid)

    return step


def make_refresh_segment_fn(
    model, gamma: float, tol: float, m: int, nb: int, bsz: int,
    seg_len: int, do_refresh: bool,
):
    """One jitted call per refresh interval: (optional) full-dataset eval +
    target-distribution refresh + delta-label stop test + the following
    `seg_len`-batch training segment — with the stop decision taken ON
    DEVICE (`lax.cond` skips the segment when delta < tol, exactly the
    reference's break-before-training, models.py:1093-1111).

    The per-epoch Python loop in `train_dec` pays ~2 host syncs per
    segment (delta fetch + history sums); this fuses them into one
    dispatch + one fetch, which matters on high-RTT device attachments
    (see benchmarks/RESULTS.md host-sync notes). Numerics are identical:
    the same `full_eval` scan, 5-dp rounding, `target_distribution`, and
    segment scan run in the same order.

    Returns (state', p_all', labels' (m,), delta, stopped, sums).
    """
    step = _dec_batch_step(model, gamma)

    @jax.jit
    def fused(state, x_all, m_all, p_all, labels_prev, start):
        if do_refresh:
            def ev(_, x):
                q, _, _ = model.apply({"params": state.params}, x)
                return None, q

            _, q = lax.scan(ev, None, x_all)
            q = jnp.round(q.reshape(-1, q.shape[-1]), 5)[:m]
            labels = jnp.argmax(q, axis=1).astype(labels_prev.dtype)
            p_all = _pad_p(target_distribution(q), nb, bsz)
            delta = jnp.mean((labels != labels_prev).astype(jnp.float32))
            stopped = delta < tol
        else:
            labels = labels_prev
            delta = jnp.float32(1.0)
            stopped = jnp.bool_(False)

        def run(state):
            xs = lax.dynamic_slice_in_dim(x_all, start, seg_len, axis=0)
            ms = lax.dynamic_slice_in_dim(m_all, start, seg_len, axis=0)
            ps = lax.dynamic_slice_in_dim(p_all, start, seg_len, axis=0)
            return lax.scan(step, state, (xs, ms, ps))

        def skip(state):
            zeros = jnp.zeros((seg_len,), jnp.float32)
            return state, (zeros, zeros, zeros, zeros)

        state, sums = lax.cond(stopped, skip, run, state)
        return state, p_all, labels, delta, stopped, sums

    return fused


def make_segment_fn(model, gamma: float, seg_len: int):
    """Jitted scan over `seg_len` consecutive batches starting at `start`.

    The segment is sliced out of the device-resident dataset ONCE
    (`dynamic_slice_in_dim`) and the scan consumes it as `xs` — per-step
    dynamic gathers from the full (NB, B, H, W, C) buffer defeat XLA's
    scan pipelining and cost ~3x step throughput (VERDICT r1 weak #1;
    measured in benchmarks/RESULTS.md).

    Returns per-step (loss*nv, rec*nv, clust*nv, nv) arrays of shape
    (seg_len,) so the caller can log one history row per batch exactly
    like the reference (models.py:1150-1161).
    """
    step = _dec_batch_step(model, gamma)

    @jax.jit
    def segment(state, x_all, m_all, p_all, start):
        xs = lax.dynamic_slice_in_dim(x_all, start, seg_len, axis=0)
        ms = lax.dynamic_slice_in_dim(m_all, start, seg_len, axis=0)
        ps = lax.dynamic_slice_in_dim(p_all, start, seg_len, axis=0)
        return lax.scan(step, state, (xs, ms, ps))

    return segment


def _init_from_config(
    config: DECConfig,
    latent_dim: int,
    m_total: int,
    initial: Optional[Tuple[np.ndarray, np.ndarray]],
    z_provider,
) -> Tuple[np.ndarray, np.ndarray]:
    """Shared load/rand/kmeans/gmm cluster-init dispatch (reference
    models.py:498-543) — ONE definition for the scan and stream paths
    (their rand/seed parity depends on it); `z_provider()` supplies
    latents only when kmeans/gmm need them."""
    from spectrogram_cube_clustering_tpu import cluster as _cluster

    k = config.n_clusters
    if config.init == "load":
        if initial is None:
            raise ValueError("init='load' requires initial=(labels, centroids)")
        return np.asarray(initial[0]), np.asarray(initial[1])
    if config.init == "rand":
        rng = np.random.default_rng(config.seed)
        labels = rng.integers(0, k, size=m_total)
        return labels, rng.uniform(size=(k, latent_dim)).astype(np.float32)
    if config.init not in ("kmeans", "gmm"):
        raise ValueError(f"unknown init {config.init!r}")
    z = z_provider()
    if config.init == "kmeans":
        labels, centroids = _cluster.kmeans(
            z, k, n_init=config.kmeans_n_init,
            max_iter=config.kmeans_max_iter, seed=config.seed,
        )
    else:
        labels, centroids = _cluster.gmm(
            z, k, n_init=config.kmeans_n_init,
            kmeans_max_iter=config.kmeans_max_iter, seed=config.seed,
        )
    return np.asarray(labels), np.asarray(centroids)


def initialize_clusters(
    model,
    params,
    data: BatchedData,
    config: DECConfig,
    initial: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster init: (labels, centroids). Reference: models.py:498-543.

    `load` takes explicit (labels, centroids) via `initial` — the workflow
    layer reads them from the GMM artifact dir; the reference's equivalent
    path is broken in-tree (indexes labels by an attribute only the dead H5
    path sets, SURVEY.md §2.3 defect 5).
    """

    def z_provider():
        _, _, z = full_eval(model, params, data)
        if isinstance(z, jax.Array) and not z.is_fully_addressable:
            # multi-process mesh: gather latents so the dense k-means/GMM
            # run identically (same seeded input) on every host
            from spectrogram_cube_clustering_tpu.train.layout import (
                fetch_global,
            )

            z = fetch_global(z)
        return z

    return _init_from_config(
        config, model.latent_dim, data.n_samples, initial, z_provider
    )


def make_stream_fns(model, gamma: float):
    """Per-batch jitted (train_step, eval_step) for the streaming path —
    same loss semantics as the segment scan, fed by
    data.prefetch.PrefetchLoader batches."""

    from spectrogram_cube_clustering_tpu.core.precision import dequant_wire

    @jax.jit
    def train_step(state, x, p, n_valid):
        # restore full width on device when the loader shipped
        # reduced-width wire batches (PrefetchLoader transfer_dtype,
        # incl. the int8 {'q','scale'} format)
        x = dequant_wire(x)
        mask = (jnp.arange(x.shape[0]) < n_valid).astype(x.dtype)

        def lf(params):
            loss, (rec, clust, _) = _dec_loss(model, gamma, params, x, mask, p)
            return loss, (rec, clust)

        (loss, (rec, clust)), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, rec, clust

    @jax.jit
    def eval_step(params, x):
        q, _, z = model.apply({"params": params}, dequant_wire(x))
        return jnp.round(q, 5), z

    return train_step, eval_step


def full_eval_stream(eval_step, params, make_loader, m_total: int):
    """Streaming batch_eval: (q (M,K), labels (M,), z (M,D)) accumulated
    on host while batches stream through the device.

    Per-batch outputs stay on device until the loader is exhausted — a
    per-batch `np.asarray` would block every step on the fetch round trip
    and serialize the pipeline (benchmarks/RESULTS.md streaming notes).
    On a multi-process mesh the sharded outputs are all-gathered at the
    end (`fetch_global`), so every host returns the global q/z."""
    from spectrogram_cube_clustering_tpu.train.layout import fetch_global

    qs, zs, takes = [], [], []
    seen = 0
    for x, n_valid in make_loader():
        q, z = eval_step(params, x)
        take = min(n_valid, m_total - seen)
        qs.append(q)
        zs.append(z)
        takes.append(take)
        seen += take
    qs = fetch_global(qs)
    zs = fetch_global(zs)
    q = np.concatenate([qb[:t] for qb, t in zip(qs, takes)], axis=0)
    z = np.concatenate([zb[:t] for zb, t in zip(zs, takes)], axis=0)
    return q, q.argmax(axis=1), z


def train_dec_stream(
    model,
    state,
    make_loader,
    m_total: int,
    config: DECConfig,
    initial: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    snapshot_path: Optional[str] = None,
    resume: bool = False,
    snapshot_cb: Optional[Callable] = None,
    snapshot_every: int = 4,
) -> Dict:
    """DEC refinement over a streaming loader (windows exceed HBM).

    `make_loader()` yields (device_batch (B, H, W, C), n_valid) in a fixed
    order each epoch (the stale-p slicing, like the reference, requires
    deterministic unshuffled iteration — models.py:1113-1114). Semantics
    match `train_dec`; throughput trades the fused segment scan for
    IO overlap. `snapshot_path`/`resume` give epoch-granular preemption
    recovery like the scan path.
    """
    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    train_step, eval_step = make_stream_fns(model, config.gamma)

    if resume and snapshot_path is not None and ckpt.snapshot_exists(snapshot_path):
        extra_tpl = {
            "p": jnp.zeros((m_total, config.n_clusters), jnp.float32),
            "labels_prev": jnp.zeros((m_total,), jnp.int32),
        }
        state, meta, extra = ckpt.restore_snapshot(
            snapshot_path, state, extra_template=extra_tpl
        )
        return _train_dec_stream_loop(
            model, state, make_loader, m_total, config,
            np.asarray(extra["labels_prev"]), np.asarray(extra["p"]),
            start_epoch=meta["epoch"], history=meta["history"],
            deltas=meta["deltas"], n_iter=meta["n_iter"],
            snapshot_path=snapshot_path,
            train_step=train_step, eval_step=eval_step,
            snapshot_cb=snapshot_cb, snapshot_every=snapshot_every,
        )

    # cluster init on streamed latents: same dispatch as the scan path
    labels_prev, centroids = _init_from_config(
        config, model.latent_dim, m_total, initial,
        lambda: full_eval_stream(
            eval_step, state.params, make_loader, m_total
        )[2],
    )

    state = state.replace(
        params=replace_centroids(state.params, jnp.asarray(centroids))
    )
    # post-centroid-injection params = the reference's DEC_Params_Initial
    # (models.py:1006-1012); the scan path captures the same point (jax
    # arrays are immutable — holding the pytree reference is a snapshot)
    initial_params = state.params
    q, _, z0 = full_eval_stream(eval_step, state.params, make_loader, m_total)
    # pre-refinement snapshot for the comparative figures' baseline side
    # (reference models.py:1176-1181), same contract as the scan path
    initial_snapshot = None
    if snapshot_cb is not None:
        initial_snapshot = (
            np.asarray(z0),
            np.asarray(labels_prev),
            np.asarray(centroids),
        )
    del z0
    p = np.asarray(target_distribution(jnp.asarray(q)))

    return _train_dec_stream_loop(
        model, state, make_loader, m_total, config,
        np.asarray(labels_prev, np.int32), p,
        start_epoch=0,
        history={"iteration": [], "reconstruction": [], "clustering": [],
                 "total": []},
        deltas={"iteration": [], "delta": []},
        n_iter=1,
        snapshot_path=snapshot_path,
        train_step=train_step, eval_step=eval_step,
        snapshot_cb=snapshot_cb, snapshot_every=snapshot_every,
        initial_params=initial_params,
        initial_snapshot=initial_snapshot,
    )


def _train_dec_stream_loop(
    model, state, make_loader, m_total, config, labels_prev, p,
    *, start_epoch, history, deltas, n_iter, snapshot_path,
    train_step, eval_step, snapshot_cb=None, snapshot_every=4,
    initial_params=None, initial_snapshot=None,
) -> Dict:
    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    finished = False
    epoch = start_epoch - 1

    # batches per refresh (reference models.py:986-989 semantics)
    for epoch in range(start_epoch, config.n_epochs):
        batch_num = 0
        offset = 0
        running = np.zeros(4)
        # per-batch losses stay on device until a refresh/epoch boundary:
        # a float() per batch would serialize every step on the dispatch
        # round trip (benchmarks/RESULTS.md streaming notes); history rows
        # (epoch-running means per batch) are reconstructed at flush time.
        pending: List[tuple] = []

        def flush():
            nonlocal running, n_iter
            if not pending:
                return
            vals = np.asarray(
                jax.device_get([p[:3] for p in pending]), np.float64
            )
            nvs = np.asarray([p[3] for p in pending], np.float64)
            per = np.concatenate([vals * nvs[:, None], nvs[:, None]], axis=1)
            cum = running[None, :] + np.cumsum(per, axis=0)
            sizes = np.maximum(cum[:, 3], 1.0)
            for j in range(len(pending)):
                history["iteration"].append(n_iter)
                history["total"].append(float(cum[j, 0] / sizes[j]))
                history["reconstruction"].append(float(cum[j, 1] / sizes[j]))
                history["clustering"].append(float(cum[j, 2] / sizes[j]))
                n_iter += 1
            running = cum[-1].copy()
            pending.clear()

        for x, n_valid in make_loader():
            # the int8 wire yields {'q','scale'} pytrees; batch-size
            # bookkeeping reads the bulk codes array
            bsz = wire_array(x).shape[0]
            if config.update_interval == -1:
                update_interval = max(int(np.ceil(m_total / (bsz * 2))), 1)
            else:
                # batches between refreshes (reference models.py:1093),
                # same as the scan path
                update_interval = max(int(config.update_interval), 1)
            if batch_num % update_interval == 0 and not (
                batch_num == 0 and epoch == 0
            ):
                flush()
                q, labels, _ = full_eval_stream(
                    eval_step, state.params, make_loader, m_total
                )
                p = np.asarray(target_distribution(jnp.asarray(q)))
                delta = float(np.mean(labels != labels_prev))
                deltas["iteration"].append(n_iter)
                deltas["delta"].append(delta)
                labels_prev = labels
                if delta < config.tol:
                    if config.verbose:
                        print("Stop criterion met, training complete.")
                    finished = True
                    break
            p_slice = p[offset : offset + bsz]
            if len(p_slice) < bsz:  # trailing padded batch
                p_slice = np.concatenate(
                    [p_slice,
                     np.zeros((bsz - len(p_slice), p.shape[1]), p.dtype)]
                )
            state, loss, rec, clust = train_step(
                state, x, jnp.asarray(p_slice), jnp.float32(n_valid)
            )
            pending.append((loss, rec, clust, n_valid))
            offset += n_valid
            batch_num += 1
        flush()
        if config.verbose and not finished:
            # same per-epoch progress line as the scan path — a
            # multi-hour streaming run with verbose on used to print
            # nothing at all
            accum = running[:3] / max(running[3], 1.0)
            print(
                f"Epoch [{epoch + 1}/{config.n_epochs}] "
                f"Loss={accum[0]:.4e} MSE={accum[1]:.4e} KLD={accum[2]:.4e}"
            )
        if (
            snapshot_cb is not None
            and not finished
            and (epoch + 1) % snapshot_every == 0
        ):
            q_s, labels_s, z_s = full_eval_stream(
                eval_step, state.params, make_loader, m_total
            )
            snapshot_cb(
                epoch + 1, labels_s, z_s,
                np.asarray(state.params["centroids"]),
                initial=initial_snapshot,
            )
        if snapshot_path is not None and not finished:
            ckpt.save_snapshot(
                snapshot_path, state,
                {"epoch": epoch + 1, "history": history, "deltas": deltas,
                 "n_iter": n_iter},
                extra={
                    "p": jnp.asarray(p, jnp.float32),
                    "labels_prev": jnp.asarray(labels_prev, jnp.int32),
                },
            )
        if finished:
            break

    return {
        "state": state,
        "initial_params": initial_params,  # None when resumed
        "history": history,
        "deltas": deltas,
        "labels": np.asarray(labels_prev),
        "centroids": np.asarray(state.params["centroids"]),
        "stopped_early": finished,
        "last_epoch": epoch + 1,
    }


def train_dec(
    model,
    state,
    data: BatchedData,
    config: DECConfig,
    initial: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    log_scalar: Optional[Callable[[str, float, int], None]] = None,
    snapshot_cb: Optional[Callable] = None,
    snapshot_every: int = 4,
    snapshot_path: Optional[str] = None,
    resume: bool = False,
) -> Dict:
    """Run DEC refinement. Returns final state, histories, labels, deltas.

    With `snapshot_path`, a full snapshot (train state + target
    distribution + previous labels + loop metadata) is written each epoch;
    `resume=True` continues a preempted run at epoch granularity (the
    reference restarts DEC from scratch, SURVEY.md §5).
    """
    from spectrogram_cube_clustering_tpu.train import checkpoint as ckpt

    m = data.n_samples
    nb = data.n_batches
    bsz = data.batch_size
    if config.update_interval == -1:
        # -1 => 2 refreshes/epoch (reference models.py:986-989)
        update_interval = int(np.ceil(m / (bsz * 2)))
    else:
        # explicit values are BATCHES between refreshes, gated directly —
        # reference models.py:1093 (batch_num % update_interval), not a
        # refreshes-per-epoch count
        update_interval = int(config.update_interval)
    update_interval = max(update_interval, 1)

    start_epoch = 0
    resumed_meta = None
    if resume and snapshot_path is not None and ckpt.snapshot_exists(snapshot_path):
        # skip cluster init + initial eval entirely: the snapshot carries
        # the live target distribution and previous labels
        extra_tpl = {
            "p_all": jnp.zeros((nb, bsz, config.n_clusters), jnp.float32),
            "labels_prev": jnp.zeros((m,), jnp.int32),
        }
        state, resumed_meta, extra = ckpt.restore_snapshot(
            snapshot_path, state, extra_template=extra_tpl
        )
        start_epoch = resumed_meta["epoch"]
        p_all = jnp.asarray(extra["p_all"])
        labels_prev = jnp.asarray(extra["labels_prev"])
        # the restored params are mid-training — NOT the pre-refinement
        # initialization; the original run saved the real one
        initial_params = None
        initial_snapshot = None
    else:
        labels_prev, centroids = initialize_clusters(
            model, state.params, data, config, initial
        )
        state = state.replace(
            params=replace_centroids(state.params, jnp.asarray(centroids))
        )
        initial_params = state.params

        q, _, z0 = full_eval(model, state.params, data)
        # pre-refinement snapshot (z0/labels0/centroids0) — the baseline
        # side of every comparative snapshot figure (reference passes
        # z_array0/labels_prev/centroids to plotter_mp at models.py:
        # 1176-1181). Fetched to host NOW so the (M, D) buffer doesn't
        # stay pinned in HBM for the whole refinement; skipped entirely
        # when no figure hook wants it.
        initial_snapshot = None
        if snapshot_cb is not None:
            from spectrogram_cube_clustering_tpu.train.layout import (
                fetch_global as _fg,
            )

            initial_snapshot = (
                np.asarray(_fg(z0)),
                np.asarray(labels_prev),
                np.asarray(centroids),
            )
        del z0
        p = target_distribution(q)
        p_all = _pad_p(p, nb, bsz)
        # int32 for snapshot-template stability (np.load'ed labels are int64)
        labels_prev = jnp.asarray(labels_prev, jnp.int32)

    fused_fns = {}

    def run_fused(state, p_all, labels_prev, start, seg_len, do_refresh):
        key = (seg_len, do_refresh)
        if key not in fused_fns:
            fused_fns[key] = make_refresh_segment_fn(
                model, config.gamma, config.tol, m, nb, bsz,
                seg_len, do_refresh,
            )
        return fused_fns[key](
            state, data.x, data.mask, p_all, labels_prev, jnp.array(start)
        )

    history: Dict[str, List[float]] = {
        "iteration": [], "reconstruction": [], "clustering": [], "total": [],
    }
    deltas: Dict[str, List[float]] = {"iteration": [], "delta": []}

    n_iter = 1
    if resumed_meta is not None:
        history = resumed_meta["history"]
        deltas = resumed_meta["deltas"]
        n_iter = resumed_meta["n_iter"]
    running = np.zeros(4)  # loss, rec, clust, size (epoch-accumulated)
    finished = False
    epoch = start_epoch - 1
    for epoch in range(start_epoch, config.n_epochs):
        running[:] = 0.0
        batch_num = 0
        while batch_num < nb:
            # Segment starts always sit on refresh boundaries
            # (batch_num % update_interval == 0 by construction); the only
            # skipped refresh is the very first batch of epoch 0
            # (reference models.py:1093).
            do_refresh = not (batch_num == 0 and epoch == 0)
            next_refresh = (batch_num // update_interval + 1) * update_interval
            seg_len = min(next_refresh, nb) - batch_num
            # One device call: eval + target refresh + delta stop test +
            # training segment (the stop skips the segment on device).
            state_new, p_all_new, labels_new, delta_d, stopped, sums = (
                run_fused(
                    state, p_all, labels_prev, batch_num, seg_len, do_refresh
                )
            )
            if do_refresh:
                delta = float(delta_d)
                deltas["iteration"].append(n_iter)
                deltas["delta"].append(delta)
                if log_scalar is not None:
                    log_scalar("delta", delta, n_iter)
                labels_prev = labels_new
                p_all = p_all_new
                if bool(stopped):
                    if config.verbose:
                        print("Stop criterion met, training complete.")
                    finished = True
                    break
            state = state_new
            # per-step sums -> one history row per batch with the epoch's
            # running means, exactly the reference's per-batch accumulation
            # (models.py:1150-1161); the stream path logs identically.
            per_step = np.stack([np.asarray(v) for v in sums])  # (4, seg_len)
            cum = running[:, None] + np.cumsum(per_step, axis=1)
            sizes = np.maximum(cum[3], 1.0)
            for j in range(seg_len):
                history["iteration"].append(n_iter + j)
                history["total"].append(float(cum[0, j] / sizes[j]))
                history["reconstruction"].append(float(cum[1, j] / sizes[j]))
                history["clustering"].append(float(cum[2, j] / sizes[j]))
            running = cum[:, -1].copy()
            n_iter += seg_len
            batch_num += seg_len

            accum = running[:3] / max(running[3], 1.0)
            if log_scalar is not None:
                log_scalar("Loss", accum[0], n_iter - 1)
                log_scalar("MSE", accum[1], n_iter - 1)
                log_scalar("KLD", accum[2], n_iter - 1)

        if config.verbose:
            accum = running[:3] / max(running[3], 1.0)
            print(
                f"Epoch [{epoch + 1}/{config.n_epochs}] "
                f"Loss={accum[0]:.4e} MSE={accum[1]:.4e} KLD={accum[2]:.4e}"
            )
        # figure-snapshot hook every `snapshot_every` epochs (reference
        # models.py:1166-1192 takes a full eval + t-SNE every 4 epochs)
        if (
            snapshot_cb is not None
            and not finished
            and (epoch + 1) % snapshot_every == 0
        ):
            from spectrogram_cube_clustering_tpu.train.layout import (
                fetch_global,
            )

            q_s, labels_s, z_s = full_eval(model, state.params, data)
            labels_s, z_s = fetch_global((labels_s, z_s))
            snapshot_cb(
                epoch + 1, np.asarray(labels_s), np.asarray(z_s),
                np.asarray(state.params["centroids"]),
                initial=initial_snapshot,
            )
        if snapshot_path is not None and not finished:
            ckpt.save_snapshot(
                snapshot_path, state,
                {"epoch": epoch + 1, "history": history, "deltas": deltas,
                 "n_iter": n_iter},
                extra={"p_all": p_all, "labels_prev": labels_prev},
            )
        if finished:
            break

    from spectrogram_cube_clustering_tpu.train.layout import fetch_global

    labels_final = np.asarray(fetch_global(labels_prev))
    return {
        "state": state,
        "initial_params": initial_params,
        "history": history,
        "deltas": deltas,
        "labels": labels_final,
        "centroids": np.asarray(state.params["centroids"]),
        "stopped_early": finished,
        "last_epoch": epoch + 1,
    }
