"""REAL multi-process test of the multi-host data-feeding path
(VERDICT r1 #4; SURVEY.md §5 'Distributed communication backend').

Spawns two python processes that form a jax.distributed cluster over a
local TCP coordinator (gloo CPU collectives), each owning 4 of the 8
virtual CPU devices. Both hosts feed only their process-local block via
train.layout.put_process_local / make_array_from_process_local_data, train
the same AEC for 2 epochs (scan path AND a streamed sharded batch), and
must produce exactly the losses of the single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, __REPO__)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1])
import jax.numpy as jnp
import numpy as np
import spectrogram_cube_clustering_tpu as scc

# the framework's own bring-up wrapper (idempotence included)
scc.core.initialize_distributed(
    "localhost:" + sys.argv[2], num_processes=2, process_id=rank,
    local_device_ids=[0, 1, 2, 3],
)
scc.core.initialize_distributed(
    "localhost:" + sys.argv[2], num_processes=2, process_id=rank,
    local_device_ids=[0, 1, 2, 3],
)

assert jax.process_count() == 2 and len(jax.devices()) == 8

x, _ = scc.data.synthetic_windows(128, n_classes=3, seed=11)
x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
mesh = scc.core.make_data_mesh()
model = scc.models.AEC()

# scan path: device-resident batches fed process-locally
data = scc.train.make_batched_data(x, batch_size=32, mesh=mesh)
assert not data.x.sharding.is_fully_addressable
state = scc.train.create_train_state(
    model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
)
out = scc.train.train_aec(
    model, state, data, None,
    scc.train.AECConfig(n_epochs=2, early_stopping=False),
)

# streaming path: prefetch loader feeding sharded global batches
from spectrogram_cube_clustering_tpu.data import PrefetchLoader
items = [x[i:i + 32] for i in range(0, len(x), 32)]
state2 = scc.train.create_train_state(
    model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
)
sout = scc.train.train_aec_stream(
    model, state2,
    lambda: PrefetchLoader(
        lambda i: items[i], len(items), 32, num_workers=1,
        sharding=scc.core.batch_sharding(mesh, 4),
    ),
    scc.train.AECConfig(n_epochs=2, early_stopping=False),
)
# streaming with per-host IO division (item_windows): each host must
# read only the items its block needs — and produce identical losses
items8 = [x[i:i + 8] for i in range(0, len(x), 8)]
reads = []
def counting_item(i):
    reads.append(i)
    return items8[i]
state3 = scc.train.create_train_state(
    model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
)
lout = scc.train.train_aec_stream(
    model, state3,
    lambda: PrefetchLoader(
        counting_item, len(items8), 32, num_workers=2,
        sharding=scc.core.batch_sharding(mesh, 4), item_windows=8,
    ),
    scc.train.AECConfig(n_epochs=2, early_stopping=False),
)
# batch 32 = 4 items; each host's 16-row block = 2 items per batch ->
# 8 of 16 items per host (+ the item-0 shape probe on rank 1)
n_unique = len(set(reads))
assert n_unique <= 9, f"rank {rank} read {n_unique} items, expected <=9"

# DEC scan path: cluster init + fused refresh/segment + label export all
# cross host boundaries (fetch_global) — this used to crash on the
# device_get of process-spanning q/z/labels
dec = scc.models.DEC(n_clusters=3)
dcfg = scc.train.DECConfig(
    n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
    kmeans_n_init=2, kmeans_max_iter=10,
)
dstate = scc.train.create_train_state(
    dec, jax.random.key(1), jnp.asarray(x[:2]), lr=1e-3
)
# snapshot_path (SHARED across processes — orbax coordinates the save):
# the epoch-end save must gather the process-spanning p_all/labels_prev
# (checkpoint.save -> fetch_global) instead of crashing
snap = os.path.join(sys.argv[3], "snap")
dout = scc.train.train_dec(dec, dstate, data, dcfg, snapshot_path=snap)
assert dout["labels"].shape == (128,)
assert os.path.exists(snap)

# DEC streaming path: full_eval_stream all-gathers its sharded q/z
dstate2 = scc.train.create_train_state(
    dec, jax.random.key(1), jnp.asarray(x[:2]), lr=1e-3
)
dsout = scc.train.train_dec_stream(
    dec, dstate2,
    lambda: PrefetchLoader(
        lambda i: items[i], len(items), 32, num_workers=1,
        sharding=scc.core.batch_sharding(mesh, 4),
    ),
    128, dcfg,
)
assert dsout["labels"].shape == (128,)
# artifact-write gating: EVERY host calls the CSV writers (as the
# predict workflow does), but only process 0 may touch the files —
# ungated append-mode Labels.csv used to interleave one copy of every
# row per host
# ELASTIC resume: a snapshot written by a SINGLE-process run (epochs
# 1-2 of 4, seeded by the pytest process before this cluster started)
# resumes on THIS 2-process cluster — params/optimizer restore across a
# topology change and training continues process-locally fed
estate = scc.train.create_train_state(
    model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
)
eout = scc.train.train_aec(
    model, estate, data, None,
    scc.train.AECConfig(n_epochs=4, early_stopping=False),
    snapshot_path=os.path.join(sys.argv[3], "esnap"), resume=True,
)
assert eout["history"]["epoch"] == [1, 2, 3, 4]

from jax.experimental import multihost_utils

# experiment serials feed orbax snapshot paths, which must be IDENTICAL
# on every process (per-rank paths deadlock the save barrier): _serial()
# broadcasts rank 0's wall clock, so even deliberately-skewed clocks
# must agree
import time
if rank == 1:
    time.sleep(0.05)  # force the local wall clocks apart
from spectrogram_cube_clustering_tpu.utils.config import _serial
with open(os.path.join(sys.argv[3], "serial_%d.txt" % rank), "w") as fh:
    fh.write(_serial())
multihost_utils.sync_global_devices("serials_written")
if rank == 0:
    with open(os.path.join(sys.argv[3], "serial_0.txt")) as fh:
        s0 = fh.read()
    with open(os.path.join(sys.argv[3], "serial_1.txt")) as fh:
        s1 = fh.read()
    assert s0 == s1 and len(s0) == 21, f"serials diverged: {s0} vs {s1}"

scc.utils.save_labels(
    [{"idx": i, "label": 0} for i in range(8)], sys.argv[3]
)
scc.utils.save_history(
    {"Epoch": [1, 2], "Training MSE": out["history"]["train"]},
    os.path.join(sys.argv[3], "hist.csv"),
)
multihost_utils.sync_global_devices("labels_written")
if rank == 0:
    with open(os.path.join(sys.argv[3], "Labels.csv")) as fh:
        label_lines = len(fh.read().strip().splitlines())
    # save_history gates on the coordinator the same way: exactly one
    # header + 2 epoch rows, never one copy per host
    with open(os.path.join(sys.argv[3], "hist.csv")) as fh:
        hist_lines = len(fh.read().strip().splitlines())
    assert hist_lines == 3, f"hist.csv has {hist_lines} lines"
    print("RESULT " + json.dumps(
        {"scan": out["history"]["train"], "stream": sout["history"]["train"],
         "stream_local": lout["history"]["train"],
         "dec": dout["history"]["total"],
         "dec_labels": np.asarray(dout["labels"]).tolist(),
         "dec_stream": dsout["history"]["total"],
         "elastic": eout["history"]["train"],
         "label_lines": label_lines}
    ), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path):
    # Seed the elastic-resume snapshot from a SINGLE-process run BEFORE
    # the cluster starts: the workers resume it across the topology
    # change (1 process -> 2 processes over the same 8 virtual devices).
    import jax
    import jax.numpy as jnp

    import spectrogram_cube_clustering_tpu as scc

    x, _ = scc.data.synthetic_windows(128, n_classes=3, seed=11)
    x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
    mesh = scc.core.make_data_mesh()
    model = scc.models.AEC()
    data = scc.train.make_batched_data(x, batch_size=32, mesh=mesh)
    seed_state = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
    )
    scc.train.train_aec(
        model, seed_state, data, None,
        scc.train.AECConfig(n_epochs=2, early_stopping=False),
        snapshot_path=str(tmp_path / "esnap"),
    )

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.replace("__REPO__", repr(REPO)))
    port = str(_free_port())
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=REPO, text=True,
        )
        for rank in range(2)
    ]
    # drain both workers CONCURRENTLY: they are collective-coupled, so a
    # sequential communicate() can deadlock when the undrained worker's
    # pipe fills; and always reap both so a failure never leaks an orphan
    import concurrent.futures as cf

    try:
        with cf.ThreadPoolExecutor(2) as pool:
            results = list(
                pool.map(lambda p: p.communicate(timeout=600), procs)
            )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    outs = []
    for p, (stdout, stderr) in zip(procs, results):
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(stdout)
    result = None
    for line in outs[0].splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    assert result is not None, f"no RESULT line in:\n{outs[0]}"

    # single-process reference on the same 8 devices: ONE 4-epoch run
    # serves both comparisons (its first two epochs ARE the 2-epoch
    # reference — sequential, identically seeded)
    state4 = scc.train.create_train_state(
        model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
    )
    ref4 = scc.train.train_aec(
        model, state4, data, None,
        scc.train.AECConfig(n_epochs=4, early_stopping=False),
    )["history"]["train"]
    ref = ref4[:2]

    np.testing.assert_allclose(result["scan"], ref, rtol=1e-4)
    np.testing.assert_allclose(result["stream"], ref, rtol=1e-4)
    np.testing.assert_allclose(result["stream_local"], ref, rtol=1e-4)

    # elastic resume: 2-process continuation of the single-process
    # snapshot == the uninterrupted single-process 4-epoch run
    np.testing.assert_allclose(result["elastic"], ref4, rtol=1e-4)

    # and the inverse direction: the DEC snapshot the 2-process cluster
    # wrote resumes in THIS single process and keeps training
    dec2 = scc.models.DEC(n_clusters=3)
    dstate2 = scc.train.create_train_state(
        dec2, jax.random.key(1), jnp.asarray(x[:2]), lr=1e-3
    )
    cont = scc.train.train_dec(
        dec2, dstate2, data,
        scc.train.DECConfig(
            n_clusters=3, n_epochs=3, tol=0.0, init="kmeans",
            kmeans_n_init=2, kmeans_max_iter=10,
        ),
        snapshot_path=str(tmp_path / "snap"), resume=True,
    )
    assert cont["labels"].shape == (128,)
    assert np.isfinite(cont["history"]["total"]).all()

    # DEC (scan + streaming) on the same mesh: losses and labels must
    # match the single-process run
    dec = scc.models.DEC(n_clusters=3)
    dcfg = scc.train.DECConfig(
        n_clusters=3, n_epochs=2, tol=0.0, init="kmeans",
        kmeans_n_init=2, kmeans_max_iter=10,
    )
    dstate = scc.train.create_train_state(
        dec, jax.random.key(1), jnp.asarray(x[:2]), lr=1e-3
    )
    dref = scc.train.train_dec(dec, dstate, data, dcfg)
    np.testing.assert_allclose(
        result["dec"], dref["history"]["total"], rtol=1e-4
    )
    assert np.array_equal(result["dec_labels"], dref["labels"])
    np.testing.assert_allclose(
        result["dec_stream"], dref["history"]["total"], rtol=1e-4
    )
    # header + 8 rows exactly: process 1's save_labels call wrote nothing
    assert result["label_lines"] == 9


class TestProcessBlockMath:
    """Unit coverage of the index math (single-process: block == whole
    axis; multi-device contiguity check)."""

    def test_single_process_block_is_whole_axis(self):
        import spectrogram_cube_clustering_tpu as scc
        from spectrogram_cube_clustering_tpu.train.layout import (
            batched_sharding,
            process_block,
        )

        mesh = scc.core.make_data_mesh()
        s = batched_sharding(mesh, 4)
        lo, hi = process_block(s, (3, 64, 4, 101), axis=1)
        assert (lo, hi) == (0, 64)

    def test_put_process_local_matches_device_put(self, rng):
        import jax

        import spectrogram_cube_clustering_tpu as scc
        from spectrogram_cube_clustering_tpu.train.layout import (
            batched_sharding,
            put_process_local,
        )

        mesh = scc.core.make_data_mesh()
        x = rng.normal(size=(3, 16, 4, 7)).astype(np.float32)
        s = batched_sharding(mesh, 4)
        a = put_process_local(x, s, axis=1)
        b = jax.device_put(x, s)
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
