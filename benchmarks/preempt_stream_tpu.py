"""Streaming preemption soak on the real chip.

The production failure mode the snapshot machinery exists for: a
streaming AEC run (host-RAM windows feeding per-batch jitted steps
through the prefetch loader) is SIGKILLed mid-epoch on the live TPU,
then restarted with `resume=True`. The resumed run must pick up at the
snapshot epoch and finish with a contiguous history — the on-device
state (params + optimizer moments) restores through orbax across the
process boundary and the tunnel.

    python benchmarks/preempt_stream_tpu.py [n_epochs] [kill_after_s]
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, sys
sys.path.insert(0, __REPO__)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(__REPO__, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import spectrogram_cube_clustering_tpu as scc

snap, n_epochs = sys.argv[1], int(sys.argv[2])
x, _ = scc.data.synthetic_windows(100_352, n_classes=5, seed=3)
x = np.asarray(scc.ops.sample_norm_cent(jnp.asarray(x)))
item = 2048
items = [x[i * item : (i + 1) * item] for i in range(len(x) // item)]
model = scc.models.AEC()
state = scc.train.create_train_state(
    model, jax.random.key(0), jnp.asarray(x[:2]), lr=1e-3
)
out = scc.train.train_aec_stream(
    model, state,
    lambda: scc.data.PrefetchLoader(
        lambda i: items[i], n_items=len(items), batch_size=4096,
        num_workers=4,
    ),
    scc.train.AECConfig(n_epochs=n_epochs, early_stopping=False),
    snapshot_path=snap, snapshot_every=1, resume=True,
)
print("WORKER_DONE " + json.dumps(
    {"epochs": out["history"]["epoch"], "train": out["history"]["train"]}
), flush=True)
'''


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    kill_after = float(sys.argv[2]) if len(sys.argv) > 2 else 25.0
    import tempfile

    work = tempfile.mkdtemp(prefix="preempt_soak_")
    snap = os.path.join(work, "SNAPSHOT")
    worker_py = os.path.join(work, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER.replace("__REPO__", repr(REPO)))

    def spawn(log_path):
        # log to a FILE: a PIPE nobody drains fills at ~64 KiB and blocks
        # the worker in write() before it ever snapshots
        log = open(log_path, "w")
        return subprocess.Popen(
            [sys.executable, worker_py, snap, str(n_epochs)],
            stdout=log, stderr=subprocess.STDOUT,
            cwd=REPO, text=True,
        )

    print(f"run 1: training {n_epochs} epochs, SIGKILL {kill_after}s after "
          "the first snapshot lands")
    p = spawn(os.path.join(work, "run1.log"))
    t0 = time.time()
    killed = False
    first_snap = None
    while p.poll() is None:
        if first_snap is None and os.path.exists(snap):
            first_snap = time.time()  # kill mid-epoch AFTER work exists
        if first_snap is not None and time.time() - first_snap > kill_after:
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.5)
    p.wait()
    if not killed:
        print("run 1 finished before the kill window — raise n_epochs")
        print(open(os.path.join(work, "run1.log")).read()[-3000:])
        return 1
    has_snap = os.path.exists(snap) or os.path.exists(snap + ".old")
    print(f"run 1 SIGKILLed at {time.time() - t0:.1f}s; snapshot on disk: "
          f"{has_snap}")
    assert has_snap, "no snapshot written before the kill"

    print("run 2: resuming to completion")
    t1 = time.time()
    run2_log = os.path.join(work, "run2.log")
    p2 = spawn(run2_log)
    try:
        p2.wait(timeout=1800)
    except subprocess.TimeoutExpired:
        # never leak a live TPU-attached worker: a wedged one can take
        # the tunnel chip offline for everyone (~20 min)
        p2.kill()
        p2.wait()
        raise
    out = open(run2_log).read()
    assert p2.returncode == 0, f"resume failed:\n{out[-3000:]}"
    result = None
    for line in out.splitlines():
        if line.startswith("WORKER_DONE "):
            result = json.loads(line[len("WORKER_DONE "):])
    assert result is not None, f"no WORKER_DONE in:\n{out[-2000:]}"
    epochs = result["epochs"]
    assert epochs == list(range(1, n_epochs + 1)), (
        f"history not contiguous: {epochs}"
    )
    import math

    assert all(math.isfinite(v) for v in result["train"])
    assert result["train"][-1] < result["train"][0]
    print(
        f"resume completed in {time.time() - t1:.1f}s; history contiguous "
        f"1..{n_epochs}, final loss {result['train'][-1]:.4e} "
        f"(first {result['train'][0]:.4e})"
    )
    print("PREEMPTION SOAK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
