"""Configuration system: `.ini` <-> typed config, experiment trees, sweeps.

Surface parity with the reference's `Configuration`
(Cluster/utils.py:33-208) and `config_training` (utils.py:569-598):

- `.ini` files with UNIVERSAL / PARAMETERS / HYPERPARAMETERS sections;
- a typed-coercion table for known keys; every HYPERPARAMETERS value parses
  as a comma-separated sweep list whose cartesian product defines runs
  (utils.py:135-140, consumed production.py:120);
- experiment directory trees `Outputs/Models/{AEC|DEC}/Exp<serial>/
  Run_<hp-string>/tmp/`, with GMM under the AEC run (`GMM/n_clusters=K/`)
  and predictions under `Prediction/` (utils.py:63-108);
- config snapshots persisted as `.ini` + `.txt` + `.pkl` (utils.py:181-187);
- `parse_nclusters` regex on saved-weight paths (utils.py:1061-1081).

TPU-first deviations: `set_device` resolves JAX devices/meshes instead of
`torch.device` (utils.py:190-200); serials take microsecond precision so
sweep runs launched within one second do not collide.
"""

from __future__ import annotations

import configparser
import itertools
import os
import pickle
import re
import shutil
import subprocess
from datetime import datetime
from typing import Any, Dict, Iterator, List, Optional, Tuple

# Typed coercion table (reference utils.py:37-53).
DATATYPES: Dict[str, str] = {
    "n_epochs": "int",
    "show": "bool",
    "send_message": "bool",
    "early_stopping": "bool",
    "patience": "int",
    "km_metrics": "bool",
    "tb": "bool",
    "tbport": "int",
    "workers": "int",
    "batch_size": "int",
    "lr": "float",
    "n_clusters": "int",
    "gamma": "float",
    "tol": "float",
    "update_interval": "int",
    # rebuild-only knobs (not in the reference's table, utils.py:37-53)
    "resume": "bool",
    "figures": "bool",
    "km_n_init": "int",
    "km_max_iter": "int",
    "silh_max_samples": "int",
    "nperseg": "int",
    "hop": "int",
    "window_rows": "int",
    "chunk_size": "int",
    "channel_start": "int",
    "channel_stride": "int",
    "seed": "int",
    "batch_size_predict": "int",
    "sync_every": "int",
    "attention_faithful": "bool",
    "waveform_stream_block": "int",
}

_BOOL_TRUE = {"1", "yes", "true", "on"}
_BOOL_FALSE = {"0", "no", "false", "off"}


def _coerce(key: str, value: str) -> Any:
    kind = DATATYPES.get(key)
    if kind == "int":
        return int(value)
    if kind == "float":
        return float(value)
    if kind == "bool":
        v = value.strip().lower()
        if v in _BOOL_TRUE:
            return True
        if v in _BOOL_FALSE:
            return False
        raise ValueError(f"not a boolean: {key}={value!r}")
    return value


def _coerce_hp(key: str, value: str) -> List[Any]:
    """HYPERPARAMETERS values are comma-separated sweep lists
    (utils.py:135-140)."""
    parts = [p.strip() for p in value.split(",")]
    kind = DATATYPES.get(key)
    if kind == "int":
        return [int(p) for p in parts]
    if kind == "float":
        return [float(p) for p in parts]
    if kind == "bool":
        # same strict parsing as _coerce — a raw 'false' string in a
        # sweep list is truthy and would silently flip the flag on
        return [_coerce(key, p) for p in parts]
    return parts


def parse_nclusters(line: str) -> int:
    """Extract `Clusters=<K>` from a saved-weights path
    (reference utils.py:1061-1081)."""
    match = re.search(r"Clusters=(?P<n_clusters>\d+)", line)
    if not match:
        raise ValueError(f"unable to parse n_clusters from {line!r}")
    return int(match.group("n_clusters"))


def _agree_across_processes(micros: int) -> int:
    """Return process 0's value on every process of a jax.distributed run.

    Serials feed savepaths, and orbax snapshot saves require every
    process to pass the SAME path (train/checkpoint.py — per-rank paths
    deadlock the internal barrier). Wall-clock-local microsecond serials
    are guaranteed to differ across processes, so broadcast rank 0's.
    """
    try:
        # Probe WITHOUT initializing a backend: jax.process_count() would
        # block on device bring-up (bad news when serials are minted on a
        # host whose TPU tunnel is flaky). jax.distributed not being
        # initialized means single-process by definition.
        from jax._src import distributed

        if distributed.global_state.client is None:
            return micros
        import jax

        if jax.process_count() <= 1:
            return micros
        from jax.experimental import multihost_utils

        import numpy as np

        return int(
            multihost_utils.broadcast_one_to_all(
                np.asarray(micros, dtype=np.int64)
            )
        )
    except Exception:
        # jax absent or probing failed: fall back to the local clock.
        return micros


def _serial() -> str:
    # Microseconds appended: the reference's second-resolution serials
    # (utils.py:64) collide for sweep runs started within 1 s.
    stamp = datetime.now()
    micros = _agree_across_processes(
        stamp.microsecond
        + 1_000_000 * int(stamp.replace(microsecond=0).timestamp())
    )
    sec, usec = divmod(micros, 1_000_000)
    return (
        datetime.fromtimestamp(sec)
        .replace(microsecond=usec)
        .strftime("%Y%m%dT%H%M%S%f")
    )


class Configuration:
    """Typed view over an `.ini` experiment config.

    Attributes are set dynamically from the file (as in the reference);
    `hp` holds the hyperparameter sweep lists.
    """

    def __init__(self, init_path: str):
        self.init_path = init_path
        self.hp: Dict[str, List[Any]] = {}
        self.tbpid: Optional[int] = None

    # -- parsing ---------------------------------------------------------

    def load_config(self) -> "Configuration":
        # interpolation off: values are opaque strings here, and the default
        # BasicInterpolation would crash on literal '%' in paths
        parser = configparser.ConfigParser(interpolation=None)
        with open(self.init_path) as f:
            parser.read_file(f)
        for section in parser.sections():
            for k, v in parser.items(section):
                if section == "HYPERPARAMETERS":
                    self.hp[k] = _coerce_hp(k, v)
                else:
                    if k == "img_index":
                        setattr(self, k, [int(i) for i in v.split(",")])
                    elif k == "klist":
                        lo, hi = (int(i) for i in v.split(",")[:2])
                        setattr(self, k, list(range(lo, hi + 1)))
                    else:
                        setattr(self, k, _coerce(k, v))

        mode = getattr(self, "mode", None)
        if mode == "predict":
            self.verb = "prediction"
            if getattr(self, "model", None) == "DEC":
                self.n_clusters = parse_nclusters(self.saved_weights)
            else:
                self.n_clusters = None
        elif mode == "train":
            self.verb = "training"
        elif mode == "fit":
            self.verb = "fitting"

        # AEC sweeps only over batch_size/lr (reference utils.py:167-168).
        if getattr(self, "model", None) == "AEC" and len(self.hp) > 2:
            self.hp = {
                k: v for k, v in self.hp.items() if k in ("batch_size", "lr")
            }
        self.runs = self.calc_tuning_runs()
        return self

    def calc_tuning_runs(self) -> int:
        runs = 1
        for v in self.hp.values():
            runs *= len(v)
        return runs

    def sweep(self) -> Iterator[Dict[str, Any]]:
        """Cartesian product of hp lists as dicts (production.py:120)."""
        keys = list(self.hp.keys())
        for combo in itertools.product(*self.hp.values()):
            yield dict(zip(keys, combo))

    # -- experiment tree -------------------------------------------------

    def init_exp_env(self) -> Tuple[str, str]:
        """Create the experiment root (reference utils.py:63-81).

        train   -> <savepath>/Models/<model>/Exp<serial>/
        predict -> <dirname(saved_weights)>/Prediction/
        fit     -> <dirname(saved_weights)>/GMM/
        """
        self.serial_exp = _serial()
        if self.mode == "train":
            base = os.path.join(self.savepath, "Models", self.model)
            if bool(getattr(self, "resume", False)) and os.path.isdir(base):
                # resume must land in the run tree that holds the
                # snapshot: reuse the newest Exp (serials are timestamps,
                # so lexical order = chronological) instead of minting a
                # fresh empty one where snapshot_exists is always False
                exps = sorted(
                    d for d in os.listdir(base)
                    if d.startswith("Exp")
                    and os.path.isdir(os.path.join(base, d))
                )
                if exps:
                    self.serial_exp = exps[-1][len("Exp"):]
                    self.savepath_exp = os.path.join(base, exps[-1])
                    return self.savepath_exp, self.serial_exp
            self.savepath_exp = os.path.join(base, f"Exp{self.serial_exp}")
        elif self.mode == "predict":
            run_dir = os.path.abspath(
                os.path.join(self.saved_weights, os.pardir)
            )
            self.savepath_exp = os.path.join(run_dir, "Prediction")
        elif self.mode == "fit":
            run_dir = os.path.abspath(
                os.path.join(self.saved_weights, os.pardir)
            )
            self.savepath_exp = os.path.join(run_dir, "GMM")
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        os.makedirs(self.savepath_exp, exist_ok=True)
        return self.savepath_exp, self.serial_exp

    def init_output_env(self, **kwargs) -> Tuple[str, ...]:
        """Create the per-run directory (reference utils.py:84-108)."""
        self.serial_run = _serial()
        if self.mode == "train":
            if self.model == "AEC":
                fname = (
                    f"Run_BatchSz={kwargs.get('batch_size')}_"
                    f"LR={kwargs.get('lr')}"
                )
            elif self.model == "DEC":
                fname = (
                    f"Run_Clusters={kwargs.get('n_clusters')}_"
                    f"BatchSz={kwargs.get('batch_size')}_"
                    f"LR={kwargs.get('lr')}_"
                    f"gamma={kwargs.get('gamma')}_"
                    f"tol={kwargs.get('tol')}"
                )
            else:
                raise ValueError(f"unknown model {self.model!r}")
            self.savepath_run = os.path.join(self.savepath_exp, fname)
            self.savepath_chkpnt = os.path.join(self.savepath_run, "tmp")
            os.makedirs(self.savepath_run, exist_ok=True)
            os.makedirs(self.savepath_chkpnt, exist_ok=True)
            return self.serial_run, self.savepath_run, self.savepath_chkpnt
        if self.mode == "fit":
            fname = f"n_clusters={kwargs.get('n_clusters')}"
            self.savepath_run = os.path.join(self.savepath_exp, fname)
            os.makedirs(self.savepath_run, exist_ok=True)
            return self.serial_run, self.savepath_run
        # predict: artifacts go directly in savepath_exp (reference pass-es)
        self.savepath_run = self.savepath_exp
        return self.serial_run, self.savepath_run

    def save_exp_config(self) -> str:
        """Snapshot the config next to the experiment (utils.py:181-187)."""
        fname = os.path.join(
            self.savepath_exp, f"ExpConfig{self.serial_exp}"
        )
        shutil.copyfile(self.init_path, f"{fname}.ini")
        state = {
            k: (str(v) if k == "device" else v)
            for k, v in self.__dict__.items()
            if k != "tbpid"
        }
        with open(f"{fname}.txt", "w") as f:
            f.write(str(state))
        with open(f"{fname}.pkl", "wb") as f:
            pickle.dump(state, f)
        return fname

    # -- runtime environment ---------------------------------------------

    def set_device(self, device_index: Optional[int] = None):
        """Resolve the JAX device (reference set_device, utils.py:190-200,
        picked a CUDA ordinal; here it picks a jax.Device)."""
        import jax

        devices = jax.devices()
        self.device = devices[device_index or 0]
        return self.device

    def start_tensorboard(self) -> int:
        """Spawn a TensorBoard server over the experiment dir
        (utils.py:203-208)."""
        cmd = [
            "python", "-m", "tensorboard.main", "--logdir=.",
            f"--port={self.tbport}", "--samples_per_plugin", "images=1000",
        ]
        p = subprocess.Popen(cmd, cwd=self.savepath_exp)
        self.tbpid = p.pid
        print(
            f"TensorBoard at http://localhost:{self.tbport}; PID={self.tbpid}"
        )
        return self.tbpid


def config_training(
    universal: Dict[str, Any],
    parameters: Dict[str, Any],
    hyperparameters: Optional[Dict[str, Any]] = None,
) -> str:
    """Write parameter dicts to `Config/init_<mode>.ini`
    (reference config_training, utils.py:569-598)."""
    parser = configparser.ConfigParser(interpolation=None)
    parser["UNIVERSAL"] = {k: str(v) for k, v in universal.items()}
    parser["PARAMETERS"] = {k: str(v) for k, v in parameters.items()}
    if hyperparameters is not None:
        parser["HYPERPARAMETERS"] = {
            k: str(v) for k, v in hyperparameters.items()
        }
    os.makedirs(universal["configpath"], exist_ok=True)
    fname = os.path.join(
        universal["configpath"], f"init_{parameters['mode']}.ini"
    )
    with open(fname, "w") as f:
        parser.write(f)
    return fname


def load_config(init_path: str) -> Configuration:
    return Configuration(init_path).load_config()


def init_project_env(*paths: str) -> None:
    """Create project folders idempotently (reference init_project_env,
    utils.py:983-992)."""
    for path in paths:
        created = not os.path.exists(path)
        os.makedirs(path, exist_ok=True)
        print(f"{path} {'created' if created else 'exists'}.")
    print("Project folders initialized.")
