"""`run-dc` — primary CLI driver for the clustering workflow.

Parity target: the reference's installed `runDC` script
(Cluster/runDC:25-99): parse an `.ini` path + device, build the
Configuration, start TensorBoard when asked, validate inputs, dispatch
train / predict / fit, and notify on completion.

Fixes vs the reference: `runDC` imports a `notify` that is defined nowhere
(runDC:23, SURVEY.md §2.3 defect 1) — here notification writes a completion
file and prints; `indexpath` is only validated when the config actually
sets one (the live Zarr path never does).
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime
from typing import Optional

from spectrogram_cube_clustering_tpu import workflow
from spectrogram_cube_clustering_tpu.utils import Configuration


def notify(subject: str, content: str, path: Optional[str] = None) -> None:
    """Completion notification: print + optional file drop (replaces the
    reference's missing utils.notify, runDC:23,91-93)."""
    print(f"[notify] {subject}\n{content}")
    if path:
        with open(path, "a") as f:
            f.write(f"{subject}\n{content}\n")


def main(init_path: Optional[str] = None, device: Optional[int] = None,
         argv: Optional[list] = None) -> Configuration:
    if init_path is None:
        parser = argparse.ArgumentParser(
            description="Pretrain (AEC), fit (GMM), or train (DEC) the "
            "spectrogram-cube clustering workflow from an .ini config."
        )
        parser.add_argument("init_path", help="path to init .ini file")
        parser.add_argument(
            "--device", type=int, default=None,
            help="accelerator device index (reference: --cuda_device)",
        )
        args = parser.parse_args(argv)
        init_path = args.init_path
        device = args.device

    config = Configuration(init_path).load_config()
    config.set_device(device)
    config.init_exp_env()

    if getattr(config, "tb", False):
        config.start_tensorboard()
        time.sleep(1)

    config.save_exp_config()

    tic = datetime.now()
    # ---- input checks (runDC:71-76) -------------------------------------
    if config.model != "GMM" and not os.path.exists(config.fname_dataset):
        raise ValueError(f"Dataset file not found: {config.fname_dataset}")
    indexpath = getattr(config, "indexpath", None)
    if indexpath and not os.path.exists(indexpath):
        raise ValueError(f"Index file not found: {indexpath}")
    if config.model in ("DEC", "GMM") or config.mode in ("predict", "fit"):
        if not os.path.exists(getattr(config, "saved_weights", "")):
            raise ValueError(
                f"Saved weights not found: {getattr(config, 'saved_weights', None)}"
            )

    print("=" * 80)
    print(f"Executing {config.verb} mode for {config.model}")
    figures = bool(getattr(config, "figures", True))
    if config.mode == "train":
        workflow.train(config)
    elif config.mode == "predict":
        workflow.predict(config, figures=figures)
    elif config.mode == "fit":
        workflow.gmm_fit(config, figures=figures)
    else:
        raise ValueError(f"unknown mode {config.mode!r}")
    toc = datetime.now()
    content = (
        f"{config.model} {config.verb} completed at {toc}.\n"
        f"Time Elapsed = {toc - tic}."
    )
    print(content)
    if getattr(config, "send_message", False):
        notify(
            f"{config.model} {config.verb} completed.", content,
            path=os.path.join(config.savepath_exp, "COMPLETED.txt"),
        )
    print("=" * 80)
    return config


if __name__ == "__main__":
    main()
