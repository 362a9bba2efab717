"""Workflow orchestration: train / predict / gmm_fit keyed by Configuration.

Reference parity: Cluster/production.py (L4 of SURVEY.md §1) — dispatch on
config.model in {AEC, DEC, GMM} x config.mode in {train, predict, fit}.
"""

from spectrogram_cube_clustering_tpu.workflow.data import load_data
from spectrogram_cube_clustering_tpu.workflow.train import train, make_model
from spectrogram_cube_clustering_tpu.workflow.predict import predict
from spectrogram_cube_clustering_tpu.workflow.fit import gmm_fit

__all__ = ["load_data", "train", "predict", "gmm_fit", "make_model"]
