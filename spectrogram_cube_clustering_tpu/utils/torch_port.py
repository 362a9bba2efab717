"""Import trained reference `.pt` checkpoints (torch state_dicts).

A user migrating from the reference keeps their trained models: this maps
the reference's state_dict keys (Cluster/networks.py module layout —
`encoder.encoder.<i>`, `decoder.decoder.<i>`, `clustering.weights`) onto
this framework's flax param trees with the exact layout transposes
validated by tests/test_torch_parity.py:

- Conv2d weight (out, in, kh, kw)        -> kernel (kh, kw, in, out)
- ConvTranspose2d weight (in, out, kh, kw) -> kernel (kh, kw, out, in)
  (flax transpose_kernel=True convention, models/layers.py)
- Linear weight (out, in)                -> kernel (in, out)

Only numpy is required to convert; `torch.load` is used just to unpickle
the file (CPU, weights_only).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(
        t.detach().cpu().numpy() if hasattr(t, "detach") else t,
        dtype=np.float32,
    )


def _conv(w):
    return _np(w).transpose(2, 3, 1, 0)


def _convt(w):
    return _np(w).transpose(2, 3, 1, 0)


def _dense(w):
    return _np(w).T


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a reference `.pt` checkpoint to a flat name->array dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items()}


# Reference sequential indices (networks.py:172-214): convs at 0/2/4,
# attention at 6, linear at 8; decoder linear at 0, convT at 3/5/7/9.
_ENC_CONVS = (0, 2, 4)
_DEC_CONVTS = (3, 5, 7, 9)


def aec_params_from_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference AEC/Encoder+Decoder state_dict -> flax AEC params."""
    enc = {}
    for n, i in enumerate(_ENC_CONVS):
        enc[f"Conv_{n}"] = {
            "kernel": _conv(sd[f"encoder.encoder.{i}.weight"]),
            "bias": _np(sd[f"encoder.encoder.{i}.bias"]),
        }
    enc["SpatialAttention_0"] = {
        "Conv_0": {"kernel": _conv(sd["encoder.encoder.6.conv.weight"])}
    }
    enc["Dense_0"] = {
        "kernel": _dense(sd["encoder.encoder.8.weight"]),
        "bias": _np(sd["encoder.encoder.8.bias"]),
    }
    dec = {
        "Dense_0": {
            "kernel": _dense(sd["decoder.decoder.0.weight"]),
            "bias": _np(sd["decoder.decoder.0.bias"]),
        }
    }
    for n, i in enumerate(_DEC_CONVTS):
        entry = {"kernel": _convt(sd[f"decoder.decoder.{i}.weight"])}
        if f"decoder.decoder.{i}.bias" in sd:
            entry["bias"] = _np(sd[f"decoder.decoder.{i}.bias"])
        dec[f"TorchConvTranspose_{n}"] = {"ConvTranspose_0": entry}
    return {"encoder": enc, "decoder": dec}


def dec_params_from_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference DEC state_dict -> flax DEC params (incl. centroids)."""
    params = aec_params_from_torch(sd)
    params["centroids"] = _np(sd["clustering.weights"])
    return params


# -- reverse direction: flax params -> reference .pt ------------------------


def _conv_inv(k):
    """flax conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)."""
    return np.asarray(k).transpose(3, 2, 0, 1)


def _dense_inv(k):
    return np.asarray(k).T


def torch_state_dict_from_params(params: Mapping, model: str = "auto") -> Dict[str, np.ndarray]:
    """Flax AEC/DEC params -> the reference's state_dict key layout
    (Cluster/networks.py sequential indices), float64 like the reference's
    own saved checkpoints (models.py:64,154,965). Exact inverse of
    `aec_params_from_torch` / `dec_params_from_torch` — so a model trained
    here can be loaded by the original torch code, completing migration in
    BOTH directions."""
    if model == "auto":
        model = "DEC" if "centroids" in params else "AEC"
    enc, dec = params["encoder"], params["decoder"]
    sd: Dict[str, np.ndarray] = {}
    for n, i in enumerate(_ENC_CONVS):
        sd[f"encoder.encoder.{i}.weight"] = _conv_inv(enc[f"Conv_{n}"]["kernel"])
        sd[f"encoder.encoder.{i}.bias"] = np.asarray(enc[f"Conv_{n}"]["bias"])
    sd["encoder.encoder.6.conv.weight"] = _conv_inv(
        enc["SpatialAttention_0"]["Conv_0"]["kernel"]
    )
    sd["encoder.encoder.8.weight"] = _dense_inv(enc["Dense_0"]["kernel"])
    sd["encoder.encoder.8.bias"] = np.asarray(enc["Dense_0"]["bias"])
    sd["decoder.decoder.0.weight"] = _dense_inv(dec["Dense_0"]["kernel"])
    sd["decoder.decoder.0.bias"] = np.asarray(dec["Dense_0"]["bias"])
    for n, i in enumerate(_DEC_CONVTS):
        entry = dec[f"TorchConvTranspose_{n}"]["ConvTranspose_0"]
        sd[f"decoder.decoder.{i}.weight"] = _conv_inv(entry["kernel"])
        if "bias" in entry:
            sd[f"decoder.decoder.{i}.bias"] = np.asarray(entry["bias"])
    if model == "DEC":
        sd["clustering.weights"] = np.asarray(params["centroids"])
    return {k: v.astype(np.float64) for k, v in sd.items()}


def export_checkpoint(ckpt_dir: str, out_pt: str, model: str = "auto") -> str:
    """Orbax checkpoint directory -> reference-loadable `.pt` state_dict."""
    import torch

    from spectrogram_cube_clustering_tpu.train.checkpoint import restore

    params = restore(ckpt_dir)
    sd = torch_state_dict_from_params(params, model)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, out_pt)
    return out_pt


def convert_checkpoint(pt_path: str, out_dir: str, model: str = "auto") -> str:
    """`.pt` -> orbax checkpoint directory loadable by the workflow.

    model: 'AEC' | 'DEC' | 'auto' (DEC when `clustering.weights` present).
    """
    from spectrogram_cube_clustering_tpu.train.checkpoint import save

    sd = load_torch_state_dict(pt_path)
    if model == "auto":
        model = "DEC" if "clustering.weights" in sd else "AEC"
    params = (
        dec_params_from_torch(sd) if model == "DEC"
        else aec_params_from_torch(sd)
    )
    return save(out_dir, params)
