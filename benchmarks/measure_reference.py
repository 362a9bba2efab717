"""Measure the reference-equivalent torch implementation's throughput.

The reference (Julia310/Spectrogram-Cube-Clustering) publishes no benchmark
numbers and its CUDA/cuML environment is not available here, so this script
measures a faithful torch implementation of the reference's AEC hot loop on
the hardware we do have (host CPU, torch CPU wheels): same architecture
(Encoder/Decoder per Cluster/networks.py:172-234), same float64 model dtype
(models.py:154), same Adam/MSE step (models.py:106-168, production.py:167),
same batch flow. Writes benchmarks/baseline_measured.json consumed by
bench.py's vs_baseline field.

Run: python benchmarks/measure_reference.py [--samples N] [--batch N]
"""

import argparse
import json
import os
import platform
import time

import numpy as np
import torch
import torch.nn as nn


def build_reference_aec():
    """Reference AEC architecture (networks.py:172-234), written to spec."""

    class Attention(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(2, 1, 3, padding=1, bias=False)

        def forward(self, x):
            a = torch.cat(
                [x.mean(1, keepdim=True), x.max(1, keepdim=True).values], 1
            )
            a = self.conv(a)
            return a * torch.sigmoid(a)

    encoder = nn.Sequential(
        nn.Conv2d(1, 8, (2, 4), (1, 2), 1), nn.ReLU(True),
        nn.Conv2d(8, 8, (2, 4), (1, 2), 1), nn.ReLU(True),
        nn.Conv2d(8, 8, (2, 4), (1, 2), 1), nn.ReLU(True),
        Attention(), nn.Flatten(), nn.Linear(84, 9), nn.ReLU(True),
    )
    decoder = nn.Sequential(
        nn.Linear(9, 84), nn.ReLU(True), nn.Unflatten(1, (1, 7, 12)),
        nn.ConvTranspose2d(1, 8, 3, padding=1, bias=False), nn.ReLU(True),
        nn.ConvTranspose2d(8, 8, (2, 4), (1, 2), 1, output_padding=(0, 1)),
        nn.ReLU(True),
        nn.ConvTranspose2d(8, 8, (2, 4), (1, 2), 1), nn.ReLU(True),
        nn.ConvTranspose2d(8, 1, (2, 4), (1, 2), 1, output_padding=(0, 1)),
        nn.ReLU(True),
    )
    return nn.Sequential(encoder, decoder)


def measure_aec(samples, batch, epochs):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(samples, 1, 4, 101)).astype(np.float64)
    data = torch.from_numpy(x)

    model = build_reference_aec().double()  # reference runs f64 (models.py:154)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    mse = nn.MSELoss(reduction="mean")

    # warmup
    xb = data[:batch]
    loss = mse(model(xb), xb)
    loss.backward()
    opt.step()

    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for i in range(0, samples, batch):
            xb = data[i : i + batch]
            opt.zero_grad()
            loss = mse(model(xb), xb)
            loss.backward()
            opt.step()
            n += len(xb)
    return n / (time.perf_counter() - t0)


def measure_dec(samples, batch, epochs, k=5):
    """Reference DEC hot loop to spec (models.py:1089-1163): forward through
    encoder/decoder + Student-t clustering layer, MSE + gamma*KLD(sum)/B,
    Adam, f64."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(samples, 1, 4, 101)).astype(np.float64)
    data = torch.from_numpy(x)

    aec = build_reference_aec().double()
    encoder, decoder = aec[0], aec[1]
    centroids = nn.Parameter(torch.randn(k, 9, dtype=torch.float64))
    params = list(aec.parameters()) + [centroids]
    opt = torch.optim.Adam(params, lr=1e-3)
    mse = nn.MSELoss(reduction="mean")
    kld = nn.KLDivLoss(reduction="sum")
    gamma = 0.001

    def forward(xb):
        z = encoder(xb)
        xr = decoder(z)
        d2 = torch.sum((z[:, None, :] - centroids[None]) ** 2, dim=-1)
        q = (1.0 + d2) ** -1.0
        q = q / q.sum(dim=1, keepdim=True)
        return q, xr

    with torch.no_grad():
        q0, _ = forward(data[:batch])
        p = (q0**2 / q0.sum(0)) / (q0**2 / q0.sum(0)).sum(1, keepdim=True)

    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for i in range(0, samples, batch):
            xb = data[i : i + batch]
            opt.zero_grad()
            q, xr = forward(xb)
            tar = p[: len(xb)]
            loss = mse(xr, xb) + gamma * kld(torch.log(q), tar) / len(xb)
            loss.backward()
            opt.step()
            n += len(xb)
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    aec_tput = measure_aec(args.samples, args.batch, args.epochs)
    dec_tput = measure_dec(args.samples, args.batch, args.epochs)

    out = {
        "aec_train_samples_per_sec": round(aec_tput, 1),
        "dec_train_samples_per_sec": round(dec_tput, 1),
        "hardware": f"host CPU ({platform.processor() or 'unknown'}, "
        f"{torch.get_num_threads()} torch threads)",
        "note": (
            "Reference publishes no benchmarks and its CUDA/cuML stack is "
            "unavailable here; this measures a to-spec torch implementation "
            "of the reference AEC hot loop (f64, Adam, MSE) on host CPU."
        ),
        "torch_version": torch.__version__,
        "samples": args.samples,
        "batch": args.batch,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
