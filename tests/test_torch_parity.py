"""Numerical parity against torch layer stacks.

Builds torch modules matching the reference architecture spec (see
SURVEY.md C4/C5), ports their weights into the flax models, and checks
outputs agree to f32 tolerance. This pins conv/conv-transpose geometry
(stride/padding/output_padding) and the attention quirk exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from spectrogram_cube_clustering_tpu import models  # noqa: E402


def t2j_conv(w):
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_convt(w):
    # torch convT weight (in, out, kh, kw) -> flax transpose_kernel (kh, kw, out, in)
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_dense(w):
    # torch linear weight (out, in) -> flax (in, out)
    return jnp.asarray(w.detach().numpy().T)


def t2j_bias(b):
    return jnp.asarray(b.detach().numpy())


class TorchRefEncoder(nn.Module):
    """Reference encoder architecture (networks.py:172-189), test-local."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList(
            [
                nn.Conv2d(1 if i == 0 else 8, 8, (2, 4), (1, 2), 1)
                for i in range(3)
            ]
        )
        self.att_conv = nn.Conv2d(2, 1, 3, padding=1, bias=False)
        self.fc = nn.Linear(84, 9)

    def forward(self, x):
        for c in self.convs:
            x = torch.relu(c(x))
        avg = x.mean(dim=1, keepdim=True)
        mx = x.max(dim=1, keepdim=True).values
        a = self.att_conv(torch.cat([avg, mx], dim=1))
        x = a * torch.sigmoid(a)  # reference quirk (networks.py:163-168)
        x = x.flatten(1)
        return torch.relu(self.fc(x))


class TorchRefDecoder(nn.Module):
    """Reference decoder architecture (networks.py:194-214), test-local."""

    def __init__(self):
        super().__init__()
        self.fc = nn.Linear(9, 84)
        self.ct0 = nn.ConvTranspose2d(1, 8, 3, padding=1, bias=False)
        self.ct1 = nn.ConvTranspose2d(8, 8, (2, 4), (1, 2), 1, output_padding=(0, 1))
        self.ct2 = nn.ConvTranspose2d(8, 8, (2, 4), (1, 2), 1)
        self.ct3 = nn.ConvTranspose2d(8, 1, (2, 4), (1, 2), 1, output_padding=(0, 1))

    def forward(self, z):
        x = torch.relu(self.fc(z)).reshape(-1, 1, 7, 12)
        for ct in (self.ct0, self.ct1, self.ct2, self.ct3):
            x = torch.relu(ct(x))
        return x


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    return rng.normal(size=(4, 1, 4, 101)).astype(np.float32)


def test_encoder_parity(data):
    tm = TorchRefEncoder().eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(data)).numpy()

    enc = models.Encoder()
    x = models.from_nchw(jnp.asarray(data))
    params = enc.init(jax.random.key(0), x)["params"]
    for i in range(3):
        params[f"Conv_{i}"]["kernel"] = t2j_conv(tm.convs[i].weight)
        params[f"Conv_{i}"]["bias"] = t2j_bias(tm.convs[i].bias)
    params["SpatialAttention_0"]["Conv_0"]["kernel"] = t2j_conv(tm.att_conv.weight)
    params["Dense_0"]["kernel"] = t2j_dense(tm.fc.weight)
    params["Dense_0"]["bias"] = t2j_bias(tm.fc.bias)

    with jax.default_matmul_precision("float32"):
        got = np.asarray(enc.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decoder_parity():
    rng = np.random.default_rng(3)
    z = rng.uniform(0, 1, size=(4, 9)).astype(np.float32)
    tm = TorchRefDecoder().eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(z)).numpy()  # (4, 1, 4, 101)

    dec = models.Decoder()
    params = dec.init(jax.random.key(0), jnp.asarray(z))["params"]
    params["Dense_0"]["kernel"] = t2j_dense(tm.fc.weight)
    params["Dense_0"]["bias"] = t2j_bias(tm.fc.bias)
    for i, ct in enumerate((tm.ct0, tm.ct1, tm.ct2, tm.ct3)):
        leaf = params[f"TorchConvTranspose_{i}"]["ConvTranspose_0"]
        leaf["kernel"] = t2j_convt(ct.weight)
        if ct.bias is not None:
            leaf["bias"] = t2j_bias(ct.bias)

    with jax.default_matmul_precision("float32"):
        got = np.asarray(
            models.to_nchw(dec.apply({"params": params}, jnp.asarray(z)))
        )
    assert got.shape == want.shape == (4, 1, 4, 101)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_fixed_mode(data):
    # faithful=False gates the INPUT feature map (8 channels survive, flatten
    # is 672 wide); faithful=True reproduces the reference's 1-channel
    # collapse (networks.py:163-168). Both must produce a 9-d latent.
    x = models.from_nchw(jnp.asarray(data))
    for faithful in (True, False):
        enc = models.Encoder(attention_faithful=faithful)
        p = enc.init(jax.random.key(0), x)
        z = enc.apply(p, x)
        assert z.shape == (4, 9)
    # and the faithful path's Dense input is the reference's 84
    pq = models.Encoder(attention_faithful=True).init(jax.random.key(0), x)
    assert pq["params"]["Dense_0"]["kernel"].shape == (84, 9)


class TorchRefUNet(nn.Module):
    """Reference UNet architecture (networks.py:91-153), test-local,
    omitting the unused down_convolution_5/up_transpose_4 like the live
    forward path."""

    @staticmethod
    def _double(cin, cout, k):
        return nn.Sequential(
            nn.Conv2d(cin, cout, k, padding=1), nn.ReLU(True),
            nn.Conv2d(cout, cout, k, padding=1), nn.ReLU(True),
        )

    def __init__(self):
        super().__init__()
        self.pool = nn.MaxPool2d(2, 2)
        self.d1 = self._double(1, 16, (2, 4))
        self.d2 = self._double(16, 32, (2, 4))
        self.d3 = self._double(32, 64, (2, 4))
        self.d4 = self._double(64, 128, (2, 4))
        n = 128 * 4 * 8
        self.down_flat = nn.Sequential(
            nn.Flatten(),
            nn.Linear(n, n // 4), nn.Sigmoid(),
            nn.Linear(n // 4, n // 16), nn.Sigmoid(),
            nn.Linear(n // 16, n // 64), nn.Sigmoid(),
            nn.Linear(n // 64, n // 256), nn.Sigmoid(),
        )
        self.up_flat = nn.Sequential(
            nn.Linear(n // 256, n // 256), nn.Sigmoid(),
            nn.Linear(n // 256, n // 64), nn.Sigmoid(),
            nn.Linear(n // 64, n // 16), nn.Sigmoid(),
            nn.Linear(n // 16, n // 4), nn.Sigmoid(),
            nn.Linear(n // 4, n), nn.Sigmoid(),
            nn.Unflatten(1, (128, 4, 8)),
        )
        self.u1 = self._double(256, 128, 3)
        self.t1 = nn.ConvTranspose2d(128, 64, (2, 6), 2, (2, 0), (0, 1))
        self.u2 = self._double(128, 64, 3)
        self.t2 = nn.ConvTranspose2d(64, 32, (2, 6), 2, (2, 0), (1, 1))
        self.u3 = self._double(64, 32, 3)
        self.t3 = nn.ConvTranspose2d(32, 16, (2, 6), 2, (2, 0), (0, 1))
        self.u4 = self._double(32, 16, 3)
        self.out = nn.Conv2d(16, 1, 3, padding=(0, 2))

    def forward(self, x):
        down_1 = self.d1(x)
        down_3 = self.d2(self.pool(down_1))
        down_5 = self.d3(self.pool(down_3))
        down_7 = self.d4(self.pool(down_5))
        z = self.down_flat(down_7)
        up_0 = self.up_flat(z)
        y = self.u1(torch.cat([down_7, up_0], 1))
        y = self.u2(torch.cat([down_5, self.t1(y)], 1))
        y = self.u3(torch.cat([down_3, self.t2(y)], 1))
        y = self.u4(torch.cat([down_1, self.t3(y)], 1))
        return self.out(y), z


def _port_double(tseq):
    return {
        "Conv_0": {"kernel": t2j_conv(tseq[0].weight), "bias": t2j_bias(tseq[0].bias)},
        "Conv_1": {"kernel": t2j_conv(tseq[2].weight), "bias": t2j_bias(tseq[2].bias)},
    }


def test_unet_parity(data):
    tm = TorchRefUNet().eval()
    with torch.no_grad():
        t_out, t_z = tm(torch.from_numpy(data))

    fm = models.UNet()
    x = jnp.asarray(data.transpose(0, 2, 3, 1))
    params = fm.init(jax.random.key(0), x)["params"]

    new = dict(params)
    for i, seq in enumerate((tm.d1, tm.d2, tm.d3, tm.d4)):
        new[f"DoubleConv_{i}"] = _port_double(seq)
    linears = [m for m in list(tm.down_flat) + list(tm.up_flat)
               if isinstance(m, nn.Linear)]
    for i, lin in enumerate(linears):
        new[f"Dense_{i}"] = {
            "kernel": t2j_dense(lin.weight), "bias": t2j_bias(lin.bias),
        }
    for i, seq in enumerate((tm.u1, tm.u2, tm.u3, tm.u4)):
        new[f"DoubleConv_{4 + i}"] = _port_double(seq)
    for i, ct in enumerate((tm.t1, tm.t2, tm.t3)):
        new[f"TorchConvTranspose_{i}"] = {
            "ConvTranspose_0": {
                "kernel": t2j_convt(ct.weight), "bias": t2j_bias(ct.bias),
            }
        }
    new["Conv_0"] = {
        "kernel": t2j_conv(tm.out.weight), "bias": t2j_bias(tm.out.bias),
    }

    with jax.default_matmul_precision("float32"):
        f_out, f_z = fm.apply({"params": new}, x)
    np.testing.assert_allclose(
        np.asarray(f_z), t_z.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f_out)[..., 0], t_out.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )


def test_torch_checkpoint_port(tmp_path, data):
    """A trained reference .pt checkpoint round-trips into flax params
    with identical outputs (the migration path for reference users)."""
    from collections import OrderedDict

    from spectrogram_cube_clustering_tpu.utils import torch_port

    enc = TorchRefEncoder().eval()
    dec = TorchRefDecoder().eval()
    with torch.no_grad():
        t_z = enc(torch.from_numpy(data))
        t_xr = dec(t_z)
    centroids = torch.randn(5, 9, dtype=torch.float32)

    # assemble a state_dict with the REFERENCE's key names
    # (networks.py:172-214, 251-323)
    sd = OrderedDict()
    for n, i in zip((0, 2, 4), (0, 1, 2)):
        sd[f"encoder.encoder.{n}.weight"] = enc.convs[i].weight
        sd[f"encoder.encoder.{n}.bias"] = enc.convs[i].bias
    sd["encoder.encoder.6.conv.weight"] = enc.att_conv.weight
    sd["encoder.encoder.8.weight"] = enc.fc.weight
    sd["encoder.encoder.8.bias"] = enc.fc.bias
    sd["decoder.decoder.0.weight"] = dec.fc.weight
    sd["decoder.decoder.0.bias"] = dec.fc.bias
    for n, ct in zip((3, 5, 7, 9), (dec.ct0, dec.ct1, dec.ct2, dec.ct3)):
        sd[f"decoder.decoder.{n}.weight"] = ct.weight
        if ct.bias is not None:
            sd[f"decoder.decoder.{n}.bias"] = ct.bias
    sd["clustering.weights"] = centroids

    pt = str(tmp_path / "DEC_Params_Final.pt")
    torch.save(sd, pt)

    out_dir = str(tmp_path / "ported")
    torch_port.convert_checkpoint(pt, out_dir)  # auto-detects DEC

    from spectrogram_cube_clustering_tpu.train.checkpoint import restore

    dec_model = models.DEC(n_clusters=5)
    x = jnp.asarray(data.transpose(0, 2, 3, 1))
    template = dec_model.init(jax.random.key(0), x)["params"]
    params = restore(out_dir, template)

    with jax.default_matmul_precision("float32"):
        q, xr, z = dec_model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(z), t_z.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xr)[..., 0], t_xr.numpy()[:, 0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["centroids"]), centroids.numpy(), rtol=1e-6
    )

    # reverse direction: export those flax params back to a reference
    # .pt — the state_dict must match the original exactly (so the
    # original torch code can load a model trained here)
    pt_back = str(tmp_path / "roundtrip.pt")
    torch_port.export_checkpoint(out_dir, pt_back)
    sd_back = torch.load(pt_back, map_location="cpu", weights_only=True)
    assert set(sd_back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(
            sd_back[k].numpy(),
            sd[k].detach().numpy().astype(np.float64),
            rtol=1e-6, atol=0,
            err_msg=k,
        )


def test_checkpoint_migration_cli_roundtrip(tmp_path, data):
    """The convert-torch-checkpoint / export-torch-checkpoint console
    tools (cli/tools.py) round-trip AEC params exactly — the argparse
    surface over the torch_port functions tested above."""
    from spectrogram_cube_clustering_tpu import cli
    from spectrogram_cube_clustering_tpu.train.checkpoint import (
        restore,
        save,
    )

    model = models.AEC()
    x = jnp.asarray(data.transpose(0, 2, 3, 1))
    params = model.init(jax.random.key(1), x)["params"]
    src = str(tmp_path / "orig_ckpt")
    save(src, params)

    pt = str(tmp_path / "AEC_Params_Final.pt")
    cli.export_torch_checkpoint([src, pt])
    back_dir = str(tmp_path / "back_ckpt")
    cli.convert_torch_checkpoint([pt, back_dir])

    back = restore(back_dir, params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        params, back,
    )
