#!/usr/bin/env python
"""Deterministic torch fixture checkpoints for the parity harness.

The published reference checkpoints (reference README.md:13-14:
DisentangledVAE_VCTK_*.pth, checkpoint_step001000000_ema.pth) cannot be
downloaded in the zero-egress build environment, so these generators produce
torch checkpoints with the reference models' EXACT state-dict names and
tensor layouts (full-size VAE; weight-normalized r9y9-layout WaveNet).
tests/test_parity_fixture.py runs eval/parity.py::parity_report and the
vocoder sample-parity gate on them, proving the load-convert-run harness
end-to-end; the real .pth files are then drop-in replacements.

Run standalone to materialize the files:

    python tools/gen_parity_ckpt.py <out_dir>
"""

from __future__ import annotations

import sys


def build_vae_module(frames: int = 64, latent: int = 32, speaker: int = 4,
                     dim_neck: int = 64, dim_pre: int = 512, seed: int = 5):
    """torch module with the reference DisentangledVAE's state-dict names
    (model/disentangled_vae.py:124-195: enc_modules.{i}.0.conv,
    enc_lstm, *.linear_layer, dec_modules.{i}.0 plain conv,
    postnet.convolutions.{i}.0.conv) and a few BN-stat priming steps."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    class ConvNorm(tnn.Module):
        def __init__(s, cin, cout, k=5, pad=2):
            super().__init__()
            s.conv = tnn.Conv1d(cin, cout, k, 1, pad)

        def forward(s, x):
            return s.conv(x)

    class LinearNorm(tnn.Module):
        def __init__(s, din, dout):
            super().__init__()
            s.linear_layer = tnn.Linear(din, dout)

        def forward(s, x):
            return s.linear_layer(x)

    class Postnet(tnn.Module):
        def __init__(s):
            super().__init__()
            dims = [(80, 512), (512, 512), (512, 512), (512, 512), (512, 80)]
            s.convolutions = tnn.ModuleList(
                tnn.Sequential(ConvNorm(a, b), tnn.BatchNorm1d(b))
                for a, b in dims)

        def forward(s, x):
            for m in s.convolutions[:-1]:
                x = torch.tanh(m(x))
            return s.convolutions[-1](x)

    class TorchVAE(tnn.Module):
        def __init__(s):
            super().__init__()
            s.frames, s.latent, s.speaker, s.neck = frames, latent, speaker, dim_neck
            s.postnet = Postnet()
            s.enc_modules = tnn.ModuleList(
                tnn.Sequential(ConvNorm(80 if i == 0 else dim_pre, dim_pre),
                               tnn.BatchNorm1d(dim_pre)) for i in range(3))
            s.enc_lstm = tnn.LSTM(dim_pre, dim_neck, 2, batch_first=True,
                                  bidirectional=True)
            s.enc_linear = LinearNorm(frames * 2 * dim_neck, 2048)
            s.style = LinearNorm(2048, speaker * 2)
            s.content = LinearNorm(2048, (latent - speaker) * 2)
            s.dec_pre_linear1 = tnn.Linear(latent, 2048)
            s.dec_pre_linear2 = tnn.Linear(2048, frames * 2 * dim_neck)
            s.dec_lstm1 = tnn.LSTM(dim_neck * 2, 512, 1, batch_first=True)
            s.dec_modules = tnn.ModuleList(
                tnn.Sequential(tnn.Conv1d(dim_pre, dim_pre, 5, 1, 2),
                               tnn.BatchNorm1d(dim_pre)) for _ in range(3))
            s.dec_lstm2 = tnn.LSTM(dim_pre, 1024, 2, batch_first=True)
            s.dec_linear2 = LinearNorm(1024, 80)

        def encode(s, x):
            import torch.nn.functional as F
            for m in s.enc_modules:
                x = F.relu(m(x))
            x = x.transpose(1, 2)
            out, _ = s.enc_lstm(x)
            out = out.reshape(x.shape[0], -1)
            out = F.relu(s.enc_linear(out))
            st, ct = s.style(out), s.content(out)
            k = s.speaker
            return (st[:, :k], st[:, k:],
                    ct[:, :s.latent - k], ct[:, s.latent - k:])

        def decode(s, z):
            import torch.nn.functional as F
            o = s.dec_pre_linear2(s.dec_pre_linear1(z))
            o = o.view(z.shape[0], -1, s.neck * 2)
            o, _ = s.dec_lstm1(o)
            o = o.transpose(-1, -2)
            for m in s.dec_modules:
                o = F.relu(m(o))
            o = o.transpose(-1, -2)
            o, _ = s.dec_lstm2(o)
            return s.dec_linear2(o).transpose(-1, -2)

    model = TorchVAE()
    # prime BatchNorm running stats with deterministic pseudo-data
    model.train()
    with torch.no_grad():
        for i in range(3):
            g = torch.Generator().manual_seed(seed + 1 + i)
            x = torch.rand(4, 80, frames, generator=g)
            model.encode(x)
            model.decode(torch.randn(4, latent, generator=g))
            model.postnet(torch.rand(4, 80, frames, generator=g))
    model.eval()
    return model


def build_wavenet_module(layers: int = 4, stacks: int = 2,
                         residual_channels: int = 16, gate_channels: int = 16,
                         skip_channels: int = 8, out_channels: int = 6,
                         cin_channels: int = 4,
                         upsample_scales=(2, 2), seed: int = 11):
    """torch module with the r9y9 wavenet_vocoder state-dict names the
    published EMA checkpoint uses (first_conv, conv_layers.{i}.conv /
    .conv1x1c / .conv1x1_skip / .conv1x1_out, last_conv_layers.{1,3},
    upsample_conv.{2j}), all weight-normalized.  Defaults are a scaled-down
    geometry (the converter path is size-agnostic; the full 24-layer config
    only changes tensor sizes)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)
    wn = tnn.utils.weight_norm

    class TorchWaveNet(tnn.Module):
        def __init__(s):
            super().__init__()
            s.first_conv = wn(tnn.Conv1d(1, residual_channels, 1))
            s.conv_layers = tnn.ModuleList()
            per_stack = layers // stacks
            for i in range(layers):
                dil = 2 ** (i % per_stack)
                layer = tnn.Module()
                layer.conv = wn(tnn.Conv1d(residual_channels, gate_channels,
                                           3, padding=dil, dilation=dil))
                layer.conv1x1c = wn(tnn.Conv1d(cin_channels, gate_channels, 1,
                                               bias=False))
                layer.conv1x1_skip = wn(tnn.Conv1d(gate_channels // 2,
                                                   skip_channels, 1))
                layer.conv1x1_out = wn(tnn.Conv1d(gate_channels // 2,
                                                  residual_channels, 1))
                s.conv_layers.append(layer)
            s.last_conv_layers = tnn.ModuleList([
                tnn.ReLU(),
                wn(tnn.Conv1d(skip_channels, skip_channels, 1)),
                tnn.ReLU(),
                wn(tnn.Conv1d(skip_channels, out_channels, 1))])
            ups = []
            for sc in upsample_scales:
                c = tnn.ConvTranspose2d(1, 1, (3, 2 * sc), (1, sc),
                                        padding=(1, sc // 2))
                ups.append(c)
                ups.append(tnn.ReLU())
            s.upsample_conv = tnn.ModuleList(ups)

    return TorchWaveNet()


def save_fixtures(out_dir: str) -> tuple[str, str]:
    import os

    import torch

    os.makedirs(out_dir, exist_ok=True)
    vae = build_vae_module()
    vae_path = os.path.join(out_dir, "DisentangledVAE_VCTK_fixture_100.pth")
    torch.save(vae.state_dict(), vae_path)

    wavenet = build_wavenet_module()
    wn_path = os.path.join(out_dir, "checkpoint_fixture_ema.pth")
    torch.save({"state_dict": wavenet.state_dict()}, wn_path)
    return vae_path, wn_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures"
    paths = save_fixtures(out)
    print("\n".join(paths))
