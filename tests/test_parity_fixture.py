"""End-to-end parity harness on committed fixture checkpoints (VERDICT
round-1 item 6): generate torch checkpoints with the reference models'
exact state-dict names (tools/gen_parity_ckpt.py), load them through the
production converter path, and gate numerical parity torch-vs-JAX.  The
published .pth files (reference README.md:13-14) are drop-in replacements
for these fixtures."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dvc_tpu.config import Config, VAEConfig, VocoderConfig

RTOL, ATOL = 2e-3, 2e-4


@pytest.fixture(scope="module")
def fixture_ckpts(tmp_path_factory):
    from tools.gen_parity_ckpt import save_fixtures
    out = tmp_path_factory.mktemp("ckpts")
    vae_path, wn_path = save_fixtures(str(out))
    return vae_path, wn_path


@pytest.fixture(scope="module")
def mel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mels")
    rng = np.random.RandomState(0)
    for spk in ("p225", "p226"):
        (d / spk).mkdir()
        for i in range(3):
            np.save(d / spk / f"{spk}_{i:03d}_mel.npy",
                    rng.rand(80, 100).astype(np.float32))
    return str(d)


class TestVAEFixtureParity:
    def test_parity_report_runs(self, fixture_ckpts, mel_dir):
        """eval/parity.py::parity_report on a real full-size .pth."""
        from dvc_tpu.eval.parity import parity_report

        vae_path, _ = fixture_ckpts
        rep = parity_report(vae_path, mel_dir, Config())
        assert rep["n_utterances"] == 6
        assert rep["n_crops"] >= 6
        assert np.isfinite(rep["l1_per_frame"])
        assert 0 < rep["l1_per_frame"] < 10

    def test_encode_decode_postnet_match_torch(self, fixture_ckpts):
        """The converted model reproduces the torch model bit-closely on
        encode, decode AND postnet (full-size geometry, eval mode)."""
        from dvc_tpu.eval.parity import load_reference_checkpoint
        from tools.gen_parity_ckpt import build_vae_module

        vae_path, _ = fixture_ckpts
        tm = build_vae_module()  # deterministic: same module as the ckpt
        model, variables = load_reference_checkpoint(vae_path, VAEConfig())

        x = torch.rand(2, 80, 64, generator=torch.Generator().manual_seed(99))
        with torch.no_grad():
            smu_t, slv_t, cmu_t, clv_t = tm.encode(x)
        smu, slv, cmu, clv = model.apply(variables, jnp.asarray(x.numpy()),
                                         method="encode")
        np.testing.assert_allclose(np.asarray(smu), smu_t.numpy(), RTOL, ATOL)
        np.testing.assert_allclose(np.asarray(slv), slv_t.numpy(), RTOL, ATOL)
        np.testing.assert_allclose(np.asarray(cmu), cmu_t.numpy(), RTOL, ATOL)
        np.testing.assert_allclose(np.asarray(clv), clv_t.numpy(), RTOL, ATOL)

        z = torch.randn(2, 32, generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            dec_t = tm.decode(z)
        dec = model.apply(variables, jnp.asarray(z.numpy()), method="decode")
        np.testing.assert_allclose(np.asarray(dec), dec_t.numpy(), RTOL, ATOL)

        mel = torch.rand(2, 80, 64, generator=torch.Generator().manual_seed(3))
        with torch.no_grad():
            post_t = tm.postnet(mel)
        post = model.apply(variables, jnp.asarray(mel.numpy()),
                           method="postnet")
        np.testing.assert_allclose(np.asarray(post), post_t.numpy(), RTOL,
                                   ATOL)


TINY = VocoderConfig(layers=4, stacks=2, residual_channels=16,
                     gate_channels=16, skip_out_channels=8, cin_channels=4,
                     upsample_scales=(2, 2), out_channels=6)


def _torch_wavenet_forward(tm, x, c):
    """Teacher-forced forward of the torch fixture module with the framework's
    causal-conv semantics (left pad (k-1)*dil, legacy sqrt(0.5) scaling) —
    the r9y9 inference behavior the converter targets."""
    import math

    import torch.nn.functional as F

    sqrt_half = math.sqrt(0.5)
    h = tm.first_conv(x)
    skips = None
    for layer in tm.conv_layers:
        residual = h
        dil = layer.conv.dilation[0]
        pad = (layer.conv.kernel_size[0] - 1) * dil
        hh = F.conv1d(F.pad(h, (pad, 0)), layer.conv.weight, layer.conv.bias,
                      dilation=dil)
        hh = hh + F.conv1d(c, layer.conv1x1c.weight)
        a, b = hh.chunk(2, dim=1)
        out = torch.tanh(a) * torch.sigmoid(b)
        s = F.conv1d(out, layer.conv1x1_skip.weight, layer.conv1x1_skip.bias)
        h = (F.conv1d(out, layer.conv1x1_out.weight, layer.conv1x1_out.bias)
             + residual) * sqrt_half
        skips = s if skips is None else (skips + s) * sqrt_half
    out = F.relu(skips)
    out = F.relu(F.conv1d(out, tm.last_conv_layers[1].weight,
                          tm.last_conv_layers[1].bias))
    return F.conv1d(out, tm.last_conv_layers[3].weight,
                    tm.last_conv_layers[3].bias)


class TestWaveNetFixtureParity:
    def test_teacher_forced_logits_match_torch(self, fixture_ckpts):
        from dvc_tpu.convert.vocode import load_vocoder_params
        from dvc_tpu.models.wavenet import WaveNet
        from tools.gen_parity_ckpt import build_wavenet_module

        _, wn_path = fixture_ckpts
        tm = build_wavenet_module()
        variables = load_vocoder_params(wn_path, TINY)
        model = WaveNet(TINY)

        rng = np.random.RandomState(0)
        t = 12
        x = rng.uniform(-1, 1, (1, 1, t)).astype(np.float32)
        c = rng.rand(1, TINY.cin_channels, t).astype(np.float32)
        with torch.no_grad():
            want = _torch_wavenet_forward(tm, torch.from_numpy(x),
                                          torch.from_numpy(c)).numpy()
        got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                          jnp.asarray(c.transpose(0, 2, 1)),
                          upsample_cond=False)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                                   rtol=RTOL, atol=ATOL)

    def test_upsample_matches_torch(self, fixture_ckpts):
        import torch.nn.functional as F

        from dvc_tpu.convert.vocode import load_vocoder_params
        from dvc_tpu.models.wavenet import WaveNet
        from tools.gen_parity_ckpt import build_wavenet_module

        _, wn_path = fixture_ckpts
        tm = build_wavenet_module()
        variables = load_vocoder_params(wn_path, TINY)
        model = WaveNet(TINY)

        rng = np.random.RandomState(1)
        c = rng.rand(1, 5, TINY.cin_channels).astype(np.float32)  # (B,T,F)
        x = torch.from_numpy(c.transpose(0, 2, 1)[:, None])  # (B,1,F,T)
        with torch.no_grad():
            for m in tm.upsample_conv:
                x = m(x) if not isinstance(m, torch.nn.ReLU) else F.relu(x)
        want = x[:, 0].numpy().transpose(0, 2, 1)  # (B, T*4, F)
        got = model.apply(variables, jnp.asarray(c), method="upsample")
        np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL,
                                   atol=ATOL)

    def test_generation_from_fixture_runs(self, fixture_ckpts):
        """The full make_vocoder path loads the .pth and generates."""
        from dvc_tpu.convert.vocode import make_vocoder

        _, wn_path = fixture_ckpts
        voc = make_vocoder(wn_path, TINY, backend="scan", pad_frames_to=4)
        mel = np.random.RandomState(2).rand(TINY.cin_channels, 6) \
            .astype(np.float32)
        wav = voc(mel)
        assert wav.shape == (6 * 4,)
        assert np.isfinite(wav).all()
