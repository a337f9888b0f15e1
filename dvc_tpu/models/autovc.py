"""AutoVC baselines.

Three generators, parity with reference autovc_replicate/:
  * AutoVC        — original AutoVC (original_autovc.py:295-328): content
    encoder conditioned on a source speaker embedding, bottleneck codes
    down/up-sampled at `freq`, decoder conditioned on the target embedding.
  * AutoVCF0      — F0-conditioned variant (original_autovc.py:262-292,
    Generator2/Decoder2): decoder input gains 205 quantized-pitch dims.
  * ProposedAutoVC — the paper's ablation (proposed_autovc.py:187-220): a
    plain autoencoder 8192 -> latent -> 8192 with no speaker input.

TPU notes: the bottleneck down/up-sampling Python loops of the reference
(original_autovc.py:77-79,310-313) are reshapes here; everything else is the
same conv/LSTM stack as the DisentangledVAE, channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvc_tpu.config import AutoVCConfig
from dvc_tpu.models.layers import LSTM, BatchNorm, ConvNorm, LinearNorm


class _ContentEncoder(nn.Module):
    """original_autovc.py:41-81 — conv stack + biLSTM + strided code sampling."""

    cfg: AutoVCConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, c_org: jax.Array, train: bool) -> jax.Array:
        # x: (B, T, n_mels); c_org: (B, dim_emb) broadcast over time and
        # concatenated on channels (original_autovc.py:64-66)
        cfg = self.cfg
        t = x.shape[1]
        cond = jnp.broadcast_to(c_org[:, None, :], (x.shape[0], t, c_org.shape[-1]))
        x = jnp.concatenate([x, cond], axis=-1)
        for i in range(3):
            x = ConvNorm(512, kernel_size=5, w_init_gain="relu",
                         dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        out, _ = LSTM(cfg.dim_neck, num_layers=2, bidirectional=True,
                      dtype=self.dtype, name="lstm")(x)
        fwd, bwd = out[..., :cfg.dim_neck], out[..., cfg.dim_neck:]
        # codes at stride freq: forward tap at block end, backward tap at
        # block start (original_autovc.py:77-79) — a reshape, not a loop
        n_codes = t // cfg.freq
        fwd_codes = fwd.reshape(x.shape[0], n_codes, cfg.freq, cfg.dim_neck)[:, :, -1]
        bwd_codes = bwd.reshape(x.shape[0], n_codes, cfg.freq, cfg.dim_neck)[:, :, 0]
        return jnp.concatenate([fwd_codes, bwd_codes], axis=-1)  # (B, T/freq, 2*neck)


class _Decoder(nn.Module):
    """original_autovc.py:133-171 (Decoder) / :222-260 (Decoder2 when f0_dims>0)."""

    cfg: AutoVCConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cfg = self.cfg
        x, _ = LSTM(cfg.dim_pre, dtype=self.dtype, name="lstm1")(x)
        for i in range(3):
            x = ConvNorm(cfg.dim_pre, kernel_size=5, w_init_gain="relu",
                         dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        x, _ = LSTM(1024, num_layers=2, dtype=self.dtype, name="lstm2")(x)
        return LinearNorm(cfg.num_mels, dtype=self.dtype, name="linear_projection")(x)


class _Postnet(nn.Module):
    """original_autovc.py:174-218 — same shape as the VAE postnet."""

    cfg: AutoVCConfig
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i in range(5):
            feats = self.cfg.num_mels if i == 4 else 512
            gain = "linear" if i == 4 else "tanh"
            x = ConvNorm(feats, kernel_size=5, w_init_gain=gain,
                         dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(name=f"bn{i}")(x, use_running_average=not train)
            if i < 4:
                x = jnp.tanh(x)
        return x


class AutoVC(nn.Module):
    """Original AutoVC generator (original_autovc.py:295-328).

    __call__(x, c_org, c_trg): x is (B, T, n_mels); returns
    (mel_outputs, mel_outputs_postnet, codes_flat); with c_trg=None only the
    flattened codes (the reference's conversion-time encoder probe).
    """

    cfg: AutoVCConfig = AutoVCConfig()
    f0_dims: int = 0
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encoder = _ContentEncoder(self.cfg, self.dtype)
        self.decoder = _Decoder(self.cfg, self.dtype)
        self.postnet = _Postnet(self.cfg, self.dtype)

    def __call__(self, x, c_org, c_trg, f0=None, train: bool = True):
        codes = self.encoder(x, c_org, train)  # (B, T/freq, 2*neck)
        b, n_codes, code_dim = codes.shape
        codes_flat = codes.reshape(b, n_codes * code_dim)
        if c_trg is None:
            return codes_flat
        t = x.shape[1]
        # upsample codes: each code repeated freq times (original_autovc.py:310-313)
        code_exp = jnp.repeat(codes, t // n_codes, axis=1)
        parts = [code_exp, jnp.broadcast_to(c_trg[:, None, :], (b, t, c_trg.shape[-1]))]
        if self.f0_dims:
            assert f0 is not None
            # reference contract (original_autovc.py:281): a PER-UTTERANCE
            # (B, f0_dims) vector broadcast over all frames
            # (`f_0.unsqueeze(1).expand(-1, T, -1)` — constant in time by the
            # reference's own design).  Per-frame (B, T, f0_dims) pitch
            # features are accepted as an extension and passed through
            # unmodified (ops/pitch.quantized_pitch_onehot works here when
            # called with bins == f0_dims; its default 257 does not match).
            if f0.ndim == 2:
                f0 = jnp.broadcast_to(f0[:, None, :], (b, t, self.f0_dims))
            assert f0.shape == (b, t, self.f0_dims), f0.shape
            parts.append(f0)
        dec_in = jnp.concatenate(parts, axis=-1)
        mel = self.decoder(dec_in, train)
        mel_post = mel + self.postnet(mel, train)
        return mel, mel_post, codes_flat


def AutoVCF0(cfg: AutoVCConfig = AutoVCConfig(), dtype=None) -> AutoVC:
    """F0-conditioned variant (original_autovc.py:262-292): +205 decoder dims."""
    return AutoVC(cfg=cfg, f0_dims=205, dtype=dtype)


class ProposedAutoVC(nn.Module):
    """The paper's no-speaker-input autoencoder (proposed_autovc.py:187-220)."""

    cfg: AutoVCConfig = AutoVCConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True):
        cfg = self.cfg
        b, t, _ = x.shape
        h = x
        for i in range(3):
            h = ConvNorm(512, kernel_size=5, w_init_gain="relu",
                         dtype=self.dtype, name=f"enc_conv{i}")(h)
            h = BatchNorm(name=f"enc_bn{i}")(h, use_running_average=not train)
            h = nn.relu(h)
        h, _ = LSTM(cfg.proposed_dim_neck, num_layers=2, bidirectional=True,
                    dtype=self.dtype, name="enc_lstm")(h)
        h = h.reshape(b, -1)
        latent = LinearNorm(cfg.proposed_latent_dim, dtype=self.dtype,
                            name="latent_code")(h)

        d = LinearNorm(t * 2 * cfg.proposed_dim_neck, dtype=self.dtype,
                       name="dec_linear")(latent)
        d = d.reshape(b, t, 2 * cfg.proposed_dim_neck)
        d, _ = LSTM(cfg.dim_pre, dtype=self.dtype, name="dec_lstm1")(d)
        for i in range(3):
            d = ConvNorm(cfg.dim_pre, kernel_size=5, w_init_gain="relu",
                         dtype=self.dtype, name=f"dec_conv{i}")(d)
            d = BatchNorm(name=f"dec_bn{i}")(d, use_running_average=not train)
            d = nn.relu(d)
        d, _ = LSTM(1024, num_layers=2, dtype=self.dtype, name="dec_lstm2")(d)
        mel = LinearNorm(cfg.num_mels, dtype=self.dtype, name="linear_projection")(d)
        mel_post = mel + _Postnet(cfg, self.dtype, name="postnet")(mel, train)
        return mel, mel_post
