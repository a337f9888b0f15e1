"""Disentangled (speaker-style / content) VAE for many-to-many voice conversion.

Architecture parity with reference model/disentangled_vae.py:124-279:
  encoder: 3 x [ConvNorm(512, k5) + BatchNorm + ReLU]  (:150-162)
           -> 2-layer biLSTM(hidden=dim_neck=64)        (:163)
           -> flatten (B, T*2*dim_neck = 8192)          (:209)
           -> ReLU(Linear 8192->2048)                   (:165,211)
           -> style head  (B, 2*speaker_size)           (:167,212)
           -> content head (B, 2*(latent-speaker))      (:168,213)
  decoder: Linear latent->2048 -> Linear 2048->8192     (:170-171,232-233)
           -> reshape (B, T, 2*dim_neck)                (:235)
           -> LSTM(128->512) -> 3 x [Conv512 + BN + ReLU] -> LSTM(512->1024, 2)
           -> Linear 1024->80                           (:172-194,238-248)
  postnet: 5 x [Conv(512,k5)+BN], tanh after the first four (:43-87)

Pairwise forward (:250-279): the two utterances of a same-speaker pair are
encoded; the second style posterior is stop-gradiented (:257-258), the two
style posteriors are AVERAGED, and ONE shared z_style sample is concatenated
with each per-utterance content sample — the group-VAE objective of
"Weakly-Supervised Disentanglement Without Compromises".

Init parity: the reference applies init_weights to every nn.Linear
(xavier gain 1, bias 0.01) and nn.Conv1d (xavier gain 1, bias 0)
(:26-31,:195), overriding the per-layer gains — reproduced here.  LSTMs keep
torch's U(-1/sqrt(H), 1/sqrt(H)).

TPU-first: channels-last compute, one fused program per step; the two
encoders/decoders of the pair run as a single batched pass (stacked on a
pair axis) so the MXU sees matmuls twice as large instead of two small ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvc_tpu.config import VAEConfig
from dvc_tpu.models.layers import LSTM, BatchNorm, ConvNorm, LinearNorm


class _Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype | None = None
    pair_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> tuple[jax.Array, ...]:
        # x: (B, T, n_mels) channels-last
        c = self.cfg
        for i in range(3):
            x = ConvNorm(c.enc_channels, kernel_size=c.kernel_size,
                         w_init_gain="linear", bias_init_value=0.0,
                         dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(momentum=c.bn_momentum, epsilon=c.bn_eps,
                          groups=self.pair_groups,
                          name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        x, _ = LSTM(c.dim_neck, num_layers=c.enc_lstm_layers, bidirectional=True,
                    dtype=self.dtype, name="lstm")(x)
        x = x.reshape(x.shape[0], -1)  # (B, T*2*dim_neck)
        x = nn.relu(LinearNorm(2048, w_init_gain="linear", bias_init_value=0.01,
                               dtype=self.dtype, name="linear")(x))
        style = LinearNorm(2 * c.speaker_size, bias_init_value=0.01,
                           dtype=self.dtype, name="style")(x)
        content = LinearNorm(2 * c.content_size, bias_init_value=0.01,
                             dtype=self.dtype, name="content")(x)
        s = c.speaker_size
        k = c.content_size
        return style[:, :s], style[:, s:], content[:, :k], content[:, k:]


class _Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype | None = None
    pair_groups: int = 1

    @nn.compact
    def __call__(self, z: jax.Array, train: bool) -> jax.Array:
        c = self.cfg
        x = LinearNorm(2048, bias_init_value=0.01, dtype=self.dtype,
                       name="pre_linear1")(z)
        x = LinearNorm(c.flat_size, bias_init_value=0.01, dtype=self.dtype,
                       name="pre_linear2")(x)
        x = x.reshape(z.shape[0], -1, 2 * c.dim_neck)  # (B, T, 128)
        x, _ = LSTM(c.dim_pre, dtype=self.dtype, name="lstm1")(x)
        for i in range(3):
            x = ConvNorm(c.dim_pre, kernel_size=c.kernel_size,
                         w_init_gain="linear", bias_init_value=0.0,
                         dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(momentum=c.bn_momentum, epsilon=c.bn_eps,
                          groups=self.pair_groups,
                          name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        x, _ = LSTM(c.dec_lstm2_hidden, num_layers=2, dtype=self.dtype,
                    name="lstm2")(x)
        x = LinearNorm(c.num_mels, bias_init_value=0.01, dtype=self.dtype,
                       name="linear2")(x)
        return x  # (B, T, n_mels)


class Postnet(nn.Module):
    """Five k=5 convs; tanh after all but the last (reference :43-87)."""

    cfg: VAEConfig
    dtype: jnp.dtype | None = None
    pair_groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        c = self.cfg
        n = c.postnet_layers
        for i in range(n):
            feats = c.num_mels if i == n - 1 else c.postnet_channels
            x = ConvNorm(feats, kernel_size=c.kernel_size, w_init_gain="linear",
                         bias_init_value=0.0, dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(momentum=c.bn_momentum, epsilon=c.bn_eps,
                          groups=self.pair_groups,
                          name=f"bn{i}")(x, use_running_average=not train)
            if i < n - 1:
                x = jnp.tanh(x)
        return x


class DisentangledVAE(nn.Module):
    """Public API mirrors the reference model: encode / decode / postnet /
    __call__(x1, x2) with (B, n_mels, T) inputs and outputs."""

    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype | None = None
    # pair_fused: run the pair through ONE 2B-batch encoder/decoder/postnet
    # pass with per-half BatchNorm statistics (grouped BN) — train-time math
    # identical to the reference's two separate calls, but every conv/LSTM
    # runs at twice the batch and the sequential LSTM chain halves.
    # Parameters/checkpoints are identical and interchangeable either way.
    pair_fused: bool = False

    def setup(self):
        g = 2 if self.pair_fused else 1
        self.encoder = _Encoder(self.cfg, self.dtype, pair_groups=g)
        self.decoder = _Decoder(self.cfg, self.dtype, pair_groups=g)
        self.postnet_mod = Postnet(self.cfg, self.dtype, pair_groups=g)

    def encode(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, ...]:
        """(B, n_mels, T) -> (style_mu, style_logvar, content_mu, content_logvar)."""
        return self.encoder(jnp.swapaxes(x, -1, -2), train)

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        """(B, latent) -> (B, n_mels, T)."""
        return jnp.swapaxes(self.decoder(z, train), -1, -2)

    def postnet(self, mel: jax.Array, train: bool = False) -> jax.Array:
        """(B, n_mels, T) residual (reference applies it channels-first)."""
        return jnp.swapaxes(self.postnet_mod(jnp.swapaxes(mel, -1, -2), train), -1, -2)

    def _reparameterize(self, mu, logvar, train: bool):
        if not train:
            return mu
        eps = jax.random.normal(self.make_rng("reparam"), logvar.shape, mu.dtype)
        return eps * jnp.exp(0.5 * logvar) + mu

    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = True):
        """Pairwise forward (reference :250-279).

        encode/decode/postnet run once per pair element, exactly as the
        reference does — this keeps BatchNorm train-mode statistics per-call
        (stacking the pair would silently change training dynamics).  Both
        calls live inside one jitted program, so there is no dispatch cost.
        Returns (recons_x1, recons_x2, recons_x1_hat, recons_x2_hat,
                 q_z1_mu, q_z1_logvar, q_z2_mu, q_z2_logvar,
                 z_style_mu, z_style_logvar).
        """
        if self.pair_fused:
            b = x1.shape[0]
            s_mu, s_lv, c_mu, c_lv = self.encode(
                jnp.concatenate([x1, x2], axis=0), train=train)
            style_mu1, style_mu2 = s_mu[:b], s_mu[b:]
            style_lv1, style_lv2 = s_lv[:b], s_lv[b:]
            content_mu1, content_mu2 = c_mu[:b], c_mu[b:]
            content_lv1, content_lv2 = c_lv[:b], c_lv[b:]
        else:
            style_mu1, style_lv1, content_mu1, content_lv1 = \
                self.encode(x1, train=train)
            style_mu2, style_lv2, content_mu2, content_lv2 = \
                self.encode(x2, train=train)
        z_content1 = self._reparameterize(content_mu1, content_lv1, train)
        z_content2 = self._reparameterize(content_mu2, content_lv2, train)

        style_mu2 = jax.lax.stop_gradient(style_mu2)
        style_lv2 = jax.lax.stop_gradient(style_lv2)
        z_style_mu = (style_mu1 + style_mu2) / 2
        z_style_lv = (style_lv1 + style_lv2) / 2
        # NOTE reference :261 samples z_style with train=True unconditionally.
        z_style = self._reparameterize(z_style_mu, z_style_lv, train=True)

        z1 = jnp.concatenate([z_style, z_content1], axis=-1)
        z2 = jnp.concatenate([z_style, z_content2], axis=-1)

        q_z1_mu = jnp.concatenate([z_style_mu, content_mu1], axis=-1)
        q_z1_lv = jnp.concatenate([z_style_lv, content_lv1], axis=-1)
        q_z2_mu = jnp.concatenate([z_style_mu, content_mu2], axis=-1)
        q_z2_lv = jnp.concatenate([z_style_lv, content_lv2], axis=-1)

        if self.pair_fused:
            recons = self.decode(jnp.concatenate([z1, z2], axis=0), train=train)
            recons_hat = recons + self.postnet(recons, train=train)
            recons_x1, recons_x2 = recons[:b], recons[b:]
            recons_x1_hat, recons_x2_hat = recons_hat[:b], recons_hat[b:]
        else:
            recons_x1 = self.decode(z1, train=train)
            recons_x2 = self.decode(z2, train=train)
            recons_x1_hat = recons_x1 + self.postnet(recons_x1, train=train)
            recons_x2_hat = recons_x2 + self.postnet(recons_x2, train=train)
        return (recons_x1, recons_x2, recons_x1_hat, recons_x2_hat,
                q_z1_mu, q_z1_lv, q_z2_mu, q_z2_lv, z_style_mu, z_style_lv)
