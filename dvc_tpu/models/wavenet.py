"""WaveNet vocoder (mixture-of-logistics, mel-conditioned).

The reference builds this model from the external `wavenet_vocoder` pip
package (preprocessing/processing.py:20-41) with the hyperparameters of
preprocessing/hparams.py:82-117: 24 layers / 4 stacks (dilations 1..32),
512 residual/gate channels, 256 skip channels, kernel 3, scalar input,
10-mixture MoL head (30 channels), 80-dim local conditioning upsampled by
transposed convs x[4,4,4,4] (= hop 256), EMA checkpoint
`checkpoint_step001000000_ema.pth` (model/variational_base_vae.py:254).

This file provides:
  * WaveNet          — Flax module, teacher-forced forward for training
                       (causal dilated convs over the whole waveform; MXU-
                       friendly since every conv is a large batched matmul);
  * discretized_mix_logistic_loss / sample_from_mol — the MoL head math;
  * fast_generate    — autoregressive sampling as a single `lax.scan` with
                       per-layer ring buffers (the fast-wavenet queue trick:
                       each k=3/dilation-d layer keeps its last 2d inputs),
                       replacing the reference's Python-loop
                       `incremental_forward` (preprocessing/processing.py:68).
                       kernels/wavenet_step.py holds the fused Pallas variant.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dvc_tpu.config import VocoderConfig

SQRT_HALF = math.sqrt(0.5)


class _UpsampleNetwork(nn.Module):
    """Transposed-conv mel upsampler (x prod(upsample_scales) in time).

    Matches the reference stack: per scale s, ConvTranspose2d(1, 1,
    (freq_axis_kernel_size, 2s), stride=(1, s), pad=(1, s//2)) + ReLU on a
    (B, 1, C, T) view, so mel bins mix slightly along the frequency axis.
    """

    cfg: VocoderConfig

    @nn.compact
    def __call__(self, c: jax.Array) -> jax.Array:
        # c: (B, T_frames, C) -> (B, T_frames * hop, C)
        x = c
        kf = self.cfg.freq_axis_kernel_size
        n_mels = c.shape[-1]
        for i, s in enumerate(self.cfg.upsample_scales):
            # torch ConvTranspose2d(1, 1, (kf, 2s), stride=(1, s),
            # padding=((kf-1)//2, s//2)) over a (B, 1, C, T) view.
            # ConvTranspose == input-dilated correlation with the FLIPPED
            # kernel and padding k-1-p per side; kernel param kept in torch
            # layout (kf, 2s) so checkpoints convert by reshape only.
            #
            # TPU layout: expressed as a TIME-axis 1-D conv whose (2s, C, C)
            # kernel is the BANDED expansion of the tiny (2s, kf) filter
            # along the mel axis — identical math (out-of-range band entries
            # are zero, reproducing the frequency zero-padding), but the mel
            # bins sit on the 128-lane axis.  The naive (B, T, C, 1) NHWC
            # formulation put the size-1 dim on lanes: XLA padded it 128x
            # (a (8, 49k, 80, 1) temp ballooned 120 MB -> 15 GB of HBM).
            kernel = self.param(f"up{i}_kernel",
                                nn.initializers.constant(1.0 / (2 * s * kf)),
                                (kf, 2 * s))
            bias = self.param(f"up{i}_bias", nn.initializers.zeros, (1,))
            w = jnp.flip(kernel, (0, 1)).T  # (2s, kf)
            pt = 2 * s - 1 - s // 2
            pf = kf - 1 - (kf - 1) // 2
            ci = jnp.arange(n_mels)[:, None]
            co = jnp.arange(n_mels)[None, :]
            df = ci - co + pf                       # (C, C) band offsets
            valid = (df >= 0) & (df < kf)
            banded = jnp.where(valid[None, :, :],
                               w[:, jnp.clip(df, 0, kf - 1)],
                               0.0)                 # (2s, C, C) = (H, I, O)
            x = jax.lax.conv_general_dilated(
                x, banded, window_strides=(1,),
                padding=[(pt, pt)],
                lhs_dilation=(s,),
                dimension_numbers=("NHC", "HIO", "NHC")) + bias
            x = nn.relu(x)
        return x  # (B, T*hop, C)


class _ResidualGLU(nn.Module):
    """One dilated-conv gated layer (residual + skip), r9y9 semantics."""

    cfg: VocoderConfig
    dilation: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array, train: bool) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        residual = x
        if train and cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout, deterministic=not train)(x)
        pad = (cfg.kernel_size - 1) * self.dilation  # causal left pad
        h = nn.Conv(cfg.gate_channels, (cfg.kernel_size,),
                    kernel_dilation=(self.dilation,), padding=[(pad, 0)],
                    dtype=self.dtype, name="conv")(x)
        hc = nn.Conv(cfg.gate_channels, (1,), use_bias=False, dtype=self.dtype,
                     name="conv1x1c")(c)
        a, b = jnp.split(h + hc, 2, axis=-1)
        out = jnp.tanh(a) * jax.nn.sigmoid(b)
        skip = nn.Conv(cfg.skip_out_channels, (1,), dtype=self.dtype,
                       name="conv1x1_skip")(out)
        res = nn.Conv(cfg.residual_channels, (1,), dtype=self.dtype,
                      name="conv1x1_out")(out)
        return (res + residual) * SQRT_HALF, skip


class WaveNet(nn.Module):
    cfg: VocoderConfig = VocoderConfig()
    dtype: Any = None

    def setup(self):
        self.first_conv = nn.Conv(self.cfg.residual_channels, (1,),
                                  dtype=self.dtype, name="first_conv")
        self.layers = [
            _ResidualGLU(self.cfg, self.cfg.dilation(i), self.dtype, name=f"layer{i}")
            for i in range(self.cfg.layers)
        ]
        self.final1 = nn.Conv(self.cfg.skip_out_channels, (1,), dtype=self.dtype,
                              name="final1")
        self.final2 = nn.Conv(self.cfg.out_channels, (1,), dtype=self.dtype,
                              name="final2")
        self.upsample_net = _UpsampleNetwork(self.cfg, name="upsample")

    def upsample(self, c: jax.Array) -> jax.Array:
        return self.upsample_net(c)

    def __call__(self, x: jax.Array, c: jax.Array, train: bool = False,
                 upsample_cond: bool = True) -> jax.Array:
        """Teacher-forced forward.

        x: (B, T, 1) scalar waveform in [-1, 1]; c: (B, T_frames, n_mels)
        (upsampled here) or (B, T, n_mels) if upsample_cond=False.
        Returns (B, T, out_channels) MoL parameters.
        """
        if upsample_cond:
            c = self.upsample(c)
        assert c.shape[1] == x.shape[1], (c.shape, x.shape)
        h = self.first_conv(x)
        skips = None
        for layer in self.layers:
            h, s = layer(h, c, train)
            if skips is None:
                skips = s
            else:
                skips = (skips + s) * (SQRT_HALF if self.cfg.legacy else 1.0)
        out = nn.relu(skips)
        out = nn.relu(self.final1(out))
        return self.final2(out)


# --- mixture of logistics ----------------------------------------------------

def discretized_mix_logistic_loss(y_hat: jax.Array, y: jax.Array,
                                  num_classes: int = 65536,
                                  log_scale_min: float = -32.23619130191664,
                                  reduce: bool = True) -> jax.Array:
    """Negative log-likelihood of y under discretized MoL (y_hat: (B,T,3K))."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    y = jnp.broadcast_to(y, y_hat.shape[:-1] + (1,))
    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # log P(X < -0.999..)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)        # log P(X > 0.999..)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2.0))
    log_probs = jnp.where(y < -0.999, log_cdf_plus,
                          jnp.where(y > 0.999, log_one_minus_cdf_min, inner))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -jax.nn.logsumexp(log_probs, axis=-1)
    return jnp.mean(nll) if reduce else nll


def sample_from_mol(y_hat: jax.Array, rng: jax.Array,
                    log_scale_min: float = -32.23619130191664) -> jax.Array:
    """Sample waveform values from MoL parameters (..., 3K) -> (...,)."""
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    rng_mix, rng_u = jax.random.split(rng)
    # gumbel-max mixture selection
    g = -jnp.log(-jnp.log(jax.random.uniform(
        rng_mix, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5)))
    sel = jax.nn.one_hot(jnp.argmax(logit_probs + g, axis=-1), nr_mix)
    means = jnp.sum(y_hat[..., nr_mix:2 * nr_mix] * sel, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y_hat[..., 2 * nr_mix:] * sel, axis=-1), log_scale_min)
    u = jax.random.uniform(rng_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


# --- fast autoregressive generation -----------------------------------------

def _p(tree, *path):
    for k in path:
        tree = tree[k]
    return tree


def fast_generate(variables: dict, c_frames: jax.Array, rng: jax.Array,
                  cfg: VocoderConfig = VocoderConfig()) -> jax.Array:
    """Autoregressive MoL sampling, (B, T_frames, n_mels) -> (B, T_frames*hop).

    One `lax.scan` over samples; each k=3/dilation-d layer carries a (B, 2d,
    R) ring buffer of its input history, so a step is 24 x 3 matvecs + gating
    — the XLA analogue of `incremental_forward` minus the Python loop.
    Upsampling of the conditioner runs once, batched, before the scan.
    """
    params = variables["params"]
    up = nn.apply(lambda m, c: m.upsample(c), WaveNet(cfg))
    c = up(variables, c_frames)  # (B, T, n_mels)
    b, t, _ = c.shape

    w_first = _p(params, "first_conv", "kernel")[0]  # (1, R)
    b_first = _p(params, "first_conv", "bias")
    layer_ws = []
    for i in range(cfg.layers):
        lp = _p(params, f"layer{i}")
        layer_ws.append(dict(
            w=lp["conv"]["kernel"],            # (k, R, G)
            b=lp["conv"]["bias"],
            wc=lp["conv1x1c"]["kernel"][0],    # (n_mels, G)
            ws=lp["conv1x1_skip"]["kernel"][0],
            bs=lp["conv1x1_skip"]["bias"],
            wo=lp["conv1x1_out"]["kernel"][0],
            bo=lp["conv1x1_out"]["bias"],
        ))
    wf1, bf1 = _p(params, "final1", "kernel")[0], _p(params, "final1", "bias")
    wf2, bf2 = _p(params, "final2", "kernel")[0], _p(params, "final2", "bias")

    bufs = tuple(
        jnp.zeros((b, 2 * cfg.dilation(i), cfg.residual_channels), jnp.float32)
        for i in range(cfg.layers))
    x0 = jnp.zeros((b,), jnp.float32)

    cs = jnp.swapaxes(c, 0, 1)  # (T, B, n_mels)
    rngs = jax.random.split(rng, t)

    def step(carry, inputs):
        x_prev, bufs = carry
        c_t, rng_t = inputs
        h = x_prev[:, None] * w_first + b_first  # (B, R)
        new_bufs = []
        skips = None
        for i, lw in enumerate(layer_ws):
            d = cfg.dilation(i)
            buf = bufs[i]
            x_tm2d = buf[:, 0]
            x_tmd = buf[:, d]
            conv = (jnp.dot(x_tm2d, lw["w"][0], preferred_element_type=jnp.float32)
                    + jnp.dot(x_tmd, lw["w"][1], preferred_element_type=jnp.float32)
                    + jnp.dot(h, lw["w"][2], preferred_element_type=jnp.float32)
                    + lw["b"]
                    + jnp.dot(c_t, lw["wc"], preferred_element_type=jnp.float32))
            a, g = jnp.split(conv, 2, axis=-1)
            out = jnp.tanh(a) * jax.nn.sigmoid(g)
            s = jnp.dot(out, lw["ws"], preferred_element_type=jnp.float32) + lw["bs"]
            res = jnp.dot(out, lw["wo"], preferred_element_type=jnp.float32) + lw["bo"]
            new_bufs.append(jnp.concatenate([buf[:, 1:], h[:, None]], axis=1))
            h = (res + h) * SQRT_HALF
            skips = s if skips is None else (skips + s) * (SQRT_HALF if cfg.legacy else 1.0)
        o = jax.nn.relu(skips)
        o = jax.nn.relu(jnp.dot(o, wf1, preferred_element_type=jnp.float32) + bf1)
        y_hat = jnp.dot(o, wf2, preferred_element_type=jnp.float32) + bf2
        x_t = sample_from_mol(y_hat, rng_t, cfg.log_scale_min)
        return (x_t, tuple(new_bufs)), x_t

    (_, _), ys = jax.lax.scan(step, (x0, bufs), (cs, rngs))
    return jnp.swapaxes(ys, 0, 1)  # (B, T)
