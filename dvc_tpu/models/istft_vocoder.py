"""Non-autoregressive iSTFT-head vocoder.

An additive fast-vocoder family alongside the AR WaveNet (the reference's
only synthesis path): following the FreeV / Autovocoder direction
(PAPERS.md), the network starts from the PSEUDO-INVERSE-MEL magnitude
prior — already most of the spectrum — and only learns a log-magnitude
residual plus a phase field; the waveform is one jitted overlap-add iSTFT
(convert/griffinlim.py machinery).

TPU-first rationale: generation is ONE feed-forward program — dilated
convs over (B, T_frames, C) land on the MXU as large batched matmuls, the
iSTFT is an irfft + scatter-add — so a 3 s utterance synthesizes in
~a millisecond instead of the AR sampler's serial 48k steps.  Fidelity
trades against the WaveNet (no autoregressive sample modeling); Griffin-Lim
remains the zero-training fallback between the two.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from dvc_tpu.config import AudioConfig, ISTFTVocoderConfig


class _Block(nn.Module):
    """Dilated residual conv block over (B, T, C)."""

    channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.dilation * (self.kernel_size - 1) // 2
        h = nn.Conv(self.channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], name="conv_a")(nn.silu(x))
        h = nn.Conv(self.channels, (1,), name="conv_b")(nn.silu(h))
        return x + h


class ISTFTVocoder(nn.Module):
    """mel (B, n_mels, T) [0,1]-normalized -> complex STFT (B, T, n_freq)."""

    cfg: ISTFTVocoderConfig = ISTFTVocoderConfig()
    audio: AudioConfig = AudioConfig()

    @nn.compact
    def __call__(self, mel_norm: jax.Array) -> jax.Array:
        from dvc_tpu.convert.griffinlim import mel_to_stft_magnitude

        prior = mel_to_stft_magnitude(mel_norm, self.audio)  # (B, T, F)
        log_prior = jnp.log(prior + 1e-5)
        n_freq = prior.shape[-1]

        # LayerNorms keep the trunk's activation scale independent of the
        # raw log-magnitude range (~±11): without them, any drift in the
        # zero-init magnitude head multiplies O(30) activations and the
        # loss climbs 10x in the first 50 steps (measured) before slowly
        # recovering
        h = nn.Conv(self.cfg.channels, (7,), padding=[(3, 3)],
                    name="stem")(log_prior)
        h = nn.LayerNorm(name="stem_norm")(h)
        for i in range(self.cfg.blocks):
            d = self.cfg.dilation_cycle[i % len(self.cfg.dilation_cycle)]
            h = _Block(self.cfg.channels, self.cfg.kernel_size, d,
                       name=f"block{i}")(h)
        h = nn.LayerNorm(name="head_norm")(nn.silu(h))
        # magnitude: learned log residual on the pinv prior (FreeV's
        # parallel-estimate trick: the net only models what pinv misses)
        log_res = nn.Conv(n_freq, (1,), name="mag_head",
                          kernel_init=nn.initializers.zeros)(h)
        mag = jnp.exp(jnp.clip(log_prior + log_res, -11.5, 6.0))
        # phase: an unnormalized (re, im) pair per bin -> unit phasor.
        # NOTE lax.complex, not `re + 1j*im` arithmetic: the experimental
        # axon TPU backend fails (UNIMPLEMENTED) on the weak-typed complex
        # scalar multiply that pattern lowers to.
        ri = nn.Conv(2 * n_freq, (1,), name="phase_head")(h)
        re, im = ri[..., :n_freq], ri[..., n_freq:]
        norm = jnp.sqrt(re * re + im * im + 1e-9)
        return jax.lax.complex((mag * (re / norm)).astype(jnp.float32),
                               (mag * (im / norm)).astype(jnp.float32))


def synthesize(model: ISTFTVocoder, variables, mel_norm: jax.Array,
               length: int | None = None) -> jax.Array:
    """mel (B, n_mels, T) -> waveform (B, length); default length = the
    largest sample count framing to exactly T frames."""
    from dvc_tpu.convert.griffinlim import (
        default_inversion_length,
        istft,
    )

    t = mel_norm.shape[-1]
    if length is None:
        length = default_inversion_length(t, model.audio)
    if length > t * model.audio.hop_size:
        # istft's crop window only holds t*hop samples for a t-frame spec;
        # a larger request would come back silently short (jnp slices clip)
        raise ValueError(
            f"length {length} exceeds the {t * model.audio.hop_size} samples "
            f"a {t}-frame mel can synthesize")
    spec = model.apply(variables, mel_norm)
    return istft(spec, length, model.audio)
