"""Typed configuration tree — the single source of truth for every subsystem.

The reference spreads configuration over three uncoordinated mechanisms
(argparse in train.py:13-47, attr-dict hparams duplicated in
preprocessing/hparams.py:39-162 and preprocessing/encoder/hparams.py, and
module-level constants in preprocessing/encoder/params_data.py /
params_model.py), with defaults that drift from the canonical shell scripts
(training.sh / conversion.sh).  Here one dataclass tree replaces all of them;
`training_preset()` / `conversion_preset()` reproduce the shell-script values.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class AudioConfig:
    """Audio/DSP parameters (reference: preprocessing/hparams.py:39-111 and
    preprocessing/encoder/params_data.py:1-29, unified)."""

    sample_rate: int = 16_000
    num_mels: int = 80
    fmin: float = 90.0
    fmax: float = 7600.0
    fft_size: int = 1024
    hop_size: int = 256
    min_level_db: float = -100.0
    ref_level_db: float = 16.0
    rescaling: bool = True
    rescaling_max: float = 0.999
    # hparams-parity record (preprocessing/hparams.py:76): the reference
    # runs with True and ops/mel.py implements exactly that (clip to [0,1]);
    # the False branch (assert instead of clip) is intentionally not built
    allow_clipping_in_normalization: bool = True
    # STFT window. The reference uses lws(fft, hop, mode="speech")
    # (preprocessing/utils.py:84-86); magnitude-only use means the analysis
    # window is the only free choice. lws' default analysis window is
    # sqrt(hann), which "sqrt_hann" reproduces.
    window: str = "sqrt_hann"

    # VAD (preprocessing/encoder/params_data.py:17-24; detector role of
    # webrtcvad.Vad(mode=3) at encoder/audio.py:97)
    vad_window_length_ms: int = 30
    vad_moving_average_width: int = 8
    vad_max_silence_length: int = 6
    vad_detector: str = "gmm"  # "gmm" (WebRTC-architecture) | "energy"
    vad_mode: int = 3          # webrtcvad aggressiveness 0..3
    audio_norm_target_dbfs: float = -30.0

    # Partial-utterance windows for the speaker encoder
    # (preprocessing/encoder/params_data.py:11-13)
    partials_n_frames: int = 63
    inference_n_frames: int = 80  # parity record (params_data.py:13; the
                                  # reference itself never reads it either)

    @property
    def n_freq(self) -> int:
        return self.fft_size // 2 + 1


@dataclass(frozen=True)
class VAEConfig:
    """DisentangledVAE architecture (reference: model/disentangled_vae.py:124-195)."""

    num_mels: int = 80
    frames: int = 64              # samples_length; the encoder flattens T*2*dim_neck
    latent_dim: int = 32          # --latent-size (training.sh: 32)
    speaker_size: int = 4         # --speaker_size (training.sh: 4)
    dim_neck: int = 64
    dim_pre: int = 512
    enc_channels: int = 512
    enc_lstm_layers: int = 2
    dec_lstm2_hidden: int = 1024
    postnet_channels: int = 512
    postnet_layers: int = 5
    kernel_size: int = 5
    bn_momentum: float = 0.9      # flax momentum = 1 - torch 0.1
    bn_eps: float = 1e-5
    # run the GVAE pair through one 2B-batch pass with per-half (grouped)
    # BatchNorm statistics — train math identical to the reference's two
    # separate calls, measured ~7% faster and halves the LSTM chain count
    pair_fused: bool = True

    @property
    def content_size(self) -> int:
        return self.latent_dim - self.speaker_size

    @property
    def flat_size(self) -> int:
        # biLSTM output flattened: frames * 2 * dim_neck (= 8192 at defaults)
        return self.frames * 2 * self.dim_neck


@dataclass(frozen=True)
class LossConfig:
    """Loss coefficients (reference: train.py:42-45, model/disentangled_vae.py:310-327)."""

    mse_cof: float = 10.0
    kl_cof: float = 10.0
    style_cof: float = 0.1       # computed/logged but NOT in the total (parity quirk)
    beta_cof: float = 0.1
    # TPU-native additive option (train/adversarial.py): weight of the
    # gradient-reversal speaker-classifier CE on the content posterior mean.
    # 0 (default) keeps the reference objective bit-identical; > 0 requires
    # adv_speakers (the corpus speaker count) to be set too.
    adv_cof: float = 0.0
    adv_speakers: int = 0
    adv_lr: float = 1e-3
    adv_mode: str = "confusion"  # or "grl"; see train/adversarial.py


@dataclass(frozen=True)
class TrainConfig:
    """Trainer settings (reference: training.sh:1-13, train.py:13-47)."""

    batch_size: int = 8
    learning_rate: float = 1e-4
    epochs: int = 200_000
    report_interval: int = 50
    seed: int = 1
    samples_length: int = 64
    # TPU-native additions
    compute_dtype: str = "bfloat16"   # matmul/conv compute dtype; params stay f32
    donate_state: bool = True
    remat: bool = False               # jax.checkpoint over the pair forward
    checkpoint_format: str = "msgpack"  # "msgpack" (single-host file) or
                                        # "orbax" (sharded dir, multi-host)


@dataclass(frozen=True)
class VocoderConfig:
    """WaveNet vocoder (reference: preprocessing/hparams.py:82-117)."""

    out_channels: int = 30            # 10 mixtures x 3 (pi, mean, log_scale)
    layers: int = 24
    stacks: int = 4
    residual_channels: int = 512
    gate_channels: int = 512
    skip_out_channels: int = 256
    kernel_size: int = 3
    dropout: float = 1 - 0.95
    cin_channels: int = 80
    # hparams-parity record: -1 = global (speaker) conditioning disabled,
    # the reference's setting (hparams.py:102); a gin path is not built
    gin_channels: int = -1
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    freq_axis_kernel_size: int = 3
    log_scale_min: float = -32.23619130191664
    # hparams-parity record: the reference TRAINS with torch weight_norm;
    # here convs are plain and the torch->flax converter fuses g*v/||v||
    # into the kernel at load (utils/torch_convert.py) — numerically the
    # same inference weights
    weight_normalization: bool = True
    legacy: bool = True

    @property
    def layers_per_stack(self) -> int:
        return self.layers // self.stacks

    def dilation(self, layer: int) -> int:
        return 2 ** (layer % self.layers_per_stack)

    @property
    def receptive_field(self) -> int:
        dil = sum(self.dilation(i) for i in range(self.layers))
        return dil * (self.kernel_size - 1) + 1


@dataclass(frozen=True)
class ISTFTVocoderConfig:
    """Non-autoregressive iSTFT-head vocoder (additive fast-vocoder family,
    FreeV / Autovocoder direction — see PAPERS.md): a dilated convnet
    refines the pseudo-inverse-mel magnitude prior and predicts phase; the
    waveform is one jitted iSTFT.  Single-pass generation — no sample loop
    at all — trading the AR WaveNet's fidelity ceiling for ~1000x lower
    single-stream latency."""

    channels: int = 512
    blocks: int = 8                       # dilated residual conv blocks
    kernel_size: int = 7
    dilation_cycle: Sequence[int] = (1, 2, 4, 8)


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    """GE2E speaker encoder (reference: preprocessing/encoder/params_model.py:1-11)."""

    mel_n_channels: int = 80
    hidden_size: int = 256
    embedding_size: int = 256
    num_layers: int = 3
    speakers_per_batch: int = 64
    utterances_per_speaker: int = 10
    learning_rate: float = 1e-4
    partials_n_frames: int = 63


@dataclass(frozen=True)
class AutoVCConfig:
    """AutoVC baselines (reference: autovc_replicate/original_autovc.py:295-328,
    proposed_autovc.py:187-220)."""

    dim_neck: int = 32
    dim_emb: int = 256
    dim_pre: int = 512
    freq: int = 32
    num_mels: int = 80
    # "proposed" plain-autoencoder variant
    proposed_dim_neck: int = 64
    proposed_latent_dim: int = 256


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism layer. No reference counterpart (the reference
    is single-GPU; see SURVEY.md §2.2) — this is the TPU-native distributed
    backend: axis names over which pjit/shard_map emit XLA collectives on ICI."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1      # -1: all devices on the data axis
    model_parallel: int = 1
    shard_opt_state: bool = True  # ZeRO-style optimizer-state sharding over data axis


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    speaker_encoder: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    autovc: AutoVCConfig = field(default_factory=AutoVCConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=4, default=str)

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def training_preset() -> Config:
    """Hyperparameters of the canonical training run (reference training.sh:1-13:
    200k epochs, bs=8, lr=1e-4, latent 32, speaker 4, 64-frame samples)."""
    return Config()


@dataclass(frozen=True)
class ConversionSpec:
    """The conversion-run identity carried by conversion.sh:2-3,13-14."""

    src_spk: str
    trg_spk: str
    num_utterances: int = 2  # reference converts the first 2 sorted utts
                             # (variational_base_vae.py:264)


def conversion_preset(src_spk: str = "VCTK-Corpus_wav16_p225",
                      trg_spk: str = "VCTK-Corpus_wav16_p226"
                      ) -> tuple[Config, ConversionSpec]:
    """Conversion-time settings (reference conversion.sh:1-14).

    The Config equals the training preset: conversion.sh passes
    --samples_length=128 but the reference's chunking_mel hardcodes 64-frame
    chunks (variational_base_vae.py:337) and the VAE geometry cannot take
    other lengths, so 64 is the effective value and the one kept here.
    """
    return Config(), ConversionSpec(src_spk, trg_spk)
