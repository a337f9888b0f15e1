"""WORLD-feature voice conversion driver.

The reference ships all the WORLD machinery (C7: analysis, mcep transforms,
log-Gaussian pitch conversion, synthesis — preprocessing/WORLD_processing.py)
and an MCC dataset/VAE path (SpeechDatasetMCC2, samples_length=128) but never
wires them into a conversion entry point (train.py only exposes the mel
path).  This driver completes that path the TPU-native way:

  1. VAE latent swap on 128-frame chunks of normalized MCCs (chunking_mcc,
     model/variational_base_vae.py:350-360) — batched, one device pass;
  2. de-normalize with the target speaker's mcep statistics;
  3. mc2sp back to a spectral envelope (exact pysptk math);
  4. log-Gaussian pitch conversion src->trg (WORLD_processing.py:187-192);
  5. WORLD synthesis (ops/world.world_speech_synthesis: the native
     WORLD-faithful pulse-by-pulse engine when built, else the batched
     on-device approximation).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import Config
from dvc_tpu.ops.chunk import chunk_mel, unchunk_mel
from dvc_tpu.ops.world import (
    cheaptrick_fft_size,
    mc2sp,
    mcepalpha,
    pitch_conversion,
    world_speech_synthesis,
)


def convert_mcc(model, variables, src_norm_mc: np.ndarray,
                trg_norm_mc: np.ndarray, frames: int = 128,
                fs_mask: np.ndarray | None = None) -> np.ndarray:
    """Latent-swap conversion in normalized-MCC space.

    src/trg_norm_mc: (n_mcep, T) normalized MCCs (the PairedMCCDataset
    layout).  Returns converted normalized MCCs (n_mcep, ceil-chunked T).

    fs_mask: optional (latent_dim,) binary mask (conversion.
    binarize_fs_mask) — the FeatureSelection-masked swap: convert_z takes
    the target's mean FULL latent on masked dims and the source's
    per-chunk latent elsewhere (same semantics as the mel path's
    convert --fs_mask; chip-measured to fix conversion direction at the
    reference's latent 32, docs/measurements/).
    """
    src_chunks = chunk_mel(jnp.asarray(src_norm_mc, jnp.float32), frames)
    trg_chunks = chunk_mel(jnp.asarray(trg_norm_mc, jnp.float32), frames)

    src_style_mu, _, src_content_mu, _ = model.apply(
        variables, src_chunks, method="encode")
    trg_style_mu, _, trg_content_mu, _ = model.apply(
        variables, trg_chunks, method="encode")
    n = src_chunks.shape[0]
    if fs_mask is None:
        trg_style = jnp.broadcast_to(
            jnp.mean(trg_style_mu, axis=0, keepdims=True),
            (n, trg_style_mu.shape[-1]))
        z = jnp.concatenate([trg_style, src_content_mu], axis=-1)
    else:
        mask = jnp.asarray(fs_mask, jnp.float32)
        src_z = jnp.concatenate([src_style_mu, src_content_mu], axis=-1)
        trg_mean = jnp.mean(
            jnp.concatenate([trg_style_mu, trg_content_mu], -1),
            axis=0, keepdims=True)
        z = src_z * (1.0 - mask) + trg_mean * mask
    converted = model.apply(variables, z, method="decode")
    return np.asarray(unchunk_mel(converted))


def _convert_features(model, variables, src_npz: dict, trg_npz: dict,
                      trg_stats: dict, src_logf0_stats: dict,
                      trg_logf0_stats: dict, fs: int,
                      frames: int,
                      fs_mask: np.ndarray | None = None
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Steps 1-4 of the conversion (latent swap, de-normalize, mc2sp,
    pitch transform): returns (f0_conv, sp, ap) ready for synthesis."""
    src_f0 = np.asarray(src_npz["f0"])
    src_norm = np.asarray(src_npz["normalized_mc"]).T  # (n_mcep, T)
    trg_norm = np.asarray(trg_npz["normalized_mc"]).T  # (n_mcep, T')
    t = src_norm.shape[1]

    # 1-2. latent swap (target style, source content) + target-space
    # denormalization
    conv_norm = convert_mcc(model, variables, src_norm, trg_norm, frames,
                            fs_mask=fs_mask)[:, :t]
    mc = conv_norm.T * np.asarray(trg_stats["std"]).T \
        + np.asarray(trg_stats["mean"]).T              # (T, n_mcep)

    # 3. envelope from converted mceps
    alpha = mcepalpha(fs)
    fft_size = cheaptrick_fft_size(fs)
    sp = np.asarray(mc2sp(jnp.asarray(mc, jnp.float32), alpha, fft_size))

    # 4. pitch conversion (voiced frames only; unvoiced stay 0)
    voiced = src_f0 > 0
    f0_conv = np.zeros_like(src_f0)
    if voiced.any():
        f0_conv[voiced] = pitch_conversion(
            src_f0[voiced], src_logf0_stats["mean"], src_logf0_stats["std"],
            trg_logf0_stats["mean"], trg_logf0_stats["std"])

    # aperiodicity (re-estimated flat for converted speech)
    ap = np.full((t, sp.shape[1]), 0.2, np.float32)
    ap[~voiced[:t]] = 1.0 - 1e-12
    return f0_conv[:t], sp[:t], ap


def _peak_normalize(wav: np.ndarray) -> np.ndarray:
    wav = np.asarray(wav)
    peak = np.abs(wav).max()
    return wav / peak * 0.95 if peak > 1e-8 else wav


def world_convert_utterance(model, variables, src_npz: dict, trg_npz: dict,
                            trg_stats: dict,
                            src_logf0_stats: dict, trg_logf0_stats: dict,
                            fs: int = 16_000, frame_period: float = 5.0,
                            frames: int = 128,
                            fs_mask: np.ndarray | None = None) -> np.ndarray:
    """Full WORLD-path conversion of one utterance.

    src_npz / trg_npz: dicts with keys f0, normalized_mc (T, n_mcep) — the
    data/world_preprocess.py contract.  The TARGET utterance supplies the
    style latent for the swap (latent-swap semantics of reference
    model/variational_base_vae.py:277-296: target style + source content);
    trg_stats: {"mean", "std"} mcep stats of the TARGET speaker ((n_mcep, 1)
    as stored); *_logf0_stats: {"mean", "std"} scalars.  Returns the
    synthesized waveform.
    """
    f0_conv, sp, ap = _convert_features(
        model, variables, src_npz, trg_npz, trg_stats, src_logf0_stats,
        trg_logf0_stats, fs, frames, fs_mask=fs_mask)
    wav = world_speech_synthesis(f0_conv, sp, ap, fs, frame_period)
    return _peak_normalize(wav)


def world_convert_corpus(model, variables, src_npzs: list, trg_npzs: list,
                         trg_stats: dict, src_logf0_stats: dict,
                         trg_logf0_stats: dict, fs: int = 16_000,
                         frame_period: float = 5.0,
                         frames: int = 128,
                         fs_mask: np.ndarray | None = None) -> list:
    """Corpus-throughput variant of world_convert_utterance: the feature
    conversion runs per utterance (steps 1-4, identical numerics), then ALL
    waveforms synthesize in bucketed device batches via
    ops/world.synthesize_batch — the reference's per-utterance
    pyworld.synthesize loop (WORLD_processing.py:99-106) collapsed into a
    handful of vmapped programs.  src_npzs[i] converts against trg_npzs[i].
    """
    from dvc_tpu.ops.world import synthesize_batch

    feats = [_convert_features(model, variables, s, t, trg_stats,
                               src_logf0_stats, trg_logf0_stats, fs, frames,
                               fs_mask=fs_mask)
             for s, t in zip(src_npzs, trg_npzs)]
    wavs = synthesize_batch([f[0] for f in feats], [f[1] for f in feats],
                            [f[2] for f in feats], fs, frame_period)
    return [_peak_normalize(w) for w in wavs]
