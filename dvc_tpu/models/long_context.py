"""Whole-utterance (long-context) encoding for the DisentangledVAE.

The reference architecture can only consume 64-frame blocks: conversion
chops an utterance into INDEPENDENT chunks (chunking_mel,
model/variational_base_vae.py:335-348), so the encoder's receptive field —
three k=5 convs and a 2-layer biLSTM — is truncated at every chunk
boundary.  This module is the additive TPU-native capability SURVEY.md §5
("long-context") plans on top of that contract:

  * the conv stack and the biLSTM run ONCE over the full utterance, so
    context flows across chunk boundaries (the biLSTM's backward direction
    sees the whole future, as it does within a training sample);
  * the flatten + linear heads — whose 8192-wide input hard-codes 64
    frames — are then applied per 64-frame slice of the full-context LSTM
    output, keeping checkpoint compatibility: no new parameters, any
    trained/converted DisentangledVAE checkpoint works unchanged;
  * with a `Mesh`, the frame axis is sharded across devices: halo-exchange
    convs + the ring-relay blockwise LSTM (parallel/sequence.py), so one
    utterance of any length is encoded cooperatively by all chips.

The per-chunk latents drop into the standard conversion path (style =
mean over chunks, decode per chunk) via `convert_mel_long_context`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dvc_tpu.config import VAEConfig
from dvc_tpu.models.disentangled_vae import DisentangledVAE
from dvc_tpu.models.layers import lstm_direction
from dvc_tpu.ops.chunk import unchunk_mel
from dvc_tpu.parallel.sequence import (
    frame_sharded_encode_conv_stack,
    sequence_sharded_lstm,
)


def _dense_conv_stack(x: jax.Array, enc_params: dict, enc_stats: dict,
                      eps: float) -> jax.Array:
    """Single-device image of frame_sharded_encode_conv_stack (BN in
    inference mode)."""
    h = x
    for i in range(3):
        kern = enc_params[f"conv{i}"]["conv"]["kernel"]
        bias = enc_params[f"conv{i}"]["conv"]["bias"]
        pad = (kern.shape[0] - 1) // 2
        h = jax.lax.conv_general_dilated(
            h, kern, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC")) + bias
        bn_p = enc_params[f"bn{i}"]["bn"]
        bn_s = enc_stats[f"bn{i}"]["bn"]
        h = (h - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + eps) \
            * bn_p["scale"] + bn_p["bias"]
        h = jax.nn.relu(h)
    return h


def _bilstm(x: jax.Array, lstm_params: dict, num_layers: int,
            mesh: Mesh | None) -> jax.Array:
    """torch-layout multi-layer biLSTM over the FULL frame axis; the frame
    axis is sharded when a mesh is given."""
    for layer in range(num_layers):
        outs = []
        for rev in (False, True):
            sfx = f"l{layer}" + ("_reverse" if rev else "")
            args = (lstm_params[f"w_ih_{sfx}"], lstm_params[f"w_hh_{sfx}"],
                    lstm_params[f"b_ih_{sfx}"], lstm_params[f"b_hh_{sfx}"])
            if mesh is None:
                ys, _ = lstm_direction(x, *args, reverse=rev)
            else:
                ys, _ = sequence_sharded_lstm(x, *args, mesh, reverse=rev)
            outs.append(ys)
        x = jnp.concatenate(outs, axis=-1)
    return x


@partial(jax.jit, static_argnums=(0, 3))
def _encode_jit(cfg: VAEConfig, variables, mel: jax.Array,
                mesh: Mesh | None):
    enc_params = variables["params"]["encoder"]
    enc_stats = variables["batch_stats"]["encoder"]
    x = jnp.swapaxes(mel, -1, -2)  # (B, T, n_mels)
    if mesh is None:
        h = _dense_conv_stack(x, enc_params, enc_stats, cfg.bn_eps)
    else:
        h = frame_sharded_encode_conv_stack(
            x, {"params": enc_params, "batch_stats": enc_stats}, mesh,
            eps=cfg.bn_eps)
    h = _bilstm(h, enc_params["lstm"], cfg.enc_lstm_layers, mesh)

    # per-chunk heads on the full-context LSTM output
    b, t, width = h.shape
    n_chunks = t // cfg.frames
    flat = h.reshape(b, n_chunks, cfg.frames * width)
    lin = enc_params["linear"]["dense"]
    z = jax.nn.relu(flat @ lin["kernel"] + lin["bias"])
    sty = enc_params["style"]["dense"]
    con = enc_params["content"]["dense"]
    style = z @ sty["kernel"] + sty["bias"]
    content = z @ con["kernel"] + con["bias"]
    s, k = cfg.speaker_size, cfg.content_size
    return (style[..., :s], style[..., s:],
            content[..., :k], content[..., k:])


def whole_utterance_encode(cfg: VAEConfig, variables, mel,
                           mesh: Mesh | None = None):
    """Full-context encode of (B, n_mels, T) mels (T zero-padded up to the
    next 64-frame multiple).

    Returns per-chunk posteriors (style_mu, style_logvar, content_mu,
    content_logvar), each (B, n_chunks, dim).  With T == cfg.frames and no
    mesh this equals `model.encode` exactly; for longer T the receptive
    field crosses chunk boundaries — the point of the variant.

    DELIBERATE deviation from the reference chunk count: chunk_mel always
    emits T//frames + 1 chunks (an all-zero final chunk at exact
    multiples, ops/chunk.py), which is harmless there because chunks are
    independent; HERE an artificial zero chunk would smear fake context
    into the real chunks through the biLSTM, so exact multiples use
    exactly T/frames chunks.  Consequence: at exact multiples the
    long-context conversion output is one 64-frame chunk SHORTER than the
    chunked path's, and the style mean has no zero-chunk term.
    """
    mel = jnp.asarray(mel, jnp.float32)
    t = mel.shape[-1]
    n_chunks = t // cfg.frames + (1 if t % cfg.frames else 0)
    pad = n_chunks * cfg.frames - t
    if pad:
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)))
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        if mel.shape[-1] % n_dev != 0:
            raise ValueError(
                f"padded frame count {mel.shape[-1]} must divide the "
                f"{n_dev}-device mesh; pick an utterance length or mesh "
                f"size accordingly")
    return _encode_jit(cfg, variables, mel, mesh)


@partial(jax.jit, static_argnums=(0,))
def _decode_swap(model: DisentangledVAE, variables, src_style_mu,
                 trg_style_mu, src_content_mu):
    """Chunk-latent swap + decode (+postnet), same math as
    convert/conversion.py:_convert_chunks steps 3-5."""
    n = src_content_mu.shape[0]
    src_style = jnp.broadcast_to(jnp.mean(src_style_mu, axis=0, keepdims=True),
                                 (n, src_style_mu.shape[-1]))
    trg_style = jnp.broadcast_to(jnp.mean(trg_style_mu, axis=0, keepdims=True),
                                 (n, trg_style_mu.shape[-1]))
    source_z = jnp.concatenate([src_style, src_content_mu], axis=-1)
    convert_z = jnp.concatenate([trg_style, src_content_mu], axis=-1)
    recons_mel = model.apply(variables, source_z, method="decode")
    converted_mel = model.apply(variables, convert_z, method="decode")
    converted_mel = converted_mel + model.apply(variables, converted_mel,
                                                method="postnet")
    return (unchunk_mel(recons_mel),
            unchunk_mel(jnp.clip(converted_mel, 0.0, 1.0)))


def convert_mel_long_context(model: DisentangledVAE, variables,
                             source_mel: np.ndarray, target_mel: np.ndarray,
                             frames: int = 64, mesh: Mesh | None = None
                             ) -> tuple[np.ndarray, np.ndarray]:
    """`convert/conversion.py:convert_mel` with full-context encoding:
    same latent-swap semantics (style = mean over chunks), but the source
    and target posteriors come from `whole_utterance_encode` instead of
    independent 64-frame chunks.  The decoder path is unchanged (still
    per-chunk — its 8192-wide reshape is architectural)."""
    cfg = model.cfg
    if frames != cfg.frames:
        raise ValueError(f"frames={frames} does not match the model's "
                         f"architectural chunk size cfg.frames={cfg.frames}")
    src = whole_utterance_encode(cfg, variables,
                                 jnp.asarray(source_mel)[None], mesh)
    trg = whole_utterance_encode(cfg, variables,
                                 jnp.asarray(target_mel)[None], mesh)
    src_style_mu, _, src_content_mu, _ = (a[0] for a in src)
    trg_style_mu = trg[0][0]
    recons, converted = _decode_swap(model, variables, src_style_mu,
                                     trg_style_mu, src_content_mu)
    return np.asarray(recons), np.asarray(converted)
