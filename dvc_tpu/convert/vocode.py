"""Vocoder driver: normalized mel (80, T) -> waveform.

Mirrors reference wavegen (preprocessing/processing.py:45-74): T mel frames
-> T * hop_size samples via the WaveNet's autoregressive MoL sampler, but
batched/compiled (models.wavenet.fast_generate) instead of the sample-serial
Python loop of `incremental_forward`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import VocoderConfig
from dvc_tpu.models.wavenet import WaveNet, fast_generate
from dvc_tpu.train.checkpoint import load_last_checkpoint


def load_vocoder_params(ckpt_path: str, cfg: VocoderConfig = VocoderConfig()) -> dict:
    """Load vocoder weights from either a torch .pth (published reference
    checkpoint, converted on the fly) or our own msgpack checkpoint."""
    if ckpt_path.endswith((".pth", ".pt")):
        from dvc_tpu.utils.torch_convert import convert_wavenet, load_torch_state_dict
        sd = load_torch_state_dict(ckpt_path)
        return {"params": convert_wavenet(sd, n_layers=cfg.layers,
                                          n_upsample=len(cfg.upsample_scales))}
    from flax import serialization
    with open(ckpt_path, "rb") as f:
        data = f.read()
    model = WaveNet(cfg)
    c = jnp.zeros((1, 4, cfg.cin_channels))
    x = jnp.zeros((1, 4 * int(np.prod(cfg.upsample_scales)), 1))
    target = model.init(jax.random.PRNGKey(0), x, c)
    return serialization.from_bytes(target, data)


def make_vocoder(ckpt_path: str, cfg: VocoderConfig = VocoderConfig(),
                 seed: int = 0) -> Callable[[np.ndarray], np.ndarray]:
    """Returns wavegen: (80, T) normalized mel -> (T * 256,) float waveform."""
    variables = load_vocoder_params(ckpt_path, cfg)
    rng = jax.random.PRNGKey(seed)

    def wavegen(mel: np.ndarray) -> np.ndarray:
        c = jnp.asarray(mel, jnp.float32).T[None]  # (1, T, 80)
        wav = fast_generate(variables, c, rng, cfg)
        return np.asarray(wav[0])

    return wavegen
