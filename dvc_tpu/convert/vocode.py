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


def make_vocoder(ckpt_path: str | None, cfg: VocoderConfig = VocoderConfig(),
                 seed: int = 0, backend: str = "auto",
                 pad_frames_to: int = 32,
                 variables=None) -> Callable[[np.ndarray], np.ndarray]:
    """Returns wavegen: (80, T) normalized mel -> (T * 256,) float waveform.

    backend: "pallas" (fused TPU kernel), "scan" (lax.scan sampler, any
    backend), or "auto" (pallas on TPU, scan elsewhere).  Mel frames are
    zero-padded to `pad_frames_to` buckets so utterances of any length reuse
    a handful of compiled programs; the waveform is cropped to the true
    T * hop samples.  Pass `variables` to use an in-memory param tree
    instead of a checkpoint file.
    """
    if variables is None:
        variables = load_vocoder_params(ckpt_path, cfg)
    # pin on device once (checkpoint loads yield host numpy trees; the scan
    # backend would otherwise re-upload them per call — the pallas backend
    # already memoizes its packed device copy)
    variables = jax.device_put(variables)
    rng = jax.random.PRNGKey(seed)
    hop = int(np.prod(cfg.upsample_scales))
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"

    def _generate(c: np.ndarray) -> np.ndarray:
        if backend == "pallas":
            from dvc_tpu.kernels.wavenet_step import pallas_generate
            return np.asarray(pallas_generate(variables, jnp.asarray(c),
                                              seed, cfg))
        return np.asarray(fast_generate(variables, jnp.asarray(c), rng, cfg))

    def wavegen(mel: np.ndarray) -> np.ndarray:
        t = mel.shape[1]
        bucket = -(-t // pad_frames_to) * pad_frames_to
        c = np.zeros((1, bucket, mel.shape[0]), np.float32)
        c[0, :t] = np.asarray(mel, np.float32).T
        return _generate(c)[0, : t * hop]

    def wavegen_batch(mels: list[np.ndarray]) -> list[np.ndarray]:
        """Vocode MANY utterances in one device pass: mels are padded to a
        common frame bucket and run as one batch, so the kernel's aggregate
        throughput (utterances in parallel) applies instead of its
        single-stream rate."""
        if not mels:
            return []
        ts = [m.shape[1] for m in mels]
        bucket = -(-max(ts) // pad_frames_to) * pad_frames_to
        c = np.zeros((len(mels), bucket, mels[0].shape[0]), np.float32)
        for i, m in enumerate(mels):
            c[i, :m.shape[1]] = np.asarray(m, np.float32).T
        wavs = _generate(c)
        return [wavs[i, : t * hop] for i, t in enumerate(ts)]

    wavegen.batch = wavegen_batch  # type: ignore[attr-defined]
    return wavegen


def make_istft_vocoder(ckpt_path: str, cfg=None, audio=None,
                       pad_frames_to: int = 32):
    """Vocoder protocol over the non-autoregressive iSTFT vocoder
    (models/istft_vocoder.py): (80, T) mel -> (T * hop,) waveform in ONE
    feed-forward pass; `.batch` vocodes many mels as one padded batch."""
    from flax import serialization

    from dvc_tpu.config import AudioConfig, ISTFTVocoderConfig
    from dvc_tpu.models.istft_vocoder import ISTFTVocoder

    audio = audio or AudioConfig()
    model = ISTFTVocoder(cfg or ISTFTVocoderConfig(), audio)
    mel0 = jnp.zeros((1, audio.num_mels, 4))
    target = {"params": model.init(jax.random.PRNGKey(0), mel0)["params"]}
    with open(ckpt_path, "rb") as f:
        variables = serialization.from_bytes(target, f.read())
    # pin params on device ONCE: from_bytes yields host numpy arrays, and
    # passing those to the jitted generator re-uploads the full tree
    # (~80 MB over a remote link) on EVERY call
    variables = jax.device_put(variables)
    hop = audio.hop_size

    import functools

    # params travel as an ARGUMENT: closing over them embeds ~80 MB of
    # constants into the HLO (minutes of compile, and the experimental
    # backend fails fetching them during constant folding)
    @functools.partial(jax.jit, static_argnums=(2,))
    def _gen(params, mel_b, length):
        from dvc_tpu.models.istft_vocoder import synthesize
        return synthesize(model, params, mel_b, length)

    def wavegen(mel: np.ndarray) -> np.ndarray:
        return wavegen_batch([mel])[0]

    def wavegen_batch(mels: list[np.ndarray]) -> list[np.ndarray]:
        if not mels:
            return []
        ts = [m.shape[1] for m in mels]
        bucket = -(-max(ts) // pad_frames_to) * pad_frames_to
        c = np.zeros((len(mels), mels[0].shape[0], bucket), np.float32)
        for i, m in enumerate(mels):
            c[i, :, :m.shape[1]] = np.asarray(m, np.float32)
        wavs = np.asarray(_gen(variables, jnp.asarray(c), bucket * hop))
        return [wavs[i, : t * hop] for i, t in enumerate(ts)]

    wavegen.batch = wavegen_batch  # type: ignore[attr-defined]
    return wavegen
