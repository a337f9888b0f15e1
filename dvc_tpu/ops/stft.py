"""Batched STFT with lws-compatible framing.

The reference computes STFT through the native C++ `lws` package
(preprocessing/utils.py:84-86: lws.lws(fft_size, hop, mode="speech")) and uses
only the magnitude (utils.py:70).  lws' framing is documented by the
reference itself (lws_num_frames / lws_pad_lr, preprocessing/utils.py:89-107):
pad (fsize - fshift) on the left and (fsize - fshift + r) on the right so that
M frames of size fsize at hop fshift tile the padded signal exactly.  lws'
default analysis window is sqrt(hann); magnitude-only use makes that the only
degree of freedom, reproduced here (configurable).

TPU-native design: framing is a strided gather, the window is a broadcast
multiply, and the FFT is XLA's native RFFT — all batched over leading dims,
so a whole shard of utterances is one fused device program instead of one
C++ call per file.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import AudioConfig


def num_frames(length: int, fsize: int, fshift: int) -> int:
    """Frame count of the lws spectrogram (reference preprocessing/utils.py:89-97)."""
    pad = fsize - fshift
    if length % fshift == 0:
        return (length + pad * 2 - fsize) // fshift + 1
    return (length + pad * 2 - fsize) // fshift + 2


def pad_lr(length: int, fsize: int, fshift: int) -> tuple[int, int]:
    """Left/right padding lws uses internally (reference preprocessing/utils.py:100-107)."""
    m = num_frames(length, fsize, fshift)
    pad = fsize - fshift
    t = length + 2 * pad
    r = (m - 1) * fshift + fsize - t
    return pad, pad + r


@functools.lru_cache(maxsize=8)
def _window(kind: str, fsize: int) -> np.ndarray:
    # periodic hann, as used by analysis/synthesis STFT packages
    n = np.arange(fsize, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / fsize)
    if kind == "hann":
        w = hann
    elif kind == "sqrt_hann":
        w = np.sqrt(hann)
    elif kind == "rect":
        w = np.ones(fsize)
    else:
        raise ValueError(f"unknown window {kind!r}")
    return w.astype(np.float32)


def frame_signal(wav: jax.Array, fsize: int, fshift: int) -> jax.Array:
    """(..., T) -> (..., M, fsize) strided frames after lws padding."""
    length = wav.shape[-1]
    left, right = pad_lr(length, fsize, fshift)
    pad_widths = [(0, 0)] * (wav.ndim - 1) + [(left, right)]
    padded = jnp.pad(wav, pad_widths)
    m = num_frames(length, fsize, fshift)
    idx = np.arange(m)[:, None] * fshift + np.arange(fsize)[None, :]
    return padded[..., idx]


def stft_magnitude(wav: jax.Array, cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """Batched |STFT|, (..., T) -> (..., M, n_fft//2+1), float32."""
    frames = frame_signal(wav.astype(jnp.float32), cfg.fft_size, cfg.hop_size)
    win = jnp.asarray(_window(cfg.window, cfg.fft_size))
    spec = jnp.fft.rfft(frames * win, n=cfg.fft_size, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)
