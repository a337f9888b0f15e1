"""Waveform-domain ops: volume normalization, resampling, VAD, mu-law.

Replaces the native-backed audio path of the reference
(preprocessing/encoder/audio.py: librosa load/resample, webrtcvad silence
trimming, volume normalization) with batched JAX ops.  The reference's
canonical preprocessing runs with ``--no_trim`` (preprocessing.sh:1), so VAD
is optional; the energy-VAD here reproduces the smoothing + dilation
post-processing of trim_long_silences (encoder/audio.py:78-118) around an
energy detector instead of WebRTC's GMM (the C++ webrtcvad dependency).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INT16_MAX = 2**15 - 1


def normalize_volume(wav: jax.Array, target_dbfs: float = -30.0,
                     increase_only: bool = False, decrease_only: bool = False) -> jax.Array:
    """Match mean-power dBFS (reference preprocessing/encoder/audio.py:121-127)."""
    if increase_only and decrease_only:
        raise ValueError("Both increase_only and decrease_only are set")
    dbfs_change = target_dbfs - 10.0 * jnp.log10(jnp.mean(wav**2) + 1e-12)
    gain = jnp.power(10.0, dbfs_change / 20.0)
    if increase_only:
        gain = jnp.maximum(gain, 1.0)
    if decrease_only:
        gain = jnp.minimum(gain, 1.0)
    return wav * gain


def rescale_wav(wav: jax.Array, rescaling_max: float = 0.999) -> jax.Array:
    """Peak-normalize (reference preprocessing/hparams.py:72-76)."""
    return wav / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-8) * rescaling_max


# --- resampling --------------------------------------------------------------

def _sinc_kernel(up: int, down: int, num_zeros: int = 16, rolloff: float = 0.945) -> np.ndarray:
    """Windowed-sinc polyphase filter for rational resampling by up/down."""
    cutoff = rolloff * 0.5 / max(up, down)
    half = int(np.ceil(num_zeros / (2 * cutoff)))
    n = np.arange(-half, half + 1, dtype=np.float64)
    x = 2 * cutoff * n
    sinc = np.sinc(x)
    win = np.hanning(len(n) + 2)[1:-1]
    kernel = 2 * cutoff * sinc * win * up
    return kernel.astype(np.float32)


def resample_poly(wav: jax.Array, orig_sr: int, target_sr: int) -> jax.Array:
    """Rational polyphase resampling, (..., T) -> (..., T*up//down).

    TPU-native replacement for librosa.resample at
    preprocessing/encoder/audio.py:44 — an upsample/FIR/downsample expressed
    as a single strided convolution XLA maps onto the MXU.
    """
    if orig_sr == target_sr:
        return wav
    g = np.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    kernel = _sinc_kernel(up, down)
    pad = len(kernel) // 2

    x = wav.astype(jnp.float32)
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    x = x.reshape((-1, 1, t))
    # conv with input dilation == upsampling by `up`, stride == `down`
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel).reshape(1, 1, -1),
        window_strides=(down,),
        padding=[(pad, pad)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out_len = int(np.ceil(t * up / down))
    return y.reshape(batch_shape + (-1,))[..., :out_len]


# --- VAD ---------------------------------------------------------------------

def _moving_average(x: jax.Array, width: int) -> jax.Array:
    """Same asymmetric zero-padded moving average as encoder/audio.py:105-109."""
    padded = jnp.concatenate(
        [jnp.zeros((width - 1) // 2, x.dtype), x, jnp.zeros(width // 2, x.dtype)])
    csum = jnp.cumsum(padded)
    csum = jnp.concatenate([jnp.zeros(1, x.dtype), csum])
    return (csum[width:] - csum[:-width]) / width


def _binary_dilation(mask: jax.Array, width: int) -> jax.Array:
    """scipy.ndimage.binary_dilation with a ones(width) structuring element."""
    m = mask.astype(jnp.float32).reshape(1, 1, -1)
    k = jnp.ones((1, 1, width), jnp.float32)
    pad = (width - 1) // 2
    out = jax.lax.conv_general_dilated(
        m, k, window_strides=(1,), padding=[(pad, width - 1 - pad)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out.reshape(mask.shape) > 0


def energy_vad_mask(wav: jax.Array, sample_rate: int = 16_000,
                    window_ms: int = 30, threshold_db: float = -48.0,
                    moving_average_width: int = 8,
                    max_silence_length: int = 6) -> jax.Array:
    """Per-window voiced mask with the reference's smoothing + dilation chain.

    Detector: windowed RMS energy vs threshold (replacing webrtcvad's GMM at
    encoder/audio.py:97-101); post-processing (moving average, rounding,
    binary dilation) matches encoder/audio.py:104-116.
    Returns a per-window boolean mask of shape (T // samples_per_window,).
    """
    spw = (window_ms * sample_rate) // 1000
    t = (wav.shape[-1] // spw) * spw
    frames = wav[:t].reshape(-1, spw)
    rms_db = 10.0 * jnp.log10(jnp.mean(frames**2, axis=-1) + 1e-12)
    flags = (rms_db > threshold_db).astype(jnp.float32)
    smoothed = _moving_average(flags, moving_average_width)
    mask = jnp.round(smoothed).astype(bool)
    return _binary_dilation(mask, max_silence_length + 1)


def trim_long_silences(wav: np.ndarray, sample_rate: int = 16_000,
                       window_ms: int = 30, **kw) -> np.ndarray:
    """Host-side gather of voiced samples (dynamic output shape -> numpy)."""
    spw = (window_ms * sample_rate) // 1000
    t = (len(wav) // spw) * spw
    wav = wav[:t]
    mask = np.asarray(energy_vad_mask(jnp.asarray(wav), sample_rate, window_ms, **kw))
    sample_mask = np.repeat(mask, spw)
    return wav[sample_mask]


# --- mu-law ------------------------------------------------------------------

def mulaw(x: jax.Array, mu: int = 255) -> jax.Array:
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))


def inv_mulaw(y: jax.Array, mu: int = 255) -> jax.Array:
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * jnp.log1p(float(mu)))) / mu
