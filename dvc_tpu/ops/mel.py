"""Mel-spectrogram pipeline: filterbank, dB conversion, [0,1] normalization.

Reference behavior (preprocessing/utils.py:68-143):
    melspectrogram(y) = normalize(amp_to_db(mel_basis @ |STFT(y)|) - ref_level_db)
with mel_basis = librosa.filters.mel(sr, n_fft, fmin=90, fmax=7600, n_mels=80)
(preprocessing/utils.py:122-126).  librosa is not a dependency here: the
Slaney-style mel filterbank is reimplemented from its defining math
(slaney mel scale, triangular weights, area normalization), which is what
librosa computes with default ``htk=False, norm='slaney'``.

All functions are shape-polymorphic over leading batch dims and jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import AudioConfig
from dvc_tpu.ops.stft import stft_magnitude

# --- Slaney mel scale (linear below 1 kHz, log above) -----------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    mels = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mels = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mels)
    return mels


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int = 16_000, n_fft: int = 1024, n_mels: int = 80,
                   fmin: float = 90.0, fmax: float = 7600.0) -> np.ndarray:
    """(n_mels, n_fft//2+1) Slaney-normalized triangular mel filterbank.

    Bit-parity target: librosa.filters.mel(sr, n_fft, fmin=fmin, fmax=fmax,
    n_mels=n_mels) as called at reference preprocessing/utils.py:124.
    """
    assert fmax <= sample_rate / 2, "fmax above Nyquist"
    n_freq = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freq, dtype=np.float64)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# --- dB / normalization (preprocessing/utils.py:129-143) ---------------------

def amp_to_db(x: jax.Array, min_level_db: float = -100.0) -> jax.Array:
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x: jax.Array) -> jax.Array:
    return jnp.power(10.0, x * 0.05)


def normalize_mel(s_db: jax.Array, min_level_db: float = -100.0) -> jax.Array:
    return jnp.clip((s_db - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize_mel(s: jax.Array, min_level_db: float = -100.0) -> jax.Array:
    return jnp.clip(s, 0.0, 1.0) * -min_level_db + min_level_db


# --- end-to-end mel ----------------------------------------------------------

def melspectrogram(wav: jax.Array, cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """Batched mel spectrogram, (..., T_samples) -> (..., n_mels, T_frames).

    Matches reference preprocessing/utils.py:68-73: lws-style STFT magnitude,
    mel projection, amp->dB minus ref_level_db, then [0,1] normalization.
    Output time axis is last (n_mels, T) like the reference's (80, T).
    """
    mag = stft_magnitude(wav, cfg)  # (..., frames, n_freq)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.fft_size, cfg.num_mels,
                                       cfg.fmin, cfg.fmax))
    # (..., frames, n_freq) @ (n_freq, n_mels) -> (..., frames, n_mels)
    mel = jnp.einsum("...tf,mf->...tm", mag, basis,
                     preferred_element_type=jnp.float32)
    s_db = amp_to_db(mel, cfg.min_level_db) - cfg.ref_level_db
    s = normalize_mel(s_db, cfg.min_level_db)
    return jnp.swapaxes(s, -1, -2)  # (..., n_mels, frames)


melspectrogram_jit = jax.jit(melspectrogram, static_argnums=1)
