"""Griffin-Lim mel inversion: a checkpoint-free vocoder path.

Role parity with reference preprocessing/processing.py:133-141
(`simple_inverse`: librosa mel_to_stft + griffinlim), done properly: the
[0,1]-normalized mel is first inverted through the exact normalization/dB
chain of ops/mel.py (the reference's simple_inverse skips this), then mapped
back to a linear-frequency magnitude via the Moore-Penrose pseudo-inverse of
the mel filterbank (clipped at 0), and phase is recovered with Griffin-Lim
iterations.

TPU-native: the whole inversion — pinv projection, the GL fixed-point loop
(ISTFT -> STFT -> phase replace) — is one jitted program; the ISTFT is
overlap-add via a scatter-add, the loop is `lax.fori_loop`, and everything
batches over leading dims.  Quality is below the WaveNet vocoder (no phase
model), but it runs thousands of times faster and needs no checkpoint, which
makes it the default for quick conversions and for the end-to-end
convert -> eval-mcd CI loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dvc_tpu.config import AudioConfig
from dvc_tpu.ops.mel import (
    amp_to_db,
    db_to_amp,
    denormalize_mel,
    mel_filterbank,
)
from dvc_tpu.ops.stft import _window, frame_signal, num_frames, pad_lr


@functools.lru_cache(maxsize=8)
def _mel_pinv(sample_rate: int, n_fft: int, n_mels: int, fmin: float,
              fmax: float) -> np.ndarray:
    """(n_freq, n_mels) pseudo-inverse of the mel filterbank."""
    basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    return np.linalg.pinv(basis.astype(np.float64)).astype(np.float32)


def mel_to_stft_magnitude(mel_norm: jax.Array,
                          cfg: AudioConfig = AudioConfig()) -> jax.Array:
    """[0,1]-normalized (..., n_mels, T) mel -> (..., T, n_freq) |STFT|."""
    s_db = denormalize_mel(mel_norm, cfg.min_level_db) + cfg.ref_level_db
    mel_amp = db_to_amp(s_db)  # (..., n_mels, T)
    pinv = jnp.asarray(_mel_pinv(cfg.sample_rate, cfg.fft_size, cfg.num_mels,
                                 cfg.fmin, cfg.fmax))
    mag = jnp.einsum("fm,...mt->...tf", pinv, mel_amp,
                     preferred_element_type=jnp.float32)
    return jnp.maximum(mag, 0.0)


def _stft_complex(wav: jax.Array, cfg: AudioConfig) -> jax.Array:
    frames = frame_signal(wav, cfg.fft_size, cfg.hop_size)
    win = jnp.asarray(_window(cfg.window, cfg.fft_size))
    return jnp.fft.rfft(frames * win, n=cfg.fft_size, axis=-1)


def istft(spec: jax.Array, length: int, cfg: AudioConfig = AudioConfig()
          ) -> jax.Array:
    """Overlap-add inverse of ops/stft framing.

    spec: (..., M, n_freq) complex; returns (..., length) float32 such that
    istft(stft(x)) ~= x for the sqrt-hann analysis/synthesis pair.
    """
    fsize, fshift = cfg.fft_size, cfg.hop_size
    m = spec.shape[-2]
    win = jnp.asarray(_window(cfg.window, fsize))
    frames = jnp.fft.irfft(spec, n=fsize, axis=-1) * win  # (..., M, fsize)

    left, _right = pad_lr(length, fsize, fshift)
    total = (m - 1) * fshift + fsize
    starts = np.arange(m) * fshift
    idx = starts[:, None] + np.arange(fsize)[None, :]  # (M, fsize)

    flat_idx = idx.reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(batch_shape + (-1,))
    out = jnp.zeros(batch_shape + (total,), jnp.float32)
    out = out.at[..., flat_idx].add(flat)

    # window-square overlap normalization (constant except at the edges)
    wsq = np.zeros(total, np.float32)
    np.add.at(wsq, flat_idx, np.tile(np.asarray(_window(cfg.window, fsize))
                                     ** 2, m))
    out = out / jnp.asarray(np.maximum(wsq, 1e-8))
    return out[..., left:left + length]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _griffin_lim(mag: jax.Array, length: int, n_iter: int,
                 cfg: AudioConfig) -> jax.Array:
    """(..., M, n_freq) magnitude -> (..., length) waveform."""
    spec0 = mag.astype(jnp.complex64)  # zero phase init (deterministic)
    wav0 = istft(spec0, length, cfg)

    def body(_, wav):
        spec = _stft_complex(wav, cfg)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-8)
        return istft(mag * phase, length, cfg)

    return jax.lax.fori_loop(0, n_iter, body, wav0)


def _max_length_for_frames(m: int, cfg: AudioConfig) -> int | None:
    """Largest sample count whose lws framing yields exactly m frames, or
    None when no positive length does (very short mels).

    num_frames is NOT monotone in length (its hop-unaligned branch adds 2
    where the aligned one adds 1), so this inverts each branch analytically:
    aligned lengths k*hop give k - 1 + fft//hop frames; unaligned lengths
    give (L + fft - 2*hop)//hop + 2."""
    fft, hop = cfg.fft_size, cfg.hop_size
    cands = []
    k = m + 1 - fft // hop
    if k >= 1:
        cands.append(k * hop)
    lb = (m + 1) * hop - fft - 1  # unaligned-branch upper bound
    for cand in (lb, lb - 1):     # step past a hop multiple if needed
        if cand >= 1 and cand % hop != 0:
            cands.append(cand)
            break
    good = [c for c in cands if num_frames(c, fft, hop) == m]
    return max(good) if good else None


def _padded_inversion_plan(m: int, cfg: AudioConfig) -> tuple[int, int, int]:
    """(target_frames, length, crop) for a mel too short (or framing-skipped)
    to invert directly: pad the magnitude to target_frames so the inferred
    length covers the promised m*hop samples, then crop back."""
    crop = max(1, m * cfg.hop_size)
    target_m = m + -(-cfg.fft_size // cfg.hop_size) + 1
    for _ in range(4 * target_m + 8):
        length = _max_length_for_frames(target_m, cfg)
        if length is not None and length >= crop:
            return target_m, length, crop
        target_m += 1
    raise ValueError(f"no invertible framing for m={m}, cfg={cfg}")


def default_inversion_length(m: int, cfg: AudioConfig) -> int:
    """The output length griffin_lim produces for an m-frame magnitude when
    no explicit length is given (shared with the batch vocoder so single
    and batched calls agree)."""
    length = _max_length_for_frames(m, cfg)
    if length is not None and length >= 1:
        return length
    return _padded_inversion_plan(m, cfg)[2]


def griffin_lim(mag: jax.Array, cfg: AudioConfig = AudioConfig(),
                n_iter: int = 32, length: int | None = None) -> np.ndarray:
    """Phase recovery from (..., M, n_freq) |STFT| (role of librosa.griffinlim
    at reference processing.py:139).

    Default length = the largest sample count framing to exactly m frames
    (the mel round-trip inverse).  Very short inputs, where no positive
    length frames to m, are zero-padded to a viable frame count and cropped
    back to m*hop samples.
    """
    m = mag.shape[-2]
    crop = None
    if length is None:
        length = _max_length_for_frames(m, cfg)
        if length is None:
            target_m, length, crop = _padded_inversion_plan(m, cfg)
            pad = [(0, 0)] * (mag.ndim - 2) + [(0, target_m - m), (0, 0)]
            mag = jnp.pad(jnp.asarray(mag), pad)
            m = target_m
    assert num_frames(length, cfg.fft_size, cfg.hop_size) == m
    wav = _griffin_lim(jnp.asarray(mag, jnp.float32), int(length),
                       int(n_iter), cfg)
    out = np.asarray(wav)
    return out[..., :crop] if crop is not None else out


def mel_to_waveform(mel_norm: np.ndarray, cfg: AudioConfig = AudioConfig(),
                    n_iter: int = 32) -> np.ndarray:
    """[0,1] (n_mels, T) mel -> waveform, peak-normalized to 0.95."""
    mag = mel_to_stft_magnitude(jnp.asarray(mel_norm, jnp.float32), cfg)
    wav = griffin_lim(mag, cfg, n_iter)
    peak = np.abs(wav).max() if wav.size else 0.0
    return (wav / peak * 0.95).astype(np.float32) if peak > 1e-8 \
        else wav.astype(np.float32)


def make_griffinlim_vocoder(cfg: AudioConfig = AudioConfig(), n_iter: int = 32):
    """Vocoder-protocol factory: (80, T) mel -> waveform (drop-in for
    convert.vocode.make_vocoder's return); `.batch` vocodes many mels as one
    padded device batch."""

    def voc(mel: np.ndarray) -> np.ndarray:
        return mel_to_waveform(np.asarray(mel), cfg, n_iter)

    def voc_batch(mels: list) -> list:
        if not mels:
            return []
        ts = [m.shape[1] for m in mels]
        # each output is cropped to the length its single-call twin would
        # produce; pad the stack until the batched inversion covers the
        # longest of them (zero-padded mel frames decode to near-silence)
        lens = [default_inversion_length(t, cfg) for t in ts]
        t_pad = max(ts)
        while default_inversion_length(t_pad, cfg) < max(lens):
            t_pad += 1
        stack = np.zeros((len(mels), mels[0].shape[0], t_pad), np.float32)
        for i, m in enumerate(mels):
            stack[i, :, :m.shape[1]] = np.asarray(m, np.float32)
        mag = mel_to_stft_magnitude(jnp.asarray(stack), cfg)
        wavs = griffin_lim(mag, cfg, n_iter)
        out = []
        for i, t in enumerate(ts):
            w = wavs[i, :lens[i]]
            peak = np.abs(w).max() if w.size else 0.0
            out.append((w / peak * 0.95).astype(np.float32)
                       if peak > 1e-8 else w.astype(np.float32))
        return out

    voc.batch = voc_batch  # type: ignore[attr-defined]
    return voc
