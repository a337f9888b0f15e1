"""Waveform-domain op tests (ops/audio.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.audio import (
    energy_vad_mask,
    inv_mulaw,
    mulaw,
    normalize_volume,
    resample_poly,
    rescale_wav,
    trim_long_silences,
)


class TestVolume:
    def test_reaches_target_dbfs(self):
        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(8000) * 0.01, jnp.float32)
        out = normalize_volume(wav, -30.0)
        dbfs = 10 * np.log10(np.mean(np.asarray(out) ** 2))
        assert dbfs == pytest.approx(-30.0, abs=0.1)

    def test_increase_only_skips_loud(self):
        wav = jnp.asarray(np.ones(1000) * 0.9, jnp.float32)  # already loud
        out = normalize_volume(wav, -30.0, increase_only=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(wav))

    def test_conflicting_flags_raise(self):
        with pytest.raises(ValueError):
            normalize_volume(jnp.zeros(10), -30.0, increase_only=True,
                             decrease_only=True)

    def test_rescale_peak(self):
        wav = jnp.asarray([0.1, -0.5, 0.25])
        out = rescale_wav(wav, 0.999)
        assert float(jnp.max(jnp.abs(out))) == pytest.approx(0.999, rel=1e-5)


class TestResample:
    def test_length_and_tone(self):
        t = np.arange(48000) / 48000
        wav = jnp.asarray(np.sin(2 * np.pi * 440 * t), jnp.float32)
        out = resample_poly(wav, 48000, 16000)
        assert out.shape[-1] == 16000
        spec = np.abs(np.fft.rfft(np.asarray(out)[1000:9000] * np.hanning(8000)))
        freq = np.fft.rfftfreq(8000, 1 / 16000)[np.argmax(spec)]
        assert freq == pytest.approx(440.0, abs=4.0)

    def test_identity(self):
        wav = jnp.arange(100, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(resample_poly(wav, 16000, 16000)),
                                   np.asarray(wav))


class TestMulaw:
    def test_roundtrip(self):
        x = jnp.linspace(-1, 1, 101)
        np.testing.assert_allclose(np.asarray(inv_mulaw(mulaw(x))),
                                   np.asarray(x), atol=1e-6)

    def test_companding_expands_small_values(self):
        assert float(mulaw(jnp.array(0.01))) > 0.1  # quiet signals amplified


class TestVAD:
    def test_mask_shape_and_speech_detection(self):
        sr = 16000
        sil = np.zeros(sr // 2, np.float32)
        tone = (0.3 * np.sin(2 * np.pi * 250 * np.arange(sr // 2) / sr)
                ).astype(np.float32)
        wav = jnp.asarray(np.concatenate([sil, tone, sil]))
        mask = energy_vad_mask(wav, sr)
        n = len(np.asarray(mask))
        third = n // 3
        assert np.asarray(mask)[third + 1:2 * third - 1].all()

    def test_trim_shortens(self):
        sr = 16000
        sil = np.zeros(sr, np.float32)
        tone = (0.3 * np.sin(2 * np.pi * 250 * np.arange(sr) / sr)
                ).astype(np.float32)
        wav = np.concatenate([sil, tone, sil])
        trimmed = trim_long_silences(wav, sr)
        assert 0 < len(trimmed) < len(wav)
