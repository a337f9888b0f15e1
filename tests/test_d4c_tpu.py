"""Tolerance gates for the batched device D4C (ops/d4c.py) vs the native
engine — the parity contract that lets world_decompose_batch run the whole
WORLD analysis chain on the accelerator (reference pyworld.d4c call:
preprocessing/WORLD_processing.py:35)."""

import numpy as np
import pytest

from dvc_tpu.native import world as native_world
from dvc_tpu.ops.d4c import d4c_batch

FS = 16000

pytestmark = pytest.mark.skipif(not native_world.available(),
                                reason="native WORLD engine unavailable")


def _vowel(seconds=1.2, f0=150.0, vibrato=0.0, noise_db=None, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * FS)) / FS
    f0v = f0 * (1 + vibrato * np.sin(2 * np.pi * 2.3 * t))
    ph = 2 * np.pi * np.cumsum(f0v) / FS
    w = np.zeros_like(t)
    for h in range(1, 20):
        w += (0.5 / h) * np.sin(h * ph)
    if noise_db is not None:
        w += 10 ** (noise_db / 20) * rng.randn(len(t)) * np.abs(w).max()
    return (w / np.abs(w).max()).astype(np.float32)


def _native_pair(w):
    f0, _ = native_world.harvest(w, FS)
    return f0, native_world.d4c(w, f0, FS)


class TestParity:
    def test_clean_vowel(self):
        """Extreme-dynamic-range case: the f32 precision worst case (valleys
        at the FFT noise floor).  The block-local smoothing keeps agreement
        within a few percent; a plain f32 port of the native global cumsum
        measured mean |diff| 0.22 here."""
        w = _vowel()
        f0, ap_n = _native_pair(w)
        ap_d = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None],
                                    FS))[0, :len(ap_n)]
        voiced = f0 > 0
        assert voiced.sum() > 50
        d = np.abs(ap_d - ap_n)[voiced]
        assert d.mean() < 0.02, d.mean()
        assert d.max() < 0.08, d.max()

    def test_realistic_vowel(self):
        """Speech-like dynamic range (-50 dB noise floor): near-exact."""
        w = _vowel(vibrato=0.03, noise_db=-50.0, seed=1)
        f0, ap_n = _native_pair(w)
        ap_d = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None],
                                    FS))[0, :len(ap_n)]
        voiced = f0 > 0
        d = np.abs(ap_d - ap_n)[voiced]
        assert d.max() < 0.01, d.max()

    def test_unvoiced_rows_fully_aperiodic(self):
        w = _vowel()
        f0, ap_n = _native_pair(w)
        ap_d = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None],
                                    FS))[0, :len(ap_n)]
        unvoiced = f0 == 0
        assert unvoiced.any()
        assert np.allclose(ap_d[unvoiced], 1.0, atol=1e-6)

    def test_love_train_forces_noise_aperiodic(self):
        """A noise burst with a fabricated voiced F0 track must be forced
        fully aperiodic by the LoveTrain override, matching native."""
        rng = np.random.RandomState(3)
        w = (0.5 * rng.randn(FS)).astype(np.float32)
        # band-limit to high frequencies so the 0.1-4 kHz share is small
        spec = np.fft.rfft(w)
        freqs = np.fft.rfftfreq(len(w), 1 / FS)
        spec[freqs < 5000] = 0
        w = np.fft.irfft(spec, len(w)).astype(np.float32)
        w /= np.abs(w).max()
        f0 = np.full(201, 150.0)
        ap_n = native_world.d4c(w, f0, FS)
        ap_d = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None],
                                    FS))[0, :len(ap_n)]
        assert np.allclose(ap_n, 1.0, atol=1e-6)  # native overrides
        assert np.allclose(ap_d, 1.0, atol=1e-6)  # device agrees

    def test_threshold_zero_disables_override(self):
        rng = np.random.RandomState(3)
        w = (0.5 * rng.randn(FS)).astype(np.float32)
        w /= np.abs(w).max()
        f0 = np.full(201, 150.0)
        ap_d = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None],
                                    FS, threshold=0.0))[0]
        # without the override, frames are analyzed as voiced: not all-1
        assert not np.allclose(ap_d, 1.0, atol=1e-3)


class TestBatchContract:
    def test_padding_invariance(self):
        """A zero-padded row must match the same utterance alone: padded
        samples read as silence and padded frames (f0=0) come back fully
        aperiodic, like native out-of-range sampling."""
        w1 = _vowel(seconds=0.8, f0=130.0, noise_db=-45.0, seed=5)
        w2 = _vowel(seconds=1.1, f0=220.0, noise_db=-45.0, seed=6)
        f01, _ = native_world.harvest(w1, FS)
        f02, _ = native_world.harvest(w2, FS)
        n = max(len(w1), len(w2))
        fmax = max(len(f01), len(f02))
        wav_b = np.zeros((2, n), np.float32)
        wav_b[0, :len(w1)] = w1
        wav_b[1, :len(w2)] = w2
        f0_b = np.zeros((2, fmax), np.float32)
        f0_b[0, :len(f01)] = f01
        f0_b[1, :len(f02)] = f02
        ap_b = np.asarray(d4c_batch(wav_b, f0_b, FS))
        ap_solo = np.asarray(d4c_batch(w1[None],
                                       f01.astype(np.float32)[None], FS))[0]
        np.testing.assert_allclose(ap_b[0, :len(f01)], ap_solo[:len(f01)],
                                   atol=2e-4)
        assert np.allclose(ap_b[0, len(f01):], 1.0, atol=1e-6)

    def test_output_range_and_shape(self):
        w = _vowel(seconds=0.6)
        f0, _ = native_world.harvest(w, FS)
        ap = np.asarray(d4c_batch(w[None], f0.astype(np.float32)[None], FS))
        assert ap.shape == (1, len(f0), 513)
        assert (ap >= 0.001).all() and (ap < 1.0).all()
        assert np.isfinite(ap).all()

    def test_batch_mismatch_raises(self):
        with pytest.raises(ValueError, match="batch mismatch"):
            d4c_batch(np.zeros((2, 1000), np.float32),
                      np.zeros((3, 10), np.float32), FS)
