"""Unit tests for the DSP ops against the reference's defining formulas
(preprocessing/utils.py:68-143, model/variational_base_vae.py:335-348)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import AudioConfig
from dvc_tpu.ops import (
    amp_to_db,
    chunk_mel,
    db_to_amp,
    denormalize_mel,
    frame_signal,
    mel_filterbank,
    melspectrogram,
    normalize_mel,
    num_frames,
    pad_lr,
    unchunk_mel,
)
from dvc_tpu.ops.mel import hz_to_mel, mel_to_hz
from dvc_tpu.ops.stft import stft_magnitude


class TestMelFilterbank:
    def test_shape(self):
        fb = mel_filterbank(16000, 1024, 80, 90.0, 7600.0)
        assert fb.shape == (80, 513)

    def test_mel_scale_roundtrip(self):
        f = np.array([0.0, 90.0, 500.0, 999.0, 1000.0, 4000.0, 7600.0, 8000.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)

    def test_mel_scale_linear_below_1k(self):
        # slaney scale: linear with slope 3/200 below 1 kHz
        np.testing.assert_allclose(hz_to_mel(np.array([200.0])), [3.0], rtol=1e-12)
        np.testing.assert_allclose(hz_to_mel(np.array([1000.0])), [15.0], rtol=1e-12)

    def test_triangles_cover_band(self):
        fb = mel_filterbank(16000, 1024, 80, 90.0, 7600.0)
        # every filter has positive weight somewhere, none is NaN
        assert np.all(fb.sum(axis=1) > 0)
        assert np.isfinite(fb).all()
        # bins outside [fmin, fmax] get (near) zero weight
        freqs = np.linspace(0, 8000, 513)
        outside = (freqs < 89.0) | (freqs > 7601.0)
        assert np.abs(fb[:, outside]).max() == 0.0

    def test_slaney_normalization(self):
        # row i integrates to ~2/(width_hz) * area(triangle) == constant-ish;
        # check the exact defining identity instead: peak * enorm relationship
        fb = mel_filterbank(16000, 1024, 80, 90.0, 7600.0)
        mel_pts = np.linspace(hz_to_mel(90.0), hz_to_mel(7600.0), 82)
        hz_pts = mel_to_hz(mel_pts)
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        # max of each row should be <= enorm (peak of unit triangle scaled)
        assert np.all(fb.max(axis=1) <= enorm * (1 + 1e-6))


class TestDb:
    def test_amp_db_roundtrip(self):
        x = jnp.array([1e-4, 1e-2, 0.5, 1.0, 3.0])
        np.testing.assert_allclose(db_to_amp(amp_to_db(x)), x, rtol=1e-4)

    def test_amp_to_db_floor(self):
        # floor at min_level_db
        assert float(amp_to_db(jnp.array(0.0), -100.0)) == pytest.approx(-100.0, abs=0.01)

    def test_normalize_roundtrip(self):
        s_db = jnp.linspace(-100.0, 0.0, 11)
        np.testing.assert_allclose(
            denormalize_mel(normalize_mel(s_db)), s_db, atol=1e-5)

    def test_normalize_clips(self):
        assert float(normalize_mel(jnp.array(50.0))) == 1.0
        assert float(normalize_mel(jnp.array(-250.0))) == 0.0


class TestFraming:
    """Frame-count / padding parity with reference preprocessing/utils.py:89-107."""

    @pytest.mark.parametrize("length", [256, 1000, 16000, 16384, 41111])
    def test_num_frames_reference_formula(self, length):
        fsize, fshift = 1024, 256
        pad = fsize - fshift
        if length % fshift == 0:
            expected = (length + pad * 2 - fsize) // fshift + 1
        else:
            expected = (length + pad * 2 - fsize) // fshift + 2
        assert num_frames(length, fsize, fshift) == expected

    @pytest.mark.parametrize("length", [1000, 16000, 41111])
    def test_frames_tile_padded_signal(self, length):
        fsize, fshift = 1024, 256
        left, right = pad_lr(length, fsize, fshift)
        m = num_frames(length, fsize, fshift)
        assert left + length + right == (m - 1) * fshift + fsize

    def test_frame_signal_values(self):
        wav = jnp.arange(5000, dtype=jnp.float32)
        frames = frame_signal(wav, 1024, 256)
        m = num_frames(5000, 1024, 256)
        assert frames.shape == (m, 1024)
        left, _ = pad_lr(5000, 1024, 256)
        # frame 3 starts at 3*256 - left in the original signal
        start = 3 * 256
        padded_ref = np.concatenate([np.zeros(left), np.arange(5000)])
        np.testing.assert_allclose(frames[3], padded_ref[start:start + 1024])

    def test_batched(self):
        wav = jnp.ones((2, 3, 4000))
        frames = frame_signal(wav, 1024, 256)
        assert frames.shape[:2] == (2, 3)


class TestMelSpectrogram:
    def test_shape_and_range(self):
        rng = np.random.RandomState(0)
        wav = jnp.asarray(rng.randn(16000).astype(np.float32) * 0.1)
        mel = melspectrogram(wav)
        assert mel.shape == (80, num_frames(16000, 1024, 256))
        assert float(mel.min()) >= 0.0 and float(mel.max()) <= 1.0

    def test_batched_matches_single(self):
        rng = np.random.RandomState(1)
        wavs = jnp.asarray(rng.randn(3, 8000).astype(np.float32) * 0.1)
        batched = melspectrogram(wavs)
        singles = jnp.stack([melspectrogram(w) for w in wavs])
        np.testing.assert_allclose(np.asarray(batched), np.asarray(singles),
                                   rtol=1e-5, atol=1e-6)

    def test_silence_maps_to_zero(self):
        mel = melspectrogram(jnp.zeros(8000))
        np.testing.assert_allclose(np.asarray(mel), 0.0, atol=1e-6)


class TestMelGoldenValues:
    """Frozen regression values for the mel contract (two-tone 440+1337 Hz
    signal).  If these move, every trained checkpoint's input distribution
    moves with them — change only with a deliberate migration."""

    def test_golden(self):
        t = np.arange(16000) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * 440 * t)
               + 0.1 * np.sin(2 * np.pi * 1337 * t)).astype(np.float32)
        mel = np.asarray(melspectrogram(jnp.asarray(wav)))
        assert mel.shape == (80, 66)
        golden = {(0, 10): 0.357706, (20, 30): 0.310809, (40, 30): 0.148306,
                  (79, 65): 0.203851, (10, 0): 0.785709, (55, 50): 0.0}
        for (i, j), v in golden.items():
            assert mel[i, j] == pytest.approx(v, abs=2e-4), (i, j)

    def test_filterbank_row_sums(self):
        fb = mel_filterbank()
        for i, v in ((0, 0.066051), (40, 0.063985), (79, 0.064012)):
            assert float(fb[i].sum()) == pytest.approx(v, abs=1e-5)


class TestChunking:
    """Parity with reference chunking_mel (model/variational_base_vae.py:335-348)."""

    def _reference_chunking(self, mel):
        data = []
        num_spectro = (mel.shape[1] // 64) + 1
        for index in range(num_spectro):
            if index < num_spectro - 1:
                m = mel[:, index * 64:index * 64 + 64]
            else:
                m = mel[:, index * 64:]
                m = np.pad(m, ((0, 0), (0, 64 - mel.shape[1] % 64)), "constant")
            data.append(m)
        return np.stack(data)

    @pytest.mark.parametrize("t", [10, 64, 65, 128, 200, 300])
    def test_against_reference(self, t):
        mel = np.random.RandomState(t).rand(80, t).astype(np.float32)
        ours = np.asarray(chunk_mel(jnp.asarray(mel), 64))
        if t % 64 == 0:
            # reference emits an extra all-zero chunk when T % 64 == 0
            # (np.pad with width 64 - 0 == 64); ours matches
            assert ours.shape[0] == t // 64 + 1
            np.testing.assert_allclose(ours[-1], 0.0)
            np.testing.assert_allclose(
                ours[:-1], mel.reshape(80, -1, 64).transpose(1, 0, 2))
        else:
            ref = self._reference_chunking(mel)
            np.testing.assert_allclose(ours, ref)

    def test_unchunk_roundtrip(self):
        mel = np.random.RandomState(7).rand(80, 200).astype(np.float32)
        chunks = chunk_mel(jnp.asarray(mel), 64)
        back = unchunk_mel(chunks, total_frames=200)
        np.testing.assert_allclose(np.asarray(back), mel)


_LWS_GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                           "lws_golden.npz")


@pytest.mark.skipif(not os.path.exists(_LWS_GOLDEN),
                    reason="lws golden vectors not recorded yet (run "
                           "tools/gen_lws_golden.py where lws exists and "
                           "commit the fixture)")
class TestLwsGolden:
    """Pins the lws window/framing assumption (reference
    preprocessing/utils.py:84-86) against recorded lws output — the window
    shifts every mel and every checkpoint-parity number, so an exact gate."""

    @pytest.mark.parametrize("name", ["tone", "noise", "chirp", "short"])
    def test_stft_magnitude_matches_lws(self, name):
        from dvc_tpu.config import AudioConfig

        g = dict(np.load(_LWS_GOLDEN))
        wav = g[f"{name}_wav"]
        want = g[f"{name}_mag"]  # (frames, n_freq)
        got = np.asarray(stft_magnitude(jnp.asarray(wav), AudioConfig()))
        assert got.shape == want.shape, (got.shape, want.shape)
        scale = np.median(want[want > 1e-6] / np.maximum(got[want > 1e-6],
                                                         1e-12))
        # the window SHAPE must match exactly (relative error after a single
        # global scale); a pure scale difference would also be caught by the
        # dB chain, so assert it is ~1 too
        np.testing.assert_allclose(got * scale, want, rtol=1e-3, atol=1e-4)
        assert abs(scale - 1.0) < 1e-3, f"lws window scale differs: {scale}"
