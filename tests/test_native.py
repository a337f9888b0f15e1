"""Native C++ DSP engine parity tests (dvc_tpu/native/dvc_dsp.cpp).

The C++ path must produce the same mels as the JAX ops pipeline — both are
checked against each other, so either backend can feed training.
"""

import numpy as np
import pytest

from dvc_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native DSP library not built")


class TestNativeMel:
    def test_matches_jax_melspectrogram(self):
        import jax.numpy as jnp
        from dvc_tpu.ops import melspectrogram

        rng = np.random.RandomState(0)
        wav = (rng.randn(12_345) * 0.1).astype(np.float32)
        ours = native.melspectrogram(wav)
        ref = np.asarray(melspectrogram(jnp.asarray(wav)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_frame_count_contract(self):
        from dvc_tpu.ops import num_frames

        for n in (1000, 16000, 54321):
            wav = np.zeros(n, np.float32)
            mel = native.melspectrogram(wav)
            assert mel.shape == (80, num_frames(n, 1024, 256))

    def test_batch_matches_single(self):
        rng = np.random.RandomState(1)
        wavs = [(rng.randn(n) * 0.1).astype(np.float32)
                for n in (4000, 9000, 16000)]
        batch = native.melspectrogram_batch(wavs, n_threads=2)
        for wav, mel in zip(wavs, batch):
            np.testing.assert_allclose(mel, native.melspectrogram(wav),
                                       atol=1e-6)


class TestNativeExtractorBackend:
    def test_preprocess_extractor_backends_agree(self):
        from dvc_tpu.data.preprocess import BatchedMelExtractor

        rng = np.random.RandomState(3)
        wavs = [(rng.randn(n) * 0.1).astype(np.float32) for n in (5000, 12000)]
        jax_mels = BatchedMelExtractor(backend="jax")(wavs)
        nat_mels = BatchedMelExtractor(backend="native")(wavs)
        for a, b in zip(jax_mels, nat_mels):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-3)


class TestNativeResample:
    def test_tone_preserved(self):
        t = np.arange(48000) / 48000
        wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = native.resample(wav, 48000, 16000)
        assert len(out) == 16000
        # dominant frequency still 440 Hz
        spec = np.abs(np.fft.rfft(out[1000:9000] * np.hanning(8000)))
        freq = np.fft.rfftfreq(8000, 1 / 16000)[np.argmax(spec)]
        assert freq == pytest.approx(440.0, abs=4.0)

    def test_matches_jax_resampler(self):
        import jax.numpy as jnp
        from dvc_tpu.ops.audio import resample_poly

        rng = np.random.RandomState(2)
        wav = (rng.randn(9600) * 0.3).astype(np.float32)
        ours = native.resample(wav, 48000, 16000)
        ref = np.asarray(resample_poly(jnp.asarray(wav), 48000, 16000))
        assert len(ours) == len(ref)
        # interior agreement (edges differ by padding convention)
        np.testing.assert_allclose(ours[50:-50], ref[50:-50], atol=5e-3)


class TestNativeVAD:
    def test_energy_gate(self):
        sr = 16000
        sil = np.zeros(sr // 2, np.float32)
        tone = (0.3 * np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr)
                ).astype(np.float32)
        wav = np.concatenate([sil, tone, sil])
        mask = native.energy_vad(wav, sr, 30)
        third = len(mask) // 3
        assert not mask[:third - 1].any()
        assert mask[third + 1:2 * third - 1].all()


class TestNativeDTW:
    def test_matches_python_reference(self):
        """Native accumulate+backtrack == the Python loop bit-for-bit
        (same tie-breaking: diagonal, up, left)."""
        import dvc_tpu.eval.mcd as M
        from dvc_tpu import native

        rng = np.random.RandomState(3)
        for _ in range(6):
            n, m = rng.randint(2, 60, 2)
            x = rng.rand(n, 24)
            y = rng.rand(m, 24)
            px_n, py_n = M.dtw_path(x, y)
            orig = native.available
            native.available = lambda: False
            try:
                px_p, py_p = M.dtw_path(x, y)
            finally:
                native.available = orig
            assert np.array_equal(px_n, px_p)
            assert np.array_equal(py_n, py_p)

    def test_degenerate_shapes(self):
        from dvc_tpu import native
        px, py = native.dtw_path(np.ones((1, 5)))
        assert np.array_equal(px, np.zeros(5))
        assert np.array_equal(py, np.arange(5))
