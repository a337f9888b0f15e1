"""Utility-layer tests: WAV IO, speaker-inference windows, prefetch, timers."""

import numpy as np
import pytest

from dvc_tpu.utils.wavio import read_wav, write_wav


class TestWavIO:
    def test_roundtrip_pcm16(self, tmp_path):
        rng = np.random.RandomState(0)
        wav = (rng.randn(12345) * 0.3).clip(-1, 1).astype(np.float32)
        path = str(tmp_path / "t.wav")
        write_wav(path, wav, 16000)
        back, sr = read_wav(path)
        assert sr == 16000 and len(back) == len(wav)
        # PCM16 quantization + peak scaling: correlation must be ~1
        c = np.corrcoef(wav, back)[0, 1]
        assert c > 0.999

    def test_rejects_garbage(self, tmp_path):
        path = str(tmp_path / "bad.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav file at all")
        with pytest.raises(ValueError):
            read_wav(path)

    def test_float32_wav(self, tmp_path):
        import struct
        wav = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
        body = wav.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        hdr += b"data" + struct.pack("<I", len(body))
        path = str(tmp_path / "f32.wav")
        with open(path, "wb") as f:
            f.write(hdr + body)
        back, sr = read_wav(path)
        np.testing.assert_allclose(back, wav, atol=1e-7)


class TestPartialSlices:
    def test_reference_math(self):
        """compute_partial_slices parity with encoder/inference.py:59-108."""
        from dvc_tpu.models.speaker_inference import compute_partial_slices

        n_samples = 16000  # 1 s
        wav_slices, mel_slices = compute_partial_slices(n_samples)
        # 160 samples/frame, 101 frames, frame_step 32 (50% overlap of 63)
        assert mel_slices[0] == slice(0, 63)
        assert mel_slices[1] == slice(32, 95)
        for ws, ms in zip(wav_slices, mel_slices):
            assert ws.start == ms.start * 160 and ws.stop == ms.stop * 160
        # slices cover the signal
        assert wav_slices[-1].stop >= n_samples * 0.75

    def test_short_utterance_single_slice(self):
        from dvc_tpu.models.speaker_inference import compute_partial_slices

        _, mel_slices = compute_partial_slices(2000)  # 0.125 s
        assert len(mel_slices) == 1


class TestPrefetch:
    def test_order_and_completeness(self):
        from dvc_tpu.data.dataset import prefetch

        out = list(prefetch(iter(range(17)), depth=3))
        assert out == list(range(17))

    def test_empty(self):
        from dvc_tpu.data.dataset import prefetch

        assert list(prefetch(iter([]))) == []


class TestStepTimer:
    def test_stats(self):
        import time
        from dvc_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(4):
            t.tick()
            time.sleep(0.005)
        # upper bound is generous: a loaded 1-core host can stretch a 5 ms
        # sleep past 60 ms (observed when the suite shares the core with a
        # benchmark run)
        assert 3 <= t.mean_ms <= 1000
        assert "ms/step" in t.summary()


class TestKeySeq:
    def test_unique_keys(self):
        from dvc_tpu.utils.prng import key_seq

        gen = key_seq(0)
        keys = [tuple(np.asarray(next(gen)).tolist()) for _ in range(5)]
        assert len(set(keys)) == 5


class TestCompileCachePrune:
    def test_prunes_oldest_past_budget(self, tmp_path):
        from dvc_tpu.utils.cache import cache_size_bytes, prune_compile_cache

        d = tmp_path / "cache"
        d.mkdir()
        import os as _os
        import time as _time
        for i in range(6):
            (d / f"e{i}.bin").write_bytes(b"x" * 1000)
            _os.utime(d / f"e{i}.bin", (i + 1, i + 1))  # distinct atimes
        assert cache_size_bytes(str(d)) == 6000
        freed = prune_compile_cache(str(d), max_bytes=5000, target_bytes=3000)
        assert freed >= 3000
        # the oldest-accessed entries went first
        remaining = sorted(p.name for p in d.iterdir())
        assert "e0.bin" not in remaining and "e5.bin" in remaining

    def test_noop_under_budget(self, tmp_path):
        from dvc_tpu.utils.cache import prune_compile_cache

        d = tmp_path / "cache"
        d.mkdir()
        (d / "a.bin").write_bytes(b"x" * 10)
        assert prune_compile_cache(str(d), max_bytes=1000) == 0
        assert (d / "a.bin").exists()


class TestPrefetchErrors:
    def test_exception_propagates_to_consumer(self):
        from dvc_tpu.data.dataset import prefetch

        def bad():
            yield 1
            raise RuntimeError("corrupt file")

        it = prefetch(iter(bad()))
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="corrupt file"):
            list(it)


class TestEmbedLongUtterance:
    def test_embed_utterance_over_one_second(self):
        """Partial slices must use the framework's hop (256), not the
        reference encoder's 10 ms step — a >1.2 s wav used to crash."""
        import jax

        from dvc_tpu.config import SpeakerEncoderConfig
        from dvc_tpu.models.speaker_inference import SpeakerEmbedder

        cfg = SpeakerEncoderConfig(hidden_size=16, embedding_size=16,
                                   num_layers=1)
        emb = SpeakerEmbedder(cfg)
        params = emb.model.init(jax.random.PRNGKey(0),
                                np.zeros((1, 63, 80), np.float32))["params"]
        emb.load(params)
        wav = (0.3 * np.sin(2 * np.pi * 200 * np.arange(32000) / 16000)
               ).astype(np.float32)  # 2 s
        e = emb.embed_utterance(wav)
        assert e.shape == (16,)
        assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-4
