"""Griffin-Lim mel-inversion vocoder (convert/griffinlim.py) and the
EpochPermutationSampler balance guarantee."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import AudioConfig
from dvc_tpu.convert.griffinlim import (
    griffin_lim,
    istft,
    make_griffinlim_vocoder,
    mel_to_stft_magnitude,
    mel_to_waveform,
)
from dvc_tpu.ops.mel import melspectrogram
from dvc_tpu.ops.stft import stft_magnitude, num_frames


CFG = AudioConfig()


class TestIstft:
    def test_roundtrip(self):
        """istft(stft(x)) ~= x away from the edges for the sqrt-hann pair."""
        from dvc_tpu.convert.griffinlim import _stft_complex

        rng = np.random.RandomState(0)
        t = 4096
        x = rng.randn(t).astype(np.float32) * 0.3
        spec = _stft_complex(jnp.asarray(x), CFG)
        y = np.asarray(istft(spec, t, CFG))
        assert y.shape == (t,)
        core = slice(CFG.fft_size, t - CFG.fft_size)
        err = np.abs(y[core] - x[core]).max()
        assert err < 1e-3, err

    def test_batched(self):
        from dvc_tpu.convert.griffinlim import _stft_complex

        rng = np.random.RandomState(1)
        x = rng.randn(3, 2048).astype(np.float32)
        spec = _stft_complex(jnp.asarray(x), CFG)
        y = np.asarray(istft(spec, 2048, CFG))
        assert y.shape == (3, 2048)


class TestGriffinLim:
    def test_recovers_sinusoid(self):
        """GL on the |STFT| of a pure tone reproduces its spectrum."""
        t = np.arange(6144) / CFG.sample_rate
        x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        mag = stft_magnitude(jnp.asarray(x), CFG)
        wav = griffin_lim(mag, CFG, n_iter=16, length=len(x))
        mag2 = np.asarray(stft_magnitude(jnp.asarray(wav), CFG))
        peak = np.argmax(np.asarray(mag).mean(0))
        peak2 = np.argmax(mag2.mean(0))
        assert peak == peak2
        # spectral convergence
        num = np.linalg.norm(mag2 - np.asarray(mag))
        den = np.linalg.norm(np.asarray(mag))
        assert num / den < 0.35

    def test_default_length_is_consistent(self):
        mag = jnp.ones((20, CFG.fft_size // 2 + 1), jnp.float32)
        wav = griffin_lim(mag, CFG, n_iter=1)
        assert num_frames(wav.shape[-1], CFG.fft_size, CFG.hop_size) == 20

    @pytest.mark.parametrize("m", [1, 2, 3, 4, 5])
    def test_short_mel_lengths(self, m):
        """Every frame count inverts to its advertised default length; mels
        with no exact round-trip inverse (m <= 3 at the default framing)
        come back with the full m*hop samples (regression: the pad amount
        used to under-cover the crop — 512 samples for a 3-frame mel's
        promised 768)."""
        from dvc_tpu.convert.griffinlim import default_inversion_length
        from dvc_tpu.ops.stft import num_frames as nf
        mag = jnp.ones((m, CFG.fft_size // 2 + 1), jnp.float32)
        wav = griffin_lim(mag, CFG, n_iter=1)
        assert wav.shape[-1] == default_inversion_length(m, CFG)
        if nf(wav.shape[-1], CFG.fft_size, CFG.hop_size) != m:
            # padded/cropped path: the promised m*hop samples
            assert wav.shape[-1] == max(1, m * CFG.hop_size)

    def test_hop_not_dividing_fft(self):
        """Default-length inference must work for any legal framing grid
        (regression: the closed-form inverse assumed fft % hop == 0 and
        tripped the frame-count assert)."""
        from dvc_tpu.config import AudioConfig
        cfg = AudioConfig(fft_size=1024, hop_size=250)
        mag = jnp.ones((20, cfg.fft_size // 2 + 1), jnp.float32)
        wav = griffin_lim(mag, cfg, n_iter=1)
        assert wav.ndim == 1 and wav.shape[-1] > 0
        assert num_frames(wav.shape[-1], cfg.fft_size, cfg.hop_size) \
            in (20, 21)  # exact when the grid admits it


class TestMelInversion:
    def test_mel_roundtrip_energy(self):
        """mel -> waveform -> mel correlates with the input mel."""
        rng = np.random.RandomState(0)
        t = np.arange(8192) / CFG.sample_rate
        x = (0.4 * np.sin(2 * np.pi * 220.0 * t)
             + 0.1 * rng.randn(len(t))).astype(np.float32)
        mel = np.asarray(melspectrogram(jnp.asarray(x), CFG))
        wav = mel_to_waveform(mel, CFG, n_iter=8)
        assert np.isfinite(wav).all() and np.abs(wav).max() <= 0.951
        mel2 = np.asarray(melspectrogram(jnp.asarray(wav), CFG))
        tt = min(mel.shape[1], mel2.shape[1])
        a, b = mel[:, :tt].ravel(), mel2[:, :tt].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, corr

    def test_mel_to_stft_magnitude_nonneg(self):
        mel = np.random.RandomState(0).rand(80, 12).astype(np.float32)
        mag = np.asarray(mel_to_stft_magnitude(jnp.asarray(mel), CFG))
        assert mag.shape == (12, CFG.fft_size // 2 + 1)
        assert (mag >= 0).all()

    def test_vocoder_factory_protocol(self):
        voc = make_griffinlim_vocoder(CFG, n_iter=2)
        mel = np.random.RandomState(0).rand(80, 8).astype(np.float32)
        wav = voc(mel)
        assert wav.ndim == 1 and np.isfinite(wav).all()

    def test_vocoder_batch_protocol(self):
        """`.batch` vocodes variable-length mels in one device pass; each
        output has the same length its single-call twin would have."""
        voc = make_griffinlim_vocoder(CFG, n_iter=2)
        rng = np.random.RandomState(1)
        # includes a 2-frame mel: its single-call twin takes the padded
        # m*hop path, and the batch must still match it exactly
        mels = [rng.rand(80, t).astype(np.float32) for t in (8, 12, 6, 2)]
        wavs = voc.batch(mels)
        assert len(wavs) == 4
        for m, w in zip(mels, wavs):
            assert w.shape == voc(m).shape
            assert np.isfinite(w).all()


class TestEpochPermutationSampler:
    def test_balance_guarantee(self):
        """Over any sampled window, max count <= 2x min count once every item
        has appeared (the reference RandomCycler's contract)."""
        from dvc_tpu.data.speaker_dataset import EpochPermutationSampler

        items = list(range(10))
        s = EpochPermutationSampler(items, np.random.default_rng(0))
        stream = s.sample(200)
        from collections import Counter
        for start in range(0, 150, 7):
            for width in (30, 55):
                c = Counter(stream[start:start + width])
                if len(c) == len(items):
                    assert max(c.values()) <= 2 * min(c.values())

    def test_epoch_is_permutation(self):
        from dvc_tpu.data.speaker_dataset import EpochPermutationSampler

        items = ["a", "b", "c", "d"]
        s = EpochPermutationSampler(items, np.random.default_rng(1))
        for _ in range(5):
            assert sorted(s.sample(4)) == sorted(items)

    def test_next_and_empty(self):
        import pytest
        from dvc_tpu.data.speaker_dataset import EpochPermutationSampler

        s = EpochPermutationSampler([7], np.random.default_rng(0))
        assert next(s) == 7
        with pytest.raises(ValueError):
            EpochPermutationSampler([])
