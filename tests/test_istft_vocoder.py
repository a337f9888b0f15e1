"""Non-autoregressive iSTFT vocoder (models/istft_vocoder.py): shapes,
training convergence (overfit a tone), and the vocoder protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import AudioConfig, ISTFTVocoderConfig
from dvc_tpu.models.istft_vocoder import ISTFTVocoder, synthesize
from dvc_tpu.train.istft_vocoder_trainer import (
    ISTFTVocoderTrainer,
    multi_resolution_stft_loss,
)

TINY = ISTFTVocoderConfig(channels=48, blocks=2, dilation_cycle=(1, 2))
AUDIO = AudioConfig()


class TestModel:
    def test_spec_shape_and_waveform(self):
        model = ISTFTVocoder(TINY, AUDIO)
        mel = jnp.asarray(np.random.RandomState(0).rand(2, 80, 12),
                          jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), mel)
        spec = model.apply(variables, mel)
        assert spec.shape == (2, 12, AUDIO.fft_size // 2 + 1)
        assert jnp.iscomplexobj(spec)
        wav = synthesize(model, variables, mel, length=12 * AUDIO.hop_size)
        assert wav.shape == (2, 12 * AUDIO.hop_size)
        assert np.isfinite(np.asarray(wav)).all()

    def test_zero_init_head_starts_at_prior(self):
        """The magnitude head is zero-initialized, so an untrained model's
        magnitudes equal the pinv-mel prior — training starts from the
        classical estimate, not noise."""
        from dvc_tpu.convert.griffinlim import mel_to_stft_magnitude
        model = ISTFTVocoder(TINY, AUDIO)
        mel = jnp.asarray(np.random.RandomState(1).rand(1, 80, 8),
                          jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), mel)
        spec = model.apply(variables, mel)
        prior = mel_to_stft_magnitude(mel, AUDIO)
        np.testing.assert_allclose(np.abs(np.asarray(spec)),
                                   np.maximum(np.asarray(prior), 0) + 0,
                                   rtol=1e-3, atol=2e-4)


class TestTraining:
    def test_overfits_a_tone(self):
        """A tiny model must overfit a single harmonic batch quickly — the
        whole train loop (losses, grads, iSTFT) demonstrably learns."""
        from dvc_tpu.ops.mel import melspectrogram

        t_frames = 16
        t = t_frames * AUDIO.hop_size
        x = np.arange(t) / AUDIO.sample_rate
        wav = (0.5 * np.sin(2 * np.pi * 220.0 * x)
               + 0.2 * np.sin(2 * np.pi * 440.0 * x)).astype(np.float32)
        wav_b = wav[None, :]
        mel = np.asarray(melspectrogram(jnp.asarray(wav_b), AUDIO))[
            :, :, :t_frames]

        trainer = ISTFTVocoderTrainer(TINY, lr=1e-3)
        losses = trainer.train_steps(
            ((mel, wav_b) for _ in range(120)), 120,
            logging_func=lambda *a: None)
        assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])
        assert np.isfinite(losses).all()

    def test_mrstft_loss_zero_for_identical(self):
        wav = jnp.asarray(np.random.RandomState(0).rand(1, 4096),
                          jnp.float32)
        assert float(multi_resolution_stft_loss(wav, wav)) < 1e-5


class TestVocoderProtocol:
    def test_make_istft_vocoder_roundtrip(self, tmp_path):
        from dvc_tpu.convert.vocode import make_istft_vocoder

        trainer = ISTFTVocoderTrainer(TINY)
        path = trainer.save(str(tmp_path), "t")
        voc = make_istft_vocoder(path, cfg=TINY)
        mels = [np.random.RandomState(i).rand(80, n).astype(np.float32)
                for i, n in ((0, 10), (1, 7))]
        wavs = voc.batch(mels)
        assert [len(w) for w in wavs] == [10 * AUDIO.hop_size,
                                          7 * AUDIO.hop_size]
        assert all(np.isfinite(w).all() for w in wavs)
        solo = voc(mels[0])
        assert solo.shape == wavs[0].shape
