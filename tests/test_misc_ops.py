"""Tests for remaining ops: δ-VAE KL (vs the reference's Python loop) and
pitch quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.train.losses import kl_delta_vae


class TestDeltaVAEKL:
    def test_matches_reference_loop(self):
        """Vectorized kl_delta_vae == the reference's per-dim loop
        (model/disentangled_vae.py:334-345), reimplemented in numpy."""
        rng = np.random.RandomState(0)
        mu = rng.randn(5, 7).astype(np.float64)
        logvar = (rng.randn(5, 7) * 0.3).astype(np.float64)
        alpha = 0.95

        def f(x, coef=1.0):
            return coef * x - np.log(x) - 1.0

        kl = np.zeros(5)
        for j in range(mu.shape[1]):
            if j == 0:
                kl = kl + f(np.exp(logvar[:, j])) + mu[:, j] ** 2
            else:
                kl = kl + f(np.exp(logvar[:, j]) / (1 - alpha**2))
                kl = kl + ((mu[:, j] - alpha * mu[:, j - 1]) ** 2
                           + alpha**2 * logvar[:, j - 1]) / (1 - alpha**2)
        want = -0.5 * kl.sum()

        got = float(kl_delta_vae(jnp.asarray(mu, jnp.float32),
                                 jnp.asarray(logvar, jnp.float32), alpha))
        assert got == pytest.approx(want, rel=1e-4)


class TestPitchOps:
    def test_estimate_pitch_quantized(self):
        from dvc_tpu.ops.pitch import estimate_pitch

        t = np.arange(8000) / 16000
        wav = 0.4 * np.sin(2 * np.pi * 180 * t).astype(np.float32)
        q = np.asarray(estimate_pitch(jnp.asarray(wav)))
        # quantized to (0, 256] integers (reference utils.py:189-191)
        assert q.min() >= 0 and q.max() <= 256
        assert np.allclose(q, np.round(q))

    def test_batch_pitch_shapes(self):
        from dvc_tpu.ops.pitch import get_batch_pitch

        wavs = np.stack([
            0.4 * np.sin(2 * np.pi * f * np.arange(4000) / 16000)
            for f in (120.0, 200.0)]).astype(np.float32)
        out = np.asarray(get_batch_pitch(jnp.asarray(wavs)))
        assert out.shape == (2, 4000 // 80 + 1)

    def test_onehot(self):
        from dvc_tpu.ops.pitch import quantized_pitch_onehot

        p = jnp.asarray([0.0, 128.0, 256.0, 400.0])
        oh = np.asarray(quantized_pitch_onehot(p, bins=257))
        assert oh.shape == (4, 257)
        assert oh[1, 128] == 1.0
        assert oh[3, 256] == 1.0  # clipped into range
        np.testing.assert_allclose(oh.sum(-1), 1.0)
