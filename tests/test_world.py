"""WORLD-equivalent analysis chain tests (ops/world.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.ops.world import (
    aperiodicity,
    estimate_f0,
    freqt,
    mc2sp,
    mcepalpha,
    pitch_conversion,
    sp2mc,
    spectral_envelope,
    synthesize,
    synthesize_batch,
)


def synth_harmonic(f0=150.0, fs=16000, dur=0.5, n_harm=8, seed=0):
    t = np.arange(int(fs * dur)) / fs
    rng = np.random.RandomState(seed)
    wav = sum((0.6 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.rand() * 6)
              for k in range(n_harm))
    return (wav / np.abs(wav).max() * 0.5).astype(np.float32)


class TestMcepAlpha:
    def test_known_values(self):
        # pysptk.util.mcepalpha references: 16 kHz -> ~0.42, 44.1 kHz -> ~0.544
        assert mcepalpha(16000) == pytest.approx(0.42, abs=0.015)
        assert mcepalpha(44100) == pytest.approx(0.544, abs=0.02)


class TestFreqt:
    def test_alpha_zero_identity(self):
        c = jnp.asarray(np.random.RandomState(0).rand(3, 10), jnp.float32)
        out = freqt(c, 9, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-6)

    def test_matches_reference_recursion(self):
        """Compare against a direct numpy port of SPTK freqt."""
        def freqt_np(c, order, alpha):
            h = np.zeros(order + 1)
            for i in range(len(c) - 1, -1, -1):
                prev = h.copy()
                h[0] = c[i] + alpha * prev[0]
                if order >= 1:
                    h[1] = (1 - alpha**2) * prev[0] + alpha * prev[1]
                for m in range(2, order + 1):
                    h[m] = prev[m - 1] + alpha * (prev[m] - h[m - 1])
            return h

        rng = np.random.RandomState(1)
        c = rng.rand(16).astype(np.float64)
        ours = np.asarray(freqt(jnp.asarray(c, jnp.float32), 12, 0.42))[0]
        ref = freqt_np(c, 12, 0.42)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestSp2Mc:
    def test_roundtrip_smooth_spectrum(self):
        """mc2sp(sp2mc(sp)) ~= sp for a smooth spectrum with enough order."""
        n_freq = 513
        freqs = np.linspace(0, 1, n_freq)
        sp = (np.exp(-3 * freqs) + 0.1).astype(np.float32)[None, :] ** 2
        alpha = 0.42
        mc = sp2mc(jnp.asarray(sp), order=59, alpha=alpha)
        sp_rec = np.asarray(mc2sp(mc, alpha, fftlen=1024))
        ratio = sp_rec[0] / sp[0]
        # log-domain agreement within ~15% across the band
        assert np.abs(np.log(ratio)).mean() < 0.15


class TestF0:
    def test_detects_fundamental(self):
        wav = synth_harmonic(150.0)
        f0, t = estimate_f0(jnp.asarray(wav), 16000)
        voiced = np.asarray(f0)[np.asarray(f0) > 0]
        assert len(voiced) > 0.5 * len(np.asarray(f0))
        assert np.median(voiced) == pytest.approx(150.0, rel=0.05)

    def test_silence_is_unvoiced(self):
        f0, _ = estimate_f0(jnp.zeros(8000), 16000)
        assert float(jnp.max(f0)) == 0.0

    def test_frame_count_contract(self):
        # pyworld.harvest returns len(wav)//hop + 1 frames
        wav = jnp.zeros(8000)
        f0, t = estimate_f0(wav, 16000, frame_period=5.0)
        assert f0.shape[0] == 8000 // 80 + 1
        assert float(t[1] - t[0]) == pytest.approx(0.005)


class TestEnvelope:
    def test_shape_and_positive(self):
        wav = synth_harmonic(200.0)
        f0, _ = estimate_f0(jnp.asarray(wav), 16000)
        sp = spectral_envelope(jnp.asarray(wav), f0, 16000)
        assert sp.shape[0] == f0.shape[0]
        # WORLD rule: fft = 2^ceil(log2(3*fs/71 + 1)) = 1024 at 16 kHz
        assert sp.shape[1] == 513
        assert float(jnp.min(sp)) > 0

    def test_envelope_tracks_formant(self):
        """Envelope energy should concentrate where the harmonics are."""
        wav = synth_harmonic(150.0, n_harm=4)
        f0, _ = estimate_f0(jnp.asarray(wav), 16000)
        sp = np.asarray(spectral_envelope(jnp.asarray(wav), f0, 16000))
        mid = sp[len(sp) // 2]
        freqs = np.linspace(0, 8000, len(mid))
        low = mid[(freqs > 100) & (freqs < 1000)].mean()
        high = mid[freqs > 4000].mean()
        assert low > 10 * high


class TestSynthesis:
    def test_output_length_and_energy(self):
        wav = synth_harmonic(150.0)
        f0, _ = estimate_f0(jnp.asarray(wav), 16000)
        sp = spectral_envelope(jnp.asarray(wav), f0, 16000)
        ap = aperiodicity(jnp.asarray(wav), f0, 16000,
                          fft_size=2 * (sp.shape[-1] - 1))
        out = synthesize(f0, sp, ap, 16000)
        assert out.shape[0] == f0.shape[0] * 80
        assert np.isfinite(np.asarray(out)).all()
        assert float(jnp.std(out)) > 0


class TestSynthesizeBatch:
    """Corpus-batched device synthesis (ops/world.synthesize_batch)."""

    def _corpus(self, lengths=(100, 230, 300), n_freq=513, seed=0):
        rng = np.random.default_rng(seed)
        f0s, sps, aps = [], [], []
        for n in lengths:
            f0s.append(np.where(rng.random(n) > 0.3, 150.0, 0.0)
                       .astype(np.float32))
            sps.append(rng.random((n, n_freq)).astype(np.float32) * 1e-4
                       + 1e-6)
            aps.append(np.clip(rng.random((n, n_freq)), 0.01, 0.99)
                       .astype(np.float32))
        return f0s, sps, aps

    def test_length_contract_and_finite(self):
        f0s, sps, aps = self._corpus()
        outs = synthesize_batch(f0s, sps, aps, pad_to_frames=256, max_batch=2)
        assert len(outs) == 3
        for f0, out in zip(f0s, outs):
            assert out.shape == (len(f0) * 80,)
            assert np.isfinite(out).all() and out.std() > 0

    def test_matches_single_padded_call(self):
        """Each cropped row == one _synthesize_core call on the same padded
        shape with the same fold_in key — bucketing adds nothing.  (Tight
        allclose, not bit-equal: the jitted batch may come from the
        persistent compile cache built with different codegen flags than
        the eager single call, which shifts ULPs.)"""
        import jax

        from dvc_tpu.ops.world import _synthesize_core

        f0s, sps, aps = self._corpus()
        outs = synthesize_batch(f0s, sps, aps, pad_to_frames=256, max_batch=2)
        i, pad, n_freq = 1, 512, 513
        n = len(f0s[i])
        f0p = np.zeros(pad, np.float32)
        f0p[:n] = f0s[i]
        spp = np.full((pad, n_freq), 1e-30, np.float32)
        spp[:n] = sps[i]
        app = np.full((pad, n_freq), 1.0 - 1e-12, np.float32)
        app[:n] = aps[i]
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        single = np.asarray(_synthesize_core(
            jnp.asarray(f0p), jnp.asarray(spp), jnp.asarray(app), key,
            16000, 5.0))[:n * 80]
        np.testing.assert_allclose(single, outs[i], atol=1e-6)

    def test_chunking_invariant(self):
        """Splitting a bucket into different max_batch chunks cannot change
        any row (per-utterance fold_in keys, same padded shape; allclose
        because B=4 and B=1 compile to different programs)."""
        f0s, sps, aps = self._corpus(lengths=(100, 120, 230, 250))
        whole = synthesize_batch(f0s, sps, aps, pad_to_frames=256,
                                 max_batch=8)
        split = synthesize_batch(f0s, sps, aps, pad_to_frames=256,
                                 max_batch=1)
        for a, b in zip(whole, split):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_validates_shapes(self):
        f0s, sps, aps = self._corpus()
        with pytest.raises(ValueError):
            synthesize_batch(f0s[:2], sps, aps)
        bad_sp = [s[:, :-1] for s in sps]
        with pytest.raises(ValueError):
            synthesize_batch(f0s, [sps[0], bad_sp[1], sps[2]], aps)


class TestPitchConversion:
    def test_log_gaussian_transform(self):
        f0 = np.array([100.0, 200.0])
        out = pitch_conversion(f0, np.log(100), 1.0, np.log(200), 1.0)
        np.testing.assert_allclose(out, [200.0, 400.0], rtol=1e-6)
