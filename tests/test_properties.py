"""Property-based tests (hypothesis) over the pure-math core.

The reference ships no tests at all (SURVEY.md §4); beyond the unit/golden
suite, these assert INVARIANTS over randomized inputs: codec roundtrips,
length contracts, DTW path validity, framing inverses.  Shapes are drawn
from small sets so jitted ops hit a bounded compile cache; values are fully
random.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

SET = dict(max_examples=25, deadline=None, derandomize=True)


class TestMulawRoundtrip:
    @settings(**SET)
    @given(st.integers(0, 2**31 - 1))
    def test_inverse(self, seed):
        from dvc_tpu.ops.audio import inv_mulaw, mulaw
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.uniform(-1, 1, 257).astype(np.float32))
        np.testing.assert_allclose(np.asarray(inv_mulaw(mulaw(x))),
                                   np.asarray(x), atol=2e-6)


class TestChunkRoundtrip:
    @settings(**SET)
    @given(st.integers(1, 200), st.integers(0, 2**31 - 1))
    def test_unchunk_inverts_chunk(self, t, seed):
        from dvc_tpu.ops.chunk import chunk_mel, unchunk_mel
        rng = np.random.RandomState(seed)
        mel = rng.rand(80, t).astype(np.float32)
        chunks = chunk_mel(jnp.asarray(mel), 64)
        back = np.asarray(unchunk_mel(chunks, total_frames=t))
        np.testing.assert_array_equal(back, mel)
        # padding rule: always t//64 + 1 chunks (reference chunking_mel)
        assert chunks.shape == (t // 64 + 1, 80, 64)


class TestFlacRoundtrip:
    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(st.integers(64, 5000), st.integers(0, 2**31 - 1),
           st.sampled_from(["fixed2", "lpc1", "verbatim"]),
           st.sampled_from([256, 1024, 4096]))
    def test_bit_exact_mono(self, tmp_path_factory, n, seed, mode, blocksize):
        from dvc_tpu.native import flac as native_flac
        from tools.flac_encoder import write_flac
        if not native_flac.available():
            pytest.skip("no native decoder")
        rng = np.random.RandomState(seed)
        wav = np.clip(rng.randn(n) * 0.3, -1, 1)
        p = str(tmp_path_factory.mktemp("flac") / "x.flac")
        write_flac(p, wav, 16000, blocksize=blocksize, mode=mode)
        got, sr = native_flac.read_flac(p)
        want = np.clip(np.round(wav * 32767.0), -32768, 32767) / 32768.0
        assert sr == 16000 and len(got) == n
        np.testing.assert_allclose(got, want, atol=1 / 32768.0)


class TestWavIO:
    @settings(**SET)
    @given(st.integers(1, 10000), st.integers(0, 2**31 - 1))
    def test_roundtrip_shape_and_correlation(self, tmp_path_factory, n, seed):
        from dvc_tpu.utils.wavio import read_wav, write_wav
        rng = np.random.RandomState(seed)
        wav = (rng.randn(n) * 0.3).clip(-1, 1).astype(np.float32)
        p = str(tmp_path_factory.mktemp("wav") / "x.wav")
        write_wav(p, wav, 16000)
        back, sr = read_wav(p)
        assert sr == 16000 and len(back) == n
        if n > 8 and np.std(wav) > 1e-6:
            assert np.corrcoef(wav, back)[0, 1] > 0.999


class TestResampleContract:
    @settings(max_examples=15, deadline=None, derandomize=True)
    @given(st.sampled_from([999, 1000, 1001, 4097, 7777]),
           st.sampled_from([(8000, 16000), (24000, 16000), (22050, 16000),
                            (16000, 22050), (48000, 16000)]))
    def test_length(self, n, rates):
        from dvc_tpu.ops.audio import resample_poly
        a, b = rates
        y = resample_poly(jnp.ones(n), a, b)
        g = np.gcd(a, b)
        assert y.shape[-1] == int(np.ceil(n * (b // g) / (a // g)))


class TestDTWPathProperties:
    @settings(**SET)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
    def test_valid_monotone_path(self, n, m, seed):
        from dvc_tpu.eval.mcd import dtw_path
        rng = np.random.RandomState(seed)
        px, py = dtw_path(rng.rand(n, 4), rng.rand(m, 4))
        assert px[0] == 0 and py[0] == 0
        assert px[-1] == n - 1 and py[-1] == m - 1
        dx, dy = np.diff(px), np.diff(py)
        assert ((dx >= 0) & (dx <= 1)).all()
        assert ((dy >= 0) & (dy <= 1)).all()
        assert ((dx + dy) >= 1).all()  # every step advances

    @settings(**SET)
    @given(st.integers(2, 40), st.integers(0, 2**31 - 1))
    def test_self_alignment_is_diagonal(self, n, seed):
        from dvc_tpu.eval.mcd import dtw_path
        rng = np.random.RandomState(seed)
        # distinct rows so the optimal self-alignment is unique
        x = rng.rand(n, 4) + np.arange(n)[:, None]
        px, py = dtw_path(x, x)
        np.testing.assert_array_equal(px, np.arange(n))
        np.testing.assert_array_equal(py, np.arange(n))


class TestFramingInverse:
    @settings(**SET)
    @given(st.sampled_from([(1024, 256), (1024, 250), (512, 128), (800, 200),
                            (1024, 160)]),
           st.integers(1, 100))
    def test_max_length_frames_to_exactly_m(self, geo, m):
        from dvc_tpu.config import AudioConfig
        from dvc_tpu.convert.griffinlim import _max_length_for_frames
        from dvc_tpu.ops.stft import num_frames
        fft, hop = geo
        cfg = AudioConfig(fft_size=fft, hop_size=hop)
        L = _max_length_for_frames(m, cfg)
        if L is not None:
            assert L >= 1
            assert num_frames(L, fft, hop) == m
            # maximality: one more hop-aligned step overshoots
            assert num_frames(L + hop, fft, hop) > m


class TestMcepRoundtrip:
    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(st.integers(0, 2**31 - 1))
    def test_sp2mc_mc2sp_recovers_smooth_envelopes(self, seed):
        from dvc_tpu.ops.world import mc2sp, mcepalpha, sp2mc
        rng = np.random.RandomState(seed)
        fftlen, order, fs = 1024, 36, 16000
        n_freq = fftlen // 2 + 1
        # smooth positive envelope: low-order cosine series in log domain
        k = np.linspace(0, np.pi, n_freq)
        log_env = sum(rng.randn() * 0.5 * np.cos(i * k) for i in range(6))
        sp = np.exp(log_env)[None, :].astype(np.float32)
        alpha = mcepalpha(fs)
        mc = sp2mc(jnp.asarray(sp), order, alpha)
        back = np.asarray(mc2sp(mc, alpha, fftlen))
        # order-36 cepstrum reconstructs a 6-term smooth envelope closely
        rel = np.abs(np.log(back) - np.log(sp)).max()
        assert rel < 0.1, rel


class TestSamplerBalance:
    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(st.integers(2, 12), st.integers(1, 50), st.integers(0, 2**31 - 1))
    def test_at_most_one_epoch_spread(self, n_items, draws, seed):
        from dvc_tpu.data.speaker_dataset import EpochPermutationSampler
        rng = np.random.default_rng(seed)
        s = EpochPermutationSampler(list(range(n_items)), rng)
        got = s.sample(draws)
        counts = np.bincount(got, minlength=n_items)
        # full epochs contribute 1 to every item; the partial epoch 0 or 1,
        # so counts can never spread by more than one
        assert counts.max() - counts.min() <= 1
