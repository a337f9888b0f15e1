"""Tests for MCD/DTW and EER evaluation (reference MCD_calculate.py:86-93,
encoder/model.py:129-137)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.eval.eer import equal_error_rate, ge2e_eer
from dvc_tpu.eval.mcd import dtw_cost_banded, dtw_path, mcd_from_mcc


class TestDTW:
    def test_identity_alignment(self):
        x = np.random.RandomState(0).rand(20, 4)
        px, py = dtw_path(x, x)
        # identical sequences align on the diagonal with zero cost
        assert (px == py).all()

    def test_shifted_alignment(self):
        x = np.random.RandomState(1).rand(30, 3)
        y = x[5:]
        px, py = dtw_path(x, y)
        # tail must align index i+5 -> i
        assert px[-1] == 29 and py[-1] == 24

    def test_monotonic_path(self):
        x = np.random.RandomState(2).rand(15, 2)
        y = np.random.RandomState(3).rand(18, 2)
        px, py = dtw_path(x, y)
        assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()
        assert px[0] == 0 and py[0] == 0

    def test_banded_cost_matches_full_for_identity(self):
        x = jnp.asarray(np.random.RandomState(4).rand(32, 8), jnp.float32)
        cost = float(dtw_cost_banded(x, x, band=8))
        # float32 x^2+y^2-2xy distance noise accumulates ~1e-3/cell on the
        # diagonal; exact zero is not representable
        assert cost == pytest.approx(0.0, abs=0.05)


class TestMCD:
    def test_zero_for_identical(self):
        mcc = np.random.RandomState(0).rand(50, 36)
        assert mcd_from_mcc(mcc, mcc) == pytest.approx(0.0, abs=1e-9)

    def test_formula_constant_offset(self):
        """MCD of sequences differing by d in one coeff == 10/ln10*sqrt(2)*d."""
        mcc = np.zeros((10, 24))
        mcc2 = mcc.copy()
        mcc2[:, 0] = 0.5
        expected = 10.0 / np.log(10.0) * np.sqrt(2.0 * 0.25)
        assert mcd_from_mcc(mcc, mcc2) == pytest.approx(expected, rel=1e-6)

    def test_voiced_only_filtering(self):
        mcc = np.random.RandomState(1).rand(20, 30)
        f0 = np.zeros(20)
        f0[5:15] = 100.0
        # voiced-only MCD uses frames 5..14 of both
        v = mcd_from_mcc(mcc, mcc + 0.1, f0, f0)
        full = mcd_from_mcc(mcc, mcc + 0.1)
        assert v == pytest.approx(full, rel=0.2)  # same constant-offset math

    def test_uses_first_24_coeffs(self):
        mcc = np.zeros((10, 36))
        mcc2 = mcc.copy()
        mcc2[:, 30] = 5.0  # beyond the 24 used
        assert mcd_from_mcc(mcc, mcc2) == pytest.approx(0.0, abs=1e-9)


class TestMCDDeviceAnalysis:
    def test_device_matches_native_analysis(self):
        """eval-mcd --analysis device: MCDs from corpus-batched device
        WORLD analysis agree with the native per-wav path (the f0/MCC
        chains are tolerance-gated against each other, so MCD can differ
        only in the decimals)."""
        from dvc_tpu.eval.mcd import evaluate_mcd_wav
        from dvc_tpu.native import world as native_world

        if not native_world.available():
            pytest.skip("native WORLD engine not built")
        rng = np.random.RandomState(0)
        fs = 16000

        def voice(f0, n=12000):
            t = np.arange(n) / fs
            inst = f0 * (1 + 0.05 * np.sin(2 * np.pi * 3 * t))
            return (0.4 * np.sin(2 * np.pi * np.cumsum(inst) / fs)
                    + 0.02 * rng.randn(n)).astype(np.float32)

        src = [voice(150.0), voice(120.0)]
        cvt = [voice(230.0), voice(200.0)]
        nat = evaluate_mcd_wav(src, cvt, fs, analysis="native")
        dev = evaluate_mcd_wav(src, cvt, fs, analysis="device")
        assert len(nat) == len(dev) == 2
        for a, b in zip(nat, dev):
            assert np.isfinite(a) and np.isfinite(b)
            # 5% relative (advisor r3 tightened this from 35%): the f0/MCC
            # chains are tolerance-gated against each other, so a larger
            # drift would mean a real regression in the device analysis
            assert abs(a - b) < 0.05 * max(a, 1.0), (a, b)


class TestEER:
    def test_perfect_separation(self):
        labels = np.array([1, 1, 1, 0, 0, 0])
        scores = np.array([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
        assert equal_error_rate(labels, scores) == pytest.approx(0.0, abs=1e-9)

    def test_random_scores_near_half(self):
        rng = np.random.RandomState(0)
        labels = rng.randint(0, 2, 10_000)
        scores = rng.rand(10_000)
        assert equal_error_rate(labels, scores) == pytest.approx(0.5, abs=0.03)

    def test_ge2e_eer_shape_contract(self):
        rng = np.random.RandomState(1)
        s, u = 4, 5
        sim = rng.rand(s * u, s)
        # boost the true-speaker column -> low EER
        truth = np.repeat(np.arange(s), u)
        sim[np.arange(s * u), truth] += 5.0
        assert ge2e_eer(sim, s, u) < 0.05


class TestGroupOps:
    def test_accumulate_group_evidence_matches_loop(self):
        import jax
        from dvc_tpu.ops.group import accumulate_group_evidence

        rng = np.random.RandomState(0)
        b, d, g = 8, 5, 3
        mu = rng.randn(b, d).astype(np.float32)
        logvar = rng.randn(b, d).astype(np.float32) * 0.3
        labels = rng.randint(0, g, b)

        gm, glv = accumulate_group_evidence(
            jnp.asarray(mu), jnp.asarray(logvar), jnp.asarray(labels), g)

        # reference dict-loop reimplementation (model/utils.py:13-75)
        var = np.exp(logvar)
        for lab in range(g):
            idx = np.where(labels == lab)[0]
            if len(idx) == 0:
                continue
            inv = (1.0 / var[idx]).sum(axis=0)
            gv = 1.0 / inv
            gmu = (mu[idx] / var[idx]).sum(axis=0) * gv
            for i in idx:
                np.testing.assert_allclose(np.asarray(gm)[i], gmu, rtol=1e-4)
                np.testing.assert_allclose(np.asarray(glv)[i], np.log(gv),
                                           rtol=1e-4)

    def test_group_wise_reparameterize_shares_eps(self):
        import jax
        from dvc_tpu.ops.group import group_wise_reparameterize

        mu = jnp.zeros((4, 3))
        logvar = jnp.zeros((4, 3))
        labels = jnp.asarray([0, 0, 1, 1])
        z = group_wise_reparameterize(jax.random.PRNGKey(0), mu, logvar,
                                      labels, 2)
        z = np.asarray(z)
        np.testing.assert_allclose(z[0], z[1])
        np.testing.assert_allclose(z[2], z[3])
        assert not np.allclose(z[0], z[2])

    def test_permute_dims_preserves_columns(self):
        import jax
        from dvc_tpu.ops.group import permute_dims

        z = jnp.asarray(np.arange(20, dtype=np.float32).reshape(5, 4))
        p = np.asarray(permute_dims(jax.random.PRNGKey(0), z))
        for j in range(4):
            assert sorted(p[:, j]) == sorted(np.asarray(z)[:, j])


class TestVerificationEER:
    def test_separable_embeddings_near_zero(self):
        from dvc_tpu.eval.eer import verification_eer
        rng = np.random.RandomState(0)
        # 3 speakers, well-separated cluster centers
        centers = np.eye(3, 16) * 5
        embeds, ids = [], []
        for s in range(3):
            for _ in range(10):
                embeds.append(centers[s] + 0.1 * rng.randn(16))
                ids.append(s)
        eer = verification_eer(np.stack(embeds), np.asarray(ids))
        assert eer < 0.05

    def test_random_embeddings_near_half(self):
        from dvc_tpu.eval.eer import verification_eer
        rng = np.random.RandomState(1)
        embeds = rng.randn(60, 16)
        ids = np.repeat(np.arange(3), 20)
        eer = verification_eer(embeds, ids)
        assert 0.3 < eer < 0.7

    def test_degenerate_single_speaker(self):
        from dvc_tpu.eval.eer import verification_eer
        embeds = np.random.RandomState(2).randn(5, 8)
        assert verification_eer(embeds, np.zeros(5)) == 0.0
