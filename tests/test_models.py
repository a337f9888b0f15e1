"""Shape/semantics tests for the Flax models, mirroring the dims documented in
SURVEY.md §2 (C8 DisentangledVAE, C15 SpeakerEncoder, C20 AutoVC, C21
FeatureSelection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import AutoVCConfig, SpeakerEncoderConfig, VAEConfig
from dvc_tpu.models import (
    AutoVC,
    DisentangledVAE,
    FeatureSelection,
    ProposedAutoVC,
    SpeakerEncoder,
)
from dvc_tpu.models.layers import LSTM
from dvc_tpu.train.losses import gvae_pair_loss


@pytest.fixture(scope="module")
def vae_setup():
    cfg = VAEConfig()
    model = DisentangledVAE(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 80, 64), jnp.float32)
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    return model, variables, x


class TestLSTM:
    def test_output_shapes(self):
        m = LSTM(32, num_layers=2, bidirectional=True)
        x = jnp.ones((3, 10, 16))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y, (h, c) = m.apply(vars_, x)
        assert y.shape == (3, 10, 64)
        assert h.shape == (2, 3, 32)  # (num_dirs of last layer, B, H)

    def test_param_layout_torch(self):
        m = LSTM(32, num_layers=1)
        vars_ = m.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 16)))
        p = vars_["params"]
        assert p["w_ih_l0"].shape == (128, 16)
        assert p["w_hh_l0"].shape == (128, 32)
        assert p["b_ih_l0"].shape == (128,)

    def test_reverse_direction_flips(self):
        """A biLSTM on a palindromic batch: fwd(x) == bwd(x reversed), so the
        reversed output on flipped input must equal forward output."""
        m = LSTM(8, bidirectional=True)
        x = jnp.asarray(np.random.RandomState(1).rand(2, 6, 4), jnp.float32)
        vars_ = m.init(jax.random.PRNGKey(1), x)
        y, _ = m.apply(vars_, x)
        y_flip, _ = m.apply(vars_, jnp.flip(x, 1))
        # forward half on flipped input == flipped backward half on original
        # only if weights were shared between directions — they are not; just
        # check both halves differ and are finite
        assert np.isfinite(np.asarray(y)).all()
        assert not np.allclose(y[..., :8], y[..., 8:])
        assert y_flip.shape == y.shape


class TestDisentangledVAE:
    def test_forward_shapes(self, vae_setup):
        model, variables, x = vae_setup
        outs, _ = model.apply(variables, x, x, train=True,
                              rngs={"reparam": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
        (rx1, rx2, rx1h, rx2h, q1m, q1l, q2m, q2l, smu, slv) = outs
        assert rx1.shape == (2, 80, 64)
        assert rx1h.shape == (2, 80, 64)
        assert q1m.shape == (2, 32)     # latent_dim
        assert smu.shape == (2, 4)      # speaker_size

    def test_encode_shapes(self, vae_setup):
        model, variables, x = vae_setup
        smu, slv, cmu, clv = model.apply(variables, x, method="encode")
        assert smu.shape == (2, 4) and slv.shape == (2, 4)
        assert cmu.shape == (2, 28) and clv.shape == (2, 28)

    def test_decode_shapes(self, vae_setup):
        model, variables, _ = vae_setup
        z = jnp.zeros((2, 32))
        mel = model.apply(variables, z, method="decode")
        assert mel.shape == (2, 80, 64)

    def test_eval_deterministic(self, vae_setup):
        """train=False must not need a reparam rng (mu passthrough) except for
        the style sample, which the reference draws unconditionally (:261)."""
        model, variables, x = vae_setup
        o1 = model.apply(variables, x, x, train=False,
                         rngs={"reparam": jax.random.PRNGKey(5)})
        o2 = model.apply(variables, x, x, train=False,
                         rngs={"reparam": jax.random.PRNGKey(5)})
        np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]))

    def test_loss_terms(self, vae_setup):
        model, variables, x = vae_setup
        outs, _ = model.apply(variables, x, x, train=True,
                              rngs={"reparam": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
        terms = gvae_pair_loss(x, x, *outs)
        assert np.isfinite(float(terms.total))
        # style KL excluded: total == mse_cof*L1s + kl_cof*KLs exactly
        expect = 10.0 * (terms.mse_x1 + terms.mse_x2 + terms.mse_x1_hat +
                         terms.mse_x2_hat) + 10.0 * (terms.z1_kl + terms.z2_kl)
        assert float(terms.total) == pytest.approx(float(expect), rel=1e-6)

    def test_style_kl_factor(self):
        """z_kl_style uses factor -1 (not -0.5) and sums over everything / B
        (reference :323)."""
        mu = jnp.ones((4, 4)) * 0.5
        lv = jnp.zeros((4, 4))
        zeros = jnp.zeros((4, 80, 64))
        qm = jnp.zeros((4, 32))
        terms = gvae_pair_loss(zeros, zeros, zeros, zeros, zeros, zeros,
                               qm, qm, qm, qm, mu, lv)
        # -1 * sum(1 + 0 - 0.25 - 1) / 4 = -1 * (16 * -0.25) / 4 = 1.0
        assert float(terms.z_style_kl) == pytest.approx(1.0, rel=1e-6)


class TestSpeakerEncoder:
    def test_embedding_shape_and_norm(self):
        cfg = SpeakerEncoderConfig()
        m = SpeakerEncoder(cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(6, 63, 80), jnp.float32)
        vars_ = m.init(jax.random.PRNGKey(0), x)
        e = m.apply(vars_, x)
        assert e.shape == (6, 256)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0,
                                   rtol=1e-5)

    def test_similarity_matrix_matches_loop(self):
        """Vectorized GE2E similarity == the reference's per-speaker loop
        (encoder/model.py:86-92), reimplemented here in numpy."""
        cfg = SpeakerEncoderConfig()
        m = SpeakerEncoder(cfg)
        s, u, e = 4, 5, 16
        embeds = np.random.RandomState(2).rand(s, u, e).astype(np.float32)
        embeds /= np.linalg.norm(embeds, axis=2, keepdims=True)
        x = jnp.ones((2, 63, 80))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        sim = np.asarray(m.apply(vars_, jnp.asarray(embeds),
                                 method="similarity_matrix"))

        # reference loop
        incl = embeds.mean(axis=1, keepdims=True)
        incl = incl / np.linalg.norm(incl, axis=2, keepdims=True)
        excl = (embeds.sum(axis=1, keepdims=True) - embeds) / (u - 1)
        excl = excl / np.linalg.norm(excl, axis=2, keepdims=True)
        ref = np.zeros((s, u, s), np.float32)
        mask_matrix = 1 - np.eye(s, dtype=int)
        for j in range(s):
            mask = np.where(mask_matrix[j])[0]
            ref[mask, :, j] = (embeds[mask] * incl[j]).sum(axis=2)
            ref[j, :, j] = (embeds[j] * excl[j]).sum(axis=1)
        ref = ref * 10.0 + (-5.0)
        np.testing.assert_allclose(sim, ref, rtol=1e-4, atol=1e-5)

    def test_ge2e_loss_finite(self):
        cfg = SpeakerEncoderConfig()
        m = SpeakerEncoder(cfg)
        x = jnp.ones((2, 63, 80))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        embeds = jnp.asarray(np.random.RandomState(3).rand(4, 5, 256), jnp.float32)
        loss, sim = m.apply(vars_, embeds, method="loss")
        assert np.isfinite(float(loss))
        assert sim.shape == (20, 4)

    def test_zero_embeddings_finite_loss_and_grad(self):
        """ReLU-dead embeddings (an all-zero speaker) must give finite loss
        AND finite gradients: the reference's raw-norm division NaNs the run
        (encoder/model.py:76,81), and a naive maximum(norm, eps) floor still
        NaNs the BACKWARD pass (0 * inf in the norm VJP at exactly zero)."""
        cfg = SpeakerEncoderConfig()
        m = SpeakerEncoder(cfg)
        x = jnp.ones((2, 63, 80))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        embeds = np.random.RandomState(4).rand(4, 5, 256).astype(np.float32)
        embeds[0] = 0.0  # one entirely dead speaker

        def loss_fn(e):
            loss, _ = m.apply(vars_, e, method="loss")
            return loss

        loss, grad = jax.value_and_grad(loss_fn)(jnp.asarray(embeds))
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(grad)).all()


class TestAutoVC:
    def test_original_shapes(self):
        cfg = AutoVCConfig()
        m = AutoVC(cfg)
        x = jnp.ones((2, 64, 80))
        c = jnp.ones((2, 256))
        vars_ = m.init(jax.random.PRNGKey(0), x, c, c, train=True)
        (mel, mel_post, codes), _ = m.apply(vars_, x, c, c, train=True,
                                            mutable=["batch_stats"])
        assert mel.shape == (2, 64, 80)
        assert mel_post.shape == (2, 64, 80)
        assert codes.shape == (2, (64 // 32) * 64)  # T/freq codes of 2*dim_neck

    def test_codes_only(self):
        cfg = AutoVCConfig()
        m = AutoVC(cfg)
        x = jnp.ones((2, 64, 80))
        c = jnp.ones((2, 256))
        vars_ = m.init(jax.random.PRNGKey(0), x, c, c, train=True)
        codes = m.apply(vars_, x, c, None, train=False)
        assert codes.shape == (2, 128)

    def test_proposed_shapes(self):
        m = ProposedAutoVC()
        x = jnp.ones((2, 64, 80))
        vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
        (mel, mel_post), _ = m.apply(vars_, x, train=True, mutable=["batch_stats"])
        assert mel.shape == (2, 64, 80)
        assert mel_post.shape == (2, 64, 80)


class TestFeatureSelection:
    def test_mask_and_classify(self):
        m = FeatureSelection(input_size=32, num_spk=109)
        x = jnp.ones((10, 32))
        # init both branches (mask + classifier)
        vars_ = m.init(jax.random.PRNGKey(0), x,
                       method=lambda mod, x: (mod(x), mod.classify(x)))
        mask = m.apply(vars_, x)
        assert mask.shape == (10, 32)
        assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0
        pred = m.apply(vars_, x * mask, method="classify")
        assert pred.shape == (10, 109)
        np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)
