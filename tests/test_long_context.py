"""Whole-utterance (long-context) encoding tests (models/long_context.py).

The variant must (a) reduce exactly to model.encode on a single 64-frame
chunk, (b) give identical results frame-sharded on the 8-device mesh and
dense on one device, and (c) actually carry context across chunk
boundaries — the capability the reference's chunking lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu.config import MeshConfig, VAEConfig
from dvc_tpu.models.disentangled_vae import DisentangledVAE
from dvc_tpu.models.long_context import (
    convert_mel_long_context,
    whole_utterance_encode,
)
from dvc_tpu.parallel.mesh import make_mesh

CFG = VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                dec_lstm2_hidden=32, postnet_channels=32)


@pytest.fixture(scope="module")
def model_and_vars():
    model = DisentangledVAE(CFG)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, CFG.num_mels, CFG.frames), jnp.float32)
    variables = model.init({"params": rng, "reparam": rng}, x, x, train=True)
    # non-trivial running BN stats so eval-mode normalization is exercised
    stats = jax.tree.map(lambda a: a, variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig())


class TestWholeUtteranceEncode:
    def test_single_chunk_equals_model_encode(self, model_and_vars):
        model, variables = model_and_vars
        rng = np.random.RandomState(0)
        mel = jnp.asarray(rng.rand(3, CFG.num_mels, CFG.frames), jnp.float32)
        got = whole_utterance_encode(CFG, variables, mel)
        want = model.apply(variables, mel, method="encode")
        for g, w in zip(got, want):
            assert g.shape == (3, 1) + w.shape[1:]
            np.testing.assert_allclose(np.asarray(g[:, 0]), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)

    def test_sharded_matches_dense(self, model_and_vars, mesh):
        model, variables = model_and_vars
        rng = np.random.RandomState(1)
        # 4 chunks x 16 frames = 64 frames over 8 devices
        mel = jnp.asarray(rng.rand(2, CFG.num_mels, 4 * CFG.frames),
                          jnp.float32)
        dense = whole_utterance_encode(CFG, variables, mel)
        sharded = whole_utterance_encode(CFG, variables, mel, mesh)
        for d, s in zip(dense, sharded):
            np.testing.assert_allclose(np.asarray(s), np.asarray(d),
                                       rtol=2e-4, atol=2e-5)

    def test_context_crosses_chunk_boundaries(self, model_and_vars):
        """Changing ONLY the first chunk's frames must change the second
        chunk's full-context latents (biLSTM carries state across the
        boundary) — while the chunked reference encode cannot see it."""
        model, variables = model_and_vars
        rng = np.random.RandomState(2)
        mel_a = rng.rand(1, CFG.num_mels, 2 * CFG.frames).astype(np.float32)
        mel_b = mel_a.copy()
        mel_b[:, :, :CFG.frames] = rng.rand(1, CFG.num_mels, CFG.frames)

        lc_a = whole_utterance_encode(CFG, variables, mel_a)
        lc_b = whole_utterance_encode(CFG, variables, mel_b)
        # second-chunk content latents differ under full context
        assert not np.allclose(np.asarray(lc_a[2][:, 1]),
                               np.asarray(lc_b[2][:, 1]), atol=1e-6)

        # the chunked path provably cannot: same second chunk -> same latents
        enc_a = model.apply(variables, jnp.asarray(mel_a[:, :, CFG.frames:]),
                            method="encode")
        enc_b = model.apply(variables, jnp.asarray(mel_b[:, :, CFG.frames:]),
                            method="encode")
        np.testing.assert_allclose(np.asarray(enc_a[2]), np.asarray(enc_b[2]))

    def test_pads_ragged_tail(self, model_and_vars):
        _, variables = model_and_vars
        rng = np.random.RandomState(3)
        mel = rng.rand(1, CFG.num_mels, CFG.frames + 5).astype(np.float32)
        out = whole_utterance_encode(CFG, variables, mel)
        assert out[0].shape[1] == 2  # padded to two chunks


class TestConvertLongContext:
    def test_shapes_and_differs_from_chunked(self, model_and_vars):
        from dvc_tpu.convert.conversion import convert_mel
        model, variables = model_and_vars
        rng = np.random.RandomState(4)
        src = rng.rand(CFG.num_mels, 3 * CFG.frames - 2).astype(np.float32)
        trg = rng.rand(CFG.num_mels, 2 * CFG.frames).astype(np.float32)
        recons, converted = convert_mel_long_context(model, variables, src,
                                                     trg, CFG.frames)
        assert converted.shape == (CFG.num_mels, 3 * CFG.frames)
        assert np.isfinite(converted).all()
        _, chunked = convert_mel(model, variables, src, trg, CFG.frames)
        # same decoder, different (full-context) posteriors
        assert not np.allclose(converted, chunked, atol=1e-6)
