"""Adversarial content-regularization tests (train/adversarial.py).

The DANN speaker classifier on the content posterior is an ADDITIVE
tpu-native option (reference objective: model/disentangled_vae.py:309-327
has no such term); adv_cof = 0 must keep everything bit-identical, and
adv_cof > 0 must measurably strip speaker identity from the content dims.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu import config as C
from dvc_tpu.data.dataset import PairedMelDataset
from dvc_tpu.train.adversarial import (
    create_adv_state,
    grad_reverse,
    make_adv_train_step,
)
from dvc_tpu.train.trainer import Trainer, create_train_state


def tiny_config(adv_cof=0.0, adv_speakers=0, **train_kw) -> C.Config:
    vae = C.VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                      dec_lstm2_hidden=32, postnet_channels=32)
    train_kw = {"batch_size": 4, "compute_dtype": "float32", **train_kw}
    return C.Config(vae=vae, train=C.TrainConfig(**train_kw),
                    loss=C.LossConfig(adv_cof=adv_cof,
                                      adv_speakers=adv_speakers))


class TestGradReverse:
    def test_forward_identity(self):
        x = jnp.arange(6.0).reshape(2, 3)
        np.testing.assert_array_equal(np.asarray(grad_reverse(x, 1.0)),
                                      np.asarray(x))

    def test_backward_negated(self):
        g = jax.grad(lambda x: jnp.sum(grad_reverse(x, 1.0) ** 2))(
            jnp.array([1.0, -2.0]))
        np.testing.assert_allclose(np.asarray(g), [-2.0, 4.0])

    def test_lambda_scales(self):
        g = jax.grad(lambda x: jnp.sum(grad_reverse(x, 0.5)))(jnp.ones(3))
        np.testing.assert_allclose(np.asarray(g), [-0.5, -0.5, -0.5])


def _speaker_batch(rng, cfg, n_speakers=2, batch=8):
    """Pair batch where speaker identity is the DOMINANT signal: each
    speaker adds a large constant offset to otherwise-random mels."""
    spk = rng.randint(0, n_speakers, size=batch).astype(np.int32)
    offs = (spk.astype(np.float32) * 4.0 - 2.0)[:, None, None]
    shape = (batch, cfg.vae.num_mels, cfg.vae.frames)
    x1 = (rng.rand(*shape).astype(np.float32) * 0.1 + offs)
    x2 = (rng.rand(*shape).astype(np.float32) * 0.1 + offs)
    return jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(spk)


class TestAdvStep:
    def test_step_runs_and_counts(self):
        cfg = tiny_config()
        model, state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg)
        adv_model, adv_state, adv_opt = create_adv_state(
            jax.random.PRNGKey(2), cfg.vae.content_size, n_speakers=2)
        step = make_adv_train_step(model, optimizer, adv_model, adv_opt,
                                   compute_dtype="float32", donate=False)
        rng = np.random.RandomState(0)
        x1, x2, spk = _speaker_batch(rng, cfg)
        state2, adv2, terms, m = step(state, adv_state, x1[:4], x2[:4],
                                      spk[:4], jax.random.PRNGKey(1))
        assert int(state2.step) == int(state.step) + 1
        assert np.isfinite(float(terms.total))
        assert np.isfinite(float(m["adv_ce"]))
        assert 0.0 <= float(m["adv_acc"]) <= 1.0
        # the adversary actually updated
        l0 = jax.tree_util.tree_leaves(adv_state.params)[0]
        l1 = jax.tree_util.tree_leaves(adv2.params)[0]
        assert not np.allclose(np.asarray(l0), np.asarray(l1))

    def test_grl_mode_runs(self):
        cfg = tiny_config()
        model, state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg)
        adv_model, adv_state, adv_opt = create_adv_state(
            jax.random.PRNGKey(2), cfg.vae.content_size, n_speakers=2)
        step = make_adv_train_step(model, optimizer, adv_model, adv_opt,
                                   mode="grl", compute_dtype="float32",
                                   donate=False)
        rng = np.random.RandomState(0)
        x1, x2, spk = _speaker_batch(rng, cfg, batch=4)
        _, _, terms, m = step(state, adv_state, x1, x2, spk,
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(terms.total))
        assert np.isfinite(float(m["adv_ce"]))

    def test_bad_mode_rejected(self):
        cfg = tiny_config()
        model, state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg)
        adv_model, adv_state, adv_opt = create_adv_state(
            jax.random.PRNGKey(2), cfg.vae.content_size, n_speakers=2)
        with pytest.raises(ValueError, match="mode"):
            make_adv_train_step(model, optimizer, adv_model, adv_opt,
                                mode="nope")

    def test_confusion_no_scale_cheat_and_recon_intact(self):
        """Pins the two MEASURED no-harm properties of confusion mode
        (module docstring #2/#3): without the z-score the encoder shrank
        the whole content latent to dodge the adversary (total variance
        15.3 -> 0.7 at cof=100); with it the latent scale must survive
        adversarial training, and reconstruction must not be traded away.
        (No toy-scale disentanglement claim is made — measured honestly
        as null here; the real effect is gated at chip scale.)"""
        cfg = tiny_config(batch_size=16)

        def make_batch(rng):
            return _speaker_batch(rng, cfg, batch=16)

        def train_encoder(adv_cof):
            model, state, optimizer = create_train_state(
                jax.random.PRNGKey(0), cfg)
            adv_model, adv_state, adv_opt = create_adv_state(
                jax.random.PRNGKey(2), cfg.vae.content_size, n_speakers=2,
                hidden=64)
            step = make_adv_train_step(model, optimizer, adv_model, adv_opt,
                                       adv_cof=adv_cof,
                                       compute_dtype="float32", donate=False)
            rng = np.random.RandomState(1)
            accs = []
            for i in range(120):
                x1, x2, spk = make_batch(rng)
                state, adv_state, terms, m = step(
                    state, adv_state, x1, x2, spk, jax.random.PRNGKey(3))
                if i >= 100:
                    accs.append(float(m["adv_acc"]))
            hx1, hx2, _hspk = _speaker_batch(np.random.RandomState(99), cfg,
                                             batch=32)
            outs = model.apply({"params": state.params,
                                "batch_stats": state.batch_stats},
                               hx1, hx2, train=False,
                               rngs={"reparam": jax.random.PRNGKey(7)})
            s = cfg.vae.speaker_size
            zc = np.asarray(outs[4][:, s:])  # q_z1_mu content dims
            return zc, float(terms.mse_x1), float(np.mean(accs))

        zc_plain, mse_plain, _ = train_encoder(adv_cof=0.0)
        zc_adv, mse_adv, acc_adv = train_encoder(adv_cof=100.0)
        var_plain = float(zc_plain.var(0).sum())
        var_adv = float(zc_adv.var(0).sum())
        # no scale cheat: the latent must keep a comparable energy scale
        # (the un-normalized formulation collapsed it ~20x)
        assert var_adv > 0.2 * var_plain, (var_adv, var_plain)
        # the classifier branch actually learns (it sees a blatant offset)
        assert acc_adv > 0.8, acc_adv
        # reconstruction not traded away
        assert mse_adv < 1.5 * mse_plain, (mse_adv, mse_plain)


def _make_fake_speaker_tree(root, speakers=("p225", "p226", "p227"), utts=4):
    rng = np.random.RandomState(0)
    for j, spk in enumerate(speakers):
        d = os.path.join(root, spk)
        os.makedirs(d, exist_ok=True)
        for u in range(utts):
            t = rng.randint(20, 60)
            np.save(os.path.join(d, f"{spk}_{u:03d}_mel.npy"),
                    (rng.rand(80, t) + 2.0 * j).astype(np.float32))


class TestCliAdv:
    def test_train_adv_cof_flag(self, tmp_path):
        """`train --adv_cof` wires the corpus speaker count into the
        adversary and completes an epoch (cli/run.py cmd_train)."""
        import json

        from dvc_tpu.cli.run import main

        _make_fake_speaker_tree(str(tmp_path / "mels"))
        results = str(tmp_path / "results")
        assert main(["train", "--dataset_fp", str(tmp_path / "mels"),
                     "--log_dir", results, "--epochs", "1",
                     "--report-interval", "1", "--samples_length", "16",
                     "--batch-size", "2", "--compute-dtype", "float32",
                     "--adv_cof", "5.0"]) == 0
        with open(os.path.join(results, "config.json")) as f:
            cfg = json.load(f)
        assert cfg["loss"]["adv_cof"] == 5.0
        assert cfg["loss"]["adv_speakers"] == 3  # corpus speaker count


class TestTrainerAdv:
    def test_adv_cof_zero_keeps_plain_path(self):
        tr = Trainer(tiny_config(), use_mesh=False)
        assert tr._adv_model is None

    def test_adv_requires_speaker_count(self):
        with pytest.raises(ValueError, match="adv_speakers"):
            Trainer(tiny_config(adv_cof=1.0, adv_speakers=0), use_mesh=False)

    @pytest.mark.parametrize("use_mesh", [False, True])
    def test_adv_epoch_and_checkpoint_interchange(self, tmp_path, use_mesh):
        """One adversarial epoch (single-device AND 8-CPU mesh) reports the
        adv metrics, and the checkpoint stays loadable by a PLAIN trainer
        (the adversary lives outside the TrainState by design)."""
        _make_fake_speaker_tree(str(tmp_path / "mels"))
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16,
                              seed=0)
        cfg = tiny_config(adv_cof=5.0, adv_speakers=len(ds.speaker_ids),
                          batch_size=2)
        tr = Trainer(cfg, checkpoints_path=str(tmp_path / "ckpt"),
                     use_mesh=use_mesh)
        totals = tr.train_epoch(ds, 1)
        assert totals["n_batches"] >= 1
        assert np.isfinite(totals["total"])
        assert np.isfinite(totals["adv_ce"])
        assert 0.0 <= totals["adv_acc"] / totals["n_batches"] <= 1.0
        tr.save(1)
        plain = Trainer(tiny_config(batch_size=2),
                        checkpoints_path=str(tmp_path / "ckpt"),
                        use_mesh=False)
        assert plain.load_last() == 2  # resumes after epoch 1
