"""Trainer / checkpoint / data-pipeline tests (tiny configs for CPU speed)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvc_tpu import config as C
from dvc_tpu.data.dataset import PairedMelDataset
from dvc_tpu.train.checkpoint import (
    latest_checkpoint_step,
    load_last_checkpoint,
    save_checkpoint,
)
from dvc_tpu.train.trainer import Trainer, create_train_state, make_train_step


def tiny_config(**train_kw) -> C.Config:
    vae = C.VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                      dec_lstm2_hidden=32, postnet_channels=32)
    train_kw = {"batch_size": 4, "compute_dtype": "float32", **train_kw}
    return C.Config(vae=vae, train=C.TrainConfig(**train_kw))


@pytest.fixture(scope="module")
def tiny_state():
    cfg = tiny_config()
    model, state, optimizer = create_train_state(jax.random.PRNGKey(0), cfg)
    return cfg, model, state, optimizer


class TestTrainStep:
    def test_loss_decreases(self, tiny_state):
        cfg, model, state, optimizer = tiny_state
        step = make_train_step(model, optimizer, compute_dtype="float32",
                               donate=False)
        rng = jax.random.PRNGKey(1)
        x1 = jnp.asarray(np.random.RandomState(0).rand(4, 80, 16), jnp.float32)
        x2 = jnp.asarray(np.random.RandomState(1).rand(4, 80, 16), jnp.float32)
        losses = []
        for _ in range(5):
            state, terms = step(state, x1, x2, rng)
            losses.append(float(terms.total))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], f"no progress: {losses}"

    def test_step_counter(self, tiny_state):
        cfg, model, state, optimizer = tiny_state
        step = make_train_step(model, optimizer, compute_dtype="float32",
                               donate=False)
        x = jnp.zeros((4, 80, 16))
        new_state, _ = step(state, x, x, jax.random.PRNGKey(0))
        assert int(new_state.step) == int(state.step) + 1


class TestCheckpoint:
    def test_roundtrip_and_latest_wins(self, tiny_state, tmp_path):
        _, _, state, _ = tiny_state
        d = str(tmp_path)
        save_checkpoint(d, "DisentangledVAE_VCTK", 3, state)
        save_checkpoint(d, "DisentangledVAE_VCTK", 10, state)
        save_checkpoint(d, "DisentangledVAE_VCTK", 7, state)
        epoch, path = latest_checkpoint_step(d)
        assert epoch == 10
        loaded_epoch, loaded = load_last_checkpoint(d, state)
        assert loaded_epoch == 10
        chex_leaf = jax.tree_util.tree_leaves(loaded.params)[0]
        orig_leaf = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_allclose(np.asarray(chex_leaf), np.asarray(orig_leaf))

    def test_empty_dir(self, tmp_path):
        assert latest_checkpoint_step(str(tmp_path)) is None


def _make_fake_mel_tree(root, speakers=("p225", "p226"), utts=6, t_range=(20, 90)):
    rng = np.random.RandomState(0)
    for spk in speakers:
        d = os.path.join(root, spk)
        os.makedirs(d, exist_ok=True)
        for u in range(utts):
            t = rng.randint(*t_range)
            np.save(os.path.join(d, f"{spk}_{u:03d}_mel.npy"),
                    rng.rand(80, t).astype(np.float32))


class TestPairedDataset:
    def test_pairing_same_speaker(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path))
        ds = PairedMelDataset(str(tmp_path), samples_length=16, seed=0)
        # 6 utts per speaker -> 3 pairs per speaker -> 6 pairs
        assert len(ds) == 6
        for fp1, fp2 in ds.utterance_fp:
            assert os.path.dirname(fp1) == os.path.dirname(fp2)
            assert fp1 != fp2

    def test_crop_and_pad_shapes(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path), t_range=(5, 40))
        ds = PairedMelDataset(str(tmp_path), samples_length=16, seed=0)
        m1, m2, spk = ds[0]
        assert m1.shape == (80, 16) and m2.shape == (80, 16)
        assert 0 <= spk < 2

    def test_shuffle_repairs(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path))
        ds = PairedMelDataset(str(tmp_path), samples_length=16, seed=0)
        before = [tuple(p) for p in ds.utterance_fp]
        ds.shuffle_data()
        after = [tuple(p) for p in ds.utterance_fp]
        assert len(before) == len(after)
        assert before != after  # re-paired (prob. of identity ~ 0)

    def test_batches_static_shape(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path))
        ds = PairedMelDataset(str(tmp_path), samples_length=16, seed=0)
        batches = list(ds.batches(4))
        assert len(batches) == 1  # 6 pairs // 4
        x1, x2, spk = batches[0]
        assert x1.shape == (4, 80, 16)
        assert spk.dtype == np.int32


class TestTrainerEndToEnd:
    def test_evaluate(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path / "mels"))
        cfg = tiny_config(batch_size=2)
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16, seed=0)
        tr = Trainer(cfg, use_mesh=False)
        out = tr.evaluate(ds, logging_func=lambda *a: None)
        assert np.isfinite(out["total"])
        assert out["mse_x1"] > 0

    def test_dataset_smaller_than_batch_still_trains(self, tmp_path):
        """Static-shape batching drops partial batches, so a corpus with
        fewer pairs than batch_size used to train ZERO batches per epoch
        silently (1500 no-op epochs observed); the batch now clamps to the
        pair count."""
        _make_fake_mel_tree(str(tmp_path / "mels"))
        cfg = tiny_config(batch_size=64)  # far more than the fake corpus
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16,
                              seed=0)
        assert 0 < len(ds) < 64
        tr = Trainer(cfg, use_mesh=False)
        totals = tr.train_epoch(ds, 1)
        assert totals["n_batches"] >= 1
        assert np.isfinite(totals["total"])

    def test_one_epoch_and_resume(self, tmp_path):
        _make_fake_mel_tree(str(tmp_path / "mels"))
        cfg = tiny_config(batch_size=2)
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16, seed=0)
        tr = Trainer(cfg, checkpoints_path=str(tmp_path / "ckpt"), use_mesh=False)
        tr.run_training(ds, epochs=2, report_interval=1, reload_model=False,
                        logging_func=lambda *a: None)
        found = latest_checkpoint_step(str(tmp_path / "ckpt"))
        assert found is not None and found[0] == 2
        # resume picks up after epoch 2
        tr2 = Trainer(cfg, checkpoints_path=str(tmp_path / "ckpt"), use_mesh=False)
        assert tr2.load_last() == 3


class TestRemat:
    def test_remat_step_matches_plain(self, tmp_path):
        """jax.checkpoint over the pair forward must leave losses (and the
        updated params) bitwise-comparable — it only trades FLOPs for
        activation memory."""
        import dataclasses
        _make_fake_mel_tree(str(tmp_path / "mels"))
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16,
                              seed=0)
        losses = {}
        for remat in (False, True):
            cfg = tiny_config(batch_size=2)
            cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                        remat=remat))
            tr = Trainer(cfg, use_mesh=False)
            totals = tr.train_epoch(ds, 1)
            losses[remat] = totals["total"]
            ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16,
                                  seed=0)  # identical pairing both runs
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=1e-6, atol=1e-6)
