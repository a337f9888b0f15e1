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
