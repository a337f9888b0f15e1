"""Multi-host layer tests — single-process degenerate path on the virtual
8-device mesh (the multi-process path needs real multi-host hardware; its
single-host behavior must be an exact passthrough)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dvc_tpu.config import MeshConfig
from dvc_tpu.parallel.multihost import (
    PerHostBatcher,
    global_mesh,
    initialize_distributed,
    is_primary,
)


class TestSingleHostDegenerate:
    def test_initialize_noop(self):
        assert initialize_distributed() is False  # single process

    def test_primary(self):
        assert is_primary()

    def test_global_mesh_spans_all_devices(self):
        mesh = global_mesh(MeshConfig())
        assert int(np.prod(list(mesh.shape.values()))) == len(jax.devices())

    def test_per_host_batcher_shards(self):
        mesh = global_mesh(MeshConfig())
        b = PerHostBatcher(mesh)
        assert b.local_batch_size(16) == 16  # one process owns everything
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        arr = b.global_batch(x)
        assert arr.sharding.spec == P("data", None)
        np.testing.assert_allclose(np.asarray(arr), x)
