"""Multi-host (multi-slice / DCN) execution layer.

No reference counterpart (the reference is single-process single-GPU —
SURVEY.md §2.2); this is the scale-out half of the TPU-native backend:
`jax.distributed` initialization, a global mesh whose data axis spans hosts
(collectives ride ICI within a slice and DCN across slices), and per-host
batch assembly so each process feeds only its addressable shard.

Single-host is the degenerate case: every helper is a no-op passthrough, so
the same training script runs unchanged from 1 chip to a multi-slice pod.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dvc_tpu.config import MeshConfig
from dvc_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True when running multi-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", 0)))
    return jax.process_count() > 1


def global_mesh(cfg: MeshConfig = MeshConfig()) -> Mesh:
    """Mesh over ALL devices of ALL processes (jax.devices() is global)."""
    return make_mesh(cfg, jax.devices())


@dataclass
class PerHostBatcher:
    """Feed a globally-sharded batch from per-host numpy data.

    Each host materializes only its slice of the global batch;
    `jax.make_array_from_process_local_data` assembles the global Array with
    the data-axis NamedSharding, so no host ever holds the full batch.
    """

    mesh: Mesh

    def global_batch(self, local: np.ndarray, ndim: int | None = None) -> jax.Array:
        ndim = ndim if ndim is not None else local.ndim
        sharding = NamedSharding(
            self.mesh, P(self.mesh.axis_names[0], *([None] * (ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(local, sharding)
        return jax.make_array_from_process_local_data(sharding, local)

    def local_batch_size(self, global_batch_size: int) -> int:
        n = jax.process_count()
        assert global_batch_size % n == 0, \
            f"global batch {global_batch_size} must divide {n} processes"
        return global_batch_size // n


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
