from dvc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    zero_sharding_for,
    shard_batch,
)
