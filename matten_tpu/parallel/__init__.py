"""SPMD parallelism: device meshes, data-parallel and edge-partitioned training."""

from matten_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch"]
