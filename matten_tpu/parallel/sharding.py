"""Mesh construction and batch sharding for SPMD training.

Replaces the reference's delegation to Lightning DDP / torch.distributed /
NCCL (reference N12, SURVEY.md §5.8) with jax.sharding over a device mesh:

  * data axis — graphs (and their nodes/edges, which are collated into
    device-aligned blocks) are sharded; gradients are reduced by XLA
    collectives emitted from the sharding specs (the NCCL-allreduce analog).
  * graph axis — edge partitioning of large batched graphs with
    boundary-feature exchange (matten_tpu.parallel.edge_partition).

Batches for data parallelism are collated per shard and stacked on a
leading axis of size mesh.shape[data_axis]; each shard's edge_index refers
only to its own node block, so all message passing is shard-local and the
only cross-device traffic is the gradient/batch-stat reduction.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch"]


def make_mesh(
    n_data: Optional[int] = None,
    n_graph: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('data', 'graph') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_graph
    need = n_data * n_graph
    assert need <= n, f"{n_data}x{n_graph} > {n} devices"
    arr = np.asarray(devices[:need]).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def shard_batch(
    mesh: Mesh, axis: str, data: Dict, targets: Dict, scan: bool = False
) -> Tuple[Dict, Dict]:
    """Place a stacked per-shard batch (leading dim = shard count) on the mesh.

    `scan=True` for scan_steps stacks [K, S, ...]: the shard axis is dim 1.
    """
    sharding = NamedSharding(mesh, P(None, axis) if scan else P(axis))
    put = lambda x: jax.device_put(x, sharding)
    return (
        {k: put(v) for k, v in data.items()},
        {k: put(v) for k, v in targets.items()},
    )
