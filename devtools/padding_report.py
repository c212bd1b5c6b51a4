"""Measure padding overhead (dummy-node/edge fractions) of the BatchLoader.

Round-1 VERDICT weak #5: a single worst-case pad bucket overpads nearly
every batch on heterogeneous datasets. The bucket ladder
(data/datamodule.py BatchLoader num_buckets) sizes most batches near the
batch-sum mean; this script reports the measured dummy fractions on the
reference example set (n=100 elasticity crystals).

Usage: python devtools/padding_report.py [dataset.json] [batch_size]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from matten_tpu.data.dataset import TensorDatasetConfig, load_tensor_dataset
from matten_tpu.data.datamodule import BatchLoader
from matten_tpu.nn.embedding import atomic_number_map


def report(graphs, batch_size, num_buckets, batch_by_size=False, epochs=8):
    species = sorted({int(z) for g in graphs for z in g.atomic_numbers})
    loader = BatchLoader(
        graphs,
        batch_size=batch_size,
        species_map=atomic_number_map(tuple(species)),
        shuffle=True,
        num_buckets=num_buckets,
        batch_by_size=batch_by_size,
    )
    tot_e = pad_e = tot_n = pad_n = 0
    for ep in range(epochs):
        loader.set_epoch(ep)
        for data, _ in loader:
            pad_e += data["edge_mask"].shape[0]
            tot_e += int(data["edge_mask"].sum())
            pad_n += data["node_mask"].shape[0]
            tot_n += int(data["node_mask"].sum())
    return dict(
        buckets=[(p.num_nodes, p.num_edges) for p in loader.pads],
        dummy_edge_frac=1 - tot_e / pad_e,
        dummy_node_frac=1 - tot_n / pad_n,
    )


def report_ring(graphs, batch_size, sg=4, epochs=4):
    """Ring-layout slot stats: per-slot capacity vs the old conservative
    2E/Sg bound, and the resulting dummy-edge fraction."""
    species = sorted({int(z) for g in graphs for z in g.atomic_numbers})
    loader = BatchLoader(
        graphs,
        batch_size=batch_size,
        species_map=atomic_number_map(tuple(species)),
        shuffle=True,
        num_edge_shards=sg,
        node_shard=True,
        ring=True,
    )
    tot_e = pad_e = old_pad_e = 0
    caps, olds = [], []
    for ep in range(epochs):
        loader.set_epoch(ep)
        for data, _ in loader:
            pad_e += data["edge_mask"].size
            tot_e += int(data["edge_mask"].sum())
            caps.append(data["edge_index"].shape[-1] // sg)
            # the pre-balancing slot capacity was 2 * E_pad / Sg; each of
            # the Sg shards holds Sg slots -> old total = Sg*Sg*cap2_old
            e_pre, _ = loader._last_ring_stats
            olds.append(2 * e_pre // sg)
            old_pad_e += loader.num_shards * sg * sg * (2 * e_pre // sg)
    return dict(
        slot_caps=sorted(set(caps)),
        old_slot_caps=sorted(set(olds)),
        dummy_edge_frac=1 - tot_e / pad_e,
        old_dummy_edge_frac=1 - tot_e / old_pad_e,
    )


def main():
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/datasets/example_crystal_elasticity_tensor_n100.json"
    )
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    graphs, _ = load_tensor_dataset(path, TensorDatasetConfig(r_cut=5.0))
    for nb, bbs in ((1, False), (3, False), (4, True)):
        r = report(graphs, batch_size, nb, batch_by_size=bbs)
        print(
            f"num_buckets={nb} batch_by_size={bbs}: buckets={r['buckets']} "
            f"dummy edges {100 * r['dummy_edge_frac']:.1f}% "
            f"dummy nodes {100 * r['dummy_node_frac']:.1f}%"
        )
    rr = report_ring(graphs, batch_size)
    print(
        f"ring layout (Sg=4): slot caps {rr['slot_caps']} "
        f"(old conservative bound {rr['old_slot_caps']}) "
        f"dummy edges {100 * rr['dummy_edge_frac']:.1f}% "
        f"(old {100 * rr['old_dummy_edge_frac']:.1f}%)"
    )


if __name__ == "__main__":
    main()
