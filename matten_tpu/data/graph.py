"""Crystal graphs and padded static-shape batching.

Replaces the reference's PyG DataPoint/Crystal/Batch machinery (reference C3
+ N10, data/data.py:17-262): graphs are plain numpy records on the host;
batching concatenates them and pads nodes/edges/graphs to static bucket
shapes so XLA compiles once per bucket. Dummy edges connect a padded node to
itself; dummy nodes/graphs are excluded from statistics and losses via
boolean masks (SURVEY.md §7 hard part 3).

Edges are sorted by destination node after batching so segment reductions
are segment-local (the layout the Pallas aggregation kernel assumes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from matten_tpu.data import keys as K
from matten_tpu.data.neighborlist import periodic_radius_graph
from matten_tpu.data.structure import Structure

__all__ = ["CrystalGraph", "PadSpec", "collate_graphs", "pad_spec_for"]


@dataclass
class CrystalGraph:
    """One crystal as a graph (host-side numpy, float64 geometry)."""

    pos: np.ndarray  # [N, 3] cartesian
    edge_index: np.ndarray  # [2, E]
    edge_cell_shift: np.ndarray  # [E, 3]
    cell: np.ndarray  # [3, 3]
    num_neigh: np.ndarray  # [N]
    atomic_numbers: np.ndarray  # [N]
    x: Dict[str, np.ndarray] = field(default_factory=dict)  # extra inputs
    y: Dict[str, np.ndarray] = field(default_factory=dict)  # targets

    @property
    def num_nodes(self) -> int:
        return len(self.pos)

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]

    @classmethod
    def from_structure(
        cls,
        struct: Structure,
        r_cut: float,
        x: Optional[Dict[str, np.ndarray]] = None,
        y: Optional[Dict[str, np.ndarray]] = None,
    ) -> "CrystalGraph":
        """Mirror of Crystal.from_pymatgen (reference data/data.py:262-283)."""
        pos = struct.cart_coords
        edge_index, shifts, num_neigh = periodic_radius_graph(
            pos, struct.lattice, r_cut, pbc=struct.pbc
        )
        return cls(
            pos=pos,
            edge_index=edge_index,
            edge_cell_shift=shifts,
            cell=struct.lattice,
            num_neigh=num_neigh,
            atomic_numbers=struct.atomic_numbers.copy(),
            x=dict(x or {}),
            y=dict(y or {}),
        )


@dataclass(frozen=True)
class PadSpec:
    num_nodes: int
    num_edges: int
    num_graphs: int


def _round_bucket(n: int, multiple: int) -> int:
    return int(np.ceil((n + 1) / multiple)) * multiple


def pad_spec_for(
    graphs: Sequence[CrystalGraph],
    node_multiple: int = 64,
    edge_multiple: int = 512,
    graph_multiple: int = 8,
) -> PadSpec:
    """Bucketed pad sizes for a batch (always leaves >=1 dummy slot)."""
    n = sum(g.num_nodes for g in graphs)
    e = sum(g.num_edges for g in graphs)
    return PadSpec(
        _round_bucket(n, node_multiple),
        _round_bucket(e, edge_multiple),
        _round_bucket(len(graphs), graph_multiple),
    )


def collate_graphs(
    graphs: Sequence[CrystalGraph],
    pad: PadSpec,
    species_map: Optional[np.ndarray] = None,
    dtype=np.float32,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Concatenate + pad a list of graphs into a static-shape batch.

    Returns (data, targets):
      data — the model input dict (keys.py fields + masks),
      targets — per-graph fields stacked to [G_pad, ...], per-node fields to
      [N_pad, ...] (classified by leading-dimension == num_nodes).

    `species_map` is the Z -> species-index lookup from
    nn.embedding.atomic_number_map; when given, species_index is precomputed
    host-side.
    """
    ng = len(graphs)
    n_tot = sum(g.num_nodes for g in graphs)
    e_tot = sum(g.num_edges for g in graphs)
    if pad.num_nodes <= n_tot:
        raise ValueError(f"node pad {pad.num_nodes} <= total nodes {n_tot}")
    if pad.num_edges < e_tot:
        raise ValueError(f"edge pad {pad.num_edges} < total edges {e_tot}")
    if pad.num_graphs < ng:
        raise ValueError(f"graph pad {pad.num_graphs} < num graphs {ng}")

    pos = np.zeros((pad.num_nodes, 3), dtype=dtype)
    atomic_numbers = np.zeros(pad.num_nodes, dtype=np.int32)
    num_neigh = np.zeros(pad.num_nodes, dtype=dtype)
    batch = np.full(pad.num_nodes, pad.num_graphs - 1, dtype=np.int32)
    node_mask = np.zeros(pad.num_nodes, dtype=bool)

    edge_index = np.full((2, pad.num_edges), pad.num_nodes - 1, dtype=np.int32)
    edge_cell_shift = np.zeros((pad.num_edges, 3), dtype=dtype)
    edge_mask = np.zeros(pad.num_edges, dtype=bool)

    cell = np.tile(np.eye(3, dtype=dtype), (pad.num_graphs, 1, 1))
    graph_mask = np.zeros(pad.num_graphs, dtype=bool)

    node_off = 0
    edge_off = 0
    for gi, g in enumerate(graphs):
        n, e = g.num_nodes, g.num_edges
        pos[node_off : node_off + n] = g.pos
        atomic_numbers[node_off : node_off + n] = g.atomic_numbers
        num_neigh[node_off : node_off + n] = g.num_neigh
        batch[node_off : node_off + n] = gi
        node_mask[node_off : node_off + n] = True
        edge_index[:, edge_off : edge_off + e] = g.edge_index + node_off
        edge_cell_shift[edge_off : edge_off + e] = g.edge_cell_shift
        edge_mask[edge_off : edge_off + e] = True
        cell[gi] = g.cell
        graph_mask[gi] = True
        node_off += n
        edge_off += e

    # sort edges by destination for segment-local aggregation
    order = np.argsort(edge_index[1], kind="stable")
    edge_index = edge_index[:, order]
    edge_cell_shift = edge_cell_shift[order]
    edge_mask = edge_mask[order]

    data = {
        K.POSITIONS: pos,
        K.ATOMIC_NUMBERS: atomic_numbers,
        K.NUM_NEIGH: num_neigh,
        K.BATCH: batch,
        K.NODE_MASK: node_mask,
        K.EDGE_INDEX: edge_index,
        K.EDGE_CELL_SHIFT: edge_cell_shift,
        K.EDGE_MASK: edge_mask,
        K.CELL: cell,
        K.GRAPH_MASK: graph_mask,
    }
    if species_map is not None:
        z = np.clip(atomic_numbers, 0, len(species_map) - 1)
        data[K.SPECIES_INDEX] = species_map[z].astype(np.int32)

    # extra per-node inputs (atom_feats)
    for key in graphs[0].x:
        vals = [np.asarray(g.x[key]) for g in graphs]
        if vals[0].ndim >= 1 and vals[0].shape[0] == graphs[0].num_nodes:
            stacked = np.concatenate(vals, axis=0)
            out = np.zeros((pad.num_nodes,) + stacked.shape[1:], dtype=dtype)
            out[:n_tot] = stacked
        else:
            stacked = np.concatenate([v.reshape(1, -1) for v in vals], axis=0)
            out = np.zeros((pad.num_graphs,) + stacked.shape[1:], dtype=dtype)
            out[:ng] = stacked
        data[key] = out

    # targets
    targets: Dict[str, np.ndarray] = {}
    for key in graphs[0].y:
        vals = [np.asarray(g.y[key]) for g in graphs]
        per_node = vals[0].ndim >= 1 and vals[0].shape[0] == graphs[0].num_nodes
        # disambiguate single-node graphs with [1, D] graph targets: treat
        # explicit 2D [1, D] rows as per-graph unless all graphs match nodes
        if per_node and not all(
            v.shape[0] == g.num_nodes for v, g in zip(vals, graphs)
        ):
            per_node = False
        if per_node:
            stacked = np.concatenate(vals, axis=0)
            out = np.zeros((pad.num_nodes,) + stacked.shape[1:], dtype=stacked.dtype if stacked.dtype == bool else dtype)
            out[:n_tot] = stacked
        else:
            stacked = np.concatenate([v.reshape(1, -1) for v in vals], axis=0)
            out = np.zeros((pad.num_graphs,) + stacked.shape[1:], dtype=dtype)
            out[:ng] = stacked
        targets[key] = out
    return data, targets
