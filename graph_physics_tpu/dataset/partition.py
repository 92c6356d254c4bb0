"""Mesh partitioning for sub-mesh training (the METIS replacement).

Spec: the reference partitions large meshes with METIS via PyG ClusterData
(torch_graph.py:108-135), caches per-trajectory node-id lists
(dataset.py:244-327) and trains Cluster-GCN style on independent
submeshes; ``--num_partitions`` / adaptive ``--max_nodes_per_partition``
(train.py:62-68).

TPU re-design: recursive coordinate bisection (RCB) on node positions —
no external C library, deterministic, balanced parts (within one node),
and geometric locality on meshes comparable to METIS for this use case.
Parts map naturally to shape buckets (each part padded to one bucket) and,
for the distributed upgrade, to per-chip shards
(graph_physics_tpu/parallel).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from graph_physics_tpu.core import padding


def rcb_partition(pos: np.ndarray, num_parts: int) -> List[np.ndarray]:
    """Recursive coordinate bisection into ``num_parts`` balanced parts.

    Splits along the widest axis at the size-proportional quantile so any
    part count (not just powers of two) stays balanced. Returns a list of
    sorted node-id arrays.
    """
    n = pos.shape[0]
    if num_parts <= 1 or n <= 1:
        return [np.arange(n)]

    from graph_physics_tpu import native

    labels = native.rcb_labels(np.asarray(pos, np.float32), num_parts)
    if labels is not None:
        return [np.sort(np.where(labels == p)[0]) for p in range(num_parts)]

    def rec(ids: np.ndarray, parts: int) -> List[np.ndarray]:
        if parts == 1 or len(ids) <= 1:
            return [np.sort(ids)]
        p = pos[ids]
        widths = p.max(axis=0) - p.min(axis=0)
        axis = int(np.argmax(widths))
        left_parts = parts // 2
        frac = left_parts / parts
        order = np.argsort(p[:, axis], kind="stable")
        cut = int(round(len(ids) * frac))
        left = ids[order[:cut]]
        right = ids[order[cut:]]
        return rec(left, left_parts) + rec(right, parts - left_parts)

    return rec(np.arange(n), num_parts)


def num_parts_for(
    num_nodes: int,
    num_partitions: Optional[int],
    max_nodes_per_partition: Optional[int],
) -> int:
    """Adaptive part count (spec: dataset.py:135-141)."""
    if max_nodes_per_partition:
        return max(int(np.ceil(num_nodes / max_nodes_per_partition)), 1)
    return max(int(num_partitions or 1), 1)


def extract_subgraph(
    node_ids: np.ndarray,
    edge_index: np.ndarray,
    num_nodes: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Relabelled intra-part edges (spec: dataset.py:244-303 subgraph).

    Returns (local_edge_index [2, E_p], global→local map [N] with -1 for
    out-of-part nodes).
    """
    mapping = np.full(num_nodes, -1, dtype=np.int64)
    mapping[node_ids] = np.arange(len(node_ids))
    s = mapping[edge_index[0]]
    r = mapping[edge_index[1]]
    keep = (s >= 0) & (r >= 0)
    return np.stack([s[keep], r[keep]]).astype(np.int32), mapping


class PartitionCache:
    """Per-trajectory partition + subgraph cache (spec: dataset.py:304-327)."""

    def __init__(self, num_partitions: Optional[int], max_nodes: Optional[int]):
        self.num_partitions = num_partitions
        self.max_nodes = max_nodes
        self._cache: Dict = {}

    def parts_for(self, key, pos: np.ndarray, edge_index: np.ndarray):
        if key in self._cache:
            return self._cache[key]
        p = num_parts_for(len(pos), self.num_partitions, self.max_nodes)
        parts = rcb_partition(pos, p)
        subs = [extract_subgraph(ids, edge_index, len(pos)) for ids in parts]
        entry = (parts, subs)
        self._cache[key] = entry
        return entry
