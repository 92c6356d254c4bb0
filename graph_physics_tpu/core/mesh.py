"""Host-side mesh → graph construction (numpy / scipy; runs in the loader).

Covers the reference's graph-building layer with static-shape outputs:

  * ``faces_to_edges`` — undirected unique edges from triangle/tet cells
    (behavioral spec: graphphysics FaceToEdge transform + the cleaner
    jraphphysics/utils/jax_graph.py:86-128 formulation).
  * ``k_hop_edges`` — sparse boolean adjacency powers
    (spec: graphphysics/utils/torch_graph.py:14-54; the dense O(N^2) jraph
    variant is deliberately NOT reproduced).
  * ``edge_features`` — [Δpos, ‖Δpos‖] per directed edge (spec:
    T.Cartesian + T.Distance composition, graphphysics/dataset/
    preprocessing.py:16-46 — note the reference stores *raw* (non-norm'd)
    deltas: Cartesian(norm=False), Distance(norm=False)).
  * ``radius_world_edges`` — world-edge discovery by radius search between
    OBSTACLE/HANDLE and NORMAL nodes (spec: preprocessing.py:92-140).
  * ``build_mesh_graph`` — assemble a padded :class:`MeshGraph`.

Everything here is intentionally host-side: connectivity changes at most
once per frame and is cached per trajectory, so it never sits on the jit
hot path. Device-side counterparts (for inside-scan rollout) live in
``graph_physics_tpu.ops``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.spatial import cKDTree

from graph_physics_tpu.core import padding
from graph_physics_tpu.core.graph import PAD_NODE_TYPE, MeshGraph
from graph_physics_tpu.core.nodetype import NodeType


# ----------------------------------------------------------------------
# connectivity
# ----------------------------------------------------------------------

def tetra_to_faces(tets: np.ndarray) -> np.ndarray:
    """Expand [C,4] tetrahedra into their 4 triangular faces [4C,3].

    Spec: graphphysics/utils/torch_graph.py:194-210 (tet → 4 faces).
    """
    t = np.asarray(tets)
    return np.concatenate(
        [t[:, [0, 1, 2]], t[:, [0, 1, 3]], t[:, [0, 2, 3]], t[:, [1, 2, 3]]], axis=0
    )


def faces_to_edges(faces: np.ndarray, num_nodes: int) -> np.ndarray:
    """Unique undirected edges (both directions) from simplex cells.

    Accepts [C,3] triangles or [C,4] tets (tets are expanded to faces
    first). Returns int32 [2, E] with E even (both directions present) and
    no self-loops, deterministically sorted.
    """
    faces = np.asarray(faces, dtype=np.int64)
    if faces.shape[-1] not in (3, 4):
        raise ValueError(f"cells must be [C,3] or [C,4], got {faces.shape}")
    # native C++ path (graph_physics_tpu/native) — same output order
    from graph_physics_tpu import native

    out = native.faces_to_edges(faces, num_nodes)
    if out is not None:
        return out.astype(np.int32)
    if faces.shape[-1] == 4:
        faces = tetra_to_faces(faces)
    # all 3 undirected edges of each triangle
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    key = lo * num_nodes + hi
    _, first = np.unique(key, return_index=True)
    lo, hi = lo[first], hi[first]
    send = np.concatenate([lo, hi])
    recv = np.concatenate([hi, lo])
    order = np.lexsort((send, recv))
    return np.stack([send[order], recv[order]]).astype(np.int32)


def k_hop_edges(edge_index: np.ndarray, num_nodes: int, k: int) -> np.ndarray:
    """k-hop neighbourhood edges via sparse boolean matrix powers.

    Spec: graphphysics/utils/torch_graph.py:14-54 (sparse adjacency powers,
    self-loops removed). Host-side; results are cached per trajectory by
    the dataset layer.
    """
    if k <= 1:
        return edge_index.astype(np.int32)
    from graph_physics_tpu import native

    out = native.k_hop(edge_index, num_nodes, k)
    if out is not None:
        return out.astype(np.int32)
    send, recv = edge_index
    a = sp.csr_matrix(
        (np.ones(len(send), dtype=bool), (send, recv)), shape=(num_nodes, num_nodes)
    )
    acc = a.copy()
    p = a.copy()
    for _ in range(k - 1):
        p = (p @ a).astype(bool)
        acc = (acc + p).astype(bool)
    acc.setdiag(False)
    acc.eliminate_zeros()
    coo = acc.tocoo()
    order = np.lexsort((coo.row, coo.col))
    return np.stack([coo.row[order], coo.col[order]]).astype(np.int32)


# ----------------------------------------------------------------------
# edge features
# ----------------------------------------------------------------------

def edge_features(pos: np.ndarray, senders: np.ndarray, receivers: np.ndarray) -> np.ndarray:
    """Per-edge [Δpos, ‖Δpos‖] features (Δ = pos[send] − pos[recv]).

    Matches the reference's Cartesian(norm=False)+Distance(norm=False)
    composition (preprocessing.py:16-46): edge_attr[:, :D] = pos_src −
    pos_dst, last column = euclidean norm.
    """
    d = pos[senders] - pos[receivers]
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    return np.concatenate([d, n], axis=-1).astype(np.float32)


def radius_world_edges(
    world_pos: np.ndarray,
    node_type: np.ndarray,
    radius: float,
    exclude_edges: Optional[np.ndarray] = None,
    exclude_keys: Optional[np.ndarray] = None,
) -> np.ndarray:
    """World edges: radius pairs between deformable and obstacle nodes.

    Spec: graphphysics/dataset/preprocessing.py:92-140 — cKDTree radius
    pairs, keep only pairs connecting {OBSTACLE, HANDLE} with NORMAL nodes,
    drop pairs already in the mesh edge set, return both directions.
    """
    from graph_physics_tpu import native

    t = np.asarray(node_type).reshape(-1)
    obs_ids = np.where((t == NodeType.OBSTACLE) | (t == NodeType.HANDLE))[0]
    nrm_ids = np.where(t == NodeType.NORMAL)[0]
    wp = np.asarray(world_pos, np.float32)

    # cross-group grid search: only {OBSTACLE, HANDLE} x NORMAL pairs
    # survive the type filter, so searching the two groups against each
    # other skips the dominant same-group candidate volume (2.3x loader
    # speedup on the plate workload vs the full-mesh pass + filter)
    a = b = None
    if obs_ids.size and nrm_ids.size:
        small, large = (obs_ids, nrm_ids) if obs_ids.size <= nrm_ids.size \
            else (nrm_ids, obs_ids)
        cross = native.radius_cross_pairs(wp[small], wp[large], radius)
        if cross is not None:
            a, b = small[cross[:, 0]], large[cross[:, 1]]
    elif not obs_ids.size or not nrm_ids.size:
        return np.zeros((2, 0), dtype=np.int32)

    if a is None:  # native lib unavailable: full search + type filter
        pairs = native.radius_pairs(wp, radius)
        if pairs is None:
            tree = cKDTree(world_pos)
            pairs = tree.query_pairs(radius, output_type="ndarray")
        if len(pairs) == 0:
            return np.zeros((2, 0), dtype=np.int32)
        a, b = pairs[:, 0], pairs[:, 1]
        obs = lambda x: (t[x] == NodeType.OBSTACLE) | (t[x] == NodeType.HANDLE)
        nrm = lambda x: t[x] == NodeType.NORMAL
        keep = (obs(a) & nrm(b)) | (nrm(a) & obs(b))
        a, b = a[keep], b[keep]

    if len(a) == 0:
        return np.zeros((2, 0), dtype=np.int32)
    send = np.concatenate([a, b])
    recv = np.concatenate([b, a])
    existing = exclude_keys
    if existing is None and exclude_edges is not None and exclude_edges.size:
        existing = world_edge_exclude_keys(exclude_edges, world_pos.shape[0])
    if existing is not None and existing.size:
        n = int(max(world_pos.shape[0], 1))
        key = send.astype(np.int64) * n + recv
        idx = np.searchsorted(existing, key)
        idx = np.minimum(idx, len(existing) - 1)
        keep = existing[idx] != key
        send, recv = send[keep], recv[keep]
    return np.stack([send, recv]).astype(np.int32)


def world_edge_exclude_keys(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Sorted s*n+r keys of an edge set, for ``radius_world_edges``'s
    ``exclude_keys`` — mesh topology is frame-static, so per-frame
    callers (the world-edge sidecar) compute this once per trajectory."""
    n = int(max(num_nodes, 1))
    return np.unique(
        np.asarray(edge_index[0], np.int64) * n + edge_index[1]
    )


def budget_world_pairs(
    wedges: np.ndarray, world_pos: np.ndarray, budget: int
) -> np.ndarray:
    """Rank-fair, SYMMETRIC world-edge budgeting for the host path.

    When the discovered world edges exceed ``budget`` directed slots, trim
    on undirected *pairs* — both directions of a pair are kept or dropped
    together, preserving the reference's ``to_undirected`` invariant
    (graphphysics/dataset/preprocessing.py:114-140) — and rank pairs
    per-endpoint by distance (rank-major, distance-minor, matching the
    on-device scoring in ops/knn.radius_edges) so overflow drops each
    node's farthest partners first rather than whole regions in
    generation order. Warns with the drop count (no silent caps).
    """
    if wedges.shape[1] <= budget:
        return wedges
    import warnings

    s, r = np.asarray(wedges[0], np.int64), np.asarray(wedges[1], np.int64)
    u, v = np.minimum(s, r), np.maximum(s, r)
    pairs = np.unique(np.stack([u, v], axis=1), axis=0)
    p = pairs.shape[0]
    keep_n = budget // 2
    d = np.linalg.norm(
        np.asarray(world_pos, np.float64)[pairs[:, 0]]
        - np.asarray(world_pos, np.float64)[pairs[:, 1]],
        axis=1,
    )

    # per-NODE distance ranks over the UNION of a node's appearances in
    # both pair columns (a node can be the min id of some pairs and the
    # max id of others; ranking the columns separately would split its
    # partner list into two independent sequences and break fairness)
    endpoint = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dd = np.concatenate([d, d])
    order = np.lexsort((dd, endpoint))
    grp = np.r_[True, endpoint[order][1:] != endpoint[order][:-1]]
    starts = np.flatnonzero(grp)
    sizes = np.diff(np.r_[starts, 2 * p])
    within = np.arange(2 * p) - np.repeat(starts, sizes)
    rk = np.empty(2 * p, np.int64)
    rk[order] = within
    rank = np.maximum(rk[:p], rk[p:])
    sel = np.lexsort((d, rank))[:keep_n]
    kept = pairs[sel]
    warnings.warn(
        f"world-edge budget exceeded: kept {keep_n} of {p} pairs "
        f"({2 * (p - keep_n)} directed edges dropped rank-fairly; raise "
        "world_pos_parameters.edge_budget to keep all)",
        stacklevel=2,
    )
    return np.concatenate(
        [kept.T, kept.T[::-1]], axis=1
    ).astype(np.int32)


# ----------------------------------------------------------------------
# assembly
# ----------------------------------------------------------------------

def build_mesh_graph(
    x: np.ndarray,
    pos: np.ndarray,
    node_type: np.ndarray,
    edge_index: np.ndarray,
    y: Optional[np.ndarray] = None,
    prev: Optional[np.ndarray] = None,
    next_data: Optional[np.ndarray] = None,
    faces: Optional[np.ndarray] = None,
    n_pad: Optional[int] = None,
    e_pad: Optional[int] = None,
    c_pad: Optional[int] = None,
    with_edge_features: bool = True,
    traj_index: int = 0,
    time: float = 0.0,
) -> MeshGraph:
    """Assemble a padded host-side :class:`MeshGraph` (numpy arrays).

    Padding rows: x/pos/y zero, node_type = PAD_NODE_TYPE, edges point at
    node 0 with edge_mask False.
    """
    n = x.shape[0]
    e = edge_index.shape[1]
    n_pad = n_pad or padding.bucket_size(n)
    e_pad = e_pad or padding.bucket_size(e)

    # Receiver-sorted edge invariant: the fused TPU GraphNetBlock kernel
    # (ops/fused_gnblock.py via ops/tiling.py) requires edges sorted by
    # receiver with
    # padding edges last (they point at node n_pad-1 and are masked).
    # Stable sort keeps valid edges ahead of padding on equal keys, so the
    # "valid edges are a prefix" property is preserved.
    order = np.argsort(edge_index[1], kind="stable")
    edge_index = edge_index[:, order]

    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[:n] = True
    edge_mask = np.zeros(e_pad, dtype=bool)
    edge_mask[:e] = True

    nt = padding.pad_axis(
        np.asarray(node_type, dtype=np.int32).reshape(-1), n_pad, fill=PAD_NODE_TYPE
    )
    ea = None
    if with_edge_features:
        ea = edge_features(np.asarray(pos), edge_index[0], edge_index[1])
        ea = padding.pad_axis(ea, e_pad)

    fc, fm = None, None
    if faces is not None:
        faces = np.asarray(faces, dtype=np.int32)
        c_pad = c_pad or padding.bucket_size(faces.shape[0])
        fm = np.zeros(c_pad, dtype=bool)
        fm[: faces.shape[0]] = True
        fc = padding.pad_axis(faces, c_pad)

    pad = lambda a: None if a is None else padding.pad_axis(
        np.asarray(a, dtype=np.float32), n_pad
    )
    return MeshGraph(
        x=pad(x),
        pos=pad(pos),
        node_type=nt,
        node_mask=node_mask,
        senders=padding.pad_axis(edge_index[0].astype(np.int32), e_pad),
        receivers=padding.pad_axis(
            edge_index[1].astype(np.int32), e_pad, fill=n_pad - 1
        ),
        edge_mask=edge_mask,
        edge_attr=ea,
        y=pad(y),
        prev=pad(prev),
        next_data=pad(next_data),
        faces=fc,
        face_mask=fm,
        n_node=np.int32(n),
        n_edge=np.int32(e),
        traj_index=np.int32(traj_index),
        time=np.float32(time),
    )
