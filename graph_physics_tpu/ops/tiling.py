"""Host-side edge tiling for the fused GraphNetBlock kernel.

The fused Pallas message-passing kernel (:mod:`graph_physics_tpu.ops.
fused_gnblock`) replaces XLA gather/scatter with windowed one-hot matmuls
on the MXU. That requires a *blocked CSR* edge layout, built once per
topology on the host:

  * nodes are grouped into blocks of ``node_block`` (128) rows;
  * edges (already receiver-sorted — core/graph.py invariant) are grouped
    by the node block of their receiver, and every group is padded to the
    same static ``edges_per_block`` count;
  * each group's senders are covered by ``window_blocks`` ARBITRARY
    (not necessarily contiguous) ``window_unit``-row units, selected per
    group by the scalar-prefetch array ``win_start[g, k]`` — the kernel
    reads window blocks through prefetch-indexed BlockSpec maps anyway,
    so arbitrary units cost nothing extra. This makes real irregular
    meshes tileable: a locality-preserving order (reverse Cuthill–McKee,
    :func:`rcm_order`) concentrates a 128-receiver block's senders in a
    handful of 64-row units even when the global bandwidth is large
    (measured: the reference's 27k-node airfoil fixture has RCM
    bandwidth 970 — hopeless for a contiguous window — but ≤16 touched
    units per group).

The kernel then runs one grid step per (lane-chunk, node-block):
sender gather = one-hot([edges, window]) @ x_window, receiver scatter =
one-hot([nodes, edges]) @ messages — both plain MXU contractions with
static shapes.

Spec lineage: this accelerates the same contract as the reference's
torch-scatter hot loop (graphphysics/models/layers.py:1015-1102); the
blocked layout is this framework's own TPU design (SURVEY.md §7 item 2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

#: sentinel local index meaning "padded edge" — one past the last window
#: row, so iota-compare one-hots yield an all-zero row/column for it.
def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True, eq=False)  # identity eq: safe as a linen attribute
class EdgeTiling:
    """Blocked-CSR edge layout (all numpy, host-built; static per topology).

    Shapes: G = number of node blocks, Emax = padded edges per block.
    """

    #: [G * Emax] int32 — position of each slot's edge in the ORIGINAL
    #: (receiver-sorted) edge array; -1 on padded slots.
    perm: np.ndarray
    #: [G, Emax] int32 — sender index local to the group's CONCATENATED
    #: window units (= unit_rank·window_unit + row offset); sentinel
    #: (= window rows) on padded slots.
    sidx: np.ndarray
    #: [G, Emax] int32 — receiver index local to the group's node block;
    #: sentinel (= node_block) on padded slots.
    ridx: np.ndarray
    #: [G, window_blocks] int32 — the window UNITS each group reads
    #: (arbitrary, ascending; unused slots repeat the first unit).
    win_start: np.ndarray
    node_block: int
    window_blocks: int
    edges_per_block: int
    num_nodes: int  # padded node count (multiple of node_block)
    #: rows per window block. Windows are aligned/advanced at this
    #: granularity (win_start counts window_units, windows span
    #: window_blocks * window_unit rows). Finer units (64) hug the
    #: adjacency band more tightly than whole node blocks (128): on
    #: banded meshes the sender window shrinks ~33%, cutting every
    #: w_rows-proportional kernel cost (sender gathers, P_s, dxw).
    window_unit: int = 128
    #: optional window-count buckets: ((g_lo, g_hi, wb_b), ...) covering
    #: [0, G) contiguously, each with its own (smaller) window width
    #: wb_b <= window_blocks. Groups must be pre-sorted by touched-unit
    #: count (see plan_wb_buckets); the fused kernels then dispatch one
    #: pallas_call per bucket so low-window groups stop paying the global
    #: max wb in window DMA and one-hot gather flops. None = single
    #: bucket (the default dispatch).
    buckets: Optional[Tuple[Tuple[int, int, int], ...]] = None

    @property
    def num_groups(self) -> int:
        return self.win_start.shape[0]

    @property
    def window_rows(self) -> int:
        return self.window_blocks * self.window_unit

    def expand_edges(self, edge_vals: np.ndarray, fill=0):
        """Re-order a per-edge array [E, ...] into the blocked layout
        [G*Emax, ...] (padded slots get ``fill``)."""
        out_shape = (self.perm.shape[0],) + tuple(edge_vals.shape[1:])
        out = np.full(out_shape, fill, dtype=edge_vals.dtype)
        valid = self.perm >= 0
        out[valid] = edge_vals[self.perm[valid]]
        return out

    def reduce_edges(self, blocked_vals: np.ndarray, num_edges: int) -> np.ndarray:
        """Inverse of :meth:`expand_edges` (host-side, for tests)."""
        out = np.zeros((num_edges,) + tuple(blocked_vals.shape[1:]), blocked_vals.dtype)
        valid = self.perm >= 0
        out[self.perm[valid]] = blocked_vals[valid]
        return out


def apply_to_graph(graph, tiling: EdgeTiling):
    """Convert a MeshGraph to the blocked edge layout (host-side numpy).

    Nodes are padded up to ``tiling.num_nodes`` (multiple of node_block);
    edge arrays are re-ordered into the grouped layout. Padded edge slots
    follow the repo convention (senders 0, receivers N-1, mask False), so
    every mask-aware XLA op still works on the converted graph — the fused
    kernel additionally uses the tiling's local indices.
    """
    n_old = graph.x.shape[0]
    n_new = tiling.num_nodes
    pad_n = n_new - n_old
    gids = np.repeat(np.arange(tiling.num_groups), tiling.edges_per_block)
    valid = tiling.perm >= 0
    new_send = np.zeros(tiling.perm.shape[0], np.int32)
    new_recv = np.full(tiling.perm.shape[0], n_new - 1, np.int32)
    sidx_flat = tiling.sidx.reshape(-1)
    wu = tiling.window_unit
    rank = sidx_flat[valid] // wu
    new_send[valid] = (
        tiling.win_start[gids[valid], rank].astype(np.int64) * wu
        + sidx_flat[valid] % wu
    )
    new_recv[valid] = (
        gids[valid].astype(np.int64) * tiling.node_block
        + tiling.ridx.reshape(-1)[valid]
    )

    def pad_nodes(a, fill=0):
        if a is None or pad_n == 0:
            return a
        a = np.asarray(a)
        if pad_n < 0:  # trim bucket-padding rows
            return a[:n_new]
        pad = np.full((pad_n,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad], axis=0)

    from graph_physics_tpu.core.graph import PAD_NODE_TYPE

    edge_attr = graph.edge_attr
    if edge_attr is not None:
        edge_attr = tiling.expand_edges(np.asarray(edge_attr))
    return graph.replace(
        x=pad_nodes(graph.x),
        pos=pad_nodes(graph.pos),
        node_type=pad_nodes(graph.node_type, PAD_NODE_TYPE),
        node_mask=pad_nodes(graph.node_mask, False),
        senders=new_send,
        receivers=new_recv,
        edge_mask=valid,
        edge_attr=edge_attr,
        y=pad_nodes(graph.y),
        prev=pad_nodes(graph.prev),
        next_data=pad_nodes(graph.next_data),
        deselected=pad_nodes(graph.deselected, False),
        phi=pad_nodes(graph.phi),
        # runtime copies of the blocked-CSR indices: jitted fused steps
        # take them as inputs, so one compile serves every topology of
        # the same shape bucket
        tiling_idx=(
            tiling.win_start.astype(np.int32),
            tiling.sidx.astype(np.int32),
            tiling.ridx.astype(np.int32),
        ),
    )


def apply_to_graph_nk(graph, tiling):
    """Convert a MeshGraph to the uniform-degree (NK) edge layout.

    Mirror of :func:`apply_to_graph` for :class:`ops.fused_edge_attention_nk
    .NKTiling` (or the per-block-K :class:`NKBucketTiling`): nodes pad to
    ``tiling.num_nodes``; edge arrays re-order into the k-major slot
    layout (slot ``k·nb + r`` = receiver r's k-th incoming edge). Padded
    slots follow the repo convention (senders 0, receivers N-1, mask
    False) so mask-aware XLA ops still work; the fused NK kernels
    additionally consume the runtime ``tiling_idx_nk = (win_start,
    sidx...)`` copies attached here (one sidx array per K-bucket).
    """
    from graph_physics_tpu.ops.fused_edge_attention_nk import nk_row_maps

    n_old = graph.x.shape[0]
    n_new = tiling.num_nodes
    pad_n = n_new - n_old
    nb = tiling.node_block
    gids, loc_r, sidx_flat = nk_row_maps(tiling)
    valid = tiling.perm >= 0
    new_send = np.zeros(tiling.perm.shape[0], np.int32)
    new_recv = np.full(tiling.perm.shape[0], n_new - 1, np.int32)
    wu = tiling.window_unit
    rank = np.minimum(sidx_flat[valid] // wu, tiling.window_blocks - 1)
    new_send[valid] = (
        tiling.win_start[gids[valid], rank].astype(np.int64) * wu
        + sidx_flat[valid] % wu
    )
    new_recv[valid] = gids[valid].astype(np.int64) * nb + loc_r[valid]

    def pad_nodes(a, fill=0):
        if a is None or pad_n == 0:
            return a
        a = np.asarray(a)
        if pad_n < 0:
            return a[:n_new]
        pad = np.full((pad_n,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad], axis=0)

    from graph_physics_tpu.core.graph import PAD_NODE_TYPE

    edge_attr = graph.edge_attr
    if edge_attr is not None:
        edge_attr = tiling.expand_edges(np.asarray(edge_attr))
    return graph.replace(
        x=pad_nodes(graph.x),
        pos=pad_nodes(graph.pos),
        node_type=pad_nodes(graph.node_type, PAD_NODE_TYPE),
        node_mask=pad_nodes(graph.node_mask, False),
        senders=new_send,
        receivers=new_recv,
        edge_mask=valid,
        edge_attr=edge_attr,
        y=pad_nodes(graph.y),
        prev=pad_nodes(graph.prev),
        next_data=pad_nodes(graph.next_data),
        deselected=pad_nodes(graph.deselected, False),
        phi=pad_nodes(graph.phi),
        tiling_idx_nk=(
            (tiling.win_start.astype(np.int32),)
            + tuple(sx.astype(np.int32) for sx in tiling.sidx)
            if isinstance(tiling.sidx, tuple)
            else (
                tiling.win_start.astype(np.int32),
                tiling.sidx.astype(np.int32),
            )
        ),
    )


def rcm_order(senders: np.ndarray, receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    """Reverse Cuthill–McKee node permutation (old id -> position given by
    perm; use ``new_id = inv[old_id]``). Returns the permutation array such
    that ``perm[i]`` is the old id placed at new position ``i``.

    Minimizes adjacency bandwidth so sender windows stay narrow. Host-side
    (scipy), run once per topology — the TPU-native analog of the
    reference's reliance on mesh-generator ordering.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    data = np.ones(len(senders), np.int8)
    adj = sp.csr_matrix((data, (senders, receivers)), shape=(num_nodes, num_nodes))
    adj = adj + adj.T
    perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True), np.int64)
    return perm


def build_edge_tiling(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_mask: Optional[np.ndarray] = None,
    node_block: int = 128,
    max_window_blocks: int = 16,
    edge_pad_multiple: int = 16,
    window_unit: int = 64,
    window_blocks_multiple: int = 1,
) -> Optional[EdgeTiling]:
    """Build the blocked-CSR layout, or None when the topology doesn't fit.

    ``None`` is returned when any group's sender window would exceed
    ``max_window_blocks * node_block`` rows (badly-ordered mesh — reorder
    with :func:`rcm_order` first) so callers can fall back to the XLA
    path. Padded edges (``edge_mask`` False) are dropped — they re-enter
    as padded slots of the blocked layout. ``window_unit`` sets the sender
    window granularity (must divide ``node_block``); 64 hugs the adjacency
    band ~33% tighter than 128 on typical meshes.
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e_total = senders.shape[0]
    if edge_mask is not None:
        valid = np.asarray(edge_mask, bool)
    else:
        valid = np.ones(e_total, bool)
    orig_ids = np.nonzero(valid)[0]
    s = senders[orig_ids]
    r = receivers[orig_ids]

    n_pad = _round_up(max(num_nodes, 1), node_block)
    n_groups = n_pad // node_block

    # group edges by receiver block (stable: keeps receiver-sorted order)
    gid = r // node_block
    order = np.argsort(gid, kind="stable")
    s, r, orig_ids, gid = s[order], r[order], orig_ids[order], gid[order]
    counts = np.bincount(gid, minlength=n_groups)
    e_max = int(counts.max()) if counts.size else 0
    e_max = max(_round_up(max(e_max, 1), edge_pad_multiple), edge_pad_multiple)

    # sender windows: the SET of window units each group's senders touch
    # (arbitrary units — the kernel reads them via prefetch-indexed
    # BlockSpec maps, so non-contiguity is free)
    assert node_block % window_unit == 0, (node_block, window_unit)
    offs = np.concatenate([[0], np.cumsum(counts)])
    group_units = []
    for g in range(n_groups):
        seg = s[offs[g] : offs[g + 1]]
        if seg.size == 0:
            group_units.append(np.zeros(1, np.int64))
            continue
        group_units.append(np.unique(seg // window_unit))
    wb = max((len(u) for u in group_units), default=1)
    # quantize wb so near-identical meshes share a shape bucket (the extra
    # window slots re-read the first unit; sentinel sidx keeps them inert)
    wb = min(_round_up(wb, window_blocks_multiple),
             max(n_pad // window_unit, 1))
    if wb * window_unit > max_window_blocks * node_block:
        return None

    win_units = np.zeros((n_groups, wb), np.int64)
    win_rows = wb * window_unit
    perm = np.full(n_groups * e_max, -1, np.int64)
    sidx = np.full((n_groups, e_max), win_rows, np.int64)  # sentinel
    ridx = np.full((n_groups, e_max), node_block, np.int64)  # sentinel
    for g in range(n_groups):
        units = group_units[g]
        win_units[g, : len(units)] = units
        win_units[g, len(units):] = units[0]  # inert padding slots
        k = counts[g]
        if k == 0:
            continue
        sl = slice(offs[g], offs[g + 1])
        perm[g * e_max : g * e_max + k] = orig_ids[sl]
        # local index = rank of the sender's unit within the group's
        # (sorted) unit list, concatenated at window_unit granularity
        rank = np.searchsorted(units, s[sl] // window_unit)
        sidx[g, :k] = rank * window_unit + s[sl] % window_unit
        ridx[g, :k] = r[sl] - g * node_block

    return EdgeTiling(
        perm=perm.astype(np.int32),
        sidx=sidx.astype(np.int32),
        ridx=ridx.astype(np.int32),
        win_start=win_units.astype(np.int32),
        node_block=node_block,
        window_blocks=wb,
        edges_per_block=e_max,
        num_nodes=n_pad,
        window_unit=window_unit,
    )


# ----------------------------------------------------------------------
# window-count bucketing (graded meshes: don't pay the max wb everywhere)
# ----------------------------------------------------------------------

def unit_counts_from_win(win_start: np.ndarray) -> np.ndarray:
    """Per-group count of REAL window units in a ``win_start`` row.

    Real units are strictly ascending by construction; padding slots
    repeat ``units[0]``, so slot k>0 is real iff it exceeds slot k-1.
    Deterministic on the array content alone — the same counts are
    recovered from the runtime ``tiling_idx`` copy of ``win_start``, so
    bucket plans derived at build time and at step-dispatch time agree.
    """
    w = np.asarray(win_start)
    if w.shape[1] == 1:
        return np.ones(w.shape[0], np.int64)
    return 1 + (w[:, 1:] > w[:, :-1]).sum(axis=1).astype(np.int64)


def plan_wb_buckets(
    counts: np.ndarray,
    wb_buckets: int,
    window_blocks_multiple: int = 1,
    min_groups: int = 8,
    wb_cap: Optional[int] = None,
) -> Tuple[Tuple[int, int, int], ...]:
    """Contiguous-segment plan over per-group unit counts.

    Returns ``((g_lo, g_hi, wb_b), ...)`` covering [0, len(counts)),
    minimizing ``sum(len_b * round_up(max_b))`` by dynamic programming
    over contiguous cuts of the GIVEN order (callers sort groups by count
    first — see sort_blocks_for_buckets). Buckets smaller than
    ``min_groups`` are not worth a separate kernel dispatch and are
    rejected during the DP. wb_b is rounded up to
    ``window_blocks_multiple`` so bucket shapes quantize the same way
    tiling shapes do — and clamped to ``wb_cap`` (pass the tiling's
    window_blocks: build_edge_tiling clamps ITS wb to n_pad//window_unit
    after rounding, so an un-capped round-up here could exceed the
    win_start column count and index the prefetch array out of bounds).
    """
    counts = np.asarray(counts, np.int64)
    g = len(counts)
    k = max(1, int(wb_buckets))
    if g == 0 or k == 1:
        wb = int(_round_up(int(counts.max()) if g else 1,
                           window_blocks_multiple))
        if wb_cap is not None:
            wb = min(wb, int(wb_cap))
        return ((0, g, wb),)
    # suffix maxima let segment cost be O(1): max(counts[i:j]) via a
    # sparse table is overkill at G ~ hundreds; precompute max for all
    # (i, j) lazily through running maxima inside the DP loops instead.
    INF = float("inf")

    def ru(v):
        w = int(_round_up(int(v), window_blocks_multiple))
        return w if wb_cap is None else min(w, int(wb_cap))
    # dp[b][j] = min cost of covering [0, j) with b buckets
    dp = [[INF] * (g + 1) for _ in range(k + 1)]
    cut = [[0] * (g + 1) for _ in range(k + 1)]
    dp[0][0] = 0.0
    for b in range(1, k + 1):
        for j in range(1, g + 1):
            m = 0
            best, arg = INF, 0
            # i is the segment start; walk backwards keeping running max
            for i in range(j - 1, -1, -1):
                m = max(m, int(counts[i]))
                seg = j - i
                if seg < min_groups and not (i == 0 and b == 1):
                    continue
                prev = dp[b - 1][i]
                if prev is INF:
                    continue
                c = prev + seg * ru(m)
                if c < best:
                    best, arg = c, i
            dp[b][j], cut[b][j] = best, arg
    # pick the bucket count with the lowest total cost (fewer buckets win
    # ties: each extra bucket is an extra kernel dispatch)
    b_best = min(range(1, k + 1), key=lambda b: (dp[b][g], b))
    bounds = [g]
    b, j = b_best, g
    while j > 0:
        i = cut[b][j]
        bounds.append(i)
        b, j = b - 1, i
    bounds = bounds[::-1]
    out = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi > lo:
            out.append((lo, hi, ru(counts[lo:hi].max())))
    return tuple(out)


def sort_blocks_for_buckets(counts: np.ndarray) -> Optional[np.ndarray]:
    """Block order (new position -> old block id) sorting groups by
    window-unit count, with the LAST block pinned in place.

    The last node block contains the valid/padding boundary; pinning it
    keeps valid nodes a contiguous prefix after the block-level node
    permutation (every other block holds only valid rows). Returns None
    when already sorted (no re-permutation needed).
    """
    counts = np.asarray(counts)
    g = len(counts)
    if g <= 2:
        return None
    order = np.concatenate(
        [np.argsort(counts[: g - 1], kind="stable"), [g - 1]]
    ).astype(np.int64)
    if np.array_equal(order, np.arange(g)):
        return None
    return order


def block_order_to_node_perm(order: np.ndarray, node_block: int,
                             n_valid: int) -> np.ndarray:
    """Expand a block order into a node permutation over the VALID rows
    (old id at new position i = perm[i]) — the format _permute_nodes and
    rcm_order use. Requires the last block pinned (sort_blocks_for_buckets)
    so that every moved block is fully below ``n_valid``."""
    order = np.asarray(order, np.int64)
    perm_full = (order[:, None] * node_block
                 + np.arange(node_block)[None, :]).reshape(-1)
    return perm_full[:n_valid]
