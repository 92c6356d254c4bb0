"""Uniform-degree ("NK") fused edge attention — receiver ops for free.

The blocked-CSR attention kernel (:mod:`ops.fused_edge_attention`) spends
most of its MXU time on one-hot contractions; per backward grid step,
SEVEN of its ~12 contractions exist only to move values between edge rows
and receiver rows (q/g_out/denominator gathers, denominator/dq/softmax
scatters). This kernel removes ALL of them with a layout change instead
of scheduling:

  * every receiver gets exactly K edge slots (K = max in-degree, padded
    with sentinel senders), laid out **k-major**: slot ``k·nb + r`` for a
    receiver r's k-th edge. Receiver-aligned [nb, lanes] tiles are then
    STATIC row slices of the [K·nb, lanes] edge tile:
      - broadcast node→edges = concatenate K copies (row concat),
      - reduce edges→node (softmax denominator, output, dq, softmax
        correction) = Σ of K static slices — pure VPU adds, no Mosaic
        relayout, no one-hot matmuls.
  * only the sender side keeps one-hot contractions (k/v window gathers
    forward, dk/dv window scatters backward) plus the per-head SDDMM
    ones-contractions — 3 forward / 6 backward vs 6 / 12, at a row
    inflation of K·nb / Emax (≈1.1–1.4x on bounded-degree meshes).

Trade-off: K is the MAX in-degree, so degree-skewed graphs inflate rows;
``build_nk_tiling`` returns None when inflation exceeds
``max_row_inflation`` and callers fall back to the blocked-CSR kernel.
Mesh graphs (bounded degree ~7–10) sit squarely in the win region.

Numerics match ops/edge_attention.edge_attention exactly (same masked
softmax contract; padded slots and empty receivers contribute nothing),
which itself replaces the reference's DGL bsddmm/bspmm path
(graphphysics/models/layers.py:493-556).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_physics_tpu.ops.fused_gnblock import LANES, _dot, _dot_t
from graph_physics_tpu.ops.fused_edge_attention import (
    _dh_group_ones,
    _grouped_dot,
)
from graph_physics_tpu.ops.tiling import _round_up


@dataclass(frozen=True, eq=False)
class NKTiling:
    """Uniform-degree blocked layout (host-built, static per topology).

    Shapes: G = node blocks, S = K * node_block slots per block.
    Slot k·nb + r holds receiver (g·nb + r)'s k-th incoming edge.
    """

    #: [G * S] int32 — original edge id per slot; -1 on padding.
    perm: np.ndarray
    #: [G, S] int32 — sender index local to the group's concatenated
    #: window units; sentinel (= window rows) on padded slots.
    sidx: np.ndarray
    #: [G, wb] int32 — window units per group (arbitrary, ascending).
    win_start: np.ndarray
    k_slots: int  # K
    node_block: int
    window_blocks: int
    num_nodes: int  # padded (multiple of node_block)
    window_unit: int = 64

    @property
    def num_groups(self) -> int:
        return self.num_nodes // self.node_block

    @property
    def slots(self) -> int:
        return self.k_slots * self.node_block

    @property
    def window_rows(self) -> int:
        return self.window_blocks * self.window_unit

    def expand_edges(self, edge_vals: np.ndarray, fill=0):
        """Re-order a per-edge array [E, ...] into the NK slot layout
        [G*S, ...] (padded slots get ``fill``) — mirror of
        EdgeTiling.expand_edges."""
        out_shape = (self.perm.shape[0],) + tuple(edge_vals.shape[1:])
        out = np.full(out_shape, fill, dtype=edge_vals.dtype)
        valid = self.perm >= 0
        out[valid] = edge_vals[self.perm[valid]]
        return out

    def reduce_edges(self, slot_vals: np.ndarray, num_edges: int) -> np.ndarray:
        """Inverse of :meth:`expand_edges` (host-side, for tests)."""
        out = np.zeros((num_edges,) + tuple(slot_vals.shape[1:]),
                       slot_vals.dtype)
        valid = self.perm >= 0
        out[self.perm[valid]] = slot_vals[valid]
        return out


@dataclass(frozen=True, eq=False)
class NKBucketTiling:
    """Per-block-K variant of :class:`NKTiling` (graded meshes).

    A single global K = max in-degree inflates slot rows by
    ``K / mean_degree`` (the reference airfoil: K=9 against a mostly-6
    degree profile → 1.47x). Here node BLOCKS are sorted by their local
    max in-degree (the last block pinned — it holds the valid/padding
    boundary) and partitioned into ≤ ``k_buckets`` contiguous buckets,
    each with its own K_b; the fused kernels dispatch one ``pallas_call``
    per bucket (same machinery as the CSR kernel's window-count buckets,
    ops/fused_gnblock.py). Edge rows are laid out as per-bucket segments;
    each bucket's base row is aligned to its own ``slots_b`` so block
    index maps stay integral (alignment gaps carry ``perm == -1``).
    """

    #: [total_rows] int32 — original edge id per slot row; -1 on padding
    #: (incl. the alignment gaps between bucket segments).
    perm: np.ndarray
    #: per bucket: [G_b, slots_b] int32 window-local sender index
    #: (sentinel = window rows on padded slots).
    sidx: Tuple[np.ndarray, ...]
    #: [G, wb] int32 — window units per group (global across buckets).
    win_start: np.ndarray
    #: ((g_lo, g_hi, k_b), ...) contiguous group ranges with their K.
    buckets: Tuple[Tuple[int, int, int], ...]
    #: per bucket: edge-row base (multiple of that bucket's slots_b).
    bases: Tuple[int, ...]
    total_rows: int
    node_block: int
    window_blocks: int
    num_nodes: int  # padded (multiple of node_block)
    window_unit: int = 64

    @property
    def num_groups(self) -> int:
        return self.num_nodes // self.node_block

    @property
    def window_rows(self) -> int:
        return self.window_blocks * self.window_unit

    # expand/reduce share NKTiling's perm-driven implementation
    expand_edges = NKTiling.expand_edges
    reduce_edges = NKTiling.reduce_edges


def nk_total_rows(t) -> int:
    """Edge-layout row count of either NK tiling class."""
    if isinstance(t, NKBucketTiling):
        return t.total_rows
    return t.num_groups * t.slots


def nk_row_maps(t) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per slot ROW of the edge layout: (group id, receiver local row,
    window-local sender index). Alignment-gap rows get group id -1 and
    the sentinel sidx (= window rows)."""
    sentinel = t.window_blocks * t.window_unit
    nb = t.node_block
    if isinstance(t, NKBucketTiling):
        gids = np.full(t.total_rows, -1, np.int64)
        loc_r = np.zeros(t.total_rows, np.int64)
        sidx_flat = np.full(t.total_rows, sentinel, np.int64)
        for (lo, hi, k_b), base, sx in zip(t.buckets, t.bases, t.sidx):
            g_b, slots_b = hi - lo, k_b * nb
            rows = g_b * slots_b
            rel = np.arange(rows)
            gids[base : base + rows] = lo + rel // slots_b
            loc_r[base : base + rows] = rel % slots_b % nb
            sidx_flat[base : base + rows] = sx.reshape(-1)
        return gids, loc_r, sidx_flat
    slots = t.slots
    gids = np.repeat(np.arange(t.num_groups), slots)
    loc_r = np.tile(np.arange(slots) % nb, t.num_groups)
    return gids, loc_r, t.sidx.reshape(-1).astype(np.int64)


def build_nk_tiling(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_mask: Optional[np.ndarray] = None,
    node_block: int = 128,
    max_window_blocks: int = 16,
    window_unit: int = 64,
    k_multiple: int = 1,
    max_row_inflation: float = 2.0,
    window_blocks_multiple: int = 1,
) -> Optional[NKTiling]:
    """Build the uniform-degree layout, or None when it doesn't pay.

    Returns None when (a) a sender window exceeds the cap (reorder with
    rcm_order first) or (b) K·N exceeds ``max_row_inflation`` × the edge
    count (degree-skewed graph — the blocked-CSR kernel is better there).
    """
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    if edge_mask is not None:
        keep = np.asarray(edge_mask, bool)
    else:
        keep = np.ones(senders.shape[0], bool)
    orig_ids = np.nonzero(keep)[0]
    s = senders[orig_ids]
    r = receivers[orig_ids]

    n_pad = _round_up(max(num_nodes, 1), node_block)
    n_groups = n_pad // node_block

    order = np.argsort(r, kind="stable")  # receiver-major, stable edge order
    s, r, orig_ids = s[order], r[order], orig_ids[order]
    deg = np.bincount(r, minlength=n_pad)
    k_slots = int(deg.max()) if deg.size else 1
    k_slots = max(_round_up(max(k_slots, 1), k_multiple), 1)
    if s.size and k_slots * n_pad > max_row_inflation * max(s.size, 1) + n_pad:
        return None  # degree-skewed: row inflation would eat the win

    # rank of each edge within its receiver's run (receiver-sorted)
    run_start = np.zeros(n_pad + 1, np.int64)
    run_start[1:] = np.cumsum(deg)
    rank = np.arange(s.size) - run_start[r]

    # sender windows per receiver block (same contract as build_edge_tiling)
    assert node_block % window_unit == 0
    gid = r // node_block
    group_units = []
    for g in range(n_groups):
        seg = s[gid == g]
        group_units.append(
            np.unique(seg // window_unit) if seg.size else np.zeros(1, np.int64)
        )
    wb = max((len(u) for u in group_units), default=1)
    # quantize so near-identical meshes share a shape bucket (padding
    # window slots repeat the first unit; sentinel sidx keeps them inert)
    wb = min(_round_up(wb, window_blocks_multiple),
             max(n_pad // window_unit, 1))
    if wb * window_unit > max_window_blocks * node_block:
        return None

    win_rows = wb * window_unit
    slots = k_slots * node_block
    win_units = np.zeros((n_groups, wb), np.int64)
    perm = np.full(n_groups * slots, -1, np.int64)
    sidx = np.full((n_groups, slots), win_rows, np.int64)  # sentinel
    local_r = r - gid * node_block
    slot_in_group = rank * node_block + local_r  # k-major
    unit_rank = np.empty_like(s)
    for g in range(n_groups):
        units = group_units[g]
        win_units[g, : len(units)] = units
        win_units[g, len(units):] = units[0]
        m = gid == g
        if not m.any():
            continue
        unit_rank[m] = np.searchsorted(units, s[m] // window_unit)
    lidx = unit_rank * window_unit + s % window_unit
    flat = gid * slots + slot_in_group
    perm[flat] = orig_ids
    sidx[gid, slot_in_group] = lidx

    return NKTiling(
        perm=perm.astype(np.int32),
        sidx=sidx.astype(np.int32),
        win_start=win_units.astype(np.int32),
        k_slots=k_slots,
        node_block=node_block,
        window_blocks=wb,
        num_nodes=n_pad,
        window_unit=window_unit,
    )


def build_nk_bucket_tiling(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    edge_mask: Optional[np.ndarray] = None,
    node_block: int = 128,
    max_window_blocks: int = 16,
    window_unit: int = 64,
    k_multiple: int = 1,
    max_row_inflation: float = 2.0,
    window_blocks_multiple: int = 1,
    k_buckets: int = 2,
    min_groups: int = 4,
) -> Optional[Tuple["NKBucketTiling", Optional[np.ndarray]]]:
    """Per-block-K NK layout: ``(tiling, node_perm)`` or None.

    Node BLOCKS are sorted by local max in-degree (last block pinned) and
    partitioned into ≤ ``k_buckets`` contiguous segments by the same DP
    the CSR window buckets use, minimizing total slot rows. The returned
    ``node_perm`` (old id at new position i — compose with any RCM perm
    and apply via the manager's ``_permute_nodes``) is None when the
    blocks were already sorted. The inflation guard prices the ACTUAL
    bucketed row total, so graded meshes that a global K would reject
    (or inflate) pass here.
    """
    from graph_physics_tpu.ops.tiling import (
        block_order_to_node_perm,
        plan_wb_buckets,
        sort_blocks_for_buckets,
    )

    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    keep = (np.ones(senders.shape[0], bool) if edge_mask is None
            else np.asarray(edge_mask, bool))
    orig_ids = np.nonzero(keep)[0]
    s, r = senders[orig_ids], receivers[orig_ids]

    n_pad = _round_up(max(num_nodes, 1), node_block)
    n_groups = n_pad // node_block

    # per-block local max in-degree, then sort blocks (last pinned)
    deg = np.bincount(r, minlength=n_pad)
    blk_k = deg.reshape(n_groups, node_block).max(axis=1)
    order = sort_blocks_for_buckets(blk_k)
    node_perm = None
    if order is not None:
        node_perm = block_order_to_node_perm(order, node_block,
                                             int(num_nodes))
        inv = np.argsort(np.concatenate(
            [node_perm, np.arange(len(node_perm), n_pad)]))
        s, r = inv[s], inv[r]
        deg = np.bincount(r, minlength=n_pad)
        blk_k = deg.reshape(n_groups, node_block).max(axis=1)

    plan = plan_wb_buckets(np.maximum(blk_k, 1), k_buckets,
                           window_blocks_multiple=k_multiple,
                           min_groups=min_groups)

    # bucket bases aligned to each bucket's own slots_b; inflation guard
    # on the ACTUAL row total
    bases, bases_end = [], 0
    for (lo, hi, k_b) in plan:
        slots_b = k_b * node_block
        base = _round_up(bases_end, slots_b)
        bases.append(base)
        bases_end = base + (hi - lo) * slots_b
    total_rows = int(bases_end)
    if s.size and total_rows > max_row_inflation * max(s.size, 1) + n_pad:
        return None

    # receiver-major stable edge order + per-receiver rank (as the
    # single-bucket builder)
    e_order = np.argsort(r, kind="stable")
    s, r, orig_ids = s[e_order], r[e_order], orig_ids[e_order]
    run_start = np.zeros(n_pad + 1, np.int64)
    run_start[1:] = np.cumsum(deg)
    rank = np.arange(s.size) - run_start[r]

    # sender windows per group (global wb, same contract as the others)
    assert node_block % window_unit == 0
    gid = r // node_block
    group_units = []
    for g in range(n_groups):
        seg = s[gid == g]
        group_units.append(
            np.unique(seg // window_unit) if seg.size
            else np.zeros(1, np.int64))
    wb = max((len(u) for u in group_units), default=1)
    wb = min(_round_up(wb, window_blocks_multiple),
             max(n_pad // window_unit, 1))
    if wb * window_unit > max_window_blocks * node_block:
        return None
    win_rows = wb * window_unit
    win_units = np.zeros((n_groups, wb), np.int64)
    unit_rank = np.empty_like(s)
    for g in range(n_groups):
        units = group_units[g]
        win_units[g, : len(units)] = units
        win_units[g, len(units):] = units[0]
        m = gid == g
        if m.any():
            unit_rank[m] = np.searchsorted(units, s[m] // window_unit)
    lidx = unit_rank * window_unit + s % window_unit

    # fill per-bucket sidx + the global row perm
    perm = np.full(total_rows, -1, np.int64)
    sidx_list = []
    g_bucket = np.zeros(n_groups, np.int64)  # group -> bucket id
    for bi, (lo, hi, _k) in enumerate(plan):
        g_bucket[lo:hi] = bi
    b_of_e = g_bucket[gid]
    for bi, ((lo, hi, k_b), base) in enumerate(zip(plan, bases)):
        g_b, slots_b = hi - lo, k_b * node_block
        sx = np.full((g_b, slots_b), win_rows, np.int64)
        m = b_of_e == bi
        if m.any():
            assert int(rank[m].max()) < k_b, (int(rank[m].max()), k_b)
            slot = rank[m] * node_block + (r[m] - gid[m] * node_block)
            sx[gid[m] - lo, slot] = lidx[m]
            perm[base + (gid[m] - lo) * slots_b + slot] = orig_ids[m]
        sidx_list.append(sx.astype(np.int32))

    return (
        NKBucketTiling(
            perm=perm.astype(np.int32),
            sidx=tuple(sidx_list),
            win_start=win_units.astype(np.int32),
            buckets=tuple((int(lo), int(hi), int(k)) for lo, hi, k in plan),
            bases=tuple(int(b) for b in bases),
            total_rows=total_rows,
            node_block=node_block,
            window_blocks=int(wb),
            num_nodes=int(n_pad),
            window_unit=window_unit,
        ),
        node_perm,
    )


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------


def _ksum(x, k_slots, nb):
    """Σ of the K static [nb, lanes] row slices of a [K·nb, lanes] tile."""
    acc = x[0:nb]
    for k in range(1, k_slots):
        acc = acc + x[k * nb : (k + 1) * nb]
    return acc


def _ktile(x, k_slots):
    """Broadcast a [nb, lanes] node tile to [K·nb, lanes] edge rows."""
    return jnp.concatenate([x] * k_slots, axis=0)


def _nk_common(dh, wb, wu, nb, kk, lanes, sidx_ref, qj_ref, kw_refs, vw_refs,
               world_refs=None):
    slots = kk * nb
    w_rows = wb * wu
    sid = sidx_ref[0]
    oh_sT = (
        jax.lax.broadcasted_iota(jnp.int32, (w_rows, slots), 0) == sid
    ).astype(jnp.bfloat16)
    kw = jnp.concatenate([r[:] for r in kw_refs], axis=0)
    vw = jnp.concatenate([r[:] for r in vw_refs], axis=0)
    ke = _dot_t(oh_sT, kw).astype(jnp.bfloat16)  # [S, lanes]
    ve = _dot_t(oh_sT, vw).astype(jnp.bfloat16)
    qe = _ktile(qj_ref[:], kk).astype(jnp.bfloat16)

    ones_dh = _dh_group_ones(dh)
    logits = _grouped_dot(qe, ke, ones_dh, slots, lanes) / math.sqrt(dh)
    # global-shift softmax: any per-receiver-constant shift cancels in
    # num/den (see fused_edge_attention for the underflow caveat)
    shift = jnp.max(logits)
    wnum = wden = wscale = None
    if world_refs is not None:
        # world-edge sidecar pieces, re-based from their shift s_w to the
        # tile shift — exact joint softmax (see fused_edge_attention)
        nw_ref, dw_ref, sw_ref = world_refs
        sw = sw_ref[:]
        shift = jnp.maximum(shift, jnp.max(sw))
        wscale = jnp.exp(sw - shift)
        wnum = nw_ref[:] * wscale
        wden = dw_ref[:] * wscale
    valid = sid.reshape(slots, 1) < w_rows
    p = jnp.where(
        valid, jnp.exp(logits.reshape(slots, lanes) - shift), 0.0
    ).astype(jnp.bfloat16)
    denom = _ksum(p.astype(jnp.float32), kk, nb)  # fp32 [nb, lanes]
    if wden is not None:
        denom = denom + wden
    return oh_sT, qe, ke, ve, p, denom, wnum, wscale


def _nk_fwd_kernel(dh, wb, wu, nb, kk, lanes, has_world,
                   win_start_ref, sidx_ref, qj_ref, *rest):
    from graph_physics_tpu.ops.fused_edge_attention import _parse_world_refs

    kw_refs = rest[:wb]
    vw_refs = rest[wb : 2 * wb]
    rest = rest[2 * wb :]
    world_refs, rest = _parse_world_refs(rest, has_world)
    out_ref = rest[0]
    _oh, _qe, _ke, ve, p, denom, wnum, _ws = _nk_common(
        dh, wb, wu, nb, kk, lanes, sidx_ref, qj_ref, kw_refs, vw_refs,
        world_refs)
    num = _ksum((p * ve).astype(jnp.float32), kk, nb)
    if wnum is not None:
        num = num + wnum
    out = jnp.where(denom > 0.0, num / jnp.maximum(denom, 1e-30), 0.0)
    out_ref[:] = out.astype(jnp.bfloat16)


def _nk_bwd_kernel(dh, wb, wu, nb, kk, lanes, has_world,
                   win_start_ref, sidx_ref, qj_ref, *rest):
    from graph_physics_tpu.ops.fused_edge_attention import _parse_world_refs

    kw_refs = rest[:wb]
    vw_refs = rest[wb : 2 * wb]
    rest = rest[2 * wb :]
    world_refs, rest = _parse_world_refs(rest, has_world)
    g_out_ref = rest[0]
    if has_world:
        dq_ref, dkw_ref, dvw_ref, dnw_ref, ddw_ref = rest[1:]
    else:
        dq_ref, dkw_ref, dvw_ref = rest[1:]

    oh_sT, qe, ke, ve, p, denom, wnum, wscale = _nk_common(
        dh, wb, wu, nb, kk, lanes, sidx_ref, qj_ref, kw_refs, vw_refs,
        world_refs)

    inv = jnp.where(denom > 0.0, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    # identical softmax backward algebra to fused_edge_attention._bwd_kernel
    # (pre-scaled g' = inv·g_out), but every receiver move is a static
    # K-slice tile/sum instead of an oh_rN contraction:
    gp = (g_out_ref[:].astype(jnp.float32) * inv).astype(jnp.bfloat16)
    gpe = _ktile(gp, kk)                                     # edges (free)
    g_ve = (p * gpe).astype(jnp.bfloat16)
    ones_dh = _dh_group_ones(dh)
    abar = _grouped_dot(ve, gpe, ones_dh, kk * nb, lanes)    # fp32 rows
    abar2 = abar.reshape(kk * nb, lanes).astype(jnp.bfloat16)
    s_r = _ksum((p * abar2).astype(jnp.float32), kk, nb) * inv
    if wnum is not None:
        w_sr = _grouped_dot(wnum.astype(jnp.bfloat16), gp, ones_dh,
                            nb, lanes).reshape(nb, lanes)
        s_r = s_r + w_sr * inv
    s_e = _ktile(s_r.astype(jnp.bfloat16), kk)
    g_logit = (p * (abar2 - s_e)).astype(jnp.bfloat16)
    g_logit = (g_logit / math.sqrt(dh)).astype(jnp.bfloat16)

    dq_ref[:] = _ksum((g_logit * ke).astype(jnp.float32), kk, nb).astype(
        jnp.bfloat16)
    dkw_ref[:] = _dot(oh_sT, (g_logit * qe).astype(jnp.bfloat16)).astype(
        jnp.bfloat16)
    dvw_ref[:] = _dot(oh_sT, g_ve).astype(jnp.bfloat16)
    if wnum is not None:
        gp32 = g_out_ref[:].astype(jnp.float32) * inv
        dnw_ref[:] = gp32 * wscale
        num = _ksum((p * ve).astype(jnp.float32), kk, nb) + wnum
        out = jnp.where(denom > 0.0, num / jnp.maximum(denom, 1e-30), 0.0)
        ddw_ref[:] = -out * gp32 * wscale


def fused_edge_attention_nk(
    q: jnp.ndarray,  # [N, B, h, dh] packed
    k: jnp.ndarray,
    v: jnp.ndarray,
    tiling: NKTiling,
    interpret: bool = False,
    lanes: int = 1024,
    lanes_bwd: int = 512,
    tiling_idx=None,  # runtime (win_start, sidx) — compile-once buckets
    world_parts=None,  # (num_w, den_w, s_w) — see fused_edge_attention
) -> jnp.ndarray:
    """Edge-masked multi-head attention on the uniform-degree layout.

    Same contract as ops/fused_edge_attention.fused_edge_attention
    (including the world-edge sidecar ``world_parts`` seam); node arrays
    must be padded to ``tiling.num_nodes``.
    """
    n, b, h, dh = q.shape
    total_lanes = b * h * dh
    assert n == tiling.num_nodes, (n, tiling.num_nodes)
    assert LANES % dh == 0, f"head dim {dh} must divide {LANES}"
    assert total_lanes % LANES == 0

    def _fit(l):
        l = max(min(l, total_lanes), LANES)
        while total_lanes % l != 0:
            l -= LANES
        return l

    win_rows_ = tiling.window_blocks * tiling.window_unit
    if win_rows_ > 512:
        lanes = min(lanes, 512)
        lanes_bwd = min(lanes_bwd, 128)
    if win_rows_ > 1280:
        lanes = min(lanes, 256)
        lanes_bwd = min(lanes_bwd, 128)
    lanes = _fit(lanes)
    lanes_bwd = _fit(lanes_bwd)
    g_blocks = tiling.num_groups
    nb = tiling.node_block
    kk = tiling.k_slots
    wb = tiling.window_blocks
    wu = tiling.window_unit
    slots = tiling.slots

    dtype = jnp.bfloat16
    q2 = q.reshape(n, total_lanes).astype(dtype)
    k2 = k.reshape(n, total_lanes).astype(dtype)
    v2 = v.reshape(n, total_lanes).astype(dtype)
    has_world = world_parts is not None
    world_ops = ()
    if has_world:
        num_w, den_w, s_w = world_parts
        nw2 = num_w.astype(jnp.float32).reshape(n, total_lanes)
        dw2 = jnp.broadcast_to(
            den_w.astype(jnp.float32)[..., None], (n, b, h, dh)
        ).reshape(n, total_lanes)
        sw2 = jax.lax.stop_gradient(
            jnp.broadcast_to(
                s_w.astype(jnp.float32)[..., None], (n, b, h, dh)
            ).reshape(n, total_lanes)
        )
        world_ops = (nw2, dw2, sw2)

    if tiling_idx is not None:
        win_in, sidx_in = tiling_idx
        win_start = jnp.asarray(win_in, jnp.int32)
        sidx = jnp.asarray(sidx_in, jnp.int32)[:, None, :]
    else:
        sidx = jnp.asarray(tiling.sidx)[:, None, :]
        win_start = jnp.asarray(tiling.win_start)
    blk_node = win_start.reshape(-1).astype(jnp.int32)

    def _vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _specs(l):
        grid = (total_lanes // l, g_blocks)
        group_spec = _vspec((1, 1, slots), lambda c, g, ws: (g, 0, 0))
        node_spec = _vspec((nb, l), lambda c, g, ws: (g, c))
        win_specs = [
            _vspec((wu, l), partial(lambda kix, c, g, ws: (ws[g, kix], c), kix))
            for kix in range(wb)
        ]
        dw_spec = _vspec((wb * wu, l), lambda c, g, ws: (g, c))
        return grid, group_spec, node_spec, win_specs, dw_spec

    def _fwd(q2, k2, v2, world):
        grid, group_spec, node_spec, win_specs, _ = _specs(lanes)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[group_spec, node_spec] + win_specs + win_specs
            + [node_spec] * len(world),
            out_specs=[node_spec],
        )
        kernel = partial(_nk_fwd_kernel, dh, wb, wu, nb, kk, lanes,
                         has_world)
        (out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n, total_lanes), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(win_start, sidx, q2, *([k2] * wb), *([v2] * wb), *world)
        return out

    @jax.custom_vjp
    def run(q2, k2, v2, *world):
        return _fwd(q2, k2, v2, world)

    def run_fwd(q2, k2, v2, *world):
        return run(q2, k2, v2, *world), (q2, k2, v2, world)

    def run_bwd(res, g_out):
        q2, k2, v2, world = res
        grid, group_spec, node_spec, win_specs, dw_spec = _specs(lanes_bwd)
        out_specs = [node_spec, dw_spec, dw_spec]
        out_shape = [
            jax.ShapeDtypeStruct((n, total_lanes), dtype),
            jax.ShapeDtypeStruct((g_blocks * wb * wu, total_lanes), dtype),
            jax.ShapeDtypeStruct((g_blocks * wb * wu, total_lanes), dtype),
        ]
        if has_world:
            out_specs += [node_spec, node_spec]
            out_shape += [
                jax.ShapeDtypeStruct((n, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((n, total_lanes), jnp.float32),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[group_spec, node_spec] + win_specs + win_specs
            + [node_spec] * len(world) + [node_spec],  # g_out
            out_specs=out_specs,
        )
        kernel = partial(_nk_bwd_kernel, dh, wb, wu, nb, kk, lanes_bwd,
                         has_world)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(win_start, sidx, q2, *([k2] * wb), *([v2] * wb), *world,
          g_out.astype(dtype))
        dq, dkw, dvw = outs[:3]

        def reduce_windows(dw):
            blocks = dw.reshape(g_blocks * wb, wu, total_lanes)
            return jax.ops.segment_sum(
                blocks, blk_node, num_segments=n // wu
            ).reshape(n, total_lanes).astype(dtype)

        grads = (dq, reduce_windows(dkw), reduce_windows(dvw))
        if has_world:
            grads = grads + (outs[3], outs[4], jnp.zeros_like(world[2]))
        return grads

    run.defvjp(run_fwd, run_bwd)
    out2 = run(q2, k2, v2, *world_ops)
    return out2.reshape(n, b, h, dh)
