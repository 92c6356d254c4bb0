"""Fused-kernel training support: per-trajectory edge tilings.

The fused Pallas GraphNetBlock (ops/fused_gnblock.py) needs a static
blocked-CSR layout per topology. Mesh topology is static per TRAJECTORY
(the datasets cache k-hop per trajectory for the same reason), so this
module caches one :class:`~graph_physics_tpu.ops.tiling.EdgeTiling` per
trajectory, converts frames into the blocked layout inside the loader
thread, and hands the Trainer a per-topology (simulator, train-step)
clone — all clones share ONE parameter/optimizer state (the tiling only
changes the kernel schedule, not the parameters).

Trajectories whose meshes aren't tileable even after an RCM reorder fall
back to the XLA path transparently (their frames pass through
unconverted and the generic train step runs).

Not compatible with per-frame topology churn: world edges and random
extra edges change the edge set every frame — the Trainer refuses the
combination.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.ops import tiling as tiling_lib


class FusedTopologyManager:
    """Per-trajectory tiling cache + frame converter + step-fn cache.

    Steps are cached per SHAPE BUCKET, not per trajectory: the blocked-CSR
    indices ride the graph as runtime inputs (MeshGraph.tiling_idx), so
    one compiled program serves every topology whose tiling has the same
    static geometry. ``edge_pad_multiple`` / ``window_blocks_multiple``
    quantize that geometry so real datasets (~1000 distinct meshes) land
    in a handful of buckets instead of recompiling per mesh.
    """

    def __init__(self, node_block: int = 128, max_window_blocks: int = 16,
                 edge_pad_multiple: int = 64, window_blocks_multiple: int = 2,
                 window_unit: int = 64, wb_buckets: int = 1,
                 build_nk: bool = False, nk_layout: bool = False,
                 nk_k_buckets: int = 3,
                 max_cached_tilings: int = 512):
        self.node_block = node_block
        self.max_window_blocks = max_window_blocks
        self.edge_pad_multiple = edge_pad_multiple
        self.window_blocks_multiple = window_blocks_multiple
        self.window_unit = window_unit
        #: also build the uniform-degree (NK) attention layout per
        #: topology and ride its runtime indices on the graph
        #: (ops/fused_edge_attention_nk; transformer models only — the
        #: step clone sets edge_tiling_nk when the model supports it)
        self.build_nk = build_nk or nk_layout
        #: convert frames into the NK SLOT layout itself (epd models:
        #: the fused NK GraphNetBlock replaces the CSR kernel —
        #: receiver-side one-hot contractions become static K-slices,
        #: ops/fused_gnblock_nk). Topologies whose NK build fails
        #: (degree skew) fall back to the CSR layout per trajectory.
        self.nk_layout = nk_layout
        #: >1 (nk_layout mode only): on graded meshes, also price the
        #: per-block-K bucketed NK layout (ops/fused_edge_attention_nk.
        #: build_nk_bucket_tiling — node blocks sorted by local max
        #: in-degree, ≤ this many contiguous K_b segments) and use it
        #: when it cuts slot rows ≥10% vs the global-K layout. The
        #: airfoil: global K=10 inflates rows 2.13x over the edge count
        #: while 3 K-buckets reach ~1.4x. Uniform meshes (cylinder) keep
        #: the single-K layout. Transformer attention (build_nk without
        #: nk_layout) always uses the single-K layout — the NK attention
        #: kernel consumes uniform K only.
        self.nk_k_buckets = nk_k_buckets
        #: NK acceptance: max slot-rows / CSR-rows ratio under which the
        #: NK layout still wins (its kernel-constant advantage at equal
        #: rows, measured on the cylinder: epd +4%, attention +20% —
        #: BASELINE.md). Above it the CSR kernel serves the topology.
        self.nk_accept_ratio = 1.10
        self.nk_attn_accept_ratio = 1.20
        #: >1: sort node blocks by touched-window-unit count and dispatch
        #: the fused kernels as up to this many window-width buckets, so
        #: graded meshes (airfoil: wb 3..18, median 12) don't pay the max
        #: window width on every group. 1 = single dispatch (default).
        self.wb_buckets = wb_buckets
        #: (traj id, n_edge, topo digest) -> (tiling or None, rcm perm or
        #: None, NK tiling or None); LRU-bounded — real datasets have
        #: ~1,000 distinct meshes (and random-edge/partition configs one
        #: topology per SAMPLE), and a 27k-node tiling's index arrays run
        #: to ~1 MB, so an unbounded cache would grow without limit.
        #: Eviction only costs the host-side rebuild (a few ms).
        self.max_cached_tilings = max_cached_tilings
        import threading
        from collections import OrderedDict

        #: loader thread-pool workers may build tilings concurrently
        #: (BatchLoader(workers=N)); serialize cache access
        self._tilings_lock = threading.Lock()
        self._tilings: "OrderedDict[Tuple, Tuple[Optional[Any], Optional[np.ndarray], Optional[Any]]]" = OrderedDict()
        #: tiling-key -> (converted static template, source static leaf
        #: ids): when FrameBuilder serves frames from its per-trajectory
        #: skeleton, the static leaves (pos, edge_attr) are the SAME numpy
        #: objects every frame — the layout conversion of everything
        #: static can then be reused, leaving only the dynamic node leaves
        #: to pad per frame (host hot path: scripts/bench_loader.py)
        self._converted: "OrderedDict[Any, Tuple[Any, Any, Any]]" = (
            OrderedDict()
        )
        #: shape-bucket key -> (simulator clone, jitted step_fn)
        self._steps: Dict[Any, Tuple[Any, Any]] = {}
        #: win_start content digest -> bucket plan; the O(wb_buckets·G²)
        #: planning DP runs 2-3× per batch through key_for/step_for in the
        #: hot loop — it is a pure function of win_start, so memoize it
        self._plans: Dict[Any, Any] = {}

    def _batch_tiling(self, batch: MeshGraph):
        """Geometry-only EdgeTiling reconstructed from a CONVERTED batch's
        runtime indices (batch.tiling_idx) — the kernels consume only the
        static geometry plus these arrays, so the original host tiling
        object is not needed (and must not be keyed by trajectory alone:
        sub-mesh partitions give one trajectory many topologies)."""
        ti = batch.tiling_idx
        if ti is None:
            return None
        win, sidx, ridx = (np.asarray(a) for a in ti)
        g_blocks, wb = win.shape
        return tiling_lib.EdgeTiling(
            perm=np.empty(0, np.int32),  # host-only field; unused on device
            sidx=sidx, ridx=ridx, win_start=win,
            node_block=self.node_block,
            window_blocks=int(wb),
            edges_per_block=int(sidx.shape[1]),
            num_nodes=int(batch.x.shape[0]),
            window_unit=self.window_unit,
            # the bucket plan re-derives deterministically from the
            # win_start CONTENT (groups were sorted at build time), so the
            # runtime-reconstructed tiling dispatches exactly like the
            # host-built one
            buckets=self._bucket_plan(win),
        )

    def _batch_nk_tiling(self, batch: MeshGraph):
        """Geometry-only NK tiling from a converted batch's runtime NK
        indices (mirrors _batch_tiling). ``tiling_idx_nk`` carries one
        sidx array per K-bucket ((win_start, sidx...), apply_to_graph_nk)
        — more than one reconstructs the per-block-K NKBucketTiling; the
        group ranges, bases and total rows re-derive deterministically
        from the per-bucket sidx shapes (the builder's alignment rule)."""
        ti = batch.tiling_idx_nk
        if ti is None:
            return None
        from graph_physics_tpu.ops.fused_edge_attention_nk import (
            NKBucketTiling, NKTiling,
        )

        win = np.asarray(ti[0])
        sxs = [np.asarray(s) for s in ti[1:]]
        if len(sxs) == 1:
            sidx = sxs[0]
            return NKTiling(
                perm=np.empty(0, np.int32),
                sidx=sidx,
                win_start=win,
                k_slots=int(sidx.shape[1]) // self.node_block,
                node_block=self.node_block,
                window_blocks=int(win.shape[1]),
                num_nodes=int(batch.x.shape[0]),
                window_unit=self.window_unit,
            )
        from graph_physics_tpu.ops.tiling import _round_up

        nb = self.node_block
        buckets, bases, lo, end = [], [], 0, 0
        for sx in sxs:
            g_b, slots_b = int(sx.shape[0]), int(sx.shape[1])
            base = _round_up(end, slots_b)
            bases.append(base)
            end = base + g_b * slots_b
            buckets.append((lo, lo + g_b, slots_b // nb))
            lo += g_b
        return NKBucketTiling(
            perm=np.empty(0, np.int32),
            sidx=tuple(sxs),
            win_start=win,
            buckets=tuple(buckets),
            bases=tuple(bases),
            total_rows=end,
            node_block=nb,
            window_blocks=int(win.shape[1]),
            num_nodes=int(batch.x.shape[0]),
            window_unit=self.window_unit,
        )

    @staticmethod
    def nk_bucket_key(nk) -> Optional[Tuple]:
        if nk is None:
            return None
        from graph_physics_tpu.ops.fused_edge_attention_nk import (
            NKBucketTiling,
        )

        if isinstance(nk, NKBucketTiling):
            return (nk.buckets, nk.total_rows, nk.node_block,
                    nk.window_blocks, nk.window_unit, nk.num_nodes)
        return (nk.k_slots, nk.node_block, nk.window_blocks,
                nk.window_unit, nk.num_nodes)

    def _bucket_plan(self, win_start: np.ndarray):
        if self.wb_buckets <= 1:
            return None
        import zlib

        win = np.ascontiguousarray(np.asarray(win_start), np.int32)
        key = (win.shape, zlib.crc32(win.tobytes()))
        if key in self._plans:
            return self._plans[key]
        counts = tiling_lib.unit_counts_from_win(win)
        plan = tiling_lib.plan_wb_buckets(
            counts, self.wb_buckets, self.window_blocks_multiple,
            # bucket widths must never exceed the tiling's (possibly
            # capped, non-multiple) win_start column count
            wb_cap=win.shape[1])
        plan = plan if len(plan) > 1 else None
        self._plans[key] = plan
        return plan

    def key_for(self, batch: MeshGraph, base_sim=None):
        """Shape-bucket key of a (converted) batch's topology — for outer
        caches (e.g. the Trainer's multi-step cache) that must share
        entries exactly when step_for does (pass the same ``base_sim`` so
        models without edge_tiling support key to 'xla' like step_for)."""
        if base_sim is not None and not hasattr(base_sim.model, "edge_tiling"):
            return "xla"
        t = self._batch_tiling(batch)
        nk = (self._batch_nk_tiling(batch)
              if base_sim is None or hasattr(base_sim.model, "edge_tiling_nk")
              else None)
        if t is None:
            # NK-layout batch (nk_layout mode): the NK tiling IS the
            # edge order; no CSR tiling rides the graph
            if nk is not None:
                return ("nk", self.nk_bucket_key(nk))
            return "xla"
        return (self.bucket_key(t), self.nk_bucket_key(nk))

    @staticmethod
    def bucket_key(t) -> Tuple:
        """Static geometry of a tiling — equal key ⟹ same compiled step.
        The wb-bucket plan is static dispatch structure (per-bucket group
        counts and window widths), so it is part of the key."""
        return (
            t.num_nodes, t.num_groups, t.edges_per_block, t.node_block,
            t.window_blocks, t.window_unit, t.buckets,
        )

    # -- host-side frame conversion (runs in the loader thread) ---------
    def _tiling_for(self, g: MeshGraph):
        n_valid = int(g.n_node)
        e_valid = int(g.n_edge)
        send = np.asarray(g.senders)[:e_valid]
        recv = np.asarray(g.receivers)[:e_valid]
        # key on the trajectory AND a byte-exact topology digest: frames
        # of one trajectory can carry DIFFERENT topologies (sub-mesh
        # partitions slice per sample) and must not share a tiling. A
        # content hash (not an additive checksum, which is invariant
        # under endpoint re-pairing) guarantees distinct edge sets get
        # distinct tilings.
        import zlib

        chk = zlib.crc32(
            send.astype(np.int32).tobytes()
        ) ^ (zlib.crc32(recv.astype(np.int32).tobytes()) << 1)
        key = (int(np.asarray(g.traj_index)), e_valid, chk)
        with self._tilings_lock:
            if key in self._tilings:
                self._tilings.move_to_end(key)
                return key, self._tilings[key]
        kw = dict(
            node_block=self.node_block,
            max_window_blocks=self.max_window_blocks,
            edge_pad_multiple=self.edge_pad_multiple,
            window_blocks_multiple=self.window_blocks_multiple,
            window_unit=self.window_unit,
        )
        t = tiling_lib.build_edge_tiling(send, recv, n_valid, **kw)
        perm = None
        if t is None:
            # non-banded node order: reorder with reverse Cuthill-McKee
            perm = tiling_lib.rcm_order(send, recv, n_valid)
            inv = np.argsort(perm)
            t = tiling_lib.build_edge_tiling(inv[send], inv[recv], n_valid, **kw)
            if t is None:
                perm = None  # not tileable: XLA fallback for this topology
        if t is not None and self.wb_buckets > 1:
            t, perm = self._sort_for_buckets(t, perm, send, recv, n_valid, kw)
        nk = None
        if t is not None and self.build_nk:
            from graph_physics_tpu.ops.fused_edge_attention_nk import (
                build_nk_tiling,
            )

            if perm is not None:
                inv = np.argsort(perm)
                s_f, r_f = inv[send], inv[recv]
            else:
                s_f, r_f = send, recv
            nk_kw = dict(
                node_block=self.node_block,
                max_window_blocks=self.max_window_blocks,
                window_unit=self.window_unit,
                window_blocks_multiple=self.window_blocks_multiple,
                k_multiple=2,
            )
            from graph_physics_tpu.ops.fused_edge_attention_nk import (
                nk_total_rows,
            )

            nk = build_nk_tiling(s_f, r_f, n_valid, **nk_kw)
            nk_perm = None
            if self.nk_layout and self.nk_k_buckets > 1:
                # graded meshes: price the per-block-K layout against the
                # global-K one and take it when it cuts slot rows >=10%
                # (the fused NK GraphNetBlock dispatches per K-bucket;
                # the NK ATTENTION kernel cannot, hence nk_layout-only)
                from graph_physics_tpu.ops.fused_edge_attention_nk import (
                    build_nk_bucket_tiling,
                )

                res = build_nk_bucket_tiling(
                    s_f, r_f, n_valid, k_buckets=self.nk_k_buckets, **nk_kw)
                if res is not None:
                    bt, bperm = res
                    plain_rows = (nk.num_groups * nk.slots
                                  if nk is not None else None)
                    if (bt.num_nodes == t.num_nodes
                            and (plain_rows is None
                                 or bt.total_rows < 0.9 * plain_rows)):
                        nk, nk_perm = bt, bperm
            if nk is not None and nk.num_nodes != t.num_nodes:
                nk = None  # node-padding mismatch: CSR kernel only
            if nk is not None:
                # NK-vs-CSR row pricing (airfoil A/B, BASELINE.md round
                # 5): per-slot-row work is comparable across the kernels,
                # so NK's kernel-constant win (fewer one-hot MXU
                # contractions; +4% epd / +20% attention at EQUAL rows on
                # the cylinder) only survives while its slot padding
                # stays within that margin of the CSR row count. The
                # graded airfoil: global-K 1.54x CSR rows measured 0.74x
                # CSR speed; K-bucketed 1.26x still trails. Uniform
                # meshes sit at 1.0x and keep NK.
                # only priced at >=8 node blocks: below that the slot
                # quantization (K and epb both round per 128-node block)
                # dominates both layouts and the builder's own absolute
                # inflation guard is the meaningful gate
                csr_rows = t.num_groups * t.edges_per_block
                ratio = (self.nk_accept_ratio if self.nk_layout
                         else self.nk_attn_accept_ratio)
                if t.num_groups >= 8 and nk_total_rows(nk) > ratio * csr_rows:
                    nk = None
            if nk is None:
                print(
                    "[fused] NK layout rejected for trajectory "
                    f"{int(np.asarray(g.traj_index))} (degree skew: slot "
                    "rows would exceed the blocked-CSR row count beyond "
                    "the kernel-constant margin); the CSR kernel serves "
                    "it",
                    flush=True,
                )
            elif nk_perm is not None:
                # compose the bucket sort with the RCM/wb-sort node
                # order — only once the bucket layout is FINAL (the CSR
                # tiling `t` stays in the pre-bucket order; in nk_layout
                # mode it only gates tileability and prices rows: frames
                # convert via apply_to_graph_nk and tiling_idx does not
                # ride)
                perm = (nk_perm if perm is None
                        else np.asarray(perm)[nk_perm])
        with self._tilings_lock:
            self._tilings[key] = (t, perm, nk)
            while len(self._tilings) > self.max_cached_tilings:
                self._tilings.popitem(last=False)
        return key, (t, perm, nk)

    def _sort_for_buckets(self, t, perm, send, recv, n_valid, kw):
        """Re-permute node BLOCKS so groups are ordered by window-unit
        count (last block pinned — it holds the valid/padding boundary),
        rebuild the tiling in that order, and attach the bucket plan.
        A block-granular permutation maps each group's touched-unit SET
        bijectively, so per-group counts — and therefore the plan — are
        preserved exactly."""
        counts = tiling_lib.unit_counts_from_win(t.win_start)
        order = tiling_lib.sort_blocks_for_buckets(counts)
        if order is not None:
            perm2 = tiling_lib.block_order_to_node_perm(
                order, t.node_block, n_valid)
            perm = perm2 if perm is None else np.asarray(perm)[perm2]
            inv = np.argsort(perm)
            t = tiling_lib.build_edge_tiling(
                inv[np.asarray(send)], inv[np.asarray(recv)], n_valid, **kw)
            assert t is not None, "block re-sort cannot break tileability"
        plan = self._bucket_plan(t.win_start)
        if plan is not None:
            import dataclasses

            t = dataclasses.replace(t, buckets=plan)
        return t, perm

    def tiling_of(self, traj: int):
        """(tiling, rcm perm) of the first topology seen for ``traj``
        (introspection/tests; trajectories with sub-mesh partitions have
        one entry per partition topology)."""
        for (t_id, _e, _c), entry in self._tilings.items():
            if t_id == traj:
                return entry[0], entry[1]
        raise KeyError(traj)

    @staticmethod
    def _apply_template(tmpl: MeshGraph, g: MeshGraph) -> MeshGraph:
        """Converted static leaves from the cached template + this
        frame's dynamic node leaves padded to the tiling's node count.
        ``pad_nodes`` is axis-0 only, so it serves single frames
        ([N, F]) and half-packed batches ([N, B, F]) alike."""
        n_new = tmpl.x.shape[0]

        def pad_nodes(a, fill=0):
            if a is None:
                return None
            a = np.asarray(a)
            if a.shape[0] == n_new:
                return a
            if a.shape[0] > n_new:
                return a[:n_new]
            pad = np.full((n_new - a.shape[0],) + a.shape[1:], fill,
                          a.dtype)
            return np.concatenate([a, pad], axis=0)

        return tmpl.replace(
            x=pad_nodes(g.x),
            y=pad_nodes(g.y),
            prev=pad_nodes(g.prev),
            next_data=pad_nodes(g.next_data),
            deselected=pad_nodes(g.deselected, False),
            time=g.time,
            # per-frame world-edge sidecar: fixed [W] budget, node ids
            # unchanged by node padding (inactive slots are masked)
            wedge_senders=g.wedge_senders,
            wedge_receivers=g.wedge_receivers,
            wedge_mask=g.wedge_mask,
            wedge_attr=g.wedge_attr,
        )

    def transform_packed(self, g: MeshGraph) -> Optional[MeshGraph]:
        """Blocked-layout conversion of a HALF-packed batch (node leaves
        [N, B, F], static slots single — ``FrameBuilder.build_packed``).

        Only the static-template fast regime applies (the template's
        converted static leaves + an axis-0 pad of the packed node
        leaves); returns None otherwise — including the first batch of a
        trajectory, which must run per-frame to build the template — and
        the caller falls back to the per-frame path. XLA-fallback
        topologies pass through unchanged (same contract as
        ``transform_frame``)."""
        key, (t, perm, _nk) = self._tiling_for(g)
        if t is None:
            return g
        cached = self._converted.get(key)
        if (
            cached is None
            or perm is not None
            or cached[1] is not g.pos
            or cached[2] is not g.edge_attr
        ):
            return None
        return self._apply_template(cached[0], g)

    def transform_frame(self, g: MeshGraph) -> MeshGraph:
        """Convert one host-side frame into the blocked layout (no-op for
        untileable topologies).

        ``nk_layout`` mode: frames convert into the NK SLOT layout
        (apply_to_graph_nk — tiling_idx_nk rides, tiling_idx does NOT:
        one edge order per graph); NK-rejected topologies fall back to
        the CSR layout."""
        key, (t, perm, nk) = self._tiling_for(g)
        if t is None:
            return g

        # static-template fast path: FrameBuilder's skeleton serves the
        # SAME pos/edge_attr objects every frame of a trajectory, so the
        # conversion of everything static is reusable; per frame only the
        # dynamic node leaves get padded onto the template. Identity of
        # the static leaves is the exact gate (a full rebuild — moving
        # mesh, partitions, feature hooks — breaks identity and falls
        # through). RCM-permuted topologies (perm) rebuild per frame.
        cached = self._converted.get(key)
        if (
            cached is not None
            and perm is None
            and cached[1] is g.pos
            and cached[2] is g.edge_attr
        ):
            return self._apply_template(cached[0], g)

        src_pos, src_ea = g.pos, g.edge_attr  # strong refs: identity
        # comparison is only sound while the source objects stay alive
        if perm is not None:
            g = _permute_nodes(g, perm)
        if self.nk_layout and nk is not None:
            out = tiling_lib.apply_to_graph_nk(g, nk)
        else:
            out = tiling_lib.apply_to_graph(g, t)
            if nk is not None:
                out = out.replace(tiling_idx_nk=(
                    nk.win_start.astype(np.int32), nk.sidx.astype(np.int32)))
        if perm is None:
            self._converted[key] = (out, src_pos, src_ea)
            while len(self._converted) > self.max_cached_tilings:
                self._converted.popitem(last=False)
        return out

    # -- device-side step selection (runs in the train loop) ------------
    def step_for(self, batch: MeshGraph, base_sim, make_step: Callable):
        """(simulator, step_fn) for this batch's topology.

        ``make_step(simulator)`` builds the jitted train step; results are
        cached per trajectory so each topology compiles once.
        """
        t = self._batch_tiling(batch)
        t_nk = (self._batch_nk_tiling(batch)
                if hasattr(base_sim.model, "edge_tiling_nk") else None)
        if not hasattr(base_sim.model, "edge_tiling"):
            key = "xla"
        elif t is None:
            # NK-layout batch: the fused NK GraphNetBlock serves it
            key = ("nk", self.nk_bucket_key(t_nk)) if t_nk is not None \
                else "xla"
        else:
            key = (self.bucket_key(t), self.nk_bucket_key(t_nk))
        hit = self._steps.get(key)
        if hit is not None:
            return hit
        if key == "xla":
            traj = int(np.asarray(batch.traj_index))
            print(
                f"[fused] trajectory {traj}: fused kernel inactive "
                + ("(untileable topology)" if hasattr(
                    base_sim.model, "edge_tiling") else "(model has no "
                   "edge_tiling support)")
                + "; running the XLA path",
                flush=True,
            )
            entry = (base_sim, make_step(base_sim))
        else:
            from graph_physics_tpu.models.simulator import clone_with_model

            # the tiling attribute supplies ONLY static geometry here; the
            # per-topology indices arrive as batch.tiling_idx(/.._nk) at
            # run time
            if t is None:  # NK-layout batch
                updates = dict(edge_tiling_nk=t_nk)
            else:
                updates = dict(edge_tiling=t)
                if t_nk is not None:
                    updates["edge_tiling_nk"] = t_nk
            sim = clone_with_model(base_sim, base_sim.model.clone(**updates))
            entry = (sim, make_step(sim))
        self._steps[key] = entry
        return entry


def _permute_nodes(g: MeshGraph, perm: np.ndarray) -> MeshGraph:
    """Apply a node permutation (old id at position i = perm[i]) to every
    node-indexed array of a host-side frame; valid nodes stay a prefix."""
    n_valid = len(perm)
    full = np.concatenate([perm, np.arange(n_valid, g.x.shape[0])])
    inv = np.argsort(full)

    def nodes(a):
        return None if a is None else np.asarray(a)[full]

    def remap(a):
        return None if a is None else inv[np.asarray(a)].astype(np.int32)

    return g.replace(
        x=nodes(g.x),
        pos=nodes(g.pos),
        node_type=nodes(g.node_type),
        node_mask=nodes(g.node_mask),
        senders=remap(g.senders),
        receivers=remap(g.receivers),
        y=nodes(g.y),
        prev=nodes(g.prev),
        next_data=nodes(g.next_data),
        deselected=nodes(g.deselected),
        phi=nodes(g.phi),
        wedge_senders=remap(g.wedge_senders),
        wedge_receivers=remap(g.wedge_receivers),
        faces=(
            None
            if g.faces is None
            else inv[np.asarray(g.faces)].astype(np.int32)
        ),
    )
