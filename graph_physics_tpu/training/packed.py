"""Trajectory-major packed batching — the TPU fast path for training.

Why: with the stacked layout ([B, N, F], per-sample vmap), every gather/
scatter in message passing moves [H]-sized rows (64 bytes at hidden 32) —
~2% memory-transaction utilization on TPU; measured 58 of 62 ms of a
cylinder train step. When all batch elements share one topology (frames of
one trajectory — connectivity is static per trajectory), laying node data
out as [N, B, F] makes the SAME ``jnp.take``/``segment_sum`` move
[B·F]-sized rows at line rate. GraphNetBlock/MLP/RMSNorm are already
axis-0 polymorphic, so the model runs unchanged and unvmapped.

Restriction (checked): shared senders/receivers/edge masks across the
batch — use same-trajectory batches (``BatchLoader(packed=True)``). Both
the EPD and transformer paths support the packed layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_physics_tpu.core.graph import MeshGraph


def _shared(a, name: str):
    """Assert a [B, ...] array is identical across B; return element 0."""
    a = np.asarray(a)
    if not (a == a[0]).all():
        raise ValueError(
            f"packed batching requires shared {name} across the batch "
            "(use same-trajectory batches: BatchLoader(packed=True))"
        )
    return a[0]


def pack(stacked: MeshGraph) -> MeshGraph:
    """[B, N, F]-stacked MeshGraph (shared topology) → [N, B, F]-packed."""
    b = stacked.x.shape[0]

    def node_field(a):
        return None if a is None else np.moveaxis(np.asarray(a), 0, 1)

    return MeshGraph(
        x=node_field(stacked.x),
        pos=_shared(stacked.pos, "pos"),
        node_type=_shared(stacked.node_type, "node_type"),
        node_mask=_shared(stacked.node_mask, "node_mask"),
        senders=_shared(stacked.senders, "senders"),
        receivers=_shared(stacked.receivers, "receivers"),
        edge_mask=_shared(stacked.edge_mask, "edge_mask"),
        edge_attr=node_field(stacked.edge_attr),
        y=node_field(stacked.y),
        prev=node_field(stacked.prev),
        next_data=node_field(stacked.next_data),
        deselected=(
            None
            if stacked.deselected is None
            else np.moveaxis(np.asarray(stacked.deselected), 0, 1)
        ),
        phi=(
            None
            if stacked.phi is None
            else np.moveaxis(np.asarray(stacked.phi), 0, 1)
        ),
        # per-sample world-edge sidecar: [B, W(...)] -> [W, B(...)]
        wedge_senders=node_field(stacked.wedge_senders),
        wedge_receivers=node_field(stacked.wedge_receivers),
        wedge_mask=node_field(stacked.wedge_mask),
        wedge_attr=node_field(stacked.wedge_attr),
        faces=_shared(stacked.faces, "faces") if stacked.faces is not None else None,
        face_mask=(
            _shared(stacked.face_mask, "face_mask")
            if stacked.face_mask is not None
            else None
        ),
        n_node=np.asarray(stacked.n_node)[0] if stacked.n_node is not None else None,
        n_edge=np.asarray(stacked.n_edge)[0] if stacked.n_edge is not None else None,
        traj_index=(
            np.asarray(stacked.traj_index)[0]
            if stacked.traj_index is not None
            else None
        ),
        time=np.asarray(stacked.time) if stacked.time is not None else None,
        tiling_idx=(
            None
            if stacked.tiling_idx is None
            else tuple(
                _shared(a, "tiling_idx") for a in stacked.tiling_idx
            )
        ),
        tiling_idx_nk=(
            None
            if stacked.tiling_idx_nk is None
            else tuple(
                _shared(a, "tiling_idx_nk") for a in stacked.tiling_idx_nk
            )
        ),
    )


#: static (shared-topology) MeshGraph attributes in packed batches
_STATIC_ATTRS = ("pos", "node_type", "node_mask", "senders", "receivers",
                 "edge_mask", "faces", "face_mask")


def pack_frames(frames, broadcast_static: bool = False) -> MeshGraph:
    """Frames of one trajectory → [N, B, F]-packed batch, directly.

    The loader's generic path (``pack(stack_batch(frames))``) copies every
    leaf TWICE (stack to [B, N, F], then transpose to [N, B, F]) and
    stacks the B identical copies of static topology only to compare and
    drop them. When the frames share their static leaves as the SAME
    numpy objects — which FrameBuilder's per-trajectory skeleton and the
    fused transform's template guarantee — the packed batch assembles
    with ONE axis-1 stack of the dynamic leaves and zero topology
    work. Falls back to the checked generic path otherwise.

    ``broadcast_static=True``: a dynamic-slot leaf shared by ALL frames
    (static edge features are the big one: [E, 3] with E ≈ 6N) is emitted
    as a zero-copy [N, 1, F] VIEW instead of B host copies — the train
    step re-expands it on device (``expand_static_leaves``, a free XLA
    broadcast) with bit-identical results. Cuts the host assembly and the
    H2D transfer of a cylinder-sized batch by ~75% (BASELINE.md round 4).
    Only the plain single-process loader path uses it: dp/sp shardings
    and multi-host global assembly shard the batch axis, which a size-1
    leaf cannot carry.
    """
    f0 = frames[0]
    shared = all(
        getattr(f, a) is getattr(f0, a)
        for f in frames[1:]
        for a in _STATIC_ATTRS + ("tiling_idx", "tiling_idx_nk")
    )
    if not shared:
        from graph_physics_tpu.dataset.loader import stack_batch

        return pack(stack_batch(frames))

    from graph_physics_tpu import native

    def dyn(get):
        v0 = get(f0)
        if v0 is None:
            return None
        vals = [np.asarray(get(f)) for f in frames]
        if all(v is vals[0] for v in vals[1:]):
            if broadcast_static:
                # zero-copy [N, 1, F] view; the step broadcasts on device
                return vals[0][:, None]
            # one shared object (e.g. static edge features): threaded
            # native row-repeat (meshops.cc repeat_rows — GIL released,
            # sequential writes); numpy fallback is np.repeat, itself
            # measured 10x over both the axis-1 stack and
            # ascontiguousarray(broadcast_to) (numpy's 0-stride copy
            # slow path) at airfoil scale
            out = native.repeat_rows(vals[0], len(vals))
            if out is not None:
                return out
            return np.repeat(vals[0][:, None], len(vals), axis=1)
        # threaded native interleave (meshops.cc pack_rows): one
        # sequential-write pass straight into the [N, B, F] layout.
        # numpy fallback: contiguous [B, N, F] stack then ONE blocked
        # transpose — measured ~4x over numpy's axis-1 stacking
        # (B strided destination passes) at 26k nodes
        out = native.pack_rows(vals)
        if out is not None:
            return out
        return np.ascontiguousarray(np.stack(vals, axis=0).swapaxes(0, 1))

    return f0.replace(
        x=dyn(lambda f: f.x),
        edge_attr=dyn(lambda f: f.edge_attr),
        y=dyn(lambda f: f.y),
        prev=dyn(lambda f: f.prev),
        next_data=dyn(lambda f: f.next_data),
        deselected=dyn(lambda f: f.deselected),
        phi=dyn(lambda f: f.phi),
        wedge_senders=dyn(lambda f: f.wedge_senders),
        wedge_receivers=dyn(lambda f: f.wedge_receivers),
        wedge_mask=dyn(lambda f: f.wedge_mask),
        wedge_attr=dyn(lambda f: f.wedge_attr),
        time=(
            None
            if f0.time is None
            else np.asarray([np.asarray(f.time) for f in frames],
                            np.float32)
        ),
    )


def finalize_packed(
    graph: MeshGraph, batch: int, broadcast_static: bool
) -> MeshGraph:
    """Give the HALF-packed graph (``FrameBuilder.build_packed`` /
    ``FusedTopologyManager.transform_packed``) its static-slot batch
    axes: edge_attr [E, F] and phi [N] — the leaves shared by every
    frame — become [E, 1, F] / [N, 1] views under ``broadcast_static``
    (the step re-expands on device) or full host repeats otherwise,
    matching ``pack_frames`` exactly."""
    from graph_physics_tpu import native

    def add_axis(a):
        if a is None:
            return None
        a = np.asarray(a)
        if broadcast_static:
            return a[:, None]
        out = native.repeat_rows(a, batch)
        if out is not None:
            return out
        return np.repeat(a[:, None], batch, axis=1)

    rep = {}
    if graph.edge_attr is not None and graph.edge_attr.ndim == 2:
        rep["edge_attr"] = add_axis(graph.edge_attr)
    if graph.phi is not None and graph.phi.ndim == 1:
        rep["phi"] = add_axis(graph.phi)
    return graph.replace(**rep) if rep else graph


def expand_static_leaves(graph: MeshGraph) -> MeshGraph:
    """Re-expand ``pack_frames(broadcast_static=True)`` leaves on device.

    Any dynamic-slot leaf carrying a size-1 batch axis (axis 1 of the
    packed [N, B, F] layout) is broadcast to the batch size of ``x`` —
    inside jit this is a free XLA broadcast that fuses into the leaf's
    first consumer, so the downstream program (normalizer statistics
    included) is bit-identical to the host-repeated layout. No-op for
    unpacked graphs and for leaves already at full batch width.
    """
    x = graph.x
    if x is None or x.ndim != 3 or graph.node_type.ndim != 1:
        return graph  # not the packed layout
    b = x.shape[1]
    if b <= 1:
        return graph

    def expand(a):
        if a is None or a.ndim < 2 or a.shape[1] != 1:
            return a
        return jnp.broadcast_to(a, a.shape[:1] + (b,) + a.shape[2:])

    return graph.replace(
        x=expand(graph.x),
        edge_attr=expand(graph.edge_attr),
        y=expand(graph.y),
        prev=expand(graph.prev),
        next_data=expand(graph.next_data),
        deselected=expand(graph.deselected),
        phi=expand(graph.phi),
    )


def single_of(packed: MeshGraph, b: int = 0) -> MeshGraph:
    """One sample of a packed graph as a plain single-graph MeshGraph."""

    def node_field(a):
        return None if a is None else a[:, b]

    return packed.replace(
        x=node_field(packed.x),
        edge_attr=node_field(packed.edge_attr),
        y=node_field(packed.y),
        prev=node_field(packed.prev),
        next_data=node_field(packed.next_data),
        deselected=node_field(packed.deselected),
        phi=node_field(packed.phi),
        wedge_senders=node_field(packed.wedge_senders),
        wedge_receivers=node_field(packed.wedge_receivers),
        wedge_mask=node_field(packed.wedge_mask),
        wedge_attr=node_field(packed.wedge_attr),
        time=packed.time[b] if getattr(packed.time, "ndim", 0) else packed.time,
    )


def unpack_nodes(out: jnp.ndarray) -> jnp.ndarray:
    """[N, B, F] model output → [B, N, F]."""
    return jnp.moveaxis(out, 0, 1)
