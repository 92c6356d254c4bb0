"""Static-shape mesh-graph pytree — the core data structure of the framework.

The reference passes PyG ``Data`` objects with dynamic node/edge counts
(graphphysics/utils/torch_graph.py:138-220). On TPU every jitted program is
compiled for one static shape, so ``MeshGraph`` carries arrays padded to a
shape *bucket* (see :mod:`graph_physics_tpu.core.padding`) together with
validity masks. Conventions:

  * Padded node rows are zero and carry ``node_type = PAD_NODE_TYPE`` (an
    id outside :class:`NodeType`), so type-based masks exclude them for free.
  * Edges are sorted by receiver (ascending) — the contract of the fused
    scatter kernel. Padded edges have ``senders == 0``,
    ``receivers == N-1`` (so they sort last) and ``edge_mask`` False;
    their messages are zeroed before any scatter, so the stray writes to
    the (padding) last node contribute nothing. Valid edges remain a
    prefix: ``edge_mask[:n_edge]`` is all True.
  * Batching stacks graphs of the same bucket on a leading axis and vmaps
    the model; edge MLPs then run as [B, E, F] batched GEMMs on the MXU.

All arrays are JAX arrays (or numpy on host before device put); the class
is a ``flax.struct`` dataclass and therefore a registered pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct

#: node_type value assigned to padding rows; outside every NodeType code.
PAD_NODE_TYPE = -1


@struct.dataclass
class MeshGraph:
    """One (possibly padded) mesh frame as a graph.

    Shapes use N = padded node count, E = padded edge count, F/T/D for
    feature/target/space dims. A leading batch axis may be present on every
    array when graphs are stacked (models vmap over it).
    """

    # --- node data ---
    x: jnp.ndarray  # [N, F] node features (incl. node-type column, time col)
    pos: jnp.ndarray  # [N, D] mesh positions
    node_type: jnp.ndarray  # [N] int32 (PAD_NODE_TYPE on padding)
    node_mask: jnp.ndarray  # [N] bool, True on valid nodes

    # --- connectivity ---
    senders: jnp.ndarray  # [E] int32 source node ids (0 on padding)
    receivers: jnp.ndarray  # [E] int32 target node ids (0 on padding)
    edge_mask: jnp.ndarray  # [E] bool, True on valid edges
    edge_attr: Optional[jnp.ndarray] = None  # [E, Fe]

    # --- supervision / rollout state ---
    y: Optional[jnp.ndarray] = None  # [N, T] next-step target fields
    prev: Optional[jnp.ndarray] = None  # [N, P] previous-step feature block
    next_data: Optional[jnp.ndarray] = None  # [N, Q] dynamic non-target fields at t+1

    # --- augmentation ---
    deselected: Optional[jnp.ndarray] = None  # [N] bool, True = node masked out of loss
    #: per-node scalar conditioning the GraphNetBlock aggregation gate
    #: (reference ``graph.phi``, layers.py:1091-1098) — an extension hook
    #: set by custom feature builders; None almost always
    phi: Optional[jnp.ndarray] = None  # [N] f32

    # --- per-sample world edges (sidecar layout) ---
    #: World edges change every FRAME (radius pairs between deformable and
    #: obstacle nodes track the moving geometry), which would break both
    #: trajectory-major packed batching (shared senders/receivers) and the
    #: fused kernels' per-trajectory tilings if they lived in the shared
    #: edge arrays. In the sidecar layout (WorldConfig.sidecar) the shared
    #: arrays carry ONLY the static mesh edges, and world edges ride here
    #: as per-sample arrays padded to the static ``edge_budget``:
    #: [W] int32 (single graph), [W, B] (packed), [B, W] (stacked).
    #: Inactive/padded slots: senders 0, receivers N-1, mask False.
    #: Spec equivalence: reference add_world_edges concatenates them into
    #: edge_index (preprocessing.py:92-140); consumers here (attention
    #: adjacency, GraphNetBlock aggregation, edge-feature normalization)
    #: fold the sidecar in so the math is identical per sample.
    wedge_senders: Optional[jnp.ndarray] = None
    wedge_receivers: Optional[jnp.ndarray] = None
    wedge_mask: Optional[jnp.ndarray] = None
    #: [W, Fe] / [W, B, Fe] / [B, W, Fe] world-edge features (models that
    #: consume edge features, i.e. the EPD family; None for transformers)
    wedge_attr: Optional[jnp.ndarray] = None

    # --- static mesh structure (host-side use: export, gradients) ---
    faces: Optional[jnp.ndarray] = None  # [C, 3] or [C, 4] int32 cells
    face_mask: Optional[jnp.ndarray] = None  # [C] bool

    # --- metadata ---
    n_node: Optional[jnp.ndarray] = None  # [] int32 true node count
    n_edge: Optional[jnp.ndarray] = None  # [] int32 true edge count
    traj_index: Optional[jnp.ndarray] = None  # [] int32
    time: Optional[jnp.ndarray] = None  # [] f32 physical time of the frame

    # --- fused-kernel runtime indices ---
    #: ``(win_start [G], sidx [G, Emax], ridx [G, Emax])`` int32 — the
    #: blocked-CSR local indices of this frame's topology
    #: (ops/tiling.apply_to_graph). Carried as RUNTIME pytree leaves so a
    #: jitted fused train step compiles once per shape bucket and serves
    #: every same-bucket topology (real datasets have ~1000 distinct
    #: meshes; baking indices in as constants would recompile per mesh).
    tiling_idx: Optional[Any] = None
    #: ``(win_start [G, wb], sidx [G, K*nb])`` int32 — runtime indices of
    #: the uniform-degree attention layout (ops/fused_edge_attention_nk);
    #: carried alongside tiling_idx so bucket-shared compiles also serve
    #: the NK kernel
    tiling_idx_nk: Optional[Any] = None

    # ------------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        """Padded (static) node count."""
        return self.x.shape[-2]

    @property
    def num_edges(self) -> int:
        """Padded (static) edge count."""
        return self.senders.shape[-1]

    @property
    def space_dim(self) -> int:
        return self.pos.shape[-1]


def valid_node_count(graph: MeshGraph) -> jnp.ndarray:
    """Number of valid (non-padding) nodes, as a traced scalar."""
    return jnp.sum(graph.node_mask.astype(jnp.int32), axis=-1)


def summarize(graph: MeshGraph) -> Dict[str, Any]:
    """Host-side debug summary (shapes only, no device sync)."""
    out = {}
    for name in ("x", "pos", "node_type", "senders", "edge_attr", "y"):
        v = getattr(graph, name)
        out[name] = None if v is None else tuple(v.shape)
    return out
