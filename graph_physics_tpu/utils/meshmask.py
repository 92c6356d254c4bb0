"""Masked-autoencoder graph ops (MeshMask).

Spec: graphphysics/utils/meshmask.py:9-118 — (1) restrict a graph to a
selected node subset, dropping edges that touch masked nodes; (2)
reconstruct a full-resolution latent graph by filling masked nodes/edges
with learned [MASK] tokens and copying encoded values for kept ones.

TPU re-design: no compaction — static shapes are preserved and the subset
is expressed through masks. ``filter_edges`` therefore returns the
edge-kept mask (the quantity every downstream op needs) instead of a
re-indexed edge list; padded/masked lanes stay in place.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from graph_physics_tpu.core.graph import MeshGraph


def filter_edges(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    keep_nodes: jnp.ndarray,  # [N] bool
    edge_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Edge-kept mask: both endpoints must be kept (meshmask.py:9-37)."""
    kept = jnp.take(keep_nodes, senders) & jnp.take(keep_nodes, receivers)
    if edge_mask is not None:
        kept = kept & edge_mask
    return kept


def build_masked_graph(
    graph: MeshGraph, keep_nodes: jnp.ndarray
) -> Tuple[MeshGraph, jnp.ndarray]:
    """Restrict ``graph`` to ``keep_nodes`` (static-shape masking).

    Spec: meshmask.py:40-71. Returns (masked graph, edges_kept mask).
    Masked nodes get zeroed features and node_mask False; edges touching
    them get edge_mask False.
    """
    edges_kept = filter_edges(
        graph.senders, graph.receivers, keep_nodes, graph.edge_mask
    )
    keep = keep_nodes & graph.node_mask
    x = jnp.where(keep[:, None], graph.x, 0.0)
    ea = graph.edge_attr
    if ea is not None:
        ea = jnp.where(edges_kept[:, None], ea, 0.0)
    masked = graph.replace(
        x=x, node_mask=keep, edge_mask=edges_kept, edge_attr=ea
    )
    return masked, edges_kept


def reconstruct_graph(
    graph: MeshGraph,
    latent_x: jnp.ndarray,  # [N, F_latent] encoded features of kept nodes
    keep_nodes: jnp.ndarray,  # [N] bool
    node_mask_token: jnp.ndarray,  # [F_latent]
    edges_kept: Optional[jnp.ndarray] = None,
    latent_edge_attr: Optional[jnp.ndarray] = None,  # [E, Fe_latent]
    encoded_edge_attr: Optional[jnp.ndarray] = None,  # [E, Fe_latent] raw-encoded
    edge_mask_token: Optional[jnp.ndarray] = None,  # [Fe_latent]
) -> MeshGraph:
    """Fill masked nodes/edges with [MASK] tokens (meshmask.py:73-118).

    ``latent_x`` rows at kept positions are used as-is; other rows become
    the node [MASK] token. When edge reconstruction is requested,
    ``encoded_edge_attr`` (the freshly encoded raw edge features) gets the
    edge token added everywhere, then kept edges are overwritten with
    ``latent_edge_attr``.
    """
    features = jnp.where(
        keep_nodes[:, None],
        latent_x,
        node_mask_token[None, :].astype(latent_x.dtype),
    )
    ea = graph.edge_attr
    if encoded_edge_attr is not None:
        assert edge_mask_token is not None and edges_kept is not None
        ea = encoded_edge_attr + edge_mask_token[None, :].astype(encoded_edge_attr.dtype)
        if latent_edge_attr is not None:
            ea = jnp.where(edges_kept[:, None], latent_edge_attr, ea)
    return graph.replace(x=features, edge_attr=ea)
