"""Edge-masked multi-head attention as SDDMM → segment-softmax → SpMM.

TPU-native replacement for the DGL sparse attention path of the reference
(graphphysics/models/layers.py:493-561: ``bsddmm`` computes QK^T only on
adjacency edges, sparse softmax per row, ``bspmm`` aggregates V). On TPU we
express the same math over a statically padded edge list:

  1. SDDMM:     logit[e,h] = <q[recv[e],h,:], k[send[e],h,:]> / sqrt(D)
  2. softmax:   alpha = segment_softmax over incoming edges of each node
  3. SpMM:      out[n,h,:] = Σ_{e: recv[e]==n} alpha[e,h] · v[send[e],h,:]

Gather/scatter are row-wise on [N, H*D] blocks, which XLA lowers to
efficient dynamic-gather + scatter-add; the flat layout keeps the lane
dimension (H*D) contiguous and 128-aligned whenever hidden sizes are.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from graph_physics_tpu.ops import segment


def edge_attention(
    q: jnp.ndarray,  # [N, ..., H, D] (extra dims = packed batch)
    k: jnp.ndarray,
    v: jnp.ndarray,
    senders: jnp.ndarray,  # [E]
    receivers: jnp.ndarray,  # [E]
    edge_mask: Optional[jnp.ndarray] = None,  # [E] bool
    return_weights: bool = False,
    sp_axis_name: Optional[str] = None,
    sp_halo_size: Optional[int] = None,
):
    """Multi-head attention restricted to graph edges.

    Returns [N, ..., H, D] (and optionally per-edge weights [E, ..., H]).
    Padded edges (mask False) contribute nothing; nodes with no valid
    incoming edges return zeros. Works on the trajectory-major packed
    layout ([N, B, H, D], node axis first) unchanged — gathers/scatters
    act on axis 0 and move wide rows (the TPU-efficient path).

    ``sp_axis_name``: under shard_map with nodes sharded over that axis,
    senders carry GLOBAL node ids and k/v rows are fetched over ICI
    (parallel/sp.py); receivers stay local. ``sp_halo_size`` switches that
    fetch to the boundary-rows-only halo exchange (shard_graph(halo=True)).
    """
    n = q.shape[0]
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))

    if sp_axis_name is not None:
        from graph_physics_tpu.parallel.sp import sp_gather

        gather_send = lambda a: sp_gather(a, senders, sp_axis_name, sp_halo_size)
    else:
        gather_send = lambda a: jnp.take(a, senders, axis=0)

    q_e = jnp.take(q, receivers, axis=0)  # [E, ..., H, D]
    k_e = gather_send(k)
    # fp32 logits regardless of compute dtype: softmax stability.
    logits = jnp.einsum(
        "...d,...d->...", q_e, k_e, preferred_element_type=jnp.float32
    ) * scale

    alpha = segment.segment_softmax(logits, receivers, n, mask=edge_mask)

    v_e = gather_send(v)
    weighted = v_e * alpha[..., None].astype(v.dtype)
    out = segment.segment_sum(weighted, receivers, n, mask=edge_mask)
    if return_weights:
        return out, alpha
    return out


def cross_edge_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: Optional[jnp.ndarray] = None,
):
    """Cross-attention over edges (q from receivers, k/v from senders).

    Same kernel as :func:`edge_attention`; kept as an explicit alias for
    the temporal-corrector use (reference TemporalAttention,
    graphphysics/models/layers.py:822-887, where K comes from the previous
    hidden state).
    """
    return edge_attention(q, k, v, senders, receivers, edge_mask)
