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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_physics_tpu.ops import segment


def _wtake(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample node gather for the world sidecar.

    ``arr`` [N, H, D] with ``idx`` [W] (single graph), or [N, B, H, D]
    with ``idx`` [W, B] (packed; idx[w, b] selects a row of sample b).

    Packed form flattens to (node, sample)-major ROW gathers — the same
    trick _wsegment uses — instead of ``take_along_axis`` with broadcast
    indices: the latter lowers to per-ELEMENT gathers on TPU (every
    (w, b, h, d) indexed independently), which left the plate fused step
    at 7.9 TF/s issued / ~90% MXU idle (round-5 canonical matrix).
    Row gathers of the [N·B, H·D] view move whole 256-byte lines.
    """
    if idx.ndim == 1:
        return jnp.take(arr, idx, axis=0)
    w, b = idx.shape
    n = arr.shape[0]
    flat = arr.reshape((n * b,) + arr.shape[2:])
    flat_ids = (idx * b + jnp.arange(b, dtype=idx.dtype)[None, :]).reshape(-1)
    return jnp.take(flat, flat_ids, axis=0).reshape((w, b) + arr.shape[2:])


def _bcast_like(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    m = mask
    while m.ndim < like.ndim:
        m = m[..., None]
    return m


def _wsegment(
    op, values: jnp.ndarray, idx: jnp.ndarray, n: int,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Per-sample scatter for the world sidecar: ``op`` over flattened
    (node, sample) segments. values [W, ...] with idx [W] (single), or
    [W, B, ...] with idx [W, B] (packed) → [N, ...] / [N, B, ...]."""
    if idx.ndim == 1:
        return op(values, idx, n, mask=mask)
    w, b = idx.shape
    flat_ids = (idx * b + jnp.arange(b, dtype=idx.dtype)[None, :]).reshape(-1)
    flat_vals = values.reshape((w * b,) + values.shape[2:])
    flat_mask = None if mask is None else mask.reshape(-1)
    out = op(flat_vals, flat_ids, n * b, mask=flat_mask)
    return out.reshape((n, b) + values.shape[2:])


def world_attention_parts(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    wedge_senders: jnp.ndarray,
    wedge_receivers: jnp.ndarray,
    wedge_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-receiver world-softmax pieces ``(num_w, den_w, s_w)``.

    The sidecar's contribution to a joint mesh+world softmax, shifted by
    the per-receiver world max ``s_w`` (stop-gradient — the combined
    softmax is invariant to the shift, so gradients through num/den alone
    are the exact total):
      num_w[r] = Σ_w exp(l_w − s_w[r]) · v[send_w]      [N, ..., H, D]
      den_w[r] = Σ_w exp(l_w − s_w[r])                  [N, ..., H]
    Receivers with no active world edges get num=den=0, s_w=0.
    """
    n = q.shape[0]
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    packed = wedge_senders.ndim == 2
    if packed:
        # scatter-free formulation (ops/world_gather.py): gathers are
        # row takes whose VJP is a one-hot MXU dot; scatters are one-hot
        # MXU dots whose VJP is a row take — TPU scatter-add fusions were
        # ~200 of the plate step's 265 ms (round-5 profile).
        from graph_physics_tpu.ops.world_gather import wscatter_sum, wtake

        q_w = wtake(q, wedge_receivers)
        k_w = wtake(k, wedge_senders)
    else:
        q_w = _wtake(q, wedge_receivers)
        k_w = _wtake(k, wedge_senders)
    logits = jnp.einsum(
        "...d,...d->...", q_w, k_w, preferred_element_type=jnp.float32
    ) * scale
    if packed:
        # per-(sample, head) GLOBAL shift instead of per-receiver max:
        # any shift >= the receiver max keeps exp <= 1, and the kernels
        # re-base exactly between shifts (fused_edge_attention_nk.py:
        # 455-466 wscale) — same convention as their own global tile
        # shift. Removes the segment_max scatter entirely.
        m = wedge_mask
        masked_logits = logits if m is None else jnp.where(
            _bcast_like(m, logits), logits, -jnp.inf
        )
        s_val = jnp.max(masked_logits, axis=0)  # [B, ...H]
        s_val = jnp.where(jnp.isfinite(s_val), s_val, 0.0)
        s_val = jax.lax.stop_gradient(s_val)
        s_w = jnp.broadcast_to(s_val[None], (n,) + s_val.shape)
        shifted = jnp.exp(logits - s_val[None])
        if m is not None:
            shifted = jnp.where(_bcast_like(m, shifted), shifted, 0.0)
        v_w = wtake(v, wedge_senders)
        payload = jnp.concatenate(
            [
                shifted[..., None].astype(jnp.float32),
                (v_w * shifted[..., None].astype(v.dtype)).astype(
                    jnp.float32
                ),
            ],
            axis=-1,
        )  # [W, B, H, 1 + D]: den and num share ONE one-hot contraction
        out = wscatter_sum(payload, wedge_receivers, n, wedge_mask)
        den_w = out[..., 0]
        num_w = out[..., 1:]
        return num_w, den_w, s_w
    s_w = _wsegment(segment.segment_max, logits, wedge_receivers, n,
                    wedge_mask)
    s_w = jnp.where(jnp.isfinite(s_w), s_w, 0.0)
    s_w = jax.lax.stop_gradient(s_w)
    shifted = jnp.exp(logits - _wtake(s_w, wedge_receivers))
    if wedge_mask is not None:
        m = wedge_mask
        while m.ndim < shifted.ndim:
            m = m[..., None]
        shifted = jnp.where(m, shifted, 0.0)
    den_w = _wsegment(segment.segment_sum, shifted, wedge_receivers, n,
                      None)
    v_w = _wtake(v, wedge_senders)
    num_w = _wsegment(
        segment.segment_sum, v_w * shifted[..., None].astype(v.dtype),
        wedge_receivers, n, None,
    )
    return num_w.astype(jnp.float32), den_w, s_w


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
    wedge_senders: Optional[jnp.ndarray] = None,
    wedge_receivers: Optional[jnp.ndarray] = None,
    wedge_mask: Optional[jnp.ndarray] = None,
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

    ``wedge_senders/receivers/mask``: per-sample world-edge sidecar
    ([W] single / [W, B] packed — MeshGraph.wedge_*). The softmax then
    runs JOINTLY over each receiver's mesh and world neighbors, exactly
    as if the world edges were concatenated into the edge list (the
    reference's layout, preprocessing.py:92-140).
    """
    n = q.shape[0]
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    has_world = wedge_senders is not None

    if sp_axis_name is not None:
        if has_world:
            raise NotImplementedError(
                "world-edge sidecar attention is not supported under sp "
                "sharding (shard the concat layout instead)"
            )
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

    if not has_world:
        alpha = segment.segment_softmax(logits, receivers, n, mask=edge_mask)

        v_e = gather_send(v)
        weighted = v_e * alpha[..., None].astype(v.dtype)
        out = segment.segment_sum(weighted, receivers, n, mask=edge_mask)
        if return_weights:
            return out, alpha
        return out

    if return_weights:
        raise NotImplementedError(
            "return_weights with the world-edge sidecar is not supported"
        )
    # joint softmax: shift both populations by the per-receiver max over
    # mesh AND world logits (stop-gradient — stability shift only)
    num_w, den_w, s_w = world_attention_parts(
        q, k, v, wedge_senders, wedge_receivers, wedge_mask
    )
    m_mesh = segment.segment_max(logits, receivers, n, mask=edge_mask)
    m = jnp.maximum(jnp.where(jnp.isfinite(m_mesh), m_mesh, 0.0), s_w)
    m = jax.lax.stop_gradient(m)
    exp_m = jnp.exp(logits - jnp.take(m, receivers, axis=0))
    if edge_mask is not None:
        em = edge_mask
        while em.ndim < exp_m.ndim:
            em = em[..., None]
        exp_m = jnp.where(em, exp_m, 0.0)
    den = segment.segment_sum(exp_m, receivers, n, None)
    v_e = gather_send(v)
    num = segment.segment_sum(
        v_e * exp_m[..., None].astype(v.dtype), receivers, n, None
    ).astype(jnp.float32)
    # fold in the world pieces, re-based from their own shift s_w to m
    w_scale = jnp.exp(s_w - m)
    den = den + den_w * w_scale
    num = num + num_w * w_scale[..., None]
    out = num / jnp.maximum(den, jnp.finfo(jnp.float32).tiny)[..., None]
    return out.astype(v.dtype)


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
