"""Mask-aware segment ops — the TPU replacement for torch-scatter.

The reference delegates message aggregation to torch-scatter / PyG
``MessagePassing(aggr="add")`` (graphphysics/models/layers.py:926,1031-1037)
and gradient accumulation to ``index_add_`` (utils/vectorial_operators.py:
107-127). Here the same contracts are expressed as XLA segment ops over
statically padded edge lists:

  * padded edges carry ``edge_mask=False`` and point at node 0; every op
    zeroes masked lanes *before* scattering so the stray writes vanish.
  * ``num_segments`` is the padded node count → static output shapes.

These XLA-level ops are the correctness baseline; the fused Pallas
GraphNetBlock kernel in :mod:`graph_physics_tpu.ops.fused_gnblock`
accelerates the same contract on the packed-batch hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mask_vals(values: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return values
    m = mask
    while m.ndim < values.ndim:
        m = m[..., None]
    return jnp.where(m, values, jnp.zeros_like(values))


def segment_sum(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked segment sum: out[i] = Σ_{e: seg[e]==i, mask[e]} values[e]."""
    return jax.ops.segment_sum(
        _mask_vals(values, mask), segment_ids, num_segments=num_segments
    )


def segment_mean(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked segment mean with safe division for empty segments."""
    s = segment_sum(values, segment_ids, num_segments, mask)
    ones = jnp.ones(values.shape[0], dtype=values.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask)
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt[(...,) + (None,) * (s.ndim - cnt.ndim)]


def segment_max(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    neutral: float = -jnp.inf,
) -> jnp.ndarray:
    """Masked segment max (neutral element on masked lanes/empty segments)."""
    v = values if mask is None else jnp.where(
        _bcast(mask, values), values, jnp.full_like(values, neutral)
    )
    return jax.ops.segment_max(v, segment_ids, num_segments=num_segments)


def _bcast(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    m = mask
    while m.ndim < like.ndim:
        m = m[..., None]
    return m


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax within each segment, masked lanes → 0.

    This is the TPU replacement for DGL's sparse ``softmax`` used in the
    edge-masked attention path (graphphysics/models/layers.py:512-556):
    per receiving node, softmax over its incoming edges.
    """
    # subtract per-segment max (stop-gradient for stability only)
    seg_max = segment_max(logits, segment_ids, num_segments, mask)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - jax.lax.stop_gradient(seg_max[segment_ids])
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(_bcast(mask, exp), exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.finfo(exp.dtype).tiny)
    return exp / denom[segment_ids]


def gather(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather; exists so the fused kernel can swap in transparently."""
    return jnp.take(values, idx, axis=0)
