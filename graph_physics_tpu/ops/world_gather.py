"""World-sidecar gather/scatter without TPU scatter-adds.

The round-5 plate profile (scripts/profile_plate.py + the compiled HLO)
put ~200 of the 265 ms/step in ~60 identical `scatter-add` fusions: the
forward ``segment_sum``s of the world softmax pieces (41 ms each per 10
steps) and the VJPs of the world gathers (32 ms each) — XLA lowers a
65k-row scatter-add into [N·B, H, D] as a serialized kCustom fusion on
TPU, while the MXU idles (7.9 TF/s issued on a step whose peers run
60-80).

These ops keep BOTH directions off the scatter path:

  ``wtake(arr, idx)``        fwd: flat (node, sample)-major ROW take —
                             gathers are DMA-fast; it is only their
                             transpose that scatters. bwd: one-hot MXU
                             contraction ``darr = ohᵀ @ ct``.
  ``wscatter_sum(vals, ...)``fwd: one-hot MXU contraction
                             ``out = ohᵀ @ vals`` (masked rows are zero
                             rows of oh). bwd: flat row take of the
                             cotangent (+ mask).

The one-hot operand is [B, W, N] fp32 built by iota-compare — exact
0/1, so the contraction reproduces scatter-add exactly up to f32
summation order. It streams from HBM per use (the price of staying in
XLA; the fused kernels generate their mesh-side one-hots in VMEM), but
an MXU dot streaming a [B·W·N] operand beats a serialized scatter by
~10x at plate shapes. Same trick as the kernels' oh_sT tiles
(fused_edge_attention_nk.py:442-449), lifted to XLA.

Single-graph ([W] indices) callers keep plain take/segment ops — at
B=1 the scatter is small and the rollout path reuses existing
compiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _onehot(idx: jnp.ndarray, n: int,
            mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[W, B] int32 -> [B, W, N] f32 one-hot; masked rows all-zero."""
    oh = jax.nn.one_hot(idx.transpose(1, 0), n, dtype=jnp.float32)
    if mask is not None:
        oh = oh * mask.transpose(1, 0)[..., None].astype(jnp.float32)
    return oh


def _flat_take(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather of the (node, sample)-major view: [N,B,F...],[W,B]->
    [W,B,F...]. The take runs on a strictly 2-D [N·B, prod(F)] view:
    with >=3-D operands XLA picked a dim-0-minor layout for the gather
    (rows non-contiguous — 5.5 ms/instance in the round-5 plate
    profile); 2-D keeps the feature axis minor and rows contiguous."""
    n, b = arr.shape[:2]
    w = idx.shape[0]
    flat = arr.reshape(n * b, -1)
    fids = (idx * b + jnp.arange(b, dtype=idx.dtype)[None, :]).reshape(-1)
    return jnp.take(flat, fids, axis=0).reshape((w, b) + arr.shape[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def wtake(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample node gather: arr [N, B, F...], idx [W, B] -> [W, B, F...]."""
    return _flat_take(arr, idx)


def _wtake_fwd(arr, idx):
    # zero-size carrier: residuals must be jax types, so n and the
    # dtype ride as an empty [N, 0] array instead of raw shape/dtype
    carrier = jnp.zeros((arr.shape[0], 0), arr.dtype)
    return _flat_take(arr, idx), (idx, carrier)


def _wtake_bwd(res, ct):
    idx, carrier = res
    n = carrier.shape[0]
    w, b = idx.shape
    oh = _onehot(idx, n, None)
    ctf = ct.reshape(w, b, -1).astype(jnp.float32)
    d = jnp.einsum("bwn,wbf->nbf", oh, ctf,
                   preferred_element_type=jnp.float32)
    d = d.reshape((n, b) + ct.shape[2:])
    return d.astype(carrier.dtype), None


wtake.defvjp(_wtake_fwd, _wtake_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def wscatter_sum(vals: jnp.ndarray, idx: jnp.ndarray, n: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-sample masked scatter-add: vals [W, B, F...], idx [W, B] ->
    [N, B, F...] (out[i, b] = sum over masked w with idx[w, b] == i)."""
    w, b = idx.shape
    oh = _onehot(idx, n, mask)
    vf = vals.reshape(w, b, -1).astype(jnp.float32)
    out = jnp.einsum("bwn,wbf->nbf", oh, vf,
                     preferred_element_type=jnp.float32)
    return out.reshape((n, b) + vals.shape[2:]).astype(vals.dtype)


def _wscatter_fwd(vals, idx, n, mask=None):
    carrier = jnp.zeros((0,), vals.dtype)
    return wscatter_sum(vals, idx, n, mask), (idx, mask, carrier)


def _wscatter_bwd(n, res, ct):
    idx, mask, carrier = res
    g = _flat_take(ct, idx)
    if mask is not None:
        m = mask
        while m.ndim < g.ndim:
            m = m[..., None]
        g = jnp.where(m, g, jnp.zeros_like(g))
    return g.astype(carrier.dtype), None, None


wscatter_sum.defvjp(_wscatter_fwd, _wscatter_bwd)
