"""Multigrid down/up sampling (opt-in, wired manually per reference README).

Spec: graphphysics/models/hierarchical_pooling.py:13-77 —
  * DownSampler: SelectTopK (learned projection, softmax scores, keep
    ratio·N) + kNN(k=6) remesh of the kept nodes, linear feature map;
  * UpSampler: knn_interpolate(k) of coarse features onto the fine
    positions + linear.

TPU re-design: static shapes — the coarse size is ``ceil(ratio * N_pad)``
and padded/unselected slots carry masks; kNN is the on-device brute-force
kernel (ops/knn.py). Instead of compacting arrays (a CUDA memory trick),
selection returns indices into the fine graph.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_physics_tpu.ops import knn as knn_lib

Dtype = Any


class CoarseGraph(NamedTuple):
    x: jnp.ndarray  # [C, d_out]
    pos: jnp.ndarray  # [C, D]
    node_index: jnp.ndarray  # [C] indices into the fine graph
    node_mask: jnp.ndarray  # [C]
    senders: jnp.ndarray  # [E_c]
    receivers: jnp.ndarray  # [E_c]
    edge_mask: jnp.ndarray  # [E_c]
    score: jnp.ndarray  # [C] selection scores (softmax weights)


class DownSampler(nn.Module):
    d_out: int
    ratio: float = 0.25
    k: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, d_in]
        pos: jnp.ndarray,  # [N, D]
        node_mask: Optional[jnp.ndarray] = None,
        attn: Optional[jnp.ndarray] = None,
    ) -> CoarseGraph:
        n, d_in = x.shape
        c = max(int(math.ceil(self.ratio * n)), 1)
        attn = x if attn is None else attn

        # SelectTopK: learned projection -> per-node score, softmax over
        # valid nodes, keep top ratio*N.
        w = self.param(
            "select_weight", nn.initializers.lecun_normal(), (attn.shape[-1], 1), jnp.float32
        )
        logits = (attn.astype(jnp.float32) @ w)[:, 0]
        if node_mask is not None:
            logits = jnp.where(node_mask, logits, -jnp.inf)
        score = jax.nn.softmax(logits)
        top_scores, perm = jax.lax.top_k(jnp.where(jnp.isfinite(logits), logits, -1e30), c)
        sel_mask = jnp.isfinite(top_scores) & (top_scores > -1e29)
        if node_mask is not None:
            sel_mask = sel_mask & jnp.take(node_mask, perm)

        x_c = nn.Dense(self.d_out, dtype=self.dtype, name="lin")(jnp.take(x, perm, axis=0))
        pos_c = jnp.take(pos, perm, axis=0)
        # push unselected slots far away so the kNN remesh ignores them
        pos_knn = jnp.where(sel_mask[:, None], pos_c, 1e20)

        senders, receivers, edge_mask = knn_lib.knn_graph(
            pos_knn, self.k, node_mask=sel_mask
        )
        return CoarseGraph(
            x=x_c,
            pos=pos_c,
            node_index=perm.astype(jnp.int32),
            node_mask=sel_mask,
            senders=senders,
            receivers=receivers,
            edge_mask=edge_mask,
            score=jnp.take(score, perm),
        )


class UpSampler(nn.Module):
    d_out: int
    k: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_coarse: jnp.ndarray,  # [C, d_in]
        pos_coarse: jnp.ndarray,  # [C, D]
        pos_fine: jnp.ndarray,  # [N, D]
        coarse_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        interp = knn_lib.knn_interpolate(
            x_coarse, pos_coarse, pos_fine, k=self.k, ref_mask=coarse_mask
        )
        return nn.Dense(self.d_out, dtype=self.dtype, name="lin")(interp)
