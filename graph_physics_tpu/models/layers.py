"""NN building blocks (flax.linen) — the TPU re-design of the reference zoo.

Behavioral specs come from graphphysics/models/layers.py (file:line cited
per class). Differences by design:

  * modules are shape-polymorphic over a single padded graph [N, F]; the
    train step vmaps whole models over the batch axis, so edge/node MLPs
    become [B, E, F] batched GEMMs on the MXU;
  * sparse attention is the edge-list kernel in
    :mod:`graph_physics_tpu.ops.edge_attention` instead of DGL bsddmm/bspmm;
  * a ``dtype`` knob selects the compute dtype (bf16 by default on TPU)
    while parameters and softmax/norm statistics stay fp32;
  * activation checkpointing maps to ``jax.checkpoint`` (policy applied at
    the processor level rather than per-block torch.checkpoint).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_physics_tpu.ops import edge_attention as ea
from graph_physics_tpu.ops import segment
from graph_physics_tpu.ops.fused_gnblock import LANES as LANES_

Dtype = Any

def gelu_exact(x):
    """Erf-form GELU. The reference's ``nn.GELU()`` defaults to the exact
    (erf) form; ``jax.nn.gelu``'s default is the tanh approximation, which
    diverges by up to ~1e-3 — enough to fail cross-framework parity.

    Evaluated as ``x/2·(1+erf(x/√2))`` in fp32 rather than
    ``jax.nn.gelu(approximate=False)``: upstream's ``erfc(-x/√2)`` form
    lowers to TPU's tail-accurate (expensive) erfc — measured 26% of the
    whole transolver TRAIN STEP (5,013 → 6,315 g/s, same window A/B;
    even the tanh approximation was slower than fp32 erf). Same exact
    GELU to fp32 rounding (erfc(-z) ≡ 1+erf(z)); the cross-framework
    parity suite pins it against torch at 1e-5.
    """
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jax.lax.erf(xf * np.float32(0.7071067811865476)))
    return y.astype(jnp.result_type(x))


ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": gelu_exact,
    "silu": nn.silu,
}


def resolve_activation(name: Optional[str], use_silu: bool = False) -> Callable:
    """Activation registry (reference layers.py:150-161)."""
    if name is None:
        name = "silu" if use_silu else "relu"
    if name not in ACTIVATIONS:
        raise NotImplementedError(
            f"Activation '{name}' not supported. Available: {list(ACTIVATIONS)}."
        )
    return ACTIVATIONS[name]


class RMSNorm(nn.Module):
    """Root-mean-square norm with optional partial-RMS and bias.

    Spec: reference layers.py:73-129 — note the reference normalizes by
    (rms + eps), not sqrt(ms + eps); matched exactly. Statistics in fp32.
    """

    dim: int
    p: float = -1.0
    eps: float = 1e-8
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)

        def safe_norm(v):
            # sqrt(Σv²+tiny): forward-identical to ‖v‖ at fp32 but with a
            # finite gradient on all-zero rows (padded nodes)
            return jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)

        if self.p < 0.0 or self.p > 1.0:
            d_x = self.dim
            norm_x = safe_norm(xf)
        else:
            partial = int(self.dim * self.p)
            d_x = partial
            norm_x = safe_norm(xf[..., :partial])
        rms = norm_x / math.sqrt(max(d_x, 1))
        out = xf / (rms + self.eps) * scale
        if self.use_bias:
            offset = self.param("offset", nn.initializers.zeros, (self.dim,), jnp.float32)
            out = out + offset
        return out.astype(self.dtype)


class MLP(nn.Module):
    """Standard MLP: ``nb_of_layers`` Dense layers + optional RMSNorm tail.

    Spec: reference build_mlp (layers.py:163-210) — Linear/act pairs, final
    Linear, optional RMSNorm on the output.
    """

    hidden_size: int
    out_size: int
    nb_of_layers: int = 4
    layer_norm: bool = True
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        h = x.astype(self.dtype)
        for _ in range(self.nb_of_layers - 1):
            h = act(nn.Dense(self.hidden_size, dtype=self.dtype)(h))
        h = nn.Dense(self.out_size, dtype=self.dtype)(h)
        if self.layer_norm:
            h = RMSNorm(self.out_size, dtype=self.dtype)(h)
        return h


class GatedMLP(nn.Module):
    """Gated expansion: act(W1 x) * (W2 x), width = expansion * hidden.

    Spec: reference layers.py:213-249.
    """

    hidden_size: int
    expansion_factor: int = 3
    use_silu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = self.expansion_factor * self.hidden_size
        act = nn.silu if self.use_silu else gelu_exact
        left = act(nn.Dense(width, dtype=self.dtype)(x))
        right = nn.Dense(width, dtype=self.dtype)(x)
        return left * right


class GatedMLPBlock(nn.Module):
    """RMSNorm → GatedMLP → Linear(out) (reference build_gated_mlp :252-278)."""

    in_size: int
    hidden_size: int
    out_size: int
    expansion_factor: int = 3
    use_silu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = RMSNorm(self.in_size, dtype=self.dtype)(x)
        h = GatedMLP(
            hidden_size=self.hidden_size,
            expansion_factor=self.expansion_factor,
            use_silu=self.use_silu,
            dtype=self.dtype,
        )(h)
        return nn.Dense(self.out_size, dtype=self.dtype)(h)


# ----------------------------------------------------------------------
# RoPE
# ----------------------------------------------------------------------

def make_inv_freq(m: int, base: float) -> jnp.ndarray:
    """Inverse frequencies for spatial RoPE (reference layers.py:411-418)."""
    if m <= 0:
        return jnp.zeros((0,), jnp.float32)
    step = math.log(base) / max(m, 1)
    return jnp.exp(-jnp.arange(m, dtype=jnp.float32) * step)


def apply_spatial_rope(
    x: jnp.ndarray,  # [N, ..., Dh] (e.g. [N, H, Dh] or packed [N, B, H, Dh])
    pos: jnp.ndarray,  # [N, P] spatial positions
    inv_freq: jnp.ndarray,  # [m]
) -> jnp.ndarray:
    """Multi-axis spatial RoPE over the head dim.

    Spec: reference _apply_rope_with_inv (layers.py:421-490): the first
    ``P * 2m`` channels of each head are rotated, axis-by-axis, by angles
    pos[:, axis] * inv_freq; the remainder passes through. Layout here is
    heads-last-but-one rather than the reference's (N, Dh, H); math is
    identical. Extra middle dims (packed batch) broadcast.
    """
    p = pos.shape[-1]
    m = inv_freq.shape[0]
    d_rope = p * 2 * m
    if m == 0 or d_rope == 0:
        return x
    angles = pos[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]  # [N,P,m]
    mid = (1,) * (x.ndim - 2)  # broadcast over heads / packed-batch dims
    cos = jnp.cos(angles).reshape((x.shape[0],) + mid + (p, m))
    sin = jnp.sin(angles).reshape((x.shape[0],) + mid + (p, m))
    part = x[..., :d_rope].reshape(x.shape[:-1] + (p, m, 2))
    even = part[..., 0].astype(jnp.float32)
    odd = part[..., 1].astype(jnp.float32)
    rot_even = even * cos - odd * sin
    rot_odd = even * sin + odd * cos
    rot = jnp.stack([rot_even, rot_odd], axis=-1).reshape(x.shape[:-1] + (d_rope,))
    return jnp.concatenate([rot.astype(x.dtype), x[..., d_rope:]], axis=-1)


def apply_relative_rope(
    x_src: jnp.ndarray,  # [E, ..., C] source features (packed dims allowed)
    delta_pos: jnp.ndarray,  # [E, P]
    inv_freq: jnp.ndarray,  # [m]
    rope_axes: int,
) -> jnp.ndarray:
    """Relative RoPE on flat source features (GraphNetBlock variant).

    Spec: reference GraphNetBlock._apply_rope_rel (layers.py:1104-1149):
    channels are grouped per axis as [2m]*rope_axes, rotated by the edge's
    Δpos along that axis. Extra middle dims (packed batch) broadcast.
    """
    m = inv_freq.shape[0]
    if m == 0:
        return x_src
    e = x_src.shape[0]
    lead = x_src.shape[:-1]
    mid = (1,) * (x_src.ndim - 2)
    d_rope = rope_axes * 2 * m
    parts = []
    for axis in range(rope_axes):
        seg = x_src[..., axis * 2 * m : (axis + 1) * 2 * m].reshape(lead + (m, 2))
        theta = (
            delta_pos[:, axis].astype(jnp.float32).reshape((e,) + mid + (1,))
            * inv_freq.reshape((1,) * (x_src.ndim - 1) + (m,))
        )
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        even = seg[..., 0].astype(jnp.float32)
        odd = seg[..., 1].astype(jnp.float32)
        rot = jnp.stack([even * cos - odd * sin, even * sin + odd * cos], axis=-1)
        parts.append(rot.reshape(lead + (2 * m,)).astype(x_src.dtype))
    return jnp.concatenate(parts + [x_src[..., d_rope:]], axis=-1)


# ----------------------------------------------------------------------
# attention / transformer
# ----------------------------------------------------------------------

class Attention(nn.Module):
    """Edge-masked multi-head self-attention over graph nodes.

    Spec: reference Attention (layers.py:564-698): separate or shared
    Q/K/V projections, optional spatial RoPE, optional sigmoid output
    gate, output projection. The DGL sparse path is replaced by
    :func:`graph_physics_tpu.ops.edge_attention.edge_attention`; when
    ``senders is None`` attention is dense over all valid nodes (the
    reference's no-adjacency fallback).
    """

    hidden_size: int
    num_heads: int = 4
    pos_dimension: int = 3
    use_proj_bias: bool = True
    use_separate_proj_weight: bool = True
    use_rope_embeddings: bool = False
    use_gated_attention: bool = False
    rope_base: float = 10000.0
    sp_axis_name: Optional[str] = None
    sp_halo_size: Optional[int] = None
    #: blocked-CSR layout (ops/tiling.py): runs the edge attention through
    #: the fused Pallas kernel on packed bf16 inputs (None = XLA path)
    tiling: Optional[Any] = None
    #: uniform-degree layout (ops/fused_edge_attention_nk.py): preferred
    #: over the blocked-CSR kernel when set (fewer one-hot contractions —
    #: receiver-side moves become static K-slices). Must be built from the
    #: SAME edge set as ``tiling`` (validated via the CSR edge-count
    #: check). Dispatch: static topologies (tiling_idx None) use this
    #: tiling's baked indices; bucket-shared traces need runtime NK
    #: indices (tiling_idx_nk) or they stay on the CSR kernel — baking
    #: one topology's NK indices into a shared trace would be wrong.
    nk_tiling: Optional[Any] = None
    dtype: Dtype = jnp.float32

    def _fused_attn_ok(self, x, senders, kv, return_attention) -> bool:
        from graph_physics_tpu.ops.fused_gnblock import LANES

        t = self.tiling
        dh = self.hidden_size // self.num_heads
        return (
            t is not None
            and senders is not None
            and kv is None
            and not return_attention
            and self.sp_axis_name is None
            and self.dtype == jnp.bfloat16
            and x.ndim == 3
            and x.shape[0] == t.num_nodes
            and LANES % dh == 0
            and (x.shape[1] * self.hidden_size) % LANES == 0
            # the graph's edge array must BE the tiling's blocked edge set
            # (mirrors fused_path_ok): a non-blocked graph whose padded
            # node count merely coincides must not take the fused path
            and senders.shape[0] == t.num_groups * t.edges_per_block
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, C]
        senders: Optional[jnp.ndarray] = None,
        receivers: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        node_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        kv: Optional[jnp.ndarray] = None,
        return_attention: bool = False,
        tiling_idx=None,  # runtime (win_start, sidx, ridx) of the graph
        tiling_idx_nk=None,  # runtime (win_start, sidx) of the NK layout
        wedge_senders: Optional[jnp.ndarray] = None,  # world sidecar [W(,B)]
        wedge_receivers: Optional[jnp.ndarray] = None,
        wedge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if self.use_rope_embeddings and pos is None:
            raise ValueError("RoPE embeddings require positional information.")
        n = x.shape[0]
        lead = x.shape[:-1]  # [N] or packed [N, B]
        h, dh = self.num_heads, self.hidden_size // self.num_heads
        assert self.hidden_size % self.num_heads == 0

        q_proj = nn.Dense(self.hidden_size, use_bias=self.use_proj_bias, dtype=self.dtype, name="q_proj")
        if self.use_separate_proj_weight:
            k_proj = nn.Dense(self.hidden_size, use_bias=self.use_proj_bias, dtype=self.dtype, name="k_proj")
            v_proj = nn.Dense(self.hidden_size, use_bias=self.use_proj_bias, dtype=self.dtype, name="v_proj")
        else:
            k_proj = v_proj = q_proj

        src = x if kv is None else kv
        q = q_proj(x).reshape(lead + (h, dh))
        k = k_proj(src).reshape(lead + (h, dh))
        v = v_proj(src).reshape(lead + (h, dh))

        if self.use_rope_embeddings:
            m = dh // max(self.pos_dimension * 2, 1)
            inv = make_inv_freq(m, self.rope_base)
            q = apply_spatial_rope(q, pos[:, : self.pos_dimension], inv)
            k = apply_spatial_rope(k, pos[:, : self.pos_dimension], inv)

        has_world = wedge_senders is not None
        attn_weights = None
        if senders is not None and self._fused_attn_ok(
            x, senders, kv, return_attention
        ):
            world_parts = None
            if has_world:
                # per-sample world-edge softmax pieces (W ≤ edge_budget
                # rows — tiny XLA work); the kernels fold them into the
                # joint mesh+world softmax through node-aligned tiles
                world_parts = ea.world_attention_parts(
                    q, k, v, wedge_senders, wedge_receivers, wedge_mask
                )
            use_nk = (
                self.nk_tiling is not None
                and self.nk_tiling.num_nodes == self.tiling.num_nodes
                # static-topology dispatch, OR runtime NK indices riding
                # the graph (bucket-shared compiles)
                and (tiling_idx is None or tiling_idx_nk is not None)
            )
            if use_nk:
                from graph_physics_tpu.ops.fused_edge_attention_nk import (
                    fused_edge_attention_nk,
                )

                y = fused_edge_attention_nk(
                    q, k, v, self.nk_tiling,
                    interpret=jax.default_backend() != "tpu",
                    tiling_idx=tiling_idx_nk,
                    world_parts=world_parts,
                ).astype(self.dtype)
            else:
                from graph_physics_tpu.ops.fused_edge_attention import (
                    fused_edge_attention,
                )

                y = fused_edge_attention(
                    q, k, v, self.tiling,
                    interpret=jax.default_backend() != "tpu",
                    tiling_idx=tiling_idx,
                    world_parts=world_parts,
                ).astype(self.dtype)
        elif senders is not None:
            y = ea.edge_attention(
                q, k, v, senders, receivers, edge_mask,
                return_weights=return_attention,
                sp_axis_name=self.sp_axis_name,
                sp_halo_size=self.sp_halo_size,
                wedge_senders=wedge_senders,
                wedge_receivers=wedge_receivers,
                wedge_mask=wedge_mask,
            )
            if return_attention:
                y, attn_weights = y
        else:
            # dense attention over valid nodes (n = attention axis 0)
            logits = jnp.einsum(
                "n...hd,m...hd->...hnm", q, k, preferred_element_type=jnp.float32
            )
            logits = logits / math.sqrt(dh)
            if node_mask is not None:
                logits = jnp.where(node_mask[None, None, :], logits, -jnp.inf)
            alpha = jax.nn.softmax(logits, axis=-1)
            attn_weights = alpha
            y = jnp.einsum("...hnm,m...hd->n...hd", alpha.astype(v.dtype), v)

        if self.use_gated_attention:
            gate_proj = nn.Dense(
                self.hidden_size, use_bias=self.use_proj_bias, dtype=self.dtype, name="gate_proj"
            )
            gate = jax.nn.sigmoid(gate_proj(x)).reshape(lead + (h, dh))
            y = y * gate.astype(y.dtype)

        out = nn.Dense(self.hidden_size, use_bias=self.use_proj_bias, dtype=self.dtype, name="proj")(
            y.reshape(lead + (self.hidden_size,))
        )
        if return_attention:
            # per-edge weights [E, ..., H] (sparse) or dense [..., H, N, N]
            # (spec: reference Attention.return_attention, layers.py:685-698)
            return out, attn_weights
        return out


class TransformerBlock(nn.Module):
    """Pre-norm transformer block with gated-MLP FFN.

    Spec: reference Transformer (layers.py:700-819): x += attn(norm1(x));
    x += gated_mlp(norm2(x)). (The jraphphysics port is post-norm — a known
    divergence we deliberately do NOT reproduce; SURVEY.md §2.2.)
    """

    hidden_size: int
    num_heads: int = 4
    use_proj_bias: bool = True
    use_separate_proj_weight: bool = True
    use_rope_embeddings: bool = False
    use_gated_attention: bool = False
    pos_dimension: int = 3
    rope_base: float = 10000.0
    use_silu: bool = False
    sp_axis_name: Optional[str] = None
    sp_halo_size: Optional[int] = None
    #: blocked-CSR layout enabling the fused Pallas edge-attention kernel
    tiling: Optional[Any] = None
    #: uniform-degree layout (preferred; see Attention.nk_tiling)
    nk_tiling: Optional[Any] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        senders: Optional[jnp.ndarray] = None,
        receivers: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        node_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        tiling_idx=None,
        tiling_idx_nk=None,
        wedge_senders: Optional[jnp.ndarray] = None,
        wedge_receivers: Optional[jnp.ndarray] = None,
        wedge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        attn_out = Attention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            pos_dimension=self.pos_dimension,
            use_proj_bias=self.use_proj_bias,
            use_separate_proj_weight=self.use_separate_proj_weight,
            use_rope_embeddings=self.use_rope_embeddings,
            use_gated_attention=self.use_gated_attention,
            rope_base=self.rope_base,
            sp_axis_name=self.sp_axis_name,
            sp_halo_size=self.sp_halo_size,
            tiling=self.tiling,
            nk_tiling=self.nk_tiling,
            dtype=self.dtype,
            name="attention",
        )(
            RMSNorm(self.hidden_size, dtype=self.dtype, name="norm1")(x),
            senders,
            receivers,
            edge_mask,
            node_mask,
            pos,
            tiling_idx=tiling_idx,
            tiling_idx_nk=tiling_idx_nk,
            wedge_senders=wedge_senders,
            wedge_receivers=wedge_receivers,
            wedge_mask=wedge_mask,
        )
        x = x + attn_out
        ff = GatedMLPBlock(
            in_size=self.hidden_size,
            hidden_size=self.hidden_size,
            out_size=self.hidden_size,
            use_silu=self.use_silu,
            dtype=self.dtype,
            name="gated_mlp",
        )
        norm2 = RMSNorm(self.hidden_size, dtype=self.dtype, name="norm2")
        h = self.hidden_size
        if (
            self.tiling is not None
            and self.dtype == jnp.bfloat16
            and x.ndim == 3
            and LANES_ % h == 0
            and (x.shape[1] * h) % LANES_ == 0
            and x.shape[0] % 128 == 0
        ):
            # fused Pallas FFN: norm2 + the whole gated block in one
            # kernel pair (ops/fused_ffn); params materialized via
            # zero-row dummies, exactly like the GraphNetBlock fused path
            _ = ff(jnp.zeros((0, h), self.dtype))
            _ = norm2(jnp.zeros((0, h), self.dtype))
            from graph_physics_tpu.ops.fused_ffn import fused_gated_ffn

            return fused_gated_ffn(
                x.astype(self.dtype),
                ff.variables["params"],
                activation="silu" if self.use_silu else "gelu",
                interpret=jax.default_backend() != "tpu",
                norm2_scale=norm2.variables["params"]["scale"],
            ).astype(x.dtype)
        return x + ff(norm2(x))


class TemporalAttention(nn.Module):
    """Temporal corrector: cross-attention Q/V=predicted, K=previous.

    Spec: reference TemporalAttention (layers.py:822-887), including the
    sigmoid gate on the attention output and the final mixer MLP.
    """

    hidden_size: int
    num_heads: int = 4
    use_gate: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h_prev: jnp.ndarray,  # [N, C]
        h_pred: jnp.ndarray,  # [N, C]
        senders: Optional[jnp.ndarray] = None,
        receivers: Optional[jnp.ndarray] = None,
        edge_mask: Optional[jnp.ndarray] = None,
        node_mask: Optional[jnp.ndarray] = None,
        wedge_senders: Optional[jnp.ndarray] = None,
        wedge_receivers: Optional[jnp.ndarray] = None,
        wedge_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        lead = h_prev.shape[:-1]
        h, dh = self.num_heads, self.hidden_size // self.num_heads
        q = nn.Dense(self.hidden_size, dtype=self.dtype, name="q_proj")(h_pred).reshape(lead + (h, dh))
        k = nn.Dense(self.hidden_size, dtype=self.dtype, name="k_proj")(h_prev).reshape(lead + (h, dh))
        v = nn.Dense(self.hidden_size, dtype=self.dtype, name="v_proj")(h_pred).reshape(lead + (h, dh))

        if senders is not None:
            y = ea.edge_attention(q, k, v, senders, receivers, edge_mask,
                                  wedge_senders=wedge_senders,
                                  wedge_receivers=wedge_receivers,
                                  wedge_mask=wedge_mask)
        else:
            # adj=None fallback, matching the reference EXACTLY: its q/k/v
            # are reshaped (N, d, H) — heads LAST — so the dense
            # ``q @ k.transpose(-2, -1)`` (reference layers.py:509-520)
            # batches over N and computes a NODE-LOCAL d x d softmax mix
            # over the head axis, not cross-node attention. Transolver's
            # temporal head (reference transolver.py:386-390) runs this
            # path. Node-local => padded nodes cannot contaminate valid
            # ones, so node_mask is not needed here.
            logits = jnp.einsum(
                "...hi,...hj->...ij", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(dh)
            alpha = jax.nn.softmax(logits, axis=-1)
            y = jnp.einsum("...ij,...hj->...hi", alpha.astype(v.dtype), v)

        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(
            y.reshape(lead + (self.hidden_size,))
        )
        if self.use_gate:
            g_in = jnp.concatenate([h_pred, h_prev], axis=-1)
            g = nn.Dense(self.hidden_size, dtype=self.dtype, name="gate_0")(g_in)
            g = nn.Dense(self.hidden_size, dtype=self.dtype, name="gate_1")(nn.silu(g))
            out = jax.nn.sigmoid(g) * out
        h_corr = h_prev + out
        mix_in = jnp.concatenate([h_corr, h_prev], axis=-1)
        mix = nn.Dense(self.hidden_size, dtype=self.dtype, name="mixer_0")(mix_in)
        mix = nn.Dense(self.hidden_size, dtype=self.dtype, name="mixer_1")(nn.silu(mix))
        return h_corr + mix


def _wtake_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """World-sidecar node gather: x [N, F] with idx [W], or packed
    x [N, B, F] with per-sample idx [W, B] (idx[w, b] reads sample b).

    Packed form: scatter-free custom-vjp gather (ops/world_gather.wtake
    — fwd is a flat row take, bwd a one-hot MXU dot; the take's default
    VJP is a serialized TPU scatter-add, ~3-4 ms per instance in the
    round-5 plate profile)."""
    if idx.ndim == 1:
        return jnp.take(x, idx, axis=0)
    from graph_physics_tpu.ops.world_gather import wtake

    return wtake(x, idx)


def _wscatter_nodes(vals: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """World-sidecar scatter-add over (node, sample) segments — inverse
    layout of :func:`_wtake_nodes` (values pre-masked by the caller).

    Packed form: one-hot MXU contraction instead of a TPU scatter-add
    (ops/world_gather.wscatter_sum; round-5 plate profile)."""
    if idx.ndim == 1:
        return segment.segment_sum(vals, idx, n)
    from graph_physics_tpu.ops.world_gather import wscatter_sum

    return wscatter_sum(vals, idx, n)


def fused_path_ok(
    tiling,
    x,
    edge_attr,
    hidden_size: int,
    dtype,
    use_rope: bool,
    use_gate: bool,
    use_gated_mlp: bool,
    sp_axis_name,
    raw_edge: bool = False,
) -> bool:
    """Whether the fused Pallas GraphNetBlock applies to these inputs.

    Shared by GraphNetBlock and EncodeProcessDecode so the processor's
    skip-the-XLA-encoder decision can never diverge from the block's.
    ``raw_edge``: edge_attr carries RAW features (the encoder is folded
    into the kernel) rather than hidden-size ones.
    """
    from graph_physics_tpu.ops.fused_gnblock import LANES

    t = tiling
    return (
        t is not None
        and dtype == jnp.bfloat16  # the kernel computes in bf16
        and not use_rope
        and not use_gate
        and not use_gated_mlp
        and sp_axis_name is None
        and x.ndim == 3
        and edge_attr.ndim == 3
        and x.shape[-1] == hidden_size
        and LANES % hidden_size == 0
        and (x.shape[1] * hidden_size) % LANES == 0
        and x.shape[0] == t.num_nodes
        and edge_attr.shape[0] == t.num_groups * t.edges_per_block
        and (
            edge_attr.shape[-1] <= hidden_size // 2
            if raw_edge
            else edge_attr.shape[-1] == hidden_size
        )
    )


def fused_path_ok_nk(
    nk_tiling,
    x,
    edge_attr,
    hidden_size: int,
    dtype,
    use_rope: bool,
    use_gate: bool,
    use_gated_mlp: bool,
    sp_axis_name,
    raw_edge: bool = False,
) -> bool:
    """Whether the uniform-degree (NK) fused GraphNetBlock applies.

    Mirror of :func:`fused_path_ok` for graphs converted with
    :func:`ops.tiling.apply_to_graph_nk` — the edge arrays must BE the NK
    slot layout (``nk_total_rows`` rows; per-block-K bucket layouts
    included)."""
    from graph_physics_tpu.ops.fused_edge_attention_nk import (
        nk_total_rows as _nk_total_rows,
    )
    from graph_physics_tpu.ops.fused_gnblock import LANES

    t = nk_tiling
    return (
        t is not None
        and dtype == jnp.bfloat16
        and not use_rope
        and not use_gate
        and not use_gated_mlp
        and sp_axis_name is None
        and x.ndim == 3
        and edge_attr.ndim == 3
        and x.shape[-1] == hidden_size
        and LANES % hidden_size == 0
        and (x.shape[1] * hidden_size) % LANES == 0
        and x.shape[0] == t.num_nodes
        and edge_attr.shape[0] == _nk_total_rows(t)
        and (
            edge_attr.shape[-1] <= hidden_size // 2
            if raw_edge
            else edge_attr.shape[-1] == hidden_size
        )
    )


class GraphNetBlock(nn.Module):
    """Message-passing block with edge+node MLP updates and residuals.

    Spec: reference GraphNetBlock (layers.py:890-1149):
      edge' = MLP([e, x_recv, x_send]); agg = Σ_incoming edge';
      node' = MLP([x, agg]); residuals on both. Options: relative RoPE on
      source features (:1104-1149), φ-conditioned sigmoid gate on the
      aggregate (:1091-1098), gated-MLP variants.
    """

    hidden_size: int
    nb_of_layers: int = 4
    layer_norm: bool = True
    use_rope: bool = False
    rope_axes: int = 3
    rope_base: float = 10000.0
    use_gated_mlp: bool = False
    use_gate: bool = False
    activation: str = "relu"
    #: when set, senders carry GLOBAL node ids of an 'sp'-sharded graph and
    #: sender features/positions are fetched over ICI (parallel/sp.py)
    sp_axis_name: Optional[str] = None
    #: static halo row count per shard (shard_graph(halo=True) return value);
    #: switches the ICI fetch to the boundary-rows-only exchange
    sp_halo_size: Optional[int] = None
    #: blocked-CSR layout (ops/tiling.py) enabling the fused Pallas kernel
    #: on packed [N, B, H] inputs; static per topology. None = XLA path.
    tiling: Optional[Any] = None
    #: uniform-degree (NK) layout (ops/fused_edge_attention_nk.NKTiling) —
    #: the graph's edge arrays must be in the NK slot order
    #: (ops/tiling.apply_to_graph_nk). Set INSTEAD of ``tiling`` (the two
    #: layouts order edges differently); dispatch prefers NK when its
    #: shapes match.
    nk_tiling: Optional[Any] = None
    #: last processor block: the fused kernel elides its dead edge-output
    #: traffic (fwd eout write, bwd g_eout read); the caller must not use
    #: the returned edge array
    is_last_block: bool = False
    dtype: Dtype = jnp.float32

    def _fused_ok(self, x, edge_attr, raw_edge: bool = False) -> bool:
        """Whether the fused Pallas path applies to these inputs."""
        return fused_path_ok(
            self.tiling, x, edge_attr, self.hidden_size, self.dtype,
            self.use_rope, self.use_gate, self.use_gated_mlp,
            self.sp_axis_name, raw_edge=raw_edge,
        )

    def _fused_ok_nk(self, x, edge_attr, raw_edge: bool = False) -> bool:
        """Whether the uniform-degree fused path applies to these inputs."""
        return fused_path_ok_nk(
            self.nk_tiling, x, edge_attr, self.hidden_size, self.dtype,
            self.use_rope, self.use_gate, self.use_gated_mlp,
            self.sp_axis_name, raw_edge=raw_edge,
        )

    def _gather_send(self, arr: jnp.ndarray, senders: jnp.ndarray) -> jnp.ndarray:
        if self.sp_axis_name is not None:
            from graph_physics_tpu.parallel.sp import sp_gather

            return sp_gather(arr, senders, self.sp_axis_name, self.sp_halo_size)
        return jnp.take(arr, senders, axis=0)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, C]
        edge_attr: jnp.ndarray,  # [E, C]
        senders: jnp.ndarray,
        receivers: jnp.ndarray,
        edge_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        phi: Optional[jnp.ndarray] = None,
        edge_encoder_params=None,  # folded edge encoder (fused path only)
        tiling_idx=None,  # runtime (win_start, sidx, ridx) of the graph
        tiling_idx_nk=None,  # runtime (win_start, sidx) of the NK layout
        wedge_attr: Optional[jnp.ndarray] = None,  # world sidecar stream
        wedge_senders: Optional[jnp.ndarray] = None,
        wedge_receivers: Optional[jnp.ndarray] = None,
        wedge_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """Returns ``(x', edge_attr')`` — plus the updated world-edge
        stream ``wedge_attr'`` as a third element when the per-sample
        world sidecar is passed (its messages run through the SAME edge
        MLP and join the aggregation per sample)."""
        n = x.shape[0]
        has_world = wedge_attr is not None
        if has_world and self.use_rope:
            raise NotImplementedError(
                "relative RoPE with the world-edge sidecar is not "
                "supported (use the concat world layout)"
            )
        if self.use_gated_mlp:
            edge_block = GatedMLPBlock(
                in_size=3 * self.hidden_size,
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                dtype=self.dtype,
                name="edge_block",
            )
            node_block = GatedMLPBlock(
                in_size=2 * self.hidden_size,
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                dtype=self.dtype,
                name="node_block",
            )
        else:
            edge_block = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                nb_of_layers=self.nb_of_layers,
                layer_norm=self.layer_norm,
                activation=self.activation,
                dtype=self.dtype,
                name="edge_block",
            )
            node_block = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                nb_of_layers=self.nb_of_layers,
                layer_norm=self.layer_norm,
                activation=self.activation,
                dtype=self.dtype,
                name="node_block",
            )

        fold = edge_encoder_params is not None

        # per-sample world-edge stream: messages through the SAME edge
        # MLP, scattered per sample (W ≤ edge_budget rows — tiny XLA
        # work). The aggregate joins the fused kernels through their
        # node-aligned extra_agg seam; the XLA path adds it to its own
        # segment sum.
        world_agg = None
        w_upd = None
        if has_world:
            xw_send = _wtake_nodes(x, wedge_senders)
            xw_recv = _wtake_nodes(x, wedge_receivers)
            edge_in_w = jnp.concatenate(
                [wedge_attr.astype(self.dtype), xw_recv, xw_send], axis=-1
            )
            w_upd = edge_block(edge_in_w)
            wm = wedge_mask
            while wm.ndim < w_upd.ndim:
                wm = wm[..., None]
            w_upd = jnp.where(wm, w_upd, jnp.zeros((), w_upd.dtype))
            world_agg = _wscatter_nodes(w_upd, wedge_receivers, n)

        # NK dispatch requires the graph's edges to BE in the NK slot
        # order; runtime CSR indices (tiling_idx) mark a CSR-ordered graph
        # — never NK-dispatch those even when the shapes coincide (uniform
        # meshes: slots == Emax exactly)
        def _world_out(x_new, e_new):
            if not has_world:
                return x_new, e_new
            return x_new, e_new, wedge_attr + w_upd.astype(wedge_attr.dtype)

        if tiling_idx is None and self._fused_ok_nk(x, edge_attr,
                                                    raw_edge=fold):
            _ = edge_block(jnp.zeros((0, 3 * self.hidden_size), self.dtype))
            _ = node_block(jnp.zeros((0, 2 * self.hidden_size), self.dtype))
            from graph_physics_tpu.ops.fused_gnblock_nk import (
                fused_gn_block_nk,
            )

            x_new, e_new = fused_gn_block_nk(
                x.astype(self.dtype),
                edge_attr.astype(self.dtype),
                edge_block.variables["params"],
                node_block.variables["params"],
                self.nk_tiling,
                activation=self.activation,
                layer_norm=self.layer_norm,
                interpret=jax.default_backend() != "tpu",
                edge_encoder_params=edge_encoder_params,
                last_block=self.is_last_block,
                tiling_idx=tiling_idx_nk,
                extra_agg=world_agg,
            )
            return _world_out(x_new.astype(x.dtype),
                              e_new.astype(edge_attr.dtype))
        if self._fused_ok(x, edge_attr, raw_edge=fold):
            # materialize the MLP params (zero-row dummy: no compute), then
            # run the fused Pallas kernel on the same parameters
            _ = edge_block(jnp.zeros((0, 3 * self.hidden_size), self.dtype))
            _ = node_block(jnp.zeros((0, 2 * self.hidden_size), self.dtype))
            from graph_physics_tpu.ops.fused_gnblock import fused_gn_block

            x_new, e_new = fused_gn_block(
                x.astype(self.dtype),
                edge_attr.astype(self.dtype),
                edge_block.variables["params"],
                node_block.variables["params"],
                self.tiling,
                activation=self.activation,
                layer_norm=self.layer_norm,
                interpret=jax.default_backend() != "tpu",
                edge_encoder_params=edge_encoder_params,
                last_block=self.is_last_block,
                tiling_idx=tiling_idx,
                extra_agg=world_agg,
            )
            return _world_out(x_new.astype(x.dtype),
                              e_new.astype(edge_attr.dtype))
        if fold:
            raise ValueError(
                "edge_encoder_params given but the fused path does not "
                "apply to these inputs (processor/block decision mismatch)"
            )

        x_send = self._gather_send(x, senders)
        x_recv = jnp.take(x, receivers, axis=0)

        if self.use_rope:
            if pos is None:
                raise ValueError("Node positions `pos` required when use_rope=True.")
            m = self.hidden_size // (2 * self.rope_axes)
            if m == 0:
                raise ValueError(
                    f"hidden_size={self.hidden_size} too small for rope_axes={self.rope_axes}"
                )
            inv = make_inv_freq(m, self.rope_base)
            delta = (
                self._gather_send(pos[:, : self.rope_axes], senders)
                - jnp.take(pos[:, : self.rope_axes], receivers, axis=0)
            )
            x_send = apply_relative_rope(x_send, delta, inv, self.rope_axes)

        edge_in = jnp.concatenate([edge_attr, x_recv, x_send], axis=-1)
        edge_upd = edge_block(edge_in)

        agg = segment.segment_sum(edge_upd, receivers, n, mask=edge_mask)
        if world_agg is not None:
            agg = agg + world_agg.astype(agg.dtype)

        if self.use_gate:
            gate_logits = nn.Dense(self.hidden_size, dtype=self.dtype, name="gate_proj")(x)
            if phi is not None:
                gate_pos = self.param(
                    "gate_pos", nn.initializers.zeros, (self.hidden_size,), jnp.float32
                )
                gate_logits = gate_logits + phi[..., None].astype(self.dtype) * gate_pos.astype(self.dtype)
            agg = agg * jax.nn.sigmoid(gate_logits).astype(agg.dtype)

        node_in = jnp.concatenate([x, agg], axis=-1)
        node_upd = node_block(node_in)
        return _world_out(x + node_upd, edge_attr + edge_upd)
