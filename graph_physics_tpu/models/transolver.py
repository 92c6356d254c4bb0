"""Transolver++ — slice-token physics attention (TPU re-design).

Behavioral spec: graphphysics/models/transolver.py (adapted by the
reference from thuml/Transolver_plus): learned-temperature gumbel-softmax
slice assignment (:19-33,133-135), eidetic slice tokens via einsum
reduction (:142-155), dense attention over the G slice tokens (:155-160),
de-slicing (:163), pre-LN blocks with ratio-MLP (:168-228), unified-pos
reference-grid distance features (:329-359), placeholder token (:318),
optional temporal corrector applied per sample (:386-391).

TPU-shaped differences:
  * operates on one padded graph [N, C] (the processor vmaps batches);
    padded nodes get zero slice weight so slice statistics are exact;
  * the reference's DDP ``all_reduce`` of slice_norm/slice_token
    (transolver.py:137-147) becomes ``jax.lax.psum`` over ``dp_axis_name``
    when the model runs under shard_map — slice tokens then see the global
    point cloud exactly like the reference intends;
  * gumbel noise uses an explicit PRNG collection ('gumbel'); without one
    the slice assignment falls back to the noise-free tempered softmax
    (deterministic rollouts);
  * everything under the attention runs in the configured compute dtype,
    softmaxes in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_physics_tpu.models.layers import MLP, TemporalAttention, gelu_exact
from graph_physics_tpu.ops import gumbel as gumbel_ops

Dtype = Any


def gumbel_softmax(
    logits: jnp.ndarray, tau: jnp.ndarray, rng: Optional[jax.Array], hard: bool = False,
    fused: bool = False,
) -> jnp.ndarray:
    """Tempered (optionally gumbel-perturbed / straight-through) softmax.

    Spec: transolver.py:19-33. ``tau`` broadcasts against ``logits``.
    ``fused=True`` draws the gumbel noise inside a Pallas kernel
    (ops/gumbel.py — on-chip PRNG, no HBM noise tensor; same
    distribution, different generator) when the [H, G] tail tiles onto
    the 128-lane layout; other shapes keep the XLA draw.
    """
    if rng is not None and fused and gumbel_ops.supported(logits.shape):
        y = gumbel_ops.gumbel_perturb(logits, rng)
    else:
        y = logits.astype(jnp.float32)
        if rng is not None:
            u = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
            y = y + (-jnp.log(-jnp.log(u + 1e-8) + 1e-8))
    y = jax.nn.softmax(y / tau.astype(jnp.float32), axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, y.shape[-1], dtype=y.dtype)
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y


class PhysicsAttention(nn.Module):
    """Physics_Attention_1D_Eidetic (transolver.py:35-166) on [N, C]."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    slice_num: int = 64
    dropout: float = 0.0
    use_rope_embeddings: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_gated_attention: bool = False
    dp_axis_name: Optional[str] = None
    #: draw training-time slice noise with the on-chip Pallas PRNG
    #: (ops/gumbel.py) instead of an XLA uniform + double-log pass
    fused_gumbel: bool = False
    dtype: Dtype = jnp.float32

    def _rope_features(self, pos: jnp.ndarray) -> jnp.ndarray:
        p = self.rope_pos_dimension
        pos_slice = pos[..., :p].astype(jnp.float32)
        inv_freq = jnp.exp(
            -jnp.arange(p, dtype=jnp.float32) * math.log(self.rope_base) / max(p, 1)
        )
        angles = pos_slice * inv_freq[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, C]
        pos: Optional[jnp.ndarray] = None,
        node_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        n = x.shape[0]
        h, d, g = self.heads, self.dim_head, self.slice_num
        inner = h * d

        x_mid = nn.Dense(inner, dtype=self.dtype, name="in_project_x")(x)
        x_mid = x_mid.reshape(n, h, d)

        if self.use_rope_embeddings and pos is not None:
            rope = self._rope_features(pos).astype(self.dtype)
            rope = nn.Dense(d, dtype=self.dtype, name="rope_projection")(rope)
            x_mid = x_mid + rope[:, None, :]

        # learned per-node/head temperature (+0.5-init bias, clamp 0.01)
        t = nn.Dense(g, dtype=self.dtype, name="proj_temperature_0")(x_mid)
        t = nn.Dense(1, dtype=self.dtype, name="proj_temperature_1")(gelu_exact(t))
        t = gelu_exact(t)
        bias = self.param(
            "bias", lambda k, s: jnp.full(s, 0.5, jnp.float32), (1, h, 1)
        )
        temperature = jnp.clip(t.astype(jnp.float32) + bias, min=0.01)  # [N,H,1]

        slice_logits = nn.Dense(
            g,
            dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(),
            name="in_project_slice",
        )(x_mid)  # [N,H,G]

        rng = None
        if self.has_rng("gumbel"):
            rng = self.make_rng("gumbel")
        slice_weights = gumbel_softmax(
            slice_logits, temperature, rng, fused=self.fused_gumbel
        )  # [N,H,G] f32

        if node_mask is not None:
            slice_weights = slice_weights * node_mask.astype(jnp.float32)[:, None, None]

        slice_norm = jnp.sum(slice_weights, axis=0)  # [H,G]
        slice_token = jnp.einsum(
            "nhd,nhg->hgd",
            x_mid.astype(jnp.float32),
            slice_weights,
            preferred_element_type=jnp.float32,
        )
        if self.dp_axis_name is not None:
            # the reference's dist all_reduce seam (transolver.py:137-147)
            slice_norm = jax.lax.psum(slice_norm, self.dp_axis_name)
            slice_token = jax.lax.psum(slice_token, self.dp_axis_name)
        slice_token = slice_token / (slice_norm + 1e-5)[:, :, None]
        slice_token = slice_token.astype(self.dtype)

        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(slice_token)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(slice_token)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(slice_token)
        logits = jnp.einsum(
            "hgd,hkd->hgk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(d)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out_token = jnp.einsum("hgk,hkd->hgd", attn, v)

        if self.use_gated_attention:
            gate_in = jnp.concatenate([slice_token, out_token], axis=-1)
            gate = nn.Dense(d, dtype=self.dtype, name="attn_gate_0")(gate_in)
            gate = nn.Dense(d, dtype=self.dtype, name="attn_gate_1")(nn.silu(gate))
            out_token = jax.nn.sigmoid(gate) * out_token

        out_x = jnp.einsum(
            "hgd,nhg->nhd", out_token, slice_weights.astype(self.dtype)
        ).reshape(n, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out_x)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class TransolverBlock(nn.Module):
    """Transolver_plus_block (transolver.py:168-228): pre-LN attn + MLP."""

    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    mlp_ratio: int = 4
    last_layer: bool = False
    out_dim: int = 1
    slice_num: int = 32
    use_rope_embeddings: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_gated_attention: bool = False
    dp_axis_name: Optional[str] = None
    fused_gumbel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fx, pos=None, node_mask=None, deterministic: bool = True):
        attn = PhysicsAttention(
            dim=self.hidden_dim,
            heads=self.num_heads,
            dim_head=self.hidden_dim // self.num_heads,
            slice_num=self.slice_num,
            dropout=self.dropout,
            use_rope_embeddings=self.use_rope_embeddings,
            rope_pos_dimension=self.rope_pos_dimension,
            rope_base=self.rope_base,
            use_gated_attention=self.use_gated_attention,
            dp_axis_name=self.dp_axis_name,
            fused_gumbel=self.fused_gumbel,
            dtype=self.dtype,
            name="Attn",
        )
        fx = fx + attn(
            # epsilon=1e-5 matches torch nn.LayerNorm (flax default is 1e-6)
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(fx),
            pos,
            node_mask,
            deterministic,
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(fx)
        h = MLP(
            hidden_size=self.hidden_dim * self.mlp_ratio,
            out_size=self.hidden_dim,
            nb_of_layers=2,
            layer_norm=False,
            activation="gelu",
            dtype=self.dtype,
            name="mlp",
        )(h)
        fx = fx + h
        if self.last_layer:
            fx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_3")(fx)
            fx = nn.Dense(self.out_dim, dtype=self.dtype, name="mlp2")(fx)
        return fx


class TransolverModel(nn.Module):
    """Model (transolver.py:231-394) on a single graph [N, C]."""

    n_layers: int = 5
    n_hidden: int = 256
    n_head: int = 8
    mlp_ratio: int = 1
    fun_dim: int = 1
    out_dim: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    space_dim: int = 0
    dropout: float = 0.0
    use_rope_embeddings: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_gated_attention: bool = False
    use_temporal_block: bool = False
    dp_axis_name: Optional[str] = None
    fused_gumbel: bool = False
    dtype: Dtype = jnp.float32

    def _ref_grid(self) -> np.ndarray:
        """Fixed reference lattice (transolver.py:329-352): x∈[-1.5,1.5],
        y∈[0,2], z∈[-4,4], ref points per axis."""
        r = self.ref
        gx = np.linspace(-1.5, 1.5, r)
        gy = np.linspace(0.0, 2.0, r)
        gz = np.linspace(-4.0, 4.0, r)
        xx, yy, zz = np.meshgrid(gx, gy, gz, indexing="ij")
        return np.stack([xx, yy, zz], axis=-1).reshape(r**3, 3).astype(np.float32)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [N, fun_dim]
        pos: Optional[jnp.ndarray] = None,
        node_mask: Optional[jnp.ndarray] = None,
        condition: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.use_rope_embeddings and pos is None:
            raise ValueError("use_rope_embeddings=True requires node positions.")

        if self.unified_pos and pos is not None:
            grid = jnp.asarray(self._ref_grid())  # [R,3]
            p3 = pos[:, :3] if pos.shape[-1] >= 3 else jnp.pad(
                pos, ((0, 0), (0, 3 - pos.shape[-1]))
            )
            dist = jnp.sqrt(
                jnp.sum((p3[:, None, :] - grid[None, :, :]) ** 2, axis=-1)
            )  # [N, R]
            x = jnp.concatenate([x, dist.astype(x.dtype)], axis=-1)

        fx = MLP(
            hidden_size=self.n_hidden * 2,
            out_size=self.n_hidden,
            nb_of_layers=2,
            layer_norm=False,
            activation="gelu",
            dtype=self.dtype,
            name="preprocess",
        )(x.astype(self.dtype))
        placeholder = self.param(
            "placeholder",
            lambda k, s: (1.0 / self.n_hidden)
            * jax.random.uniform(k, s, jnp.float32),
            (self.n_hidden,),
        )
        fx = fx + placeholder.astype(self.dtype)[None, :]

        if condition is not None:
            cond = nn.Dense(self.n_hidden, dtype=self.dtype, name="embedding")(condition)
            fx = fx + cond[None, :]

        common = dict(
            num_heads=self.n_head,
            hidden_dim=self.n_hidden,
            dropout=self.dropout,
            mlp_ratio=self.mlp_ratio,
            out_dim=self.out_dim,
            slice_num=self.slice_num,
            use_rope_embeddings=self.use_rope_embeddings,
            rope_pos_dimension=self.rope_pos_dimension,
            rope_base=self.rope_base,
            use_gated_attention=self.use_gated_attention,
            dp_axis_name=self.dp_axis_name,
            fused_gumbel=self.fused_gumbel,
            dtype=self.dtype,
        )
        prev_fx = fx
        for i in range(self.n_layers):
            prev_fx = fx
            last = (not self.use_temporal_block) and i == self.n_layers - 1
            fx = TransolverBlock(last_layer=last, name=f"blocks_{i}", **common)(
                fx, pos, node_mask, deterministic
            )

        if self.use_temporal_block:
            fx = TemporalAttention(
                hidden_size=self.n_hidden,
                num_heads=self.n_head,
                use_gate=self.use_gated_attention,
                dtype=self.dtype,
                name="temporal_block",
            )(prev_fx, fx, node_mask=node_mask)
            fx = nn.Dense(self.out_dim, dtype=self.dtype, name="output_proj")(fx)
        return fx.astype(jnp.float32)
