"""Model architectures behind one ``model(graph) -> node outputs`` API.

Specs from graphphysics/models/processors.py:
  * :class:`EncodeProcessDecode` (:57-216) — MeshGraphNet: node+edge MLP
    encoders, M GraphNetBlocks, MLP decoder without final norm,
    ``only_processor`` mode, optional temporal corrector fed with the
    second-to-last and last hidden states (:204-209).
  * :class:`EncodeTransformDecode` (:218-385) — node encoder, M pre-norm
    transformer blocks with edge-masked sparse attention, decoder. The
    reference's no-DGL ``TransformerConv`` fallback is unnecessary here:
    the edge-attention kernel is always available.
  * :class:`TransolverProcessor` (:387-461) — adapter around the
    Transolver++ physics-attention model (models/transolver.py).

All processors consume a single padded :class:`MeshGraph` whose ``x`` /
``edge_attr`` are already normalized by the Simulator; batching is done by
vmapping the whole processor.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from graph_physics_tpu.core.graph import MeshGraph
#: fold the edge encoder into block 0's fused kernels (perf knob;
#: measured trade-off in BASELINE.md)
FOLD_EDGE_ENCODER = True

from graph_physics_tpu.models.layers import (
    MLP,
    GraphNetBlock,
    TemporalAttention,
    TransformerBlock,
    fused_path_ok,
    fused_path_ok_nk,
)

Dtype = Any


class EncodeProcessDecode(nn.Module):
    message_passing_num: int
    node_input_size: int
    edge_input_size: int
    output_size: int
    hidden_size: int = 128
    only_processor: bool = False
    use_rope_embeddings: bool = False
    use_gated_attention: bool = False
    use_gated_mlp: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_temporal_block: bool = False
    remat: bool = False
    sp_axis_name: Optional[str] = None
    sp_halo_size: Optional[int] = None
    #: blocked-CSR edge layout (ops/tiling.py) — enables the fused Pallas
    #: GraphNetBlock on packed batches; the graph's edge arrays must be in
    #: the blocked order (tiling.apply_to_graph).
    edge_tiling: Optional[Any] = None
    #: uniform-degree (NK) edge layout (ops/fused_edge_attention_nk
    #: .NKTiling) — runs the fused NK GraphNetBlock instead; the graph's
    #: edge arrays must be in the NK slot order (tiling.apply_to_graph_nk).
    #: Set INSTEAD of edge_tiling (the layouts order edges differently).
    edge_tiling_nk: Optional[Any] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, graph: MeshGraph) -> jnp.ndarray:
        if self.use_rope_embeddings and self.rope_pos_dimension not in (2, 3):
            raise ValueError("rope_pos_dimension must be 2 or 3 when use_rope_embeddings=True.")
        x = graph.x.astype(self.dtype)
        edge_attr = graph.edge_attr.astype(self.dtype)
        enc_params = None
        if not self.only_processor:
            x = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                dtype=self.dtype,
                name="nodes_encoder",
            )(x)
            self.sow("intermediates", "node_encoding", x)
            edges_encoder = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                dtype=self.dtype,
                name="edges_encoder",
            )
            # fused packed path: the edge encoder folds into block 0's
            # Pallas kernels — the full-size encoded-edge array never
            # round-trips HBM. Same predicate the blocks use, with the
            # RAW edge feature width.
            # module-global knob: read at call time so perf sweeps can
            # flip processors.FOLD_EDGE_ENCODER
            fold = FOLD_EDGE_ENCODER and (
                fused_path_ok(
                    self.edge_tiling, x, edge_attr, self.hidden_size,
                    self.dtype, self.use_rope_embeddings,
                    self.use_gated_attention, self.use_gated_mlp,
                    self.sp_axis_name, raw_edge=True,
                )
                or fused_path_ok_nk(
                    self.edge_tiling_nk, x, edge_attr, self.hidden_size,
                    self.dtype, self.use_rope_embeddings,
                    self.use_gated_attention, self.use_gated_mlp,
                    self.sp_axis_name, raw_edge=True,
                )
            )
            if fold:
                _ = edges_encoder(
                    jnp.zeros((0, edge_attr.shape[-1]), self.dtype)
                )
                enc_params = edges_encoder.variables["params"]
            else:
                edge_attr = edges_encoder(edge_attr)

        # per-sample world-edge sidecar: its (tiny) stream always encodes
        # and updates in XLA — even when the mesh-edge encoder is folded
        # into the fused kernels — and joins each block's aggregation
        wedge_attr = graph.wedge_attr
        if wedge_attr is not None:
            wedge_attr = wedge_attr.astype(self.dtype)
            if not self.only_processor:
                wedge_attr = edges_encoder(wedge_attr)

        pos = graph.pos if self.use_rope_embeddings else None
        # φ-conditioned aggregation gating (reference processors.py:193 —
        # phi is read off the graph only when the gate is active)
        phi = graph.phi if self.use_gated_attention else None

        block_cls = GraphNetBlock
        if self.remat:
            block_cls = nn.remat(GraphNetBlock, static_argnums=())

        prev_x = x
        for i in range(self.message_passing_num):
            prev_x = x
            out = block_cls(
                hidden_size=self.hidden_size,
                use_gated_mlp=self.use_gated_mlp,
                use_rope=self.use_rope_embeddings,
                rope_axes=self.rope_pos_dimension,
                rope_base=self.rope_base,
                use_gate=self.use_gated_attention,
                sp_axis_name=self.sp_axis_name,
                sp_halo_size=self.sp_halo_size,
                tiling=self.edge_tiling,
                nk_tiling=self.edge_tiling_nk,
                # the final edge output is dead (only x feeds the decoder/
                # temporal block) — the fused kernel skips its traffic
                is_last_block=(i == self.message_passing_num - 1),
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                x,
                edge_attr,
                graph.senders,
                graph.receivers,
                graph.edge_mask,
                pos,
                phi,
                edge_encoder_params=enc_params if i == 0 else None,
                tiling_idx=graph.tiling_idx,
                tiling_idx_nk=graph.tiling_idx_nk,
                wedge_attr=wedge_attr,
                wedge_senders=graph.wedge_senders,
                wedge_receivers=graph.wedge_receivers,
                wedge_mask=graph.wedge_mask,
            )
            if wedge_attr is not None:
                x, edge_attr, wedge_attr = out
            else:
                x, edge_attr = out

        if self.use_temporal_block:
            x = TemporalAttention(
                hidden_size=self.hidden_size, dtype=self.dtype, name="temporal_block"
            )(prev_x, x, graph.senders, graph.receivers, graph.edge_mask,
              wedge_senders=graph.wedge_senders,
              wedge_receivers=graph.wedge_receivers,
              wedge_mask=graph.wedge_mask)

        if self.only_processor:
            return x
        self.sow("intermediates", "penultimate", x)
        return MLP(
            hidden_size=self.hidden_size,
            out_size=self.output_size,
            layer_norm=False,
            dtype=self.dtype,
            name="decode_module",
        )(x).astype(jnp.float32)


class EncodeTransformDecode(nn.Module):
    message_passing_num: int
    node_input_size: int
    output_size: int
    hidden_size: int = 128
    num_heads: int = 4
    only_processor: bool = False
    use_rope_embeddings: bool = False
    use_gated_attention: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_temporal_block: bool = False
    use_silu: bool = False
    remat: bool = False
    sp_axis_name: Optional[str] = None
    sp_halo_size: Optional[int] = None
    #: blocked-CSR edge layout (ops/tiling.py) — runs the edge attention
    #: through the fused Pallas kernel on packed bf16 batches
    edge_tiling: Optional[Any] = None
    #: uniform-degree attention layout (ops/fused_edge_attention_nk) —
    #: preferred over edge_tiling's kernel when set; must be built from
    #: the same edge set. Static topologies dispatch on this tiling's
    #: baked indices; bucket-shared compiles ride graph.tiling_idx_nk
    edge_tiling_nk: Optional[Any] = None
    #: multigrid (reference README.md:430-462 manual wiring, made a
    #: config option): coarsen to ``ratio·N`` top-k nodes with a kNN
    #: remesh after the encoder, run every transformer block on the
    #: coarse graph, knn-interpolate back with a residual add. Stacked/
    #: single-sample layouts only (selection is per-sample by nature).
    use_multigrid: bool = False
    multigrid_ratio: float = 0.5
    multigrid_k: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, graph: MeshGraph) -> jnp.ndarray:
        x = graph.x.astype(self.dtype)
        if not self.only_processor:
            x = MLP(
                hidden_size=self.hidden_size,
                out_size=self.hidden_size,
                dtype=self.dtype,
                name="nodes_encoder",
            )(x)
            self.sow("intermediates", "node_encoding", x)

        pos = graph.pos
        if self.use_rope_embeddings and pos is None:
            raise ValueError("use_rope_embeddings=True requires node positions.")

        senders, receivers = graph.senders, graph.receivers
        edge_mask, node_mask = graph.edge_mask, graph.node_mask
        tiling_idx, tiling_idx_nk = graph.tiling_idx, graph.tiling_idx_nk
        x_fine = x
        coarse = None
        if self.use_multigrid:
            if graph.wedge_senders is not None:
                raise NotImplementedError(
                    "use_multigrid with the world-edge sidecar is not "
                    "supported (use the concat world layout)"
                )
            if x.ndim != 2:
                raise ValueError(
                    "use_multigrid supports the stacked/single-sample "
                    "layouts only (per-sample top-k selection); disable "
                    "--packed"
                )
            from graph_physics_tpu.models.hierarchical_pooling import (
                DownSampler,
            )

            coarse = DownSampler(
                self.hidden_size, ratio=self.multigrid_ratio,
                k=self.multigrid_k, dtype=self.dtype, name="down_sampler",
            )(x, pos, node_mask=node_mask)
            x = coarse.x
            pos = coarse.pos
            senders, receivers = coarse.senders, coarse.receivers
            edge_mask, node_mask = coarse.edge_mask, coarse.node_mask
            # fine-edge layouts don't apply to the kNN remesh
            tiling_idx = tiling_idx_nk = None

        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=())

        prev_x = x
        for i in range(self.message_passing_num):
            prev_x = x
            x = block_cls(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                use_rope_embeddings=self.use_rope_embeddings,
                use_gated_attention=self.use_gated_attention,
                pos_dimension=self.rope_pos_dimension,
                rope_base=self.rope_base,
                use_silu=self.use_silu,
                sp_axis_name=self.sp_axis_name,
                sp_halo_size=self.sp_halo_size,
                tiling=None if self.use_multigrid else self.edge_tiling,
                nk_tiling=None if self.use_multigrid else self.edge_tiling_nk,
                dtype=self.dtype,
                name=f"block_{i}",
            )(
                x,
                senders,
                receivers,
                edge_mask,
                node_mask,
                pos,
                tiling_idx=tiling_idx,
                tiling_idx_nk=tiling_idx_nk,
                wedge_senders=graph.wedge_senders,
                wedge_receivers=graph.wedge_receivers,
                wedge_mask=graph.wedge_mask,
            )

        if coarse is not None:
            from graph_physics_tpu.models.hierarchical_pooling import (
                UpSampler,
            )

            # residual interpolation back onto the fine mesh (reference
            # README wiring: x = x + up_sampler(...))
            x = x_fine + UpSampler(
                self.hidden_size, k=self.multigrid_k, dtype=self.dtype,
                name="up_sampler",
            )(x, coarse.pos, graph.pos, coarse_mask=coarse.node_mask)
            prev_x = x_fine
            senders, receivers = graph.senders, graph.receivers
            edge_mask = graph.edge_mask

        if self.use_temporal_block:
            x = TemporalAttention(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dtype=self.dtype,
                name="temporal_block",
            )(prev_x, x, senders, receivers, edge_mask,
              wedge_senders=None if coarse is not None
              else graph.wedge_senders,
              wedge_receivers=None if coarse is not None
              else graph.wedge_receivers,
              wedge_mask=None if coarse is not None else graph.wedge_mask)

        if self.only_processor:
            return x
        self.sow("intermediates", "penultimate", x)
        return MLP(
            hidden_size=self.hidden_size,
            out_size=self.output_size,
            layer_norm=False,
            dtype=self.dtype,
            name="decode_module",
        )(x).astype(jnp.float32)


class TransolverProcessor(nn.Module):
    """Adapter around Transolver++ matching the processor API.

    Spec: graphphysics/models/processors.py:387-461. The underlying model
    lives in :mod:`graph_physics_tpu.models.transolver`.
    """

    message_passing_num: int
    node_input_size: int
    output_size: int
    hidden_size: int = 64
    num_heads: int = 2
    dropout: float = 0.0
    mlp_ratio: int = 1
    slice_num: int = 32
    ref: int = 8
    unified_pos: bool = False
    use_rope_embeddings: bool = False
    use_gated_attention: bool = False
    rope_pos_dimension: int = 3
    rope_base: float = 10000.0
    use_temporal_block: bool = False
    dp_axis_name: Optional[str] = None
    #: training-time slice noise drawn by the on-chip Pallas PRNG
    #: (ops/gumbel.py) instead of an XLA uniform + double-log pass
    fused_gumbel: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, graph: MeshGraph) -> jnp.ndarray:
        from graph_physics_tpu.models.transolver import TransolverModel

        out = TransolverModel(
            n_layers=self.message_passing_num,
            n_hidden=self.hidden_size,
            n_head=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            fun_dim=self.node_input_size,
            out_dim=self.output_size,
            slice_num=self.slice_num,
            ref=self.ref,
            unified_pos=self.unified_pos,
            use_temporal_block=self.use_temporal_block,
            dp_axis_name=self.dp_axis_name,
            fused_gumbel=self.fused_gumbel,
            dtype=self.dtype,
            name="model",
        )(
            graph.x.astype(self.dtype),
            graph.pos,
            graph.node_mask,
        )
        return out.astype(jnp.float32)
