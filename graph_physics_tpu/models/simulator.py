"""Simulator: normalization + Δ-target contract around any processor.

Spec: graphphysics/models/simulator.py:13-275 —
  * input features  = x[:, fis:fie] ⧺ one_hot(node_type, 9), normalized by
    a running-stat node normalizer (accumulating in training);
  * edge features normalized likewise (when the model consumes them);
  * training target = normalize(y − x[:, ois:oie]) with accumulation;
  * eval output     = inverse-normalize(net_out) + x[:, ois:oie].

Functional re-design: normalizer statistics live in an explicit
:class:`SimulatorState` threaded through the train step and checkpointed
(the reference persists them inside its model checkpoint,
simulator.py:226-275). Normalization happens *outside* the per-graph vmap
so one global statistics state serves the whole batch; with a DP mesh the
partial sums psum over ``axis_name`` (see models/normalizer.py).

Padding: one_hot of PAD_NODE_TYPE (-1) is all-zero, and masks keep padded
rows out of every statistic.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax import linen as nn

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.models.normalizer import (
    NormalizerState,
    normalize,
    normalizer_init,
    normalizer_inverse,
)


@struct.dataclass
class SimulatorState:
    output_norm: NormalizerState
    node_norm: NormalizerState
    edge_norm: Optional[NormalizerState] = None


@struct.dataclass
class SimulatorOutput:
    net_out: jnp.ndarray  # [.., N, out] raw (normalized-space) prediction
    target_norm: Optional[jnp.ndarray]  # [.., N, out] normalized Δ target
    outputs: Optional[jnp.ndarray]  # [.., N, out] physical-space prediction
    state: SimulatorState


class Simulator:
    """Configuration holder + pure functions. Not a pytree itself."""

    def __init__(
        self,
        node_input_size: int,
        edge_input_size: int,
        output_size: int,
        feature_index_start: int,
        feature_index_end: int,
        output_index_start: int,
        output_index_end: int,
        node_type_index: int,
        model: nn.Module,
        axis_name: Optional[str] = None,
    ):
        self.node_input_size = node_input_size
        self.edge_input_size = edge_input_size if edge_input_size > 0 else None
        self.output_size = output_size
        self.feature_index_start = feature_index_start
        self.feature_index_end = feature_index_end
        self.output_index_start = output_index_start
        self.output_index_end = output_index_end
        self.node_type_index = node_type_index
        self.model = model
        self.axis_name = axis_name

    # ------------------------------------------------------------------
    def init_state(self) -> SimulatorState:
        return SimulatorState(
            output_norm=normalizer_init(self.output_size),
            node_norm=normalizer_init(self.node_input_size),
            edge_norm=(
                normalizer_init(self.edge_input_size)
                if self.edge_input_size is not None
                else None
            ),
        )

    def init_params(self, rng: jax.Array, example: MeshGraph):
        """Initialize processor parameters from an example (single, stacked
        [B, N, F] or packed [N, B, F])."""
        g = example
        if g.x.ndim == 3:
            if self.is_packed(g):
                from graph_physics_tpu.training.packed import single_of

                g = single_of(jax.tree.map(jnp.asarray, g))
            else:
                g = jax.tree.map(lambda a: a[0], g)
        g_in, _, _, _ = self.prepare(self.init_state(), g, is_training=False)
        return self.model.init(rng, g_in)

    # ------------------------------------------------------------------
    @staticmethod
    def is_packed(graph: MeshGraph) -> bool:
        """Trajectory-major packed layout: x [N, B, F] with shared
        per-node metadata [N] (see training/packed.py). Batched stacked
        layout has x [B, N, F] with node_type [B, N]."""
        return graph.x.ndim == 3 and graph.node_type.ndim == 1

    def pre_target(self, graph: MeshGraph) -> jnp.ndarray:
        """x[:, ois:oie] — the current value of the predicted fields."""
        return graph.x[..., self.output_index_start : self.output_index_end]

    def one_hot_type(self, graph: MeshGraph) -> jnp.ndarray:
        """one_hot(node_type, NodeType.SIZE); PAD (-1) rows are all-zero."""
        oh = jax.nn.one_hot(graph.node_type, int(NodeType.SIZE), dtype=jnp.float32)
        if self.is_packed(graph):  # [N, 9] -> [N, B, 9]
            oh = jnp.broadcast_to(
                oh[:, None, :], (oh.shape[0], graph.x.shape[1], oh.shape[-1])
            )
        return oh

    def prepare(
        self,
        state: SimulatorState,
        graph: MeshGraph,
        is_training: bool,
    ) -> Tuple[MeshGraph, Optional[jnp.ndarray], jnp.ndarray, SimulatorState]:
        """Build the normalized input graph + normalized Δ target.

        Returns (input_graph, target_norm, pre_target, new_state).
        ``target_norm`` is None when the graph carries no ``y``.
        """
        node_mask = graph.node_mask
        edge_mask = graph.edge_mask
        if self.is_packed(graph):  # shared [N] masks -> per-row [N, B]
            b = graph.x.shape[1]
            node_mask = jnp.broadcast_to(node_mask[:, None], (node_mask.shape[0], b))
            if edge_mask is not None:
                edge_mask = jnp.broadcast_to(
                    edge_mask[:, None], (edge_mask.shape[0], b)
                )

        pre_t = self.pre_target(graph)
        target_norm = None
        out_state = state.output_norm
        if graph.y is not None:
            delta = graph.y - pre_t
            target_norm, out_state = normalize(
                state.output_norm,
                delta,
                mask=node_mask,
                accumulate=is_training,
                axis_name=self.axis_name if is_training else None,
            )

        feats = graph.x[..., self.feature_index_start : self.feature_index_end]
        feats = jnp.concatenate([feats, self.one_hot_type(graph)], axis=-1)
        feats_n, node_state = normalize(
            state.node_norm,
            feats,
            mask=node_mask,
            accumulate=is_training,
            axis_name=self.axis_name if is_training else None,
        )

        edge_attr = graph.edge_attr
        wedge_attr = graph.wedge_attr
        edge_state = state.edge_norm
        if self.edge_input_size is not None and edge_attr is not None:
            if wedge_attr is not None:
                # world-edge sidecar: ONE normalizer over mesh + world
                # edge features, exactly like the reference's single
                # concatenated edge array (simulator.py:94-116). Concat
                # along the edge axis (0 for single/packed, 1 stacked),
                # normalize+accumulate once, split back.
                wedge_mask = graph.wedge_mask
                axis = 0 if self.is_packed(graph) or graph.x.ndim == 2 else 1
                e_all = jnp.concatenate(
                    [edge_attr[..., : self.edge_input_size],
                     wedge_attr[..., : self.edge_input_size]], axis=axis
                )
                m_all = jnp.concatenate(
                    [edge_mask, wedge_mask.astype(edge_mask.dtype)],
                    axis=axis,
                )
                e_all, edge_state = normalize(
                    state.edge_norm,
                    e_all,
                    mask=m_all,
                    accumulate=is_training,
                    axis_name=self.axis_name if is_training else None,
                )
                e_split = graph.edge_attr.shape[axis]
                edge_attr, wedge_attr = jnp.split(e_all, [e_split], axis=axis)
            else:
                edge_attr, edge_state = normalize(
                    state.edge_norm,
                    edge_attr[..., : self.edge_input_size],
                    mask=edge_mask,
                    accumulate=is_training,
                    axis_name=self.axis_name if is_training else None,
                )

        g_in = graph.replace(x=feats_n, edge_attr=edge_attr, y=target_norm,
                             wedge_attr=wedge_attr)
        new_state = SimulatorState(
            output_norm=out_state, node_norm=node_state, edge_norm=edge_state
        )
        return g_in, target_norm, pre_t, new_state

    # ------------------------------------------------------------------
    def apply_model(self, params, g_in: MeshGraph, rngs=None) -> jnp.ndarray:
        """Run the processor.

        Packed layout ([N, B, F], shared topology): apply directly — the
        MLP/GraphNetBlock stack is axis-0 polymorphic and node-axis
        gathers then move full [B·H] rows at memory line rate (the
        TPU-efficient path). Stacked layout ([B, N, F]): vmap per sample.

        ``rngs`` is an optional flax rng-collection dict (e.g.
        ``{'gumbel': key}`` for Transolver++'s training-time slice noise,
        reference transolver.py:135); under the stacked vmap each sample
        gets an independent fold of every key — matching the reference,
        where one torch forward draws fresh noise per batch element.
        """
        if g_in.x.ndim == 3 and not self.is_packed(g_in):
            if rngs:
                b = g_in.x.shape[0]
                keys = {k: jax.random.split(v, b) for k, v in rngs.items()}
                return jax.vmap(
                    lambda g, kd: self.model.apply(params, g, rngs=kd)
                )(g_in, keys)
            return jax.vmap(lambda g: self.model.apply(params, g))(g_in)
        if rngs:
            return self.model.apply(params, g_in, rngs=rngs)
        return self.model.apply(params, g_in)

    def apply_model_with_intermediates(self, params, g_in: MeshGraph, rngs=None):
        """Run the processor capturing its sown intermediates
        ('node_encoding', 'penultimate') — the functional replacement for
        the reference's forward hooks (lightning_module.py:217-230)."""

        def f(g, kd=None):
            out, variables = self.model.apply(
                params, g, mutable=["intermediates"],
                **({"rngs": kd} if kd else {}),
            )
            return out, variables["intermediates"]

        if g_in.x.ndim == 3 and not self.is_packed(g_in):
            if rngs:
                b = g_in.x.shape[0]
                keys = {k: jax.random.split(v, b) for k, v in rngs.items()}
                return jax.vmap(f)(g_in, keys)
            return jax.vmap(f)(g_in)
        return f(g_in, rngs if rngs else None)

    def forward(
        self,
        params,
        state: SimulatorState,
        graph: MeshGraph,
        is_training: bool,
    ) -> SimulatorOutput:
        """Training: (net_out, target_norm, None). Eval: physical outputs too.

        Mirrors reference simulator.py:193-217 keyed on module train mode.
        """
        g_in, target_norm, pre_t, new_state = self.prepare(state, graph, is_training)
        net_out = self.apply_model(params, g_in)
        outputs = None
        if not is_training:
            outputs = self.build_outputs_from_pre(new_state, net_out, pre_t)
        return SimulatorOutput(
            net_out=net_out, target_norm=target_norm, outputs=outputs, state=new_state
        )

    def build_outputs_from_pre(
        self, state: SimulatorState, net_out: jnp.ndarray, pre_t: jnp.ndarray
    ) -> jnp.ndarray:
        """Inverse-normalize the predicted Δ and add the current value.

        Spec: reference simulator.py:178-191.
        """
        return normalizer_inverse(state.output_norm, net_out) + pre_t

    def build_outputs(
        self, state: SimulatorState, graph: MeshGraph, net_out: jnp.ndarray
    ) -> jnp.ndarray:
        return self.build_outputs_from_pre(state, net_out, self.pre_target(graph))


def clone_with_model(sim: "Simulator", model: nn.Module) -> "Simulator":
    """Simulator copy wrapping a different (parameter-compatible) model —
    used by the fused training path to swap in per-topology tiled models
    while sharing one parameter/optimizer state."""
    return Simulator(
        node_input_size=sim.node_input_size,
        edge_input_size=sim.edge_input_size or 0,
        output_size=sim.output_size,
        feature_index_start=sim.feature_index_start,
        feature_index_end=sim.feature_index_end,
        output_index_start=sim.output_index_start,
        output_index_end=sim.output_index_end,
        node_type_index=sim.node_type_index,
        model=model,
        axis_name=sim.axis_name,
    )
