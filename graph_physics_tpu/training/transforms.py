"""Device-side per-step graph transforms, composed into the jitted step.

The reference's preprocessing pipeline (dataset/preprocessing.py:369-443)
runs per-sample on CPU in DataLoader workers. Here the *structural* parts
(connectivity, k-hop, world-edge discovery) run host-side at load time
(graph_physics_tpu/dataset/preprocessing.py), while the *per-step value*
parts run on device inside the jit:

  * noise injection (training/noise.py),
  * world-pos edge feature columns [Δworld_pos, ‖Δworld_pos‖] appended to
    edge_attr (spec: add_world_pos_features, preprocessing.py:143-174) —
    computed from the *current* ``x``, so during training they see the
    noised world positions exactly like the reference, and during rollout
    they track the *predicted* positions (a deliberate improvement over
    the reference, which keeps ground-truth-based edge features during
    rollout; SURVEY.md §3.3 note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.training.noise import add_noise
from graph_physics_tpu.training.step import NoiseConfig


@dataclass(frozen=True)
class WorldPosConfig:
    start: int  # world-pos column range in x
    end: int


def append_world_pos_features(graph: MeshGraph, cfg: WorldPosConfig) -> MeshGraph:
    """edge_attr ⧺= [world_pos[send] − world_pos[recv], its norm].

    With the per-sample world-edge sidecar (MeshGraph.wedge_*), the same
    columns are appended to ``wedge_attr`` using per-sample gathers — the
    world edges see the exact same feature math as in the concat layout.
    """
    wp = graph.x[..., cfg.start : cfg.end]
    if graph.senders.ndim == 1:
        # single graph [N, D] or packed [N, B, D]: node axis is 0
        rel = jnp.take(wp, graph.senders, axis=0) - jnp.take(
            wp, graph.receivers, axis=0
        )
    else:
        # stacked [B, N, D] with per-sample edge lists [B, E]
        rel = jnp.take_along_axis(
            wp, graph.senders[..., None], axis=-2
        ) - jnp.take_along_axis(wp, graph.receivers[..., None], axis=-2)
    norm = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    ea = jnp.concatenate([graph.edge_attr, rel, norm], axis=-1)
    wea = graph.wedge_attr
    if wea is not None:
        from graph_physics_tpu.models.layers import _wtake_nodes

        if graph.wedge_senders.ndim == 1 or graph.node_type.ndim == 1:
            # single [W] / packed [W, B] sidecar
            wrel = (_wtake_nodes(wp, graph.wedge_senders)
                    - _wtake_nodes(wp, graph.wedge_receivers))
        else:
            # stacked [B, W] sidecar
            wrel = jnp.take_along_axis(
                wp, graph.wedge_senders[..., None], axis=-2
            ) - jnp.take_along_axis(
                wp, graph.wedge_receivers[..., None], axis=-2
            )
        wnorm = jnp.linalg.norm(wrel, axis=-1, keepdims=True)
        wea = jnp.concatenate([wea, wrel, wnorm], axis=-1)
    return graph.replace(edge_attr=ea, wedge_attr=wea)


def make_device_preprocess(
    noise_cfg: Optional[NoiseConfig] = None,
    world_cfg: Optional[WorldPosConfig] = None,
    num_steps: int = 1,
) -> Optional[Callable]:
    """Compose (graph, rng, step) -> graph for the train step.

    Order matches the reference pipeline: noise first (inserted at
    position 1, preprocessing.py:426-435), then world-pos edge features
    computed from the noised x.
    """
    if noise_cfg is None and world_cfg is None:
        return None

    def fn(graph: MeshGraph, rng: jax.Array, step: jnp.ndarray) -> MeshGraph:
        if noise_cfg is not None and noise_cfg.enabled:
            t = None
            if noise_cfg.curriculum:
                t = step.astype(jnp.float32) / max(num_steps, 1)
            graph = add_noise(
                graph,
                rng,
                list(noise_cfg.starts),
                list(noise_cfg.ends),
                list(noise_cfg.scales),
                t=t,
            )
        if world_cfg is not None:
            graph = append_world_pos_features(graph, world_cfg)
        return graph

    return fn


def make_eval_transform(
    world_cfg: Optional[WorldPosConfig] = None,
) -> Optional[Callable]:
    """(graph) -> graph for rollout frames (noise removed, like
    predict.py:69-75 get_preprocessing(remove_noise=True))."""
    if world_cfg is None:
        return None

    def fn(graph: MeshGraph) -> MeshGraph:
        return append_world_pos_features(graph, world_cfg)

    return fn
