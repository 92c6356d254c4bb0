"""Autoregressive rollout as an on-device ``lax.scan`` over frames.

Replaces the reference's Python-loop rollout state machine
(lightning_module.py:375-409 ``_make_prediction`` + validation_step:411-465
+ on_validation_epoch_end:467-493). Semantics replicated exactly:

  * frame t's ground-truth graph is used for connectivity/edge features
    (the dataset builds them from ground truth during rollout — including
    world edges; see SURVEY.md §3.3), then the predicted output slice and
    optional previous-data slice are written into ``x``;
  * BC imposition: mask = NOT(NORMAL ∪ OUTFLOW) (build_mask, :27-35);
    predicted[mask] = target[mask] after each step;
  * previous-data update: new_prev = predicted − current_output (:400-401);
  * metrics: per-step masked L2 ("val_loss"), first-step RMSE, and
    all-rollout RMSE = sqrt(mean over every step of (pred−target)²)
    — computed over valid (non-padding) nodes only.

One jit covers the whole trajectory; predictions are returned stacked for
host-side export.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.models.simulator import Simulator, SimulatorState
from graph_physics_tpu.training import loss as loss_lib


@struct.dataclass
class RolloutResult:
    predictions: jnp.ndarray  # [T, N, F] physical-space, BC-imposed
    targets: jnp.ndarray  # [T, N, F]
    val_loss: jnp.ndarray  # [T] masked L2 per step
    rmse_all_rollout: jnp.ndarray  # [] sqrt(mean over all steps)
    rmse_1step: jnp.ndarray  # [] first-step RMSE
    sq_sum: jnp.ndarray  # [T] Σ squared error over valid nodes (for exact
    count: jnp.ndarray  # [T] element counts       cross-trajectory aggregation)


def bc_mask(graph: MeshGraph) -> jnp.ndarray:
    """[N] bool — nodes whose values are overwritten from ground truth.

    Spec: build_mask (lightning_module.py:27-35): NOT(NORMAL ∪ OUTFLOW).
    Padding rows land in the mask too (pred := target = 0, harmless).
    """
    t = graph.node_type
    keep = (t == NodeType.NORMAL) | (t == NodeType.OUTFLOW)
    return ~keep


@struct.dataclass
class DynamicWorldEdges:
    """On-device world-edge rediscovery during rollout.

    The reference rebuilds world edges per frame from GROUND-TRUTH
    positions (dataset preprocessing runs before the module overwrites x —
    SURVEY.md §3.3). With this config the rollout instead runs a radius
    search (ops/knn.radius_edges) each step and writes the pairs into a
    reserved static tail region of the edge arrays, fully inside the
    scan. ``track_predicted=True`` (default) searches the CURRENT
    (predicted) world positions — the principled fix of the reference's
    quirk; ``track_predicted=False`` reproduces the reference semantics
    exactly (searches the frame's ground-truth positions) so converted
    checkpoints compare apples-to-apples.

    Frames must be built with mesh edges only and an edge padding of at
    least ``2 * budget`` free slots at the tail.
    """

    world_pos_start: int = struct.field(pytree_node=False)
    world_pos_end: int = struct.field(pytree_node=False)
    radius: float = struct.field(pytree_node=False)
    budget: int = struct.field(pytree_node=False)  # per direction
    #: per-receiver nearest-partner cap of the radius search (ops/knn.py);
    #: raise for very dense contact regions (>k in-radius partners per node)
    k_per_node: int = struct.field(pytree_node=False, default=16)
    #: False = REFERENCE semantics: rebuild world edges from the frame's
    #: GROUND-TRUTH world positions (the reference's dataset preprocessing
    #: runs before _make_prediction overwrites x — preprocessing.py:92-140
    #: + lightning_module.py:375-409), so converted DeformingPlate
    #: checkpoints can be compared apples-to-apples. True (default) =
    #: track the PREDICTED positions — the principled fix.
    track_predicted: bool = struct.field(pytree_node=False, default=True)


def _apply_dynamic_world_edges(
    g: MeshGraph, cfg: DynamicWorldEdges,
    true_x: Optional[jnp.ndarray] = None,
) -> MeshGraph:
    from graph_physics_tpu.ops.knn import radius_edges

    src = g.x if (cfg.track_predicted or true_x is None) else true_x
    wp = src[:, cfg.world_pos_start : cfg.world_pos_end].astype(jnp.float32)
    t = g.node_type
    obs = ((t == NodeType.OBSTACLE) | (t == NodeType.HANDLE)) & g.node_mask
    nrm = (t == NodeType.NORMAL) & g.node_mask
    a_idx, b_idx, valid = radius_edges(
        wp, wp, cfg.radius, cfg.budget, mask_a=obs, mask_b=nrm,
        k_per_node=cfg.k_per_node,
    )
    e_pad = g.senders.shape[0]
    off = e_pad - 2 * cfg.budget
    senders = g.senders.at[off : off + cfg.budget].set(a_idx)
    senders = senders.at[off + cfg.budget :].set(b_idx)
    receivers = g.receivers.at[off : off + cfg.budget].set(b_idx)
    receivers = receivers.at[off + cfg.budget :].set(a_idx)
    emask = g.edge_mask.at[off : off + cfg.budget].set(valid)
    emask = emask.at[off + cfg.budget :].set(valid)
    g = g.replace(senders=senders, receivers=receivers, edge_mask=emask)
    if g.edge_attr is not None:
        # refresh mesh-position features for the new tail edges
        d = jnp.take(g.pos, senders, axis=0) - jnp.take(g.pos, receivers, axis=0)
        nrm_ = jnp.linalg.norm(d, axis=-1, keepdims=True)
        mesh_feats = jnp.concatenate([d, nrm_], axis=-1).astype(g.edge_attr.dtype)
        fe = mesh_feats.shape[-1]
        ea = g.edge_attr.at[off:, :fe].set(mesh_feats[off:])
        g = g.replace(edge_attr=ea)
    return g


def make_rollout_fn(
    simulator: Simulator,
    previous_data_slice: Optional[Tuple[int, int]] = None,
    mask_types=loss_lib.DEFAULT_MASK_TYPES,
    frame_transform=None,
    dynamic_world_edges: Optional[DynamicWorldEdges] = None,
):
    """Build ``rollout(params, sim_state, frames) -> RolloutResult``.

    ``frames`` is a MeshGraph whose leaves carry a leading time axis [T,...]
    (one stacked trajectory, connectivity per frame). jit-compiled once per
    trajectory shape bucket.
    """
    ois, oie = simulator.output_index_start, simulator.output_index_end
    mask_types = tuple(int(m) for m in mask_types)

    def rollout_impl(params, sim_state: SimulatorState, frames: MeshGraph) -> RolloutResult:
        def body(carry, frame: MeshGraph):
            # Unconditional write-back: the carry is seeded with frame-0's
            # ground-truth slices, so step 0 writes identical values. (A
            # scalar-conditioned jnp.where here miscompiled on the axon TPU
            # backend — the wrong branch was selected inside scan.)
            last_pred, last_prev = carry
            x = frame.x
            x = x.at[:, ois:oie].set(last_pred)
            if previous_data_slice is not None:
                ps, pe = previous_data_slice
                x = x.at[:, ps:pe].set(last_prev)
            g = frame.replace(x=x)
            if dynamic_world_edges is not None:
                g = _apply_dynamic_world_edges(
                    g, dynamic_world_edges, true_x=frame.x
                )
            if frame_transform is not None:
                g = frame_transform(g)

            out = simulator.forward(params, sim_state, g, is_training=False)
            predicted = out.outputs
            target = frame.y

            mask = bc_mask(g)[:, None]
            predicted = jnp.where(mask, target, predicted)

            current = x[:, ois:oie]
            new_prev = predicted - current

            valid = g.node_mask.astype(jnp.float32)[:, None]
            sq = (predicted - target) ** 2 * valid
            sq_sum = jnp.sum(sq)
            count = jnp.sum(valid) * sq.shape[-1]
            step_mse = sq_sum / jnp.maximum(count, 1.0)

            step_val_loss = loss_lib._masked_mean(
                (predicted - target) ** 2,
                loss_lib.node_loss_mask(g, mask_types),
            )

            return (predicted, new_prev), (
                predicted,
                step_mse,
                step_val_loss,
                sq_sum,
                count,
            )

        # seed the carry with frame 0's ground-truth slices
        init_pred = frames.x[0, :, ois:oie].astype(jnp.float32)
        if previous_data_slice is not None:
            ps, pe = previous_data_slice
            init_prev = frames.x[0, :, ps:pe].astype(jnp.float32)
        else:
            init_prev = init_pred
        carry0 = (init_pred, init_prev)

        _, (preds, step_mses, step_val_losses, sq_sums, counts) = jax.lax.scan(
            body, carry0, frames
        )

        return RolloutResult(
            predictions=preds,
            targets=frames.y,
            val_loss=step_val_losses,
            rmse_all_rollout=jnp.sqrt(
                jnp.sum(sq_sums) / jnp.maximum(jnp.sum(counts), 1.0)
            ),
            rmse_1step=jnp.sqrt(step_mses[0]),
            sq_sum=sq_sums,
            count=counts,
        )

    rollout = jax.jit(rollout_impl)
    rollout._impl = rollout_impl  # for make_batched_rollout_fn
    return rollout


def make_batched_rollout_fn(
    simulator: Simulator,
    previous_data_slice: Optional[Tuple[int, int]] = None,
    mask_types=loss_lib.DEFAULT_MASK_TYPES,
    frame_transform=None,
    dynamic_world_edges: Optional[DynamicWorldEdges] = None,
):
    """All validation trajectories in ONE dispatch.

    vmaps the scan rollout over a leading trajectory axis: input frames
    are [R, T, N, ...] (R same-bucket trajectories stacked), outputs carry
    per-trajectory metrics. Amortizes host↔device latency across the
    whole validation epoch — the reference iterates trajectories in
    Python (lightning_module.py:411-465).
    """
    single = make_rollout_fn(
        simulator,
        previous_data_slice=previous_data_slice,
        mask_types=mask_types,
        frame_transform=frame_transform,
        dynamic_world_edges=dynamic_world_edges,
    )
    return jax.jit(jax.vmap(single._impl, in_axes=(None, None, 0)))


def stack_frames(frame_list) -> MeshGraph:
    """Stack per-frame MeshGraphs (same bucket) into a [T, ...] pytree."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *frame_list)
