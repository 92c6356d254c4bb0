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


def make_rollout_fn(
    simulator: Simulator,
    previous_data_slice: Optional[Tuple[int, int]] = None,
    mask_types=loss_lib.DEFAULT_MASK_TYPES,
    frame_transform=None,
):
    """Build ``rollout(params, sim_state, frames) -> RolloutResult``.

    ``frames`` is a MeshGraph whose leaves carry a leading time axis [T,...]
    (one stacked trajectory, connectivity per frame). jit-compiled once per
    trajectory shape bucket.
    """
    ois, oie = simulator.output_index_start, simulator.output_index_end
    mask_types = tuple(int(m) for m in mask_types)

    @jax.jit
    def rollout(params, sim_state: SimulatorState, frames: MeshGraph) -> RolloutResult:
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

    return rollout


def stack_frames(frame_list) -> MeshGraph:
    """Stack per-frame MeshGraphs (same bucket) into a [T, ...] pytree."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *frame_list)
