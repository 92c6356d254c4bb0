"""Checkpoint/resume via orbax (spec: SURVEY.md §5 checkpoint contract).

Persists the full :class:`TrainState` — params, optimizer state, simulator
normalizer statistics, step — plus run metadata. The reference keeps two
mechanisms (Lightning ckpt with optimizer/epoch/wandb-id,
train.py:249-253/lightning_module.py:560-573, and the Simulator's own
model+normalizer file, simulator.py:226-275); here one orbax checkpoint
covers both, and ``save_simulator``/``load_simulator`` provide the
model-only artifact for inference hand-off.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from graph_physics_tpu.training.step import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def make_manager(
    directory: str,
    max_to_keep: int = 3,
    best_metric: Optional[str] = None,
    best_mode: str = "min",
) -> ocp.CheckpointManager:
    """Checkpoint manager; with ``best_metric`` set, keeps the k best
    checkpoints by that metric (e.g. 'val_all_rollout_rmse') instead of
    the k most recent (the reference's ModelCheckpoint monitor analog)."""
    kwargs = {}
    if best_metric is not None:
        kwargs.update(
            best_fn=lambda m: m[best_metric],
            best_mode=best_mode,
        )
    return ocp.CheckpointManager(
        _abs(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=True,
            enable_async_checkpointing=False,
            **kwargs,
        ),
    )


def save_checkpoint(
    manager: ocp.CheckpointManager,
    state: TrainState,
    step: int,
    metadata: Optional[Dict[str, Any]] = None,
    metrics: Optional[Dict[str, float]] = None,
    wait: bool = True,
) -> None:
    """Save; with ``wait=False`` the disk write runs in orbax's background
    thread (the device->host copy happens synchronously inside ``save``,
    so donated state buffers stay safe) — callers must
    ``manager.wait_until_finished()`` before restoring or exiting."""
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        **(
            {"metadata": ocp.args.JsonSave(metadata)}
            if metadata is not None
            else {}
        ),
    )
    manager.save(step, args=args, metrics=metrics)
    if wait:
        manager.wait_until_finished()


def restore_checkpoint(
    manager: ocp.CheckpointManager,
    abstract_state: TrainState,
    step: Optional[int] = None,
):
    """Restore (state, metadata). ``abstract_state`` provides the pytree
    structure/shapes (build it with init_train_state on example data)."""
    step = step if step is not None else manager.latest_step()
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    restored = manager.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            metadata=ocp.args.JsonRestore(),
        ),
    )
    return restored["state"], restored.get("metadata")


# ----------------------------------------------------------------------
# model-only artifact (params + normalizer state), reference simulator.pth
# ----------------------------------------------------------------------

def save_simulator(path: str, params, sim_state, extra: Optional[Dict] = None):
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        _abs(path), {"params": params, "sim_state": sim_state}, force=True
    )
    ckptr.wait_until_finished()
    if extra is not None:
        with open(os.path.join(_abs(path), "extra.json"), "w") as f:
            json.dump(extra, f)


def load_simulator(path: str, abstract_params, abstract_sim_state):
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        _abs(path), {"params": abstract_params, "sim_state": abstract_sim_state}
    )
    return restored["params"], restored["sim_state"]
