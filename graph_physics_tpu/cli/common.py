"""Shared CLI plumbing: the checkpoint-restore preamble for inference.

gpt-predict and gpt-export consume a checkpoint the same way (spec:
reference predict.py:23-75 — config → model/simulator → val dataset with
noise removed → restore); this is the single home of that recipe,
including the dynamic-world-edges radius disable (host builder off,
device-side radius search on — matching reference predict.py:69-75).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass
class InferenceStack:
    param: Dict[str, Any]
    simulator: Any
    dataset: Any
    state: Any  # restored TrainState
    metadata: Optional[Dict[str, Any]]
    world_dev: Any  # device-side world-edge transform config (or None)
    dynamic_world_edges: Any  # rollout dynamic world-edge config (or None)
    example: Any  # one [1, ...] batch from the val dataset (shape witness)


def load_inference_stack(args) -> InferenceStack:
    """Build model/simulator/val-dataset from ``args`` (the shared
    predict/export argparse surface: training_parameters_path, model_path,
    bf16, external, use_previous_data) and restore the checkpoint."""
    import jax
    import jax.numpy as jnp

    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.training import checkpoint as ckpt_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule as schedule_lib
    from graph_physics_tpu.training.step import init_train_state

    param = config_lib.load_params(args.training_parameters_path)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    extra_node_features = None
    if args.external:
        from graph_physics_tpu.external import get_feature_builder

        extra_node_features = get_feature_builder(args.external)

    model = config_lib.get_model(param, dtype=dtype)
    simulator = config_lib.get_simulator(param, model)
    _, world_dev = config_lib.get_world_configs(param)

    use_prev = args.use_previous_data or bool(extra_node_features)
    # remove_noise semantics: masking off, noise off (predict.py:69-75)
    frame_cfg = config_lib.get_frame_config(
        param, masking_ratio=0.0, use_previous_data=use_prev,
        extra_node_features=extra_node_features,
    )
    dynamic_we = config_lib.get_dynamic_world_edges(param)
    if dynamic_we is not None and frame_cfg.world is not None:
        # dynamic world edges are built on device each rollout step; the
        # host builder must only reserve the (padded) edge budget —
        # radius ~0 keeps the budget without emitting stale pairs
        frame_cfg = dataclasses.replace(
            frame_cfg, world=dataclasses.replace(frame_cfg.world, radius=1e-12)
        )
    ds = config_lib.get_dataset(param, frame_cfg, switch_to_val=True)

    optimizer = schedule_lib.make_optimizer(1e-3, 1, 1)
    example = next(iter(BatchLoader(ds, 1, shuffle=False, device_put=False)))
    mtp = config_lib.get_mtp_setup(param, dtype=dtype)
    abstract = init_train_state(
        simulator, optimizer, jax.random.PRNGKey(0), example, mtp=mtp
    )
    manager = ckpt_lib.make_manager(args.model_path)
    state, metadata = ckpt_lib.restore_checkpoint(manager, abstract)
    return InferenceStack(
        param=param, simulator=simulator, dataset=ds, state=state,
        metadata=metadata, world_dev=world_dev,
        dynamic_world_edges=dynamic_we, example=example,
    )
