"""Deployment/serving artifacts (ahead-of-time compiled StableHLO)."""

from graph_physics_tpu.serving.export import (
    LoadedServingModel,
    export_eval_step,
    export_rollout,
    graph_to_dict,
    load_exported,
    save_exported,
    state_to_dict,
)

__all__ = [
    "LoadedServingModel",
    "export_eval_step",
    "export_rollout",
    "graph_to_dict",
    "load_exported",
    "save_exported",
    "state_to_dict",
]
