"""JSON config → framework objects (parity with parse_parameters.py).

The two-file contract is preserved so reference configs port unchanged
(SURVEY.md §5: training config blocks dataset/model/index/transformations/
loss/training + dataset meta.json). Spec: graphphysics/training/
parse_parameters.py:24-340.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.dataset.preprocessing import FrameConfig, WorldConfig
from graph_physics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
    TransolverProcessor,
)
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training.loss import LossType, MultiLoss
from graph_physics_tpu.training.step import NoiseConfig
from graph_physics_tpu.training.transforms import WorldPosConfig


def load_params(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def get_model(
    param: Dict[str, Any],
    only_processor: bool = False,
    dtype=jnp.float32,
    dp_axis_name: Optional[str] = None,
):
    """Spec: parse_parameters.py:81-162 (node_input_size += NodeType.SIZE;
    the torch globals for silu/mem-opt become per-module knobs)."""
    m = param.get("model", {})
    model_type = m.get("type", "")
    node_input_size = param["model"]["node_input_size"] + int(NodeType.SIZE)
    training_params = param.get("training", {})
    common = dict(
        message_passing_num=m["message_passing_num"],
        node_input_size=node_input_size,
        output_size=m["output_size"],
        hidden_size=m["hidden_size"],
        use_rope_embeddings=m.get("use_rope_embeddings", False),
        use_gated_attention=m.get("use_gated_attention", False),
        rope_pos_dimension=m.get("rope_pos_dimension", 3),
        rope_base=m.get("rope_base", 10000.0),
        use_temporal_block=training_params.get("use_temporal_block", False),
        remat=training_params.get("enable_vram_optimizations", False),
        dtype=dtype,
    )
    if model_type == "epd":
        return EncodeProcessDecode(
            edge_input_size=m["edge_input_size"],
            only_processor=only_processor,
            use_gated_mlp=m.get("use_gated_mlp", False),
            **common,
        )
    if model_type == "transformer":
        return EncodeTransformDecode(
            num_heads=m["num_heads"],
            only_processor=only_processor,
            use_silu=m.get("use_silu_activation", False),
            # multigrid pooling (reference README.md:430-462, made a
            # config option): coarse top-k + kNN remesh around the blocks
            use_multigrid=m.get("use_multigrid", False),
            multigrid_ratio=m.get("multigrid_ratio", 0.5),
            multigrid_k=m.get("multigrid_k", 6),
            **common,
        )
    if model_type == "transolver":
        common.pop("remat")
        return TransolverProcessor(
            num_heads=m["num_heads"],
            dropout=m.get("dropout", 0.0),
            mlp_ratio=m.get("mlp_ratio", 1),
            slice_num=m.get("slice_num", 32),
            ref=m.get("ref", 8),
            unified_pos=m.get("unified_pos", False),
            dp_axis_name=dp_axis_name,
            **common,
        )
    raise ValueError(f"Model type '{model_type}' not supported.")


def get_simulator(param: Dict[str, Any], model, axis_name=None) -> Simulator:
    """Spec: parse_parameters.py:165-190."""
    return Simulator(
        node_input_size=param["model"]["node_input_size"] + int(NodeType.SIZE),
        edge_input_size=param["model"]["edge_input_size"],
        output_size=param["model"]["output_size"],
        feature_index_start=param["index"]["feature_index_start"],
        feature_index_end=param["index"]["feature_index_end"],
        output_index_start=param["index"]["output_index_start"],
        output_index_end=param["index"]["output_index_end"],
        node_type_index=param["index"]["node_type_index"],
        model=model,
        axis_name=axis_name,
    )


def get_noise_config(param: Dict[str, Any], remove_noise: bool = False) -> Optional[NoiseConfig]:
    """Spec: get_preprocessing noise block (parse_parameters.py:51-60)."""
    pp = param.get("transformations", {}).get("preprocessing", {})
    scale = pp.get("noise", 0)
    if not scale or remove_noise:
        return None
    starts = pp.get("noise_index_start")
    ends = pp.get("noise_index_end")
    starts = [starts] if isinstance(starts, int) else list(starts)
    ends = [ends] if isinstance(ends, int) else list(ends)
    scales = [scale] * len(starts) if isinstance(scale, (int, float)) else list(scale)
    return NoiseConfig(
        starts=tuple(starts),
        ends=tuple(ends),
        scales=tuple(scales),
        curriculum=bool(pp.get("noise_curriculum", False)),
    )


def get_world_configs(
    param: Dict[str, Any]
) -> Tuple[Optional[WorldConfig], Optional[WorldPosConfig]]:
    """World-edge params for (host builder, device transform)."""
    wp = param.get("transformations", {}).get("world_pos_parameters", {})
    if not wp.get("use", False):
        return None, None
    host = WorldConfig(
        world_pos_index_start=wp["world_pos_index_start"],
        world_pos_index_end=wp["world_pos_index_end"],
        node_type_index=param["index"]["node_type_index"],
        radius=wp.get("radius", 0.03),
        edge_budget=wp.get("edge_budget", 1024),
    )
    dev = WorldPosConfig(start=wp["world_pos_index_start"], end=wp["world_pos_index_end"])
    return host, dev


def get_dynamic_world_edges(param: Dict[str, Any]):
    """Optional on-device world-edge rediscovery during rollout.

    Enabled with ``world_pos_parameters.dynamic_rollout: true`` — the TPU
    upgrade of the reference's ground-truth-tracking rollout world edges
    (SURVEY.md §3.3): contact edges follow the PREDICTED positions.

    ``dynamic_rollout_track: "ground_truth"`` selects the REFERENCE
    semantics instead (world edges rebuilt from the ground-truth frame
    positions each step — preprocessing.py:92-140 run before
    _make_prediction's write-back), for apples-to-apples RMSE comparison
    with converted reference checkpoints. Default: "predicted".
    """
    wp = param.get("transformations", {}).get("world_pos_parameters", {})
    if not (wp.get("use", False) and wp.get("dynamic_rollout", False)):
        return None
    from graph_physics_tpu.training.rollout import DynamicWorldEdges

    budget = wp.get("edge_budget", 1024)
    track = wp.get("dynamic_rollout_track", "predicted")
    if track not in ("predicted", "ground_truth"):
        raise ValueError(
            "world_pos_parameters.dynamic_rollout_track must be "
            f"'predicted' or 'ground_truth', got {track!r}"
        )
    return DynamicWorldEdges(
        k_per_node=wp.get("k_per_node", 16),
        world_pos_start=wp["world_pos_index_start"],
        world_pos_end=wp["world_pos_index_end"],
        radius=wp.get("radius", 0.03),
        budget=budget // 2,
        track_predicted=(track == "predicted"),
    )


def get_frame_config(
    param: Dict[str, Any],
    masking_ratio: Optional[float] = None,
    use_previous_data: bool = False,
    use_edge_feature: bool = True,
    extra_node_features: Optional[Callable] = None,
    extra_edge_features: Optional[Callable] = None,
) -> FrameConfig:
    """Spec: get_dataset (parse_parameters.py:193-277)."""
    ds = param["dataset"]
    world, _ = get_world_configs(param)
    pp = param.get("transformations", {}).get("preprocessing", {})
    return FrameConfig(
        targets=tuple(ds["targets"]),
        khop=ds.get("khop", 1),
        world=world,
        new_edges_ratio=ds.get("new_edges_ratio", 0.0) or 0.0,
        masking_ratio=(
            masking_ratio if masking_ratio is not None else pp.get("masking", 0) or 0.0
        ),
        use_previous_data=use_previous_data,
        add_edge_features=use_edge_feature,
        extra_node_features=extra_node_features,
        extra_edge_features=extra_edge_features,
    )


def get_dataset(
    param: Dict[str, Any],
    frame_config: FrameConfig,
    switch_to_val: bool = False,
    seed: int = 0,
    num_partitions: Optional[int] = None,
    max_nodes_per_partition: Optional[int] = None,
):
    """Spec: parse_parameters.py:193-277 (h5/xdmf switch + partitioning)."""
    ds = param["dataset"]
    ext = ds["extension"]
    path = ds["test_path"] if switch_to_val else ds["train_path"]
    kwargs = dict(
        seed=seed,
        num_partitions=num_partitions,
        max_nodes_per_partition=max_nodes_per_partition,
    )
    if ext == "h5":
        from graph_physics_tpu.dataset.h5_dataset import H5Dataset

        return H5Dataset(path, ds["meta_path"], frame_config, **kwargs)
    if ext == "xdmf":
        from graph_physics_tpu.dataset.xdmf_dataset import XDMFDataset

        return XDMFDataset(path, ds["meta_path"], frame_config, **kwargs)
    raise ValueError(f"Dataset extension '{ext}' not supported.")


def get_loss(param: Dict[str, Any]):
    """Spec: parse_parameters.py:300-323. Returns (loss, name-or-names)."""
    loss_block = param.get("loss")
    if loss_block is None:
        return LossType.L2LOSS, LossType.L2LOSS.name
    types = loss_block["type"]
    if len(types) > 1:
        losses = [LossType[t.upper()] for t in types]
        names = [l.name for l in losses]
        return MultiLoss(losses, loss_block["weights"]), names
    l = LossType[types[0].upper()]
    return l, l.name


def get_gradient_method(param: Dict[str, Any]) -> Optional[str]:
    """Spec: parse_parameters.py:326-340."""
    return param.get("loss", {}).get("gradient_method")


def get_mtp_setup(param: Dict[str, Any], dtype=jnp.float32):
    """Spatial-MTP wiring from the training block.

    Spec: lightning_module.py:133-231 (keys + shared decode head). Extra
    TPU knob: ``spatial_mtp_max_neighbors`` must be a static cap
    (default 16; the reference's unbounded mode has no static shape).
    """
    tp = param.get("training", {})
    if not tp.get("use_spatial_mtp", False):
        return None
    from graph_physics_tpu.models.layers import MLP
    from graph_physics_tpu.models.spatial_mtp import SpatialMTPConfig, StarEncoder
    from graph_physics_tpu.training.step import MTPSetup

    m = param["model"]
    hidden = m["hidden_size"]
    out_size = m["output_size"]
    model_type = m.get("type", "")

    cfg = SpatialMTPConfig(
        d_model=hidden,
        alpha=tp.get("spatial_mtp_alpha", 0.20),
        centers_per_step=tp.get("spatial_mtp_centers_per_step", 256),
        num_heads=tp.get("spatial_mtp_num_heads", 4),
        num_layers=tp.get("spatial_mtp_num_layers", 1),
        max_neighbors=tp.get("spatial_mtp_max_neighbors", 16) or 16,
    )
    encoder = StarEncoder(
        d_model=hidden,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        dtype=dtype,
    )

    if model_type in ("epd", "transformer"):
        head = MLP(
            hidden_size=hidden, out_size=out_size, layer_norm=False, dtype=dtype
        )

        def out_head_apply(model_params, z):
            return head.apply(
                {"params": model_params["params"]["decode_module"]}, z
            )

    elif model_type == "transolver" and tp.get("use_temporal_block", False):
        import flax.linen as nn

        head = nn.Dense(out_size, dtype=dtype)

        def out_head_apply(model_params, z):
            return head.apply(
                {"params": model_params["params"]["model"]["output_proj"]}, z
            )

    else:
        raise ValueError(
            "Spatial MTP requires a processor with a shared output head "
            "(epd/transformer, or transolver with use_temporal_block)."
        )
    return MTPSetup(cfg=cfg, encoder=encoder, out_head_apply=out_head_apply)
