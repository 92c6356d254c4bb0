"""Training CLI (spec: graphphysics/train.py:32-317).

Same two-JSON contract as the reference: a training config (dataset/model/
index/transformations/loss/training blocks) + dataset meta.json, with
run-level knobs as flags. Example:

  gpt-train --training_parameters_path training_config/cylinder.json \
            --epochs 25 --learning_rate 1e-3 --batch_size 2
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a TPU-native mesh simulator")
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", default="runs")
    p.add_argument("--run_name", default=None)
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--masking_ratio", type=float, default=None)
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--max_val_trajectories", type=int, default=None)
    p.add_argument("--val_device_batch", type=int, default=8,
                   help="max same-shape val trajectories on-device at once "
                        "(0 = one dispatch per shape group)")
    p.add_argument("--save_val_xdmf", action="store_true")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process SPMD: call jax.distributed."
                        "initialize() before backend init (coordinator/"
                        "process env vars or the explicit flags below); "
                        "data loading is process-sharded, logging and "
                        "console output happen on process 0, orbax "
                        "coordinates the checkpoint writes")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (--multihost); default: "
                        "jax auto-detection / JAX_COORDINATOR_ADDRESS")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count (--multihost)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index (--multihost)")
    p.add_argument("--num_dp_devices", type=int, default=None,
                   help="shard the batch axis over this many devices")
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--num_partitions", type=int, default=None,
                   help="train on RCB sub-mesh partitions (Cluster-GCN style)")
    p.add_argument("--max_nodes_per_partition", type=int, default=None,
                   help="adaptive partition count cap by node budget")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    p.add_argument("--packed", action="store_true",
                   help="trajectory-major [N,B,F] batching (TPU fast gathers)")
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas GraphNetBlocks (requires --packed "
                        "--bf16, epd model, static per-trajectory topology)")
    p.add_argument("--fused_wb_buckets", type=int, default=1,
                   help="dispatch the fused kernels as up to K window-width "
                        "buckets (graded meshes; groups sorted by touched "
                        "window units). 1 = single dispatch")
    p.add_argument("--fused_attn_nk", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="transformer models: run the fused attention on "
                        "the uniform-degree (NK) layout — half the one-hot "
                        "contractions on bounded-degree meshes; the "
                        "measured default (r4: 1,557 vs 1,292 g/s CSR). "
                        "Degree-skewed meshes fall back to blocked-CSR; "
                        "--no-fused_attn_nk forces CSR everywhere")
    p.add_argument("--fused_gn_nk", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="epd models: run the fused GraphNetBlock on the "
                        "uniform-degree (NK) edge layout — receiver-side "
                        "one-hot contractions become static K-slices; the "
                        "measured default (r4: 4,982 vs 4,778 g/s CSR). "
                        "Degree-skewed meshes fall back to blocked-CSR; "
                        "--no-fused_gn_nk forces CSR everywhere")
    p.add_argument("--loader_workers", type=int, default=1,
                   help="frame-building thread pool (num_workers analog; "
                        "helps when per-frame rebuilds are forced: world "
                        "edges, partitions, feature hooks)")
    p.add_argument("--broadcast_static", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="packed loader: ship shared static leaves as "
                        "[E,1,F] views, re-expanded on device by the "
                        "train step (bit-identical; ~75%% less host "
                        "assembly + H2D at cylinder scale). Auto-disabled "
                        "on sharded/multi-host paths")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="fuse K optimizer steps per XLA dispatch (latency amortization)")
    p.add_argument("--external", default=None,
                   help="use-case feature builder name (external registry)")
    return p


def _honor_platform_env():
    """This image's jax build ignores the JAX_PLATFORMS env var (the axon
    TPU plugin registers regardless); jax.config.update works. Restore the
    documented env-var behavior so CPU runs are actually on CPU."""
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    n_cpu = os.environ.get("JAX_NUM_CPU_DEVICES")
    if n_cpu:
        try:
            jax.config.update("jax_num_cpu_devices", int(n_cpu))
        except Exception:
            pass


def main(argv=None):
    args = build_argparser().parse_args(argv)
    _honor_platform_env()
    if args.multihost:
        # must run before any jax backend use; with no explicit flags jax
        # reads JAX_COORDINATOR_ADDRESS / cluster metadata itself.
        # Idempotent: a second in-process invocation (train -> resume in
        # one driver process) keeps the live distributed client.
        from jax._src import distributed as _dist

        if _dist.global_state.client is None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )

    import jax.numpy as jnp

    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training.trainer import Trainer, TrainerConfig
    from graph_physics_tpu.training.transforms import (
        make_device_preprocess,
        make_eval_transform,
    )

    param = config_lib.load_params(args.training_parameters_path)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    extra_node_features = None
    if args.external:
        from graph_physics_tpu.external import get_feature_builder

        extra_node_features = get_feature_builder(args.external)

    model = config_lib.get_model(param, dtype=dtype)
    # fused multi-chip dp runs inside shard_map (parallel/dp.py): the
    # normalizer needs the mesh axis name to psum its statistics globally
    dp_fused = (bool(args.num_dp_devices) or args.multihost) and args.fused
    simulator = config_lib.get_simulator(
        param, model, axis_name="dp" if dp_fused else None
    )
    mtp = config_lib.get_mtp_setup(param, dtype=dtype)
    loss_fn, loss_name = config_lib.get_loss(param)
    gradient_method = config_lib.get_gradient_method(param)
    noise_cfg = config_lib.get_noise_config(param)
    world_host, world_dev = config_lib.get_world_configs(param)

    use_prev = args.use_previous_data or bool(extra_node_features)
    frame_cfg = config_lib.get_frame_config(
        param,
        masking_ratio=args.masking_ratio,
        use_previous_data=use_prev,
        extra_node_features=extra_node_features,
    )
    if args.packed and frame_cfg.world is not None:
        # trajectory-major packed batching needs a static shared topology;
        # world edges switch to the per-sample SIDECAR layout (same
        # per-frame edge set and feature math — MeshGraph.wedge_*), which
        # also unlocks the fused kernels for world-edge workloads
        import dataclasses

        frame_cfg = dataclasses.replace(
            frame_cfg,
            world=dataclasses.replace(frame_cfg.world, sidecar=True),
        )
    train_ds = config_lib.get_dataset(
        param,
        frame_cfg,
        switch_to_val=False,
        seed=args.seed,
        num_partitions=args.num_partitions,
        max_nodes_per_partition=args.max_nodes_per_partition,
    )
    dynamic_we = config_lib.get_dynamic_world_edges(param)
    val_cfg = config_lib.get_frame_config(
        param, masking_ratio=0.0, use_previous_data=use_prev,
        extra_node_features=extra_node_features,
    )
    if dynamic_we is not None and val_cfg.world is not None:
        # device rollout rediscovers world edges; host must leave the
        # reserved tail slots free
        import dataclasses

        val_cfg = dataclasses.replace(
            val_cfg, world=dataclasses.replace(val_cfg.world, radius=1e-12)
        )
    val_ds = config_lib.get_dataset(param, val_cfg, switch_to_val=True, seed=args.seed)

    mesh = None
    if args.num_dp_devices or args.multihost:
        devices = jax.devices()[: args.num_dp_devices or len(jax.devices())]
        mesh = jax.sharding.Mesh(devices, ("dp",))

    run_name = args.run_name or os.path.splitext(
        os.path.basename(args.training_parameters_path)
    )[0]

    if args.fused:
        if not (args.packed and args.bf16):
            raise SystemExit("--fused requires --packed and --bf16")
        if args.num_dp_devices and args.batch_size % args.num_dp_devices:
            raise SystemExit(
                "--fused --num_dp_devices runs inside shard_map: "
                "batch_size must be divisible by num_dp_devices"
            )
        if param["dataset"].get("new_edges_ratio", 0):
            raise SystemExit(
                "--fused is incompatible with new_edges_ratio (per-frame topology)"
            )

    tcfg = TrainerConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        warmup=args.warmup,
        seed=args.seed,
        out_dir=args.out_dir,
        run_name=run_name,
        max_val_trajectories=args.max_val_trajectories,
        val_device_batch=args.val_device_batch or None,
        loader_workers=args.loader_workers,
        broadcast_static=args.broadcast_static,
        previous_data_slice=(
            (args.previous_data_start, args.previous_data_end) if args.use_previous_data else None
        ),
        save_val_xdmf=args.save_val_xdmf,
        use_wandb=args.use_wandb,
        accumulate_grad_batches=args.accumulate_grad_batches,
        packed=args.packed,
        steps_per_dispatch=args.steps_per_dispatch,
        fused=args.fused,
        fused_wb_buckets=args.fused_wb_buckets,
        fused_attn_nk=args.fused_attn_nk,
        fused_gn_nk=args.fused_gn_nk,
    )

    num_steps = max(
        (len(train_ds) + args.batch_size - 1) // args.batch_size, 1
    ) * args.epochs
    device_pre = make_device_preprocess(noise_cfg, world_dev, num_steps)
    eval_tf = make_eval_transform(world_dev)

    trainer = Trainer(
        simulator,
        train_ds,
        val_ds,
        loss_fn,
        tcfg,
        gradient_method=gradient_method,
        device_preprocess=device_pre,
        eval_transform=eval_tf,
        mesh=mesh,
        run_metadata={"config": param, "loss": loss_name},
        mtp=mtp,
        dynamic_world_edges=dynamic_we,
    )
    state = trainer.fit(resume=args.resume_training)
    print(f"training done at step {int(state.step)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
