"""gpt-export: package a checkpoint as serving artifacts (StableHLO).

Restores a checkpoint (trained here, or migrated with gpt-convert) and
writes ahead-of-time compiled ``jax.export`` artifacts — a single-frame
eval step and a full-trajectory rollout, multi-platform lowered (cpu+tpu
by default) — plus a manifest. A serving host loads them with
``graph_physics_tpu.serving.load_exported`` (or raw ``jax.export``:
the artifacts are self-contained StableHLO) without the model code or the
config contract. The deployment seam the reference's predict path lacks
(reference predict.py re-instantiates the whole module stack from source).

Shapes are fixed at export time from the validation dataset's bucket —
the same static-shape contract the training/rollout paths already use.
"""

from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gpt-export",
        description="Export serving artifacts (eval step + rollout) from a checkpoint",
    )
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--model_path", required=True, help="checkpoint directory")
    p.add_argument("--out_dir", required=True, help="artifact directory")
    p.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma-separated lowering platforms (default cpu,tpu)",
    )
    p.add_argument(
        "--skip_rollout", action="store_true",
        help="export only the single-frame eval step",
    )
    p.add_argument(
        "--serve_batch_size", type=int, default=None,
        help="also export a vmapped eval step over B same-bucket graphs "
        "(batched-inference artifact for production serving)",
    )
    p.add_argument(
        "--static_time", action="store_true",
        help="fix the rollout trajectory length to the example's (default: "
        "symbolic — one artifact serves any length, falling back to "
        "static if the model/transform stack can't lower polymorphically)",
    )
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--external", default=None)
    return p


def main(argv=None):
    from graph_physics_tpu.cli.train import _honor_platform_env

    _honor_platform_env()
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.serving import export as serving
    from graph_physics_tpu.training import checkpoint as ckpt_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule as schedule_lib
    from graph_physics_tpu.training.rollout import stack_frames
    from graph_physics_tpu.training.step import init_train_state, model_params
    from graph_physics_tpu.training.transforms import make_eval_transform

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
    frame_cfg = config_lib.get_frame_config(
        param, masking_ratio=0.0, use_previous_data=use_prev,
        extra_node_features=extra_node_features,
    )
    dynamic_we = config_lib.get_dynamic_world_edges(param)
    if dynamic_we is not None and frame_cfg.world is not None:
        import dataclasses

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
    state, _ = ckpt_lib.restore_checkpoint(manager, abstract)
    params = model_params(state.params)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    single = jax.tree.map(lambda a: a[0], example)  # strip the batch axis

    eval_ex = serving.export_eval_step(
        simulator, params, state.sim_state, single, platforms=platforms
    )
    batched_ex = None
    if args.serve_batch_size:
        batched_ex = serving.export_eval_step(
            simulator, params, state.sim_state, single, platforms=platforms,
            batch_size=args.serve_batch_size,
        )
    rollout_ex = None
    symbolic_used = False
    if not args.skip_rollout:
        frames = stack_frames(ds.trajectory_frames(0))
        kwargs = dict(
            platforms=platforms,
            previous_data_slice=(
                (args.previous_data_start, args.previous_data_end)
                if args.use_previous_data
                else None
            ),
            frame_transform=make_eval_transform(world_dev),
            dynamic_world_edges=dynamic_we,
        )
        if not args.static_time:
            try:
                rollout_ex = serving.export_rollout(
                    simulator, params, state.sim_state, frames,
                    symbolic_time=True, **kwargs,
                )
                symbolic_used = True
            except Exception as e:  # noqa: BLE001 — fall back to static
                print(
                    "[gpt-export] symbolic-length rollout lowering failed "
                    f"({type(e).__name__}); exporting with the example's "
                    f"static length T={int(frames.x.shape[0])}."
                )
        if rollout_ex is None:
            rollout_ex = serving.export_rollout(
                simulator, params, state.sim_state, frames, **kwargs
            )

    manifest = serving.save_exported(
        args.out_dir,
        eval_step=eval_ex,
        rollout=rollout_ex,
        batched_eval_step=batched_ex,
        extra_manifest={
            "training_parameters_path": os.path.abspath(
                args.training_parameters_path
            ),
            "checkpoint": os.path.abspath(args.model_path),
            "step": int(jax.device_get(state.step)),
            "rollout_symbolic_time": symbolic_used,
        },
    )
    names = list(manifest["artifacts"])
    print(
        f"[gpt-export] wrote {', '.join(names)} for platforms "
        f"{list(platforms)} to {args.out_dir}"
    )


if __name__ == "__main__":
    main()
