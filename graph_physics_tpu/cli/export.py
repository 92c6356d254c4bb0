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
        "--serve_dp_devices", type=int, default=None,
        help="shard the batched eval step's batch axis over this many "
        "devices (data-parallel serving artifact; requires that many "
        "devices visible at export and at load, and "
        "--serve_batch_size divisible by it)",
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
    if args.serve_dp_devices and not args.serve_batch_size:
        raise SystemExit(
            "--serve_dp_devices requires --serve_batch_size (the dp-sharded "
            "artifact is the batched eval step)"
        )

    import jax

    from graph_physics_tpu.cli.common import load_inference_stack
    from graph_physics_tpu.serving import export as serving
    from graph_physics_tpu.training.rollout import stack_frames
    from graph_physics_tpu.training.step import model_params
    from graph_physics_tpu.training.transforms import make_eval_transform

    stack = load_inference_stack(args)
    simulator, ds, state = stack.simulator, stack.dataset, stack.state
    world_dev, dynamic_we = stack.world_dev, stack.dynamic_world_edges
    params = model_params(state.params)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    single = jax.tree.map(lambda a: a[0], stack.example)  # strip batch axis
    # the SAME per-frame eval transform the rollout applies (world-pos
    # edge features) — both artifacts must compute the same function
    eval_transform = make_eval_transform(world_dev)

    eval_ex = serving.export_eval_step(
        simulator, params, state.sim_state, single, platforms=platforms,
        frame_transform=eval_transform,
    )
    batched_ex = None
    if args.serve_batch_size:
        dp_mesh = None
        if args.serve_dp_devices:
            import numpy as np
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < args.serve_dp_devices:
                raise SystemExit(
                    f"--serve_dp_devices {args.serve_dp_devices} but only "
                    f"{len(devs)} devices visible"
                )
            dp_mesh = Mesh(np.array(devs[: args.serve_dp_devices]), ("dp",))
        batched_ex = serving.export_eval_step(
            simulator, params, state.sim_state, single, platforms=platforms,
            batch_size=args.serve_batch_size, frame_transform=eval_transform,
            dp_mesh=dp_mesh,
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
            frame_transform=eval_transform,
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
                    f"({type(e).__name__}: {e}); exporting with the "
                    f"example's static length T={int(frames.x.shape[0])}."
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
