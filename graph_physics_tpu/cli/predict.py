"""Prediction CLI: rollout from a checkpoint + XDMF export.

Spec: graphphysics/predict.py:23-142 — load checkpoint, build the val
dataset with noise removed, autoregressively roll out every trajectory and
archive each frame to an XDMF time series.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Rollout + export from a checkpoint")
    p.add_argument("--training_parameters_path", required=True)
    p.add_argument("--model_path", required=True, help="checkpoint directory")
    p.add_argument("--out_dir", default="predictions")
    p.add_argument("--run_name", default="prediction")
    p.add_argument("--num_trajectories", type=int, default=None)
    p.add_argument("--use_previous_data", action="store_true")
    p.add_argument("--previous_data_start", type=int, default=4)
    p.add_argument("--previous_data_end", type=int, default=7)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--external", default=None)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from graph_physics_tpu.cli.train import _honor_platform_env

    _honor_platform_env()

    from graph_physics_tpu.cli.common import load_inference_stack
    from graph_physics_tpu.training.rollout import make_rollout_fn, stack_frames
    from graph_physics_tpu.training.step import model_params
    from graph_physics_tpu.training.transforms import make_eval_transform
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesWriter

    stack = load_inference_stack(args)
    simulator, ds, state = stack.simulator, stack.dataset, stack.state
    world_dev, dynamic_we = stack.world_dev, stack.dynamic_world_edges

    rollout = make_rollout_fn(
        simulator,
        previous_data_slice=(
            (args.previous_data_start, args.previous_data_end)
            if args.use_previous_data
            else None
        ),
        frame_transform=make_eval_transform(world_dev),
        dynamic_world_edges=dynamic_we,
    )

    n_traj = ds.num_trajectories
    if args.num_trajectories is not None:
        n_traj = min(n_traj, args.num_trajectories)

    for t in range(n_traj):
        frames = stack_frames(ds.trajectory_frames(t))
        res = rollout(model_params(state.params), state.sim_state, frames)
        path = os.path.join(args.out_dir, args.run_name, f"trajectory_{t}.xdmf")
        w = XdmfTimeSeriesWriter(path)
        n = int(frames.n_node[0])
        cmask = (
            int(np.sum(np.asarray(frames.face_mask[0])))
            if frames.face_mask is not None
            else None
        )
        preds = np.asarray(res.predictions)
        for i in range(preds.shape[0]):
            w.append(
                np.asarray(frames.pos[i])[:n],
                np.asarray(frames.faces[i])[:cmask],
                {
                    "prediction": preds[i, :n],
                    "target": np.asarray(res.targets[i])[:n],
                },
                float(frames.time[i]) if frames.time is not None else float(i),
            )
        print(
            f"trajectory {t}: rollout_rmse={float(res.rmse_all_rollout):.6f} -> {w.path}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
