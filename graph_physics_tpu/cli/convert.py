"""gpt-convert: migrate a reference PyTorch checkpoint to this framework.

Reads a checkpoint produced by the reference implementation (the
Simulator's ``save_checkpoint`` file, a PyTorch-Lightning ``.ckpt``, or a
raw ``state_dict``; reference models/simulator.py:226-275,
training/train.py checkpoint callbacks) plus the SAME training-parameters
JSON the reference run used, and writes a step-0 checkpoint in this
framework's format — directly consumable by ``gpt-predict --model_path``
and by ``gpt-train --resume_training`` for fine-tuning.

Every model weight and every normalizer statistic is carried over
(see utils/convert.py for the layout contracts); the optimizer state is
freshly initialized (the reference's Adam moments do not transfer across
frameworks and a fine-tune restart is the standard practice).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gpt-convert",
        description="Convert a reference (PyTorch) graph-physics checkpoint "
        "into a graph_physics_tpu checkpoint.",
    )
    p.add_argument(
        "--torch_checkpoint", required=True,
        help="path to the reference .pt/.ckpt file",
    )
    p.add_argument(
        "--training_parameters_path", required=True,
        help="the training-parameters JSON the reference run used "
        "(the same two-JSON contract gpt-train consumes)",
    )
    p.add_argument(
        "--output_dir", required=True,
        help="directory to write the converted checkpoint into "
        "(pass this as --model_path to gpt-predict)",
    )
    return p


def main(argv=None) -> None:
    from graph_physics_tpu.cli.train import _honor_platform_env

    _honor_platform_env()
    args = build_parser().parse_args(argv)

    from graph_physics_tpu.training import checkpoint as ckpt_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule as schedule_lib
    from graph_physics_tpu.training.step import TrainState
    from graph_physics_tpu.utils.convert import convert_torch_checkpoint

    param = config_lib.load_params(args.training_parameters_path)
    params, sim_state = convert_torch_checkpoint(args.torch_checkpoint, param)

    n_tensors = len(jax.tree.leaves(params))
    mtp = config_lib.get_mtp_setup(param)
    if mtp is not None:
        # The reference keeps its spatial-MTP encoder in the Lightning
        # module, outside the Simulator checkpoint contract — those
        # weights have no place in a Simulator/predict artifact. MTP is a
        # train-time auxiliary loss only, so rollouts are unaffected; a
        # resumed fine-tune re-warms the MTP head from scratch.
        from graph_physics_tpu.training.step import wrap_mtp_params

        params = wrap_mtp_params(params, mtp, jax.random.PRNGKey(0))
        print(
            "[gpt-convert] note: config enables spatial MTP; the MTP "
            "encoder is freshly initialized (aux-loss head only — "
            "rollout behavior is unaffected)."
        )

    optimizer = schedule_lib.make_optimizer(1e-3, 1, 1)
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        sim_state=sim_state,
        step=jnp.zeros((), jnp.int32),
    )
    manager = ckpt_lib.make_manager(args.output_dir, max_to_keep=1)
    ckpt_lib.save_checkpoint(
        manager,
        state,
        0,
        metadata={
            "converted_from": os.path.abspath(args.torch_checkpoint),
            "training_parameters_path": os.path.abspath(
                args.training_parameters_path
            ),
        },
    )
    acc = float(jax.device_get(sim_state.output_norm.num_accumulations))
    print(
        f"[gpt-convert] wrote step-0 checkpoint to {args.output_dir}: "
        f"{n_tensors} weight tensors, output-normalizer accumulations="
        f"{acc:.0f}. Use it via gpt-predict --model_path or "
        "gpt-train --resume_training."
    )


if __name__ == "__main__":
    main()
