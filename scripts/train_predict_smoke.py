"""Full-pipeline smoke: synthetic data → train → resume → predict+export.

The reference's `make train-predict` analog (reference Makefile:36-52).
Run on CPU by default (JAX_PLATFORMS=cpu honored by the CLIs).
"""

import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.cli.train import main as train_main
from graph_physics_tpu.cli.predict import main as predict_main


def main():
    d = tempfile.mkdtemp(prefix="gpt_smoke_")
    train_h5, meta = synthetic.write_h5_dataset(
        os.path.join(d, "train.h5"), num_trajectories=2, nx=8, ny=6, num_steps=6,
        meta_path=os.path.join(d, "meta.json"),
    )
    val_h5, _ = synthetic.write_h5_dataset(
        os.path.join(d, "val.h5"), num_trajectories=1, nx=8, ny=6, num_steps=6,
        meta_path=os.path.join(d, "meta_val.json"),
    )
    config = {
        "dataset": {
            "extension": "h5", "train_path": train_h5, "test_path": val_h5,
            "meta_path": meta, "targets": ["velocity"], "khop": 1,
        },
        "model": {
            "type": "transformer", "message_passing_num": 1, "hidden_size": 16,
            "num_heads": 4, "node_input_size": 2, "output_size": 2,
            "edge_input_size": 0,
        },
        "index": {
            "feature_index_start": 0, "feature_index_end": 2,
            "output_index_start": 0, "output_index_end": 2, "node_type_index": 2,
        },
        "transformations": {
            "preprocessing": {"noise": 0.001, "noise_index_start": [0],
                              "noise_index_end": [2], "masking": 0},
            "world_pos_parameters": {"use": False},
        },
        "training": {},
    }
    cfg = os.path.join(d, "config.json")
    with open(cfg, "w") as f:
        json.dump(config, f)

    out = os.path.join(d, "runs")
    base = ["--training_parameters_path", cfg, "--batch_size", "2",
            "--warmup", "2", "--out_dir", out, "--run_name", "smoke"]
    assert train_main(base + ["--epochs", "1"]) == 0, "train failed"
    assert train_main(base + ["--epochs", "2", "--resume_training"]) == 0, "resume failed"
    # partitioned training smoke
    assert train_main(base + ["--epochs", "1", "--run_name", "smoke_part",
                              "--num_partitions", "2"]) == 0, "partitioned train failed"
    ckpt = os.path.join(out, "smoke", "checkpoints")
    assert predict_main([
        "--training_parameters_path", cfg, "--model_path", ckpt,
        "--out_dir", os.path.join(d, "preds"), "--run_name", "p",
    ]) == 0, "predict failed"
    assert os.path.exists(os.path.join(d, "preds", "p", "trajectory_0.xdmf"))
    print(f"train-predict smoke OK ({d})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
