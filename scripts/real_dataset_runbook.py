"""Real-dataset runbook: CylinderFlow / DeformingPlate → headline RMSE.

The MeshGraphNets releases (CylinderFlow, DeformingPlate — the
reference's headline datasets, lightning_module.py:467-493 metrics) are
not in this image. When they land, this ONE script produces the
rollout-RMSE table within hours; until then ``--smoke`` drives the
identical pipeline end-to-end on fabricated fixtures so every stage
stays proven in CI (tests/test_runbook.py).

Stages (each skippable/idempotent):

  1. data      point --data_dir at the release:
                 <data_dir>/{train,valid,test}.h5  (DeepMind layout: one
                 group per trajectory, [T, N, C] field datasets) and a
                 meta.json (dt, field types/shapes — the reference's
                 dataset_config/*_meta.json schema). The tfrecord
                 releases convert with DeepMind's own tfrecord->h5
                 script; our h5 loaders consume that layout directly
                 (graphphysics/utils/hierarchical.py:25-133 parity).
  2. config    writes <out>/config.json: the canonical training_config
                 JSON for --workload with dataset paths injected.
  3. convert   (optional) --torch_checkpoint <file>: gpt-convert maps a
                 published reference checkpoint into an orbax checkpoint
                 (exact normalizer stats + weights; utils/convert.py) —
                 rollout-RMSE parity WITHOUT retraining.
  4. train     gpt-train --packed --bf16 --fused (the committed TPU fast
                 path) unless a converted checkpoint is being evaluated.
  5. predict   gpt-predict over the test split; writes trajectory XDMFs.
  6. report    <out>/rmse_table.json: per-trajectory rollout RMSE +
                 1-step/50-step/all-step aggregates (the reference's
                 on_validation_epoch_end table) — the number to put next
                 to the reference's published 2.34e-3 (cylinder,
                 BASELINE.md).

Usage:
  python scripts/real_dataset_runbook.py --workload cylinder \
      --data_dir /data/cylinder_flow --out /tmp/cyl_run \
      [--torch_checkpoint ref.ckpt] [--epochs 25]
  python scripts/real_dataset_runbook.py --workload cylinder --smoke
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_config(workload, data_dir, out):
    cfg = json.load(
        open(os.path.join(REPO, "training_config", f"{workload}.json"))
    )
    meta = os.path.join(data_dir, "meta.json")
    train = os.path.join(data_dir, "train.h5")
    test = next(
        (p for p in (os.path.join(data_dir, "valid.h5"),
                     os.path.join(data_dir, "test.h5")) if os.path.exists(p)),
        train,
    )
    for p in (meta, train):
        if not os.path.exists(p):
            raise SystemExit(
                f"missing {p} — see the module docstring for the expected "
                "release layout"
            )
    cfg["dataset"].update(train_path=train, test_path=test, meta_path=meta)
    path = os.path.join(out, "config.json")
    os.makedirs(out, exist_ok=True)
    json.dump(cfg, open(path, "w"))
    return path


def smoke_data(workload, out):
    from graph_physics_tpu.dataset import synthetic

    d = os.path.join(out, "mock_data")
    if workload == "plate":
        train, meta = synthetic.write_plate_h5_dataset(
            os.path.join(d, "train.h5"), num_trajectories=2, nx=10, ny=8,
            num_steps=10, meta_path=os.path.join(d, "meta.json"),
        )
    else:
        train, meta = synthetic.write_h5_dataset(
            os.path.join(d, "train.h5"), num_trajectories=2, nx=10, ny=8,
            num_steps=10, meta_path=os.path.join(d, "meta.json"),
        )
    return d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="cylinder",
                    choices=["cylinder", "plate"])
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--torch_checkpoint", default=None,
                    help="published reference checkpoint: convert + "
                         "evaluate instead of training")
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--smoke", action="store_true",
                    help="fabricated tiny dataset + 1 epoch on CPU: CI "
                         "proof of every stage")
    args = ap.parse_args(argv)

    out = args.out or ("/tmp/runbook_" + args.workload)
    os.makedirs(out, exist_ok=True)

    # -- 1/2: data + config --------------------------------------------
    data_dir = args.data_dir
    if args.smoke:
        data_dir = smoke_data(args.workload, out)
    if data_dir is None:
        raise SystemExit("pass --data_dir (release layout) or --smoke")
    cfg_path = build_config(args.workload, data_dir, out)

    from graph_physics_tpu.cli.predict import main as predict_main
    from graph_physics_tpu.cli.train import main as train_main

    # -- 3: optional reference-checkpoint conversion ---------------------
    model_path = None
    if args.torch_checkpoint:
        from graph_physics_tpu.cli.convert import main as convert_main

        model_path = os.path.join(out, "converted")
        rc = convert_main([
            "--torch_checkpoint", args.torch_checkpoint,
            "--training_parameters_path", cfg_path,
            "--output_dir", model_path,
        ])
        assert rc in (0, None), "conversion failed"

    # -- 4: train (the committed TPU fast path) --------------------------
    if model_path is None:
        train_args = [
            "--training_parameters_path", cfg_path,
            "--epochs", str(1 if args.smoke else args.epochs),
            "--batch_size", str(2 if args.smoke else args.batch_size),
            "--warmup", "2" if args.smoke else "1000",
            "--out_dir", os.path.join(out, "runs"),
            "--run_name", "run",
        ]
        if not args.smoke:
            train_args += ["--packed", "--bf16", "--fused"]
        rc = train_main(train_args)
        assert rc == 0, "training failed"
        model_path = os.path.join(out, "runs", "run", "checkpoints")

    # -- 5: predict over the test split ----------------------------------
    rc = predict_main([
        "--training_parameters_path", cfg_path,
        "--model_path", model_path,
        "--out_dir", os.path.join(out, "preds"),
        "--run_name", "p",
    ])
    assert rc == 0, "predict failed"

    # -- 6: RMSE table ----------------------------------------------------
    # gpt-predict prints + returns per-trajectory rollout RMSE; recompute
    # the aggregate table from the exported XDMFs so the report is
    # self-contained (prediction vs target fields ride in the files)
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesReader

    rows = []
    pred_dir = os.path.join(out, "preds", "p")
    for f in sorted(os.listdir(pred_dir)):
        if not f.endswith(".xdmf"):
            continue
        r = XdmfTimeSeriesReader(os.path.join(pred_dir, f))
        sq, cnt, horizons = 0.0, 0, {}
        for s in range(len(r)):
            _pos, _cells, fields, _t = r.read_frame(s)
            err = np.asarray(fields["prediction"]) - np.asarray(
                fields["target"]
            )
            sq += float(np.sum(err**2))
            cnt += err.size
            if s + 1 in (1, 50, len(r)):
                horizons[f"rmse@{s + 1}"] = float(
                    np.sqrt(sq / max(cnt, 1))
                )
        rows.append({"trajectory": f, **horizons,
                     "rmse_all": float(np.sqrt(sq / max(cnt, 1)))})
    table = {
        "workload": args.workload,
        "trajectories": rows,
        "rmse_all_mean": float(np.mean([r["rmse_all"] for r in rows])),
        # the reference's published headline for context (BASELINE.md):
        # CylinderFlow rollout-all RMSE ~ 2.34e-3 (MeshGraphNets table 1)
    }
    with open(os.path.join(out, "rmse_table.json"), "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
