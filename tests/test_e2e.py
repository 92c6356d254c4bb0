"""End-to-end: config JSON → train → validate → checkpoint → resume →
predict+export (the reference's Makefile train-predict path, SURVEY.md §4).
"""

import json
import os

import numpy as np
import pytest

from graph_physics_tpu.dataset import synthetic


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    train_h5, meta = synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=2, nx=7, ny=5, num_steps=6,
        meta_path=str(d / "meta.json"),
    )
    val_h5, _ = synthetic.write_h5_dataset(
        str(d / "val.h5"), num_trajectories=1, nx=7, ny=5, num_steps=6,
        meta_path=str(d / "meta_val.json"),
    )
    config = {
        "dataset": {
            "extension": "h5",
            "train_path": train_h5,
            "test_path": val_h5,
            "meta_path": meta,
            "targets": ["velocity"],
            "khop": 1,
        },
        "model": {
            "type": "epd",
            "message_passing_num": 2,
            "hidden_size": 16,
            "node_input_size": 2,
            "output_size": 2,
            "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 2,
            "output_index_start": 0,
            "output_index_end": 2,
            "node_type_index": 2,
        },
        "transformations": {
            "preprocessing": {
                "noise": 1e-4,
                "noise_index_start": [0],
                "noise_index_end": [2],
                "masking": 0,
            },
            "world_pos_parameters": {"use": False},
        },
        "training": {},
    }
    cfg_path = str(d / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return d, cfg_path


def test_train_resume_predict(workspace):
    d, cfg_path = workspace
    from graph_physics_tpu.cli.train import main as train_main
    from graph_physics_tpu.cli.predict import main as predict_main

    out = str(d / "runs")
    args = [
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "2",
        "--learning_rate", "1e-3",
        "--warmup", "5",
        "--out_dir", out,
        "--run_name", "e2e",
    ]
    assert train_main(args) == 0
    ckpt_dir = os.path.join(out, "e2e", "checkpoints")
    assert os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) > 0

    metrics_path = os.path.join(out, "e2e", "e2e.metrics.jsonl")
    records = [json.loads(l) for l in open(metrics_path)]
    assert any("val_all_rollout_rmse" in r for r in records)
    val = [r for r in records if "val_all_rollout_rmse" in r][-1]
    assert np.isfinite(val["val_all_rollout_rmse"])
    # the epoch training loss must be a real accumulated value
    assert val["train_loss_epoch"] > 0

    # resume for one more epoch
    assert train_main(args[:3] + ["2"] + args[4:] + ["--resume_training"]) == 0

    # predict + export
    pred_out = str(d / "preds")
    assert predict_main([
        "--training_parameters_path", cfg_path,
        "--model_path", ckpt_dir,
        "--out_dir", pred_out,
        "--run_name", "p",
    ]) == 0
    xdmf = os.path.join(pred_out, "p", "trajectory_0.xdmf")
    assert os.path.exists(xdmf)

    # exported series is readable and shaped right
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesReader

    r = XdmfTimeSeriesReader(xdmf)
    assert len(r) == 5
    pos, cells, pd, time = r.read_frame(0)
    assert "prediction" in pd and "target" in pd
    assert pd["prediction"].shape[1] == 2
    r.close()


def test_xdmf_roundtrip(tmp_path):
    from graph_physics_tpu.utils.xdmf import (
        XdmfTimeSeriesReader,
        XdmfTimeSeriesWriter,
    )

    pos, cells = synthetic.grid_mesh(5, 4)
    path = str(tmp_path / "series.xdmf")
    w = XdmfTimeSeriesWriter(path)
    for i in range(3):
        w.append(pos, cells, {"v": synthetic.velocity_field(pos, i * 0.1)}, i * 0.1)
    # incremental append via a fresh writer (append_mesh_to_xdmf parity)
    w2 = XdmfTimeSeriesWriter(path)
    w2.append(pos, cells, {"v": synthetic.velocity_field(pos, 0.3)}, 0.3)

    r = XdmfTimeSeriesReader(path)
    assert len(r) == 4
    p0, c0, pd, t0 = r.read_frame(0)
    np.testing.assert_allclose(p0[:, :2], pos, atol=1e-6)
    np.testing.assert_array_equal(c0, cells)
    np.testing.assert_allclose(pd["v"], synthetic.velocity_field(pos, 0.0), atol=1e-6)
    _, _, pd3, t3 = r.read_frame(3)
    assert abs(t3 - 0.3) < 1e-9
    r.close()


def test_xdmf_dataset(tmp_path):
    """XDMF dataset path: write synthetic trajectories as XDMF, load."""
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.dataset.xdmf_dataset import XDMFDataset
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesWriter

    meta = {"dt": 0.01, "features": {}, "trajectory_length": 5}
    meta_path = str(tmp_path / "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    for t in range(2):
        traj = synthetic.make_trajectory(6 + t, 5, 5)
        w = XdmfTimeSeriesWriter(str(tmp_path / f"traj_{t}.xdmf"))
        for i in range(5):
            w.append(
                traj["mesh_pos"][i],
                traj["cells"][i],
                {
                    "velocity": traj["velocity"][i],
                    "node_type": traj["node_type"][i].astype(np.float64),
                },
                i * 0.01,
            )

    ds = XDMFDataset(str(tmp_path), meta_path, FrameConfig(targets=("velocity",)))
    assert ds.num_trajectories == 2
    assert len(ds) == 8  # 2 * (5-1)
    g = ds[0]
    n = int(g.n_node)
    assert g.x.shape[-1] == 4  # velocity(2), node_type, time
    assert g.y is not None
    # node types survived the round trip
    nt = np.asarray(g.node_type[:n])
    assert (nt >= 0).all()
    frames = ds.trajectory_frames(0)
    assert len(frames) == 4


def test_fused_train_resume_predict(workspace):
    """--packed --bf16 --fused through the CLIs incl. checkpoint RESUME:
    the fused step caches are rebuilt fresh on resume while params/opt
    state restore from orbax (tilings are not part of the checkpoint)."""
    from graph_physics_tpu.cli.predict import main as predict_main
    from graph_physics_tpu.cli.train import main as train_main

    d, cfg_path = workspace
    args = [
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--packed", "--bf16", "--fused",
        "--out_dir", str(d / "runs_fused"),
        "--run_name", "rf",
    ]
    assert train_main(args) == 0
    # resume for one more epoch in a fresh process state
    assert train_main(
        args[:3] + ["2"] + args[4:] + ["--resume_training"]
    ) == 0
    metrics = [
        json.loads(l)
        for l in open(d / "runs_fused" / "rf" / "rf.metrics.jsonl")
    ]
    vals = [m for m in metrics if "val_all_rollout_rmse" in m]
    assert len(vals) >= 2  # one per epoch, across the resume
    assert all(np.isfinite(m["val_all_rollout_rmse"]) for m in vals)

    assert predict_main([
        "--training_parameters_path", cfg_path,
        "--model_path", str(d / "runs_fused" / "rf" / "checkpoints"),
        "--out_dir", str(d / "preds_fused"),
        "--run_name", "pf",
    ]) == 0
    assert os.path.exists(d / "preds_fused" / "pf" / "trajectory_0.xdmf")


def test_fused_dp_shardmap_train(workspace):
    """--fused --num_dp_devices: the fused fast path scales over a dp mesh
    via shard_map (GSPMD would replicate the Pallas calls); full CLI
    train run on the 8-device CPU mesh, incl. the multi-step dispatch
    path (lax.scan inside shard_map)."""
    from graph_physics_tpu.cli.train import main as train_main

    d, cfg_path = workspace
    assert train_main([
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "4",
        "--warmup", "2",
        "--packed", "--bf16", "--fused",
        "--num_dp_devices", "4",
        "--steps_per_dispatch", "2",
        "--out_dir", str(d / "runs_fused_dp"),
        "--run_name", "rfd",
    ]) == 0
    # resume under the mesh: orbax restores single-device state; the
    # jitted shard_map step must re-shard it transparently
    assert train_main([
        "--training_parameters_path", cfg_path,
        "--epochs", "2",
        "--batch_size", "4",
        "--warmup", "2",
        "--packed", "--bf16", "--fused",
        "--num_dp_devices", "4",
        "--steps_per_dispatch", "2",
        "--out_dir", str(d / "runs_fused_dp"),
        "--run_name", "rfd",
        "--resume_training",
    ]) == 0
    metrics = [
        json.loads(l)
        for l in open(d / "runs_fused_dp" / "rfd" / "rfd.metrics.jsonl")
    ]
    vals = [
        m["val_all_rollout_rmse"]
        for m in metrics if "val_all_rollout_rmse" in m
    ]
    assert len(vals) >= 2 and all(np.isfinite(v) for v in vals)


def test_fused_nk_transformer_train(workspace, monkeypatch, tmp_path):
    """--fused --fused_attn_nk on a transformer config through the train
    CLI: the NK kernel must actually run (counted), metrics finite."""
    import json as _json

    import graph_physics_tpu.ops.fused_edge_attention_nk as nk_mod
    from graph_physics_tpu.cli.train import main as train_main

    d, cfg_path = workspace
    cfg = _json.loads(open(cfg_path).read())
    cfg["model"].update(type="transformer", hidden_size=64, num_heads=4,
                        edge_input_size=0)
    # the 7x5 workspace mesh pads 35 nodes to one 128-node block — the NK
    # builder correctly rejects that padding inflation; use a mesh that
    # fills its node blocks so the NK layout is profitable and accepted
    train_h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "train_nk.h5"), num_trajectories=2, nx=14, ny=10,
        num_steps=4, meta_path=str(tmp_path / "meta_nk.json"),
    )
    cfg["dataset"].update(train_path=train_h5, test_path=train_h5,
                          meta_path=meta)
    cfg_t = tmp_path / "config_tf.json"
    cfg_t.write_text(_json.dumps(cfg))

    calls = []
    orig = nk_mod.fused_edge_attention_nk

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(nk_mod, "fused_edge_attention_nk", counted)

    assert train_main([
        "--training_parameters_path", str(cfg_t),
        "--epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--packed", "--bf16", "--fused", "--fused_attn_nk",
        "--out_dir", str(d / "runs_nk"),
        "--run_name", "rnk",
    ]) == 0
    assert calls, "the NK attention kernel was never dispatched"
    metrics = [
        _json.loads(l)
        for l in open(d / "runs_nk" / "rnk" / "rnk.metrics.jsonl")
    ]
    vals = [m for m in metrics if "val_all_rollout_rmse" in m]
    assert vals and np.isfinite(vals[-1]["val_all_rollout_rmse"])

    # the production combination: NK attention inside the dp shard_map
    # (per-shard batch must keep B*hidden a multiple of 128 lanes:
    # batch 4 over 2 devices -> local B=2, 2*64=128)
    import jax as _jax

    if len(_jax.devices()) >= 2:
        calls.clear()
        assert train_main([
            "--training_parameters_path", str(cfg_t),
            "--epochs", "1",
            "--batch_size", "4",
            "--warmup", "2",
            "--packed", "--bf16", "--fused", "--fused_attn_nk",
            "--num_dp_devices", "2",
            "--out_dir", str(d / "runs_nk_dp"),
            "--run_name", "rnkd",
        ]) == 0
        assert calls, "NK kernel must dispatch inside the dp shard_map"


def test_multigrid_transformer_train(workspace, tmp_path):
    """model.use_multigrid drives the coarse top-k + kNN remesh path
    through the real train CLI (config-wired multigrid, reference
    README pooling section)."""
    import json as _json

    from graph_physics_tpu.cli.train import main as train_main

    d, cfg_path = workspace
    cfg = _json.loads(open(cfg_path).read())
    cfg["model"].update(type="transformer", hidden_size=16, num_heads=4,
                        edge_input_size=0, use_multigrid=True,
                        multigrid_ratio=0.5, multigrid_k=4)
    cfg_t = tmp_path / "config_mg.json"
    cfg_t.write_text(_json.dumps(cfg))
    assert train_main([
        "--training_parameters_path", str(cfg_t),
        "--epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--out_dir", str(d / "runs_mg"),
        "--run_name", "mg",
    ]) == 0
    metrics = [
        _json.loads(l)
        for l in open(d / "runs_mg" / "mg" / "mg.metrics.jsonl")
    ]
    vals = [m for m in metrics if "val_all_rollout_rmse" in m]
    assert vals and np.isfinite(vals[-1]["val_all_rollout_rmse"])
