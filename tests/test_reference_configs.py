"""The five canonical workload configs parse and build end-to-end objects
(model, simulator, losses, noise, world params) — the porting contract:
a user of the reference drops their training JSON in unchanged.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.training import config as config_lib
from graph_physics_tpu.training.loss import LossType, MultiLoss
from tests.helpers import tiny_graph

CONFIGS = sorted(glob.glob("training_config/*.json"))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    param = config_lib.load_params(path)
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    loss_fn, names = config_lib.get_loss(param)
    noise = config_lib.get_noise_config(param)
    world_host, world_dev = config_lib.get_world_configs(param)
    frame_cfg = config_lib.get_frame_config(param)
    gm = config_lib.get_gradient_method(param)

    # node input contract: configured size + 9 one-hot classes
    assert sim.node_input_size == param["model"]["node_input_size"] + 9
    if "loss" in param:
        assert isinstance(loss_fn, MultiLoss)
        assert len(loss_fn.losses) == len(param["loss"]["type"])
        assert gm == param["loss"]["gradient_method"]
    else:
        assert loss_fn is LossType.L2LOSS
    if param["transformations"]["preprocessing"].get("noise"):
        assert noise is not None and len(noise.starts) == len(noise.ends)
    if param["transformations"]["world_pos_parameters"].get("use"):
        assert world_host is not None and world_dev is not None


def test_cylinder_config_forward():
    """The cylinder config's model runs on a synthetic frame."""
    param = config_lib.load_params("training_config/cylinder.json")
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    g = jax.tree.map(jnp.asarray, tiny_graph())
    params = sim.init_params(jax.random.PRNGKey(0), g)
    out = sim.forward(params, sim.init_state(), g, is_training=True)
    assert out.net_out.shape == (g.x.shape[0], 2)
    assert np.isfinite(np.asarray(out.net_out)).all()


# ----------------------------------------------------------------------
# 5-config e2e matrix: every canonical training_config JSON drives the
# real CLIs (train -> validate -> checkpoint -> predict/export) on a
# fabricated dataset matching its dataset_config meta schema
# (reference Makefile:36-52 pipeline, generalized to all 5 workloads).
# ----------------------------------------------------------------------

WORKLOADS = {
    "cylinder": ("cylinder", None),
    "plate": ("plate", None),
    "coarse-aneurysm": ("aneurysm", "aneurysm"),
    "pinn-aneurysm": ("aneurysm", "aneurysm"),
    "panels": ("panels", "panels"),
}


@pytest.mark.parametrize("name", sorted(WORKLOADS))
def test_canonical_config_e2e(name, tmp_path):
    import json

    from graph_physics_tpu.cli.predict import main as predict_main
    from graph_physics_tpu.cli.train import main as train_main
    from graph_physics_tpu.dataset.synthetic import write_workload_fixture

    workload, external = WORKLOADS[name]
    train_p, test_p, meta_p = write_workload_fixture(
        workload, str(tmp_path / "data")
    )
    cfg = json.load(open(f"training_config/{name}.json"))
    cfg["dataset"].update(
        train_path=train_p, test_path=test_p, meta_path=meta_p
    )
    cfg_path = str(tmp_path / f"{name}.json")
    json.dump(cfg, open(cfg_path, "w"))

    args = [
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "1",
        "--warmup", "2",
        "--out_dir", str(tmp_path / "runs"),
        "--run_name", "r",
    ]
    if external:
        args += ["--external", external]
    assert train_main(args) == 0

    metrics = [
        json.loads(l)
        for l in open(tmp_path / "runs" / "r" / "r.metrics.jsonl")
    ]
    val = [m for m in metrics if "val_all_rollout_rmse" in m][-1]
    assert np.isfinite(val["val_all_rollout_rmse"])
    assert val["train_loss_epoch"] > 0

    pred_args = [
        "--training_parameters_path", cfg_path,
        "--model_path", str(tmp_path / "runs" / "r" / "checkpoints"),
        "--out_dir", str(tmp_path / "preds"),
        "--run_name", "p",
    ]
    if external:
        pred_args += ["--external", external]
    assert predict_main(pred_args) == 0
    assert os.path.exists(tmp_path / "preds" / "p" / "trajectory_0.xdmf")


@pytest.mark.parametrize("name", ["panels", "pinn-aneurysm"])
def test_multiloss_config_packed_e2e(name, tmp_path):
    """The two physics-loss workloads under --packed (round-2 verdict #2:
    MultiLoss previously crashed on the packed fast path and locked these
    configs out of the 3-6x packed speedup)."""
    import json

    from graph_physics_tpu.cli.train import main as train_main
    from graph_physics_tpu.dataset.synthetic import write_workload_fixture

    workload, external = WORKLOADS[name]
    train_p, test_p, meta_p = write_workload_fixture(
        workload, str(tmp_path / "data")
    )
    cfg = json.load(open(f"training_config/{name}.json"))
    cfg["dataset"].update(
        train_path=train_p, test_path=test_p, meta_path=meta_p
    )
    cfg_path = str(tmp_path / f"{name}.json")
    json.dump(cfg, open(cfg_path, "w"))

    args = [
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--packed",
        "--out_dir", str(tmp_path / "runs"),
        "--run_name", "rp",
    ]
    if external:
        args += ["--external", external]
    assert train_main(args) == 0
    metrics = [
        json.loads(l)
        for l in open(tmp_path / "runs" / "rp" / "rp.metrics.jsonl")
    ]
    val = [m for m in metrics if "val_all_rollout_rmse" in m][-1]
    assert np.isfinite(val["val_all_rollout_rmse"])
    assert val["train_loss_epoch"] > 0
