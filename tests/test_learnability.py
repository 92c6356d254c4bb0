"""Quantitative learnability bar — the stand-in for real-data RMSE parity.

Until the CylinderFlow/DeformingPlate h5 releases are available in the
image, each model family must TRAIN to a committed rollout-RMSE threshold
on the deterministic synthetic advected field (dataset/synthetic.py).
The thresholds (recorded in BASELINE.md) carry ~2.5x headroom over the
measured 8-epoch results and sit well BELOW the 1-epoch RMSE, so they
regression-guard actual multi-epoch learning, not mere finiteness.
Metric surface: reference lightning_module.py:467-493.
"""

import pytest

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.preprocessing import FrameConfig
from graph_physics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
    TransolverProcessor,
)
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training.loss import LossType
from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

#: committed rollout-RMSE bars (BASELINE.md "synthetic learnability")
THRESHOLDS = {
    "epd": 0.006,
    "transformer": 0.006,
    "transolver": 0.02,
}


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("learn")
    train_h5, meta = synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=2, nx=10, ny=7, num_steps=10,
        meta_path=str(d / "meta.json"),
    )
    val_h5, _ = synthetic.write_h5_dataset(
        str(d / "val.h5"), num_trajectories=1, nx=10, ny=7, num_steps=10,
        meta_path=str(d / "m2.json"),
    )
    return d, train_h5, val_h5, meta


def _model(family):
    if family == "epd":
        return EncodeProcessDecode(
            message_passing_num=3, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=32,
        )
    if family == "transformer":
        return EncodeTransformDecode(
            message_passing_num=2, node_input_size=11, output_size=2,
            hidden_size=32, num_heads=4,
        )
    return TransolverProcessor(
        message_passing_num=2, node_input_size=11, output_size=2,
        hidden_size=32, num_heads=4, slice_num=8,
    )


@pytest.mark.parametrize("family", sorted(THRESHOLDS))
def test_family_learns_to_threshold(family, data):
    d, train_h5, val_h5, meta = data
    fc = FrameConfig(targets=("velocity",))
    sim = Simulator(
        node_input_size=11,
        edge_input_size=3 if family == "epd" else 0,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
        model=_model(family),
    )
    cfg = TrainerConfig(
        epochs=8, batch_size=2, learning_rate=1e-3, warmup=10,
        out_dir=str(d / "runs"), run_name=family,
    )
    tr = Trainer(
        sim, H5Dataset(train_h5, meta, fc), H5Dataset(val_h5, meta, fc),
        LossType.L2LOSS, cfg,
    )
    tr.fit()
    m = tr.validate(cfg.epochs)
    rmse = m["val_all_rollout_rmse"]
    assert rmse < THRESHOLDS[family], (
        f"{family}: rollout RMSE {rmse:.5f} above the committed bar "
        f"{THRESHOLDS[family]} (BASELINE.md synthetic learnability)"
    )
