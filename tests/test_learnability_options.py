"""Option-variant learnability bars (round-2 verdict weak #5).

The flagship configs enable RoPE, gating, temporal blocks, gated MLPs and
spatial MTP — previously only shape/parity-tested, so a quality
regression in an option path would pass CI. Each variant must TRAIN to a
committed rollout-RMSE bar on the deterministic synthetic advected field
(same protocol as tests/test_learnability.py; metric surface: reference
lightning_module.py:467-493). Bars carry ~3x headroom over the measured
8-epoch CPU results (see BASELINE.md).
"""

import pytest

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.preprocessing import FrameConfig
from graph_physics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
)
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training.loss import LossType
from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

#: variant -> (family, model kwargs, mtp?, committed bar).
#: measured 8-epoch RMSE in parentheses.
VARIANTS = {
    "epd_rope": ("epd", dict(use_rope_embeddings=True, rope_pos_dimension=2),
                 False, 0.006),  # (0.0019)
    "epd_gate": ("epd", dict(use_gated_attention=True), False, 0.008),  # (0.0025)
    "epd_gated_mlp": ("epd", dict(use_gated_mlp=True), False, 0.004),  # (0.0011)
    "epd_temporal": ("epd", dict(use_temporal_block=True), False, 0.004),  # (0.0013)
    "transformer_rope": ("transformer",
                         dict(use_rope_embeddings=True, rope_pos_dimension=2),
                         False, 0.006),  # (0.0017)
    "transformer_silu": ("transformer", dict(use_silu=True), False, 0.006),  # (0.0020)
    "epd_mtp": ("epd", dict(), True, 0.008),  # (0.0025)
    # multigrid pooling (reference README.md:430-462, config-wired r4):
    # coarse top-k + kNN remesh around the transformer blocks
    "transformer_multigrid": ("transformer",
                              dict(use_multigrid=True, multigrid_ratio=0.5),
                              False, 0.009),  # (0.0030)
}


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("learn_opts")
    train_h5, meta = synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=2, nx=10, ny=7, num_steps=10,
        meta_path=str(d / "meta.json"),
    )
    val_h5, _ = synthetic.write_h5_dataset(
        str(d / "val.h5"), num_trajectories=1, nx=10, ny=7, num_steps=10,
        meta_path=str(d / "m2.json"),
    )
    return d, train_h5, val_h5, meta


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_option_variant_learns_to_threshold(variant, data):
    d, train_h5, val_h5, meta = data
    family, kw, use_mtp, bar = VARIANTS[variant]
    fc = FrameConfig(targets=("velocity",))
    if family == "epd":
        model = EncodeProcessDecode(
            message_passing_num=3, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=32, **kw,
        )
        eis = 3
    else:
        model = EncodeTransformDecode(
            message_passing_num=2, node_input_size=11, output_size=2,
            hidden_size=32, num_heads=4, **kw,
        )
        eis = 0
    sim = Simulator(
        node_input_size=11, edge_input_size=eis, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=model,
    )
    mtp = None
    if use_mtp:
        from graph_physics_tpu.training import config as config_lib

        mtp = config_lib.get_mtp_setup({
            "model": {"hidden_size": 32, "output_size": 2, "type": "epd"},
            "training": {
                "use_spatial_mtp": True,
                "spatial_mtp_centers_per_step": 16,
                "spatial_mtp_max_neighbors": 8,
            },
        })
    cfg = TrainerConfig(
        epochs=8, batch_size=2, learning_rate=1e-3, warmup=10,
        out_dir=str(d / "runs"), run_name=variant,
    )
    tr = Trainer(
        sim, H5Dataset(train_h5, meta, fc), H5Dataset(val_h5, meta, fc),
        LossType.L2LOSS, cfg, mtp=mtp,
    )
    tr.fit()
    m = tr.validate(cfg.epochs)
    rmse = m["val_all_rollout_rmse"]
    assert rmse < bar, (
        f"{variant}: rollout RMSE {rmse:.5f} above the committed bar {bar} "
        "(BASELINE.md option-variant learnability)"
    )
