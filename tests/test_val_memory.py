"""Bounded validation device memory (VERDICT r3 item 4).

Trainer.validate must not pin the whole validation set in device memory:
trajectory stacks are cached HOST-side (numpy) and streamed to the chip
in chunks of at most ``cfg.val_device_batch`` trajectories. At real
CylinderFlow scale (~100 trajectories × 600 frames) the previous design
(device-cached stacks reused every epoch) held multiple GB of HBM for
the entire run.

Asserts:
* the persistent cache holds ONLY numpy leaves (nothing device-resident
  survives between epochs),
* every rollout dispatch sees at most ``val_device_batch`` trajectories,
* chunked metrics are identical to the single-dispatch ones.
"""

import numpy as np
import pytest

import jax

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.preprocessing import FrameConfig
from graph_physics_tpu.models.processors import EncodeProcessDecode
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training.loss import LossType
from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

N_VAL = 9


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("valmem")
    train_h5, meta = synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=1, nx=8, ny=6, num_steps=6,
        meta_path=str(d / "meta.json"),
    )
    val_h5, _ = synthetic.write_h5_dataset(
        str(d / "val.h5"), num_trajectories=N_VAL, nx=8, ny=6, num_steps=6,
        meta_path=str(d / "m2.json"),
    )
    return d, train_h5, val_h5, meta


def _trainer(d, train_h5, val_h5, meta, val_device_batch, name):
    fc = FrameConfig(targets=("velocity",))
    sim = Simulator(
        node_input_size=11, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=EncodeProcessDecode(
            message_passing_num=1, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=8,
        ),
    )
    cfg = TrainerConfig(
        epochs=1, batch_size=1, warmup=2, out_dir=str(d / "runs"),
        run_name=name, val_device_batch=val_device_batch,
    )
    tr = Trainer(
        sim, H5Dataset(train_h5, meta, fc), H5Dataset(val_h5, meta, fc),
        LossType.L2LOSS, cfg,
    )
    tr.init_or_resume()
    return tr


def test_validate_streams_bounded_chunks(data):
    d, train_h5, val_h5, meta = data
    tr = _trainer(d, train_h5, val_h5, meta, val_device_batch=2, name="chunk")

    seen_sizes = []
    inner = tr.batched_rollout_fn

    def spy(params, sim_state, stacked):
        seen_sizes.append(int(stacked.x.shape[0]))
        return inner(params, sim_state, stacked)

    tr.batched_rollout_fn = spy
    m_chunked = tr.validate(0)

    # every dispatch bounded by val_device_batch; all trajectories covered
    assert seen_sizes and max(seen_sizes) <= 2
    assert sum(seen_sizes) == N_VAL

    # the cross-epoch cache is host-resident: numpy leaves only
    _, prepared = tr._val_groups
    for _ts, host_frames in prepared:
        for f in host_frames:
            for leaf in jax.tree.leaves(f):
                assert isinstance(leaf, np.ndarray), type(leaf)

    # identical metrics vs the unbounded single-dispatch path
    tr2 = _trainer(d, train_h5, val_h5, meta, val_device_batch=None,
                   name="whole")
    tr2.state = tr2.state.replace(
        params=jax.device_get(tr.state.params),
        sim_state=tr.state.sim_state,
    )
    m_whole = tr2.validate(0)
    for k in m_whole:
        np.testing.assert_allclose(
            m_chunked[k], m_whole[k], rtol=1e-6, atol=1e-7, err_msg=k
        )


def test_val_cache_keys_on_dataset_identity(data, tmp_path):
    """Swapping val datasets of EQUAL trajectory count between validate()
    calls must rebuild the host stacks — a cache keyed on n_traj alone
    would silently report the old dataset's metrics (VERDICT r4 weak #7).
    """
    import shutil

    import h5py

    d, train_h5, val_h5, meta = data
    tr = _trainer(d, train_h5, val_h5, meta, val_device_batch=None,
                  name="swap")
    m_a = tr.validate(0)
    assert tr._val_groups is not None

    # different data, same trajectory count and shapes
    val2_h5 = str(tmp_path / "val2.h5")
    shutil.copy(val_h5, val2_h5)
    with h5py.File(val2_h5, "r+") as f:
        for key in f:
            f[key]["velocity"][...] = 1.5 * f[key]["velocity"][...] + 0.3
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig

    tr.val_ds = H5Dataset(val2_h5, meta, FrameConfig(targets=("velocity",)))
    m_b = tr.validate(0)
    assert m_a["val_all_rollout_rmse"] != pytest.approx(
        m_b["val_all_rollout_rmse"]
    ), "validate() reused stale stacks after a val-dataset swap"
