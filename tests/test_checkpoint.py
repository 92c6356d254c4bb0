import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.training import checkpoint as ckpt_lib
from graph_physics_tpu.training.step import init_train_state
from tests.test_train_step import batch_of, make_setup


def test_checkpoint_roundtrip(tmp_path):
    sim, opt, step_fn = make_setup(noise_scale=0.0)
    batch = batch_of(2)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    mgr = ckpt_lib.make_manager(str(tmp_path / "ckpt"))
    ckpt_lib.save_checkpoint(mgr, state, int(state.step), metadata={"run_id": "abc"})

    abstract = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    restored, meta = ckpt_lib.restore_checkpoint(mgr, abstract)
    assert meta["run_id"] == "abc"
    assert int(restored.step) == 3
    # params, optimizer state and normalizer statistics all round-trip
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        float(restored.sim_state.output_norm.acc_count),
        float(state.sim_state.output_norm.acc_count),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.sim_state.output_norm.acc_sum),
        np.asarray(state.sim_state.output_norm.acc_sum),
    )
    # training continues from the restored state
    restored, m = step_fn(restored, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_best_k_checkpointing(tmp_path):
    """best_metric keeps the lowest-metric checkpoints, not the latest."""
    sim, opt, step_fn = make_setup(noise_scale=0.0)
    batch = batch_of(1)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    mgr = ckpt_lib.make_manager(
        str(tmp_path / "best"), max_to_keep=2, best_metric="val_rmse"
    )
    for step, rmse in [(1, 0.5), (2, 0.1), (3, 0.9), (4, 0.3)]:
        ckpt_lib.save_checkpoint(
            mgr, state.replace(step=jnp.asarray(step)), step,
            metadata={}, metrics={"val_rmse": rmse},
        )
    kept = sorted(mgr.all_steps())
    assert kept == [2, 4]  # the two lowest rmse values
    assert mgr.best_step() == 2


def test_simulator_artifact_roundtrip(tmp_path):
    sim, opt, _ = make_setup()
    batch = batch_of(1)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    path = str(tmp_path / "simulator")
    ckpt_lib.save_simulator(path, state.params, state.sim_state, extra={"v": 1})
    params, sim_state = ckpt_lib.load_simulator(
        path, state.params, state.sim_state
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_processor_options():
    """only_processor + remat variants run (reference processors.py:176)."""
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from tests.helpers import tiny_graph

    g = jax.tree.map(jnp.asarray, tiny_graph())
    h = 16
    # only_processor consumes pre-encoded hidden features
    g_latent = g.replace(
        x=jnp.zeros((g.x.shape[0], h)),
        edge_attr=jnp.zeros((g.senders.shape[0], h)),
    )
    m = EncodeProcessDecode(
        message_passing_num=1, node_input_size=h, edge_input_size=h,
        output_size=2, hidden_size=h, only_processor=True,
    )
    params = m.init(jax.random.PRNGKey(0), g_latent)
    out = m.apply(params, g_latent)
    assert out.shape == (g.x.shape[0], h)  # hidden, not decoded

    m2 = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=h, remat=True,
    )
    p2 = m2.init(jax.random.PRNGKey(0), g)
    grads = jax.grad(lambda p: jnp.sum(m2.apply(p, g) ** 2))(p2)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(grads))


def test_trainer_wandb_run_id_resume(tmp_path):
    """A resumed Trainer reattaches to the checkpointed wandb run id: the
    logger must be constructed AFTER checkpoint restore (reference
    lightning_module.py:560-573 parity)."""
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

    h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=1, nx=5, ny=4, num_steps=4,
        meta_path=str(tmp_path / "meta.json"),
    )
    fc = FrameConfig(targets=("velocity",))

    def make_trainer():
        model = EncodeProcessDecode(
            message_passing_num=1, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=8,
        )
        sim = Simulator(
            node_input_size=11, edge_input_size=3, output_size=2,
            feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
            model=model,
        )
        cfg = TrainerConfig(
            epochs=1, batch_size=1, out_dir=str(tmp_path / "runs"),
            run_name="r", warmup=2,
        )
        return Trainer(
            sim, H5Dataset(h5, meta, fc), H5Dataset(h5, meta, fc),
            LossType.L2LOSS, cfg,
        )

    t1 = make_trainer()
    t1.fit()
    assert t1.logger.run_id is None  # no wandb in this image

    # inject a run id into the latest checkpoint's metadata, as a wandb
    # run would have left it
    ckpt_lib.save_checkpoint(
        t1.manager, t1.state, int(t1.state.step) + 1, metadata={"run_id": "abc123"}
    )
    t1.manager.wait_until_finished()

    t2 = make_trainer()
    t2.init_or_resume(resume=True)
    assert t2.run_metadata.get("run_id") == "abc123"
    # the lazily-built logger picks the restored id up as its resume id
    assert t2.logger.run_id == "abc123"
