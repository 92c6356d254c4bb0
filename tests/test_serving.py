"""Serving-export tests: ahead-of-time StableHLO artifacts round-trip.

The exported eval step / rollout must (a) serialize+deserialize, (b)
reproduce the in-process forward/rollout exactly, (c) thread normalizer
statistics through the dict boundary, (d) compose under an outer jit,
and (e) come out of the gpt-export CLI directly runnable.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graph_physics_tpu.models.processors import EncodeProcessDecode
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.serving import (
    export_eval_step,
    export_rollout,
    load_exported,
    save_exported,
)
from graph_physics_tpu.training.rollout import make_rollout_fn, stack_frames

from tests.helpers import tiny_graph, to_jax

NODE_IN = 2 + 9  # two feature columns + one-hot(NodeType.SIZE)


def _sim_and_params(seed=0, hidden=16):
    g = to_jax(tiny_graph())
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=3, output_size=2, hidden_size=hidden,
    )
    sim = Simulator(NODE_IN, 3, 2, 0, 2, 0, 2, 2, model)
    params = sim.init_params(jax.random.PRNGKey(seed), g)
    return sim, params, g


def _accumulated_state(sim, params, g):
    """Non-trivial normalizer statistics (one training accumulation)."""
    out = sim.forward(params, sim.init_state(), g, is_training=True)
    state = out.state
    assert float(state.node_norm.num_accumulations) > 0
    return state


def test_eval_step_roundtrip(tmp_path):
    sim, params, g = _sim_and_params()
    state = _accumulated_state(sim, params, g)
    ex = export_eval_step(sim, params, state, g, platforms=("cpu", "tpu"))
    assert ex.platforms == ("cpu", "tpu")
    save_exported(str(tmp_path), eval_step=ex)

    loaded = load_exported(str(tmp_path))
    out = loaded.eval_step(params, state, g)
    ref = sim.forward(params, state, g, is_training=False).outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # manifest records the lowered platforms + signatures
    man = json.loads((tmp_path / "manifest.json").read_text())
    assert man["artifacts"]["eval_step"]["platforms"] == ["cpu", "tpu"]
    # the eval artifact's signature must NOT demand supervision fields —
    # a serving host has no ground-truth y (the example graph had one)
    assert g.y is not None
    fields = loaded._graph_fields(loaded._eval)
    assert not fields & {"y", "next_data", "deselected", "traj_index"}
    import dataclasses as _dc

    out2 = loaded.eval_step(params, state, _dc.replace(g, y=None))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_eval_step_composes_under_jit(tmp_path):
    sim, params, g = _sim_and_params(seed=1)
    state = sim.init_state()
    save_exported(
        str(tmp_path),
        eval_step=export_eval_step(sim, params, state, g, platforms=("cpu",)),
    )
    loaded = load_exported(str(tmp_path))

    @jax.jit
    def serve(params, x):
        return loaded.eval_step(params, state, g.replace(x=x)) * 2.0

    out = serve(params, g.x)
    ref = sim.forward(params, state, g, is_training=False).outputs * 2.0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_batched_eval_step(tmp_path):
    """vmapped serving artifact: B same-bucket graphs per call, per-graph
    outputs equal to B independent single-graph forwards."""
    sim, params, g = _sim_and_params(seed=3)
    state = _accumulated_state(sim, params, g)
    ex = export_eval_step(sim, params, state, g, platforms=("cpu",),
                          batch_size=3)
    save_exported(str(tmp_path), batched_eval_step=ex)
    loaded = load_exported(str(tmp_path))

    graphs = [to_jax(tiny_graph(frame=t)) for t in range(3)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
    out = loaded.eval_step_batched(params, state, stacked)
    assert np.asarray(out).shape[0] == 3
    for b, gb in enumerate(graphs):
        ref = sim.forward(params, state, gb, is_training=False).outputs
        np.testing.assert_allclose(np.asarray(out)[b], np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("family", ["transformer", "transolver"])
def test_eval_export_other_families(tmp_path, family):
    """Every model family exports (epd is covered by the other tests)."""
    from graph_physics_tpu.models.processors import (
        EncodeTransformDecode,
        TransolverProcessor,
    )

    g = to_jax(tiny_graph())
    if family == "transformer":
        model = EncodeTransformDecode(
            message_passing_num=1, node_input_size=NODE_IN, output_size=2,
            hidden_size=32, num_heads=4,
        )
    else:
        model = TransolverProcessor(
            message_passing_num=1, node_input_size=NODE_IN, output_size=2,
            hidden_size=32, num_heads=4, slice_num=8,
        )
    sim = Simulator(NODE_IN, 0, 2, 0, 2, 0, 2, 2, model)
    params = sim.init_params(jax.random.PRNGKey(0), g)
    state = sim.init_state()
    save_exported(
        str(tmp_path),
        eval_step=export_eval_step(sim, params, state, g, platforms=("cpu",)),
    )
    out = load_exported(str(tmp_path)).eval_step(params, state, g)
    ref = sim.forward(params, state, g, is_training=False).outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dp_sharded_batched_eval(tmp_path):
    """Artifact exported with dp_mesh runs data-parallel over the serving
    host's mesh; per-graph outputs equal independent forwards."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from jax.sharding import Mesh

    sim, params, g = _sim_and_params(seed=4)
    state = sim.init_state()
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    ex = export_eval_step(sim, params, state, g, platforms=("cpu",),
                          batch_size=8, dp_mesh=mesh)
    assert ex.nr_devices == 8
    save_exported(str(tmp_path), batched_eval_step=ex)
    loaded = load_exported(str(tmp_path))

    graphs = [to_jax(tiny_graph(frame=t % 6)) for t in range(8)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)
    out = loaded.eval_step_batched(params, state, stacked)
    assert "dp" in str(getattr(out, "sharding", ""))
    for b in (0, 3, 7):
        ref = sim.forward(params, state, graphs[b], is_training=False).outputs
        np.testing.assert_allclose(np.asarray(out)[b], np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("symbolic", [False, True])
def test_rollout_roundtrip(tmp_path, symbolic):
    sim, params, _ = _sim_and_params(seed=2)
    frames = stack_frames(
        [to_jax(tiny_graph(frame=t)) for t in range(3)]
    )
    state = sim.init_state()
    ex = export_rollout(sim, params, state, frames, platforms=("cpu",),
                        symbolic_time=symbolic)
    save_exported(str(tmp_path), rollout=ex)

    loaded = load_exported(str(tmp_path))
    res = loaded.rollout(params, state, frames)

    ref = make_rollout_fn(sim)(params, state, frames)
    np.testing.assert_allclose(np.asarray(res["predictions"]),
                               np.asarray(ref.predictions),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res["rmse_all_rollout"]),
                               np.asarray(ref.rmse_all_rollout),
                               rtol=1e-6, atol=1e-6)

    if symbolic:
        # ONE artifact serves a different trajectory length
        frames5 = stack_frames(
            [to_jax(tiny_graph(frame=t)) for t in range(5)]
        )
        res5 = loaded.rollout(params, state, frames5)
        ref5 = make_rollout_fn(sim)(params, state, frames5)
        np.testing.assert_allclose(np.asarray(res5["predictions"]),
                                   np.asarray(ref5.predictions),
                                   rtol=1e-6, atol=1e-6)


def test_export_cli(tmp_path):
    """gpt-export end to end: synthetic dataset → checkpoint → artifacts →
    deserialized rollout matches the in-process rollout."""
    from graph_physics_tpu.cli.export import main as export_main
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.training import checkpoint as ckpt_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule as schedule_lib
    from graph_physics_tpu.training.step import init_train_state, model_params

    w = str(tmp_path)
    train_h5, meta = synthetic.write_h5_dataset(
        f"{w}/train.h5", num_trajectories=1, nx=8, ny=6, num_steps=5,
        meta_path=f"{w}/meta.json",
    )
    cfg = {
        "dataset": {"extension": "h5", "train_path": train_h5,
                    "test_path": train_h5, "meta_path": meta,
                    "targets": ["velocity"], "khop": 1},
        "model": {"type": "epd", "message_passing_num": 2, "hidden_size": 16,
                  "node_input_size": 2, "output_size": 2, "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0, "masking": 0},
                            "world_pos_parameters": {"use": False}},
        "training": {},
    }
    cfg_path = f"{w}/config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    # a checkpoint (fresh init is fine — export is about the artifact)
    param = config_lib.load_params(cfg_path)
    model = config_lib.get_model(param)
    simulator = config_lib.get_simulator(param, model)
    frame_cfg = config_lib.get_frame_config(param, masking_ratio=0.0)
    ds = config_lib.get_dataset(param, frame_cfg, switch_to_val=True)
    optimizer = schedule_lib.make_optimizer(1e-3, 1, 1)
    example = next(iter(BatchLoader(ds, 1, shuffle=False, device_put=False)))
    state = init_train_state(simulator, optimizer, jax.random.PRNGKey(0), example)
    manager = ckpt_lib.make_manager(f"{w}/ckpt")
    ckpt_lib.save_checkpoint(manager, state, 0, metadata={})

    export_main([
        "--training_parameters_path", cfg_path,
        "--model_path", f"{w}/ckpt",
        "--out_dir", f"{w}/artifacts",
        "--platforms", "cpu",
    ])

    loaded = load_exported(f"{w}/artifacts")
    assert loaded.manifest["rollout_symbolic_time"]  # default path
    frames = stack_frames(ds.trajectory_frames(0))
    res = loaded.rollout(model_params(state.params), state.sim_state, frames)
    ref = make_rollout_fn(simulator)(
        model_params(state.params), state.sim_state, frames
    )
    np.testing.assert_allclose(np.asarray(res["predictions"]),
                               np.asarray(ref.predictions),
                               rtol=1e-5, atol=1e-6)
    single = jax.tree.map(lambda a: a[0], example)
    out = loaded.eval_step(model_params(state.params), state.sim_state, single)
    assert np.asarray(out).shape == (single.x.shape[0], 2)
