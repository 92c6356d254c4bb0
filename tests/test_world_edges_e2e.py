"""World-edge (DeformingPlate-style) pipeline: dataset → train → rollout.

Covers the SURVEY.md §7 hard part: world-edge discovery with a static
budget, obstacle-displacement channel insertion, device-side world-pos
edge features from the noised/predicted x.
"""

import json
import os

import jax
import numpy as np
import pytest

from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.training import config as config_lib


@pytest.fixture(scope="module")
def plate_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("plate")
    train_h5, meta = synthetic.write_plate_h5_dataset(
        str(d / "train.h5"), num_trajectories=1, num_steps=6,
        meta_path=str(d / "meta.json"),
    )
    config = {
        "dataset": {
            "extension": "h5",
            "train_path": train_h5,
            "test_path": train_h5,
            "meta_path": meta,
            "targets": ["world_pos"],
            "khop": 1,
        },
        "model": {
            "type": "transformer",
            "message_passing_num": 2,
            "hidden_size": 16,
            "num_heads": 4,
            "node_input_size": 6,
            "output_size": 3,
            "edge_input_size": 0,
        },
        "index": {
            "feature_index_start": 0,
            "feature_index_end": 6,
            "output_index_start": 0,
            "output_index_end": 3,
            "node_type_index": 6,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.003,
                "noise_index_start": [0],
                "noise_index_end": [3],
                "masking": 0,
            },
            "world_pos_parameters": {
                "use": True,
                "world_pos_index_start": 0,
                "world_pos_index_end": 3,
                "radius": 0.12,
                "edge_budget": 256,
            },
        },
        "training": {},
    }
    cfg_path = str(d / "plate.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return d, cfg_path


def test_plate_frame_contract(plate_config):
    d, cfg_path = plate_config
    param = config_lib.load_params(cfg_path)
    frame_cfg = config_lib.get_frame_config(param)
    ds = config_lib.get_dataset(param, frame_cfg)
    g = ds[2]
    n = int(g.n_node)
    # x = [world_pos(3), obstacle_displacement(3), node_type, time]
    assert g.x.shape[-1] == 8
    nt = np.asarray(g.node_type[:n])
    x = np.asarray(g.x[:n])
    # displacement columns: obstacle rows = target - current (descending z)
    obs = nt == int(NodeType.OBSTACLE)
    assert obs.any()
    assert (x[obs, 5] < 0).all()  # z displacement negative
    # non-obstacle rows carry the mean obstacle displacement
    np.testing.assert_allclose(
        x[~obs, 5], x[obs, 5].mean(), atol=1e-6
    )
    # world edges exist: some edges connect OBSTACLE and NORMAL nodes
    e = int(g.n_edge)
    s, r = np.asarray(g.senders[:e]), np.asarray(g.receivers[:e])
    cross = (nt[s] == int(NodeType.OBSTACLE)) & (nt[r] == int(NodeType.NORMAL))
    assert cross.any()


def test_plate_trains_and_rolls_out(plate_config):
    d, cfg_path = plate_config
    from graph_physics_tpu.cli.train import main as train_main

    out = str(d / "runs")
    rc = train_main([
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "2",
        "--warmup", "2",
        "--out_dir", out,
        "--run_name", "plate",
    ])
    assert rc == 0
    metrics = [json.loads(l) for l in open(os.path.join(out, "plate", "plate.metrics.jsonl"))]
    val = [m for m in metrics if "val_all_rollout_rmse" in m][-1]
    assert np.isfinite(val["val_all_rollout_rmse"])


def test_dynamic_world_edges_in_rollout(plate_config):
    """On-device radius search inside the scan rollout recovers the same
    OBSTACLE↔NORMAL pairs as host preprocessing on ground-truth frames."""
    import jax.numpy as jnp

    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.training.rollout import (
        DynamicWorldEdges,
        make_rollout_fn,
        stack_frames,
    )

    import dataclasses

    d, cfg_path = plate_config
    param = config_lib.load_params(cfg_path)
    # frames WITHOUT host world edges (radius ~0 finds none) but with the
    # world edge budget reserved as free tail slots
    frame_cfg = config_lib.get_frame_config(param)
    world_off = dataclasses.replace(frame_cfg.world, radius=1e-9)
    frame_cfg = dataclasses.replace(frame_cfg, world=world_off)
    ds = config_lib.get_dataset(param, frame_cfg)

    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    frames_list = ds.trajectory_frames(0)
    frames = stack_frames(frames_list)

    budget = 128
    assert frames.senders.shape[-1] - int(np.max(np.asarray(frames.n_edge))) >= 2 * budget

    params = sim.init_params(jax.random.PRNGKey(0), jax.tree.map(lambda a: a[0], frames))
    rollout = make_rollout_fn(
        sim,
        dynamic_world_edges=DynamicWorldEdges(
            world_pos_start=0, world_pos_end=3, radius=0.12, budget=budget
        ),
    )
    res = rollout(params, sim.init_state(), frames)
    assert np.isfinite(float(res.rmse_all_rollout))

    # cross-check step 0 (ground-truth positions): device pairs == host pairs
    g0 = frames_list[0]
    n = int(g0.n_node)
    wp = np.asarray(g0.x[:n, 0:3])
    nt = np.asarray(g0.node_type[:n])
    host = mesh_lib.radius_world_edges(wp, nt, 0.12)
    host_pairs = set(zip(host[0].tolist(), host[1].tolist()))

    from graph_physics_tpu.training.rollout import _apply_dynamic_world_edges

    g0j = jax.tree.map(jnp.asarray, g0)
    g0d = _apply_dynamic_world_edges(
        g0j, DynamicWorldEdges(0, 3, 0.12, budget)
    )
    e_pad = g0d.senders.shape[0]
    off = e_pad - 2 * budget
    dm = np.asarray(g0d.edge_mask[off:])
    ds_ = np.asarray(g0d.senders[off:])[dm]
    dr_ = np.asarray(g0d.receivers[off:])[dm]
    dev_pairs = set(zip(ds_.tolist(), dr_.tolist()))
    assert dev_pairs == host_pairs


def test_device_world_features_track_noised_x(plate_config):
    """The device transform computes world-pos edge features from the
    CURRENT x (post-noise), like the reference pipeline ordering."""
    import jax.numpy as jnp

    from graph_physics_tpu.training.transforms import (
        WorldPosConfig,
        append_world_pos_features,
    )

    d, cfg_path = plate_config
    param = config_lib.load_params(cfg_path)
    frame_cfg = config_lib.get_frame_config(param)
    ds = config_lib.get_dataset(param, frame_cfg)
    g = jax.tree.map(jnp.asarray, ds[0])
    base_cols = g.edge_attr.shape[-1]
    g2 = append_world_pos_features(g, WorldPosConfig(0, 3))
    assert g2.edge_attr.shape[-1] == base_cols + 4
    e = int(g.n_edge)
    s, r = np.asarray(g.senders[:e]), np.asarray(g.receivers[:e])
    wp = np.asarray(g.x[:, 0:3])
    rel = wp[s] - wp[r]
    np.testing.assert_allclose(
        np.asarray(g2.edge_attr[:e, base_cols : base_cols + 3]), rel, atol=1e-5
    )


def test_radius_edges_large_mesh_bounded_memory():
    """radius search at 20k+ nodes: blocked distance tiles (never the full
    [N, M] matrix) and per-receiver nearest-k selection (VERDICT: replace
    the global-N^2 top-k)."""
    import jax.numpy as jnp

    from graph_physics_tpu.ops import knn as knn_lib

    rng = np.random.default_rng(0)
    n = 20480
    pos = rng.uniform(0, 10.0, (n, 3)).astype(np.float32)
    # plant a known contact cluster: 50 obstacle nodes each within r of
    # its own normal partner
    obs_sel = rng.choice(n, 50, replace=False)
    mask_a = np.zeros(n, bool)
    mask_a[obs_sel] = True
    mask_b = ~mask_a

    # cap block memory at 2^20 elems -> [51, 20480] tiles (~4 MB fp32)
    ai, bi, valid = jax.jit(
        lambda p: knn_lib.radius_edges(
            p, p, radius=0.35, budget=512,
            mask_a=jnp.asarray(mask_a), mask_b=jnp.asarray(mask_b),
            max_block_elems=1 << 20,
        )
    )(jnp.asarray(pos))
    ai, bi, valid = np.asarray(ai), np.asarray(bi), np.asarray(valid)

    r2 = 0.35**2
    for a, b in zip(ai[valid], bi[valid]):
        assert mask_a[a] and mask_b[b]
        assert ((pos[a] - pos[b]) ** 2).sum() <= r2 + 1e-6

    # reference check on a subsample: every in-radius pair of a sparse
    # obstacle should be found (degree below the per-node cap)
    from scipy.spatial import cKDTree

    tree = cKDTree(pos[mask_b])
    b_ids = np.where(mask_b)[0]
    got = {(a, b) for a, b in zip(ai[valid], bi[valid])}
    for a in obs_sel[:10]:
        nbrs = tree.query_ball_point(pos[a], 0.35)
        if len(nbrs) <= 16:
            for j in nbrs:
                assert (a, b_ids[j]) in got


def test_radius_edges_fair_budget_no_starvation():
    """A tight budget is filled rank-major: every receiver gets its
    nearest pair before any receiver gets its 2nd — a dense cluster can't
    starve a distant contact region."""
    import jax.numpy as jnp

    from graph_physics_tpu.ops import knn as knn_lib

    # obstacle 0 at origin surrounded by 20 close normals (dense region);
    # obstacle 1 far away with exactly one in-radius partner
    rng = np.random.default_rng(1)
    dense = rng.uniform(-0.05, 0.05, (20, 3)).astype(np.float32)
    far_pair = np.array([[5.0, 0.0, 0.0]], np.float32)
    pos_a = np.array([[0, 0, 0], [5.02, 0, 0]], np.float32)
    pos_b = np.concatenate([dense, far_pair])

    # budget 4 << 21 in-radius pairs of the dense cluster
    ai, bi, valid = knn_lib.radius_edges(
        jnp.asarray(pos_a), jnp.asarray(pos_b), radius=0.1, budget=4
    )
    kept = set(np.asarray(ai)[np.asarray(valid)].tolist())
    assert 1 in kept, "distant contact region was starved by the dense one"


def test_dynamic_world_edges_tracking_modes(plate_config):
    """track_predicted=False reproduces the REFERENCE semantics: world
    edges rebuilt from the ground-truth frame positions each step
    (preprocessing.py:92-140 runs before _make_prediction's write-back),
    regardless of what the model predicts. track_predicted=True follows
    the predictions instead — the two modes agree on x == ground truth
    and diverge once predictions drift."""
    import jax.numpy as jnp

    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.training.rollout import (
        DynamicWorldEdges,
        _apply_dynamic_world_edges,
    )

    d, cfg_path = plate_config
    param = config_lib.load_params(cfg_path)
    frame_cfg = config_lib.get_frame_config(param)
    ds = config_lib.get_dataset(param, frame_cfg)
    g0 = jax.tree.map(jnp.asarray, ds[0])
    budget = 128

    def tail_pairs(g):
        e_pad = g.senders.shape[0]
        off = e_pad - 2 * budget
        m = np.asarray(g.edge_mask[off:])
        return set(zip(np.asarray(g.senders[off:])[m].tolist(),
                       np.asarray(g.receivers[off:])[m].tolist()))

    # simulate the rollout write-back drifting the predicted world
    # positions far from ground truth (shift NORMAL nodes out of radius)
    n = int(g0.n_node)
    drift = jnp.where(
        (g0.node_type == int(NodeType.NORMAL))[:, None], 10.0, 0.0
    )
    x_pred = g0.x.at[:, 0:3].add(drift)
    g_pred = g0.replace(x=x_pred)

    cfg_ref = DynamicWorldEdges(0, 3, 0.12, budget, track_predicted=False)
    cfg_new = DynamicWorldEdges(0, 3, 0.12, budget, track_predicted=True)

    # reference mode ignores the drifted x: pairs == host pairs on truth
    ref_pairs = tail_pairs(
        _apply_dynamic_world_edges(g_pred, cfg_ref, true_x=g0.x))
    wp = np.asarray(g0.x[:n, 0:3])
    nt = np.asarray(g0.node_type[:n])
    host = mesh_lib.radius_world_edges(wp, nt, 0.12)
    assert ref_pairs == set(zip(host[0].tolist(), host[1].tolist()))
    assert ref_pairs  # non-empty: the check below is meaningful

    # predicted mode follows the drift: every NORMAL partner is out of
    # radius now, so no pairs survive
    new_pairs = tail_pairs(
        _apply_dynamic_world_edges(g_pred, cfg_new, true_x=g0.x))
    assert new_pairs == set()

    # on undrifted x the two modes agree exactly
    assert tail_pairs(
        _apply_dynamic_world_edges(g0, cfg_new, true_x=g0.x)
    ) == ref_pairs

    # config plumbing: dynamic_rollout_track selects the mode
    wp_cfg = param["transformations"]["world_pos_parameters"]
    wp_cfg["dynamic_rollout"] = True
    wp_cfg["dynamic_rollout_track"] = "ground_truth"
    dwe = config_lib.get_dynamic_world_edges(param)
    assert dwe.track_predicted is False
    wp_cfg["dynamic_rollout_track"] = "predicted"
    assert config_lib.get_dynamic_world_edges(param).track_predicted is True
    wp_cfg["dynamic_rollout_track"] = "bogus"
    with pytest.raises(ValueError):
        config_lib.get_dynamic_world_edges(param)
