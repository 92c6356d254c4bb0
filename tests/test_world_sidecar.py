"""Per-sample world-edge sidecar (MeshGraph.wedge_*) — parity vs concat.

World edges change every frame, which breaks trajectory-major packed
batching (shared senders/receivers) and the fused kernels' static
tilings when they live in the shared edge arrays. The sidecar layout
keeps the shared arrays mesh-only and rides world edges as per-sample
[W(,B)] arrays; consumers (attention softmax, GraphNetBlock aggregation,
edge-feature normalization) fold them in so the math is identical per
sample to the concat layout (= the reference's layout, graphphysics/
dataset/preprocessing.py:92-140).

Asserts, per model family:
  * the builder emits the exact same per-frame edge set in both layouts;
  * model outputs, parameter gradients and normalizer statistics agree;
  * packed [N, B, F] batches with [W, B] sidecars match per-sample runs;
  * the fused GN kernels' node-aligned ``extra_agg`` seam matches the
    blocked references (fwd + grads incl. the extra-aggregate cotangent);
  * the device world-pos feature transform extends wedge_attr per sample.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.training import config as config_lib


def _plate_param(tmp_path, model_block):
    train_h5, meta = synthetic.write_plate_h5_dataset(
        str(tmp_path / "train.h5"), num_trajectories=1, num_steps=6,
        meta_path=str(tmp_path / "meta.json"),
    )
    config = {
        "dataset": {
            "extension": "h5", "train_path": train_h5, "test_path": train_h5,
            "meta_path": meta, "targets": ["world_pos"], "khop": 1,
        },
        "model": model_block,
        "index": {
            "feature_index_start": 0, "feature_index_end": 6,
            "output_index_start": 0, "output_index_end": 3,
            "node_type_index": 6,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.0, "noise_index_start": [0],
                "noise_index_end": [3], "masking": 0,
            },
            "world_pos_parameters": {
                "use": True, "world_pos_index_start": 0,
                "world_pos_index_end": 3, "radius": 0.12,
                "edge_budget": 256,
            },
        },
        "training": {},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(config))
    return config_lib.load_params(str(p))


TRANSFORMER = {
    "type": "transformer", "message_passing_num": 2, "hidden_size": 16,
    "num_heads": 4, "node_input_size": 6, "output_size": 3,
    "edge_input_size": 0,
}
EPD = {
    "type": "epd", "message_passing_num": 2, "hidden_size": 16,
    "node_input_size": 6, "output_size": 3, "edge_input_size": 4,
}


def _both_datasets(param):
    fc = config_lib.get_frame_config(param)
    fc_side = dataclasses.replace(
        fc, world=dataclasses.replace(fc.world, sidecar=True))
    return (config_lib.get_dataset(param, fc),
            config_lib.get_dataset(param, fc_side))


def test_builder_sidecar_same_edge_set(tmp_path):
    param = _plate_param(tmp_path, TRANSFORMER)
    ds_c, ds_s = _both_datasets(param)
    for i in (0, 2, 4):
        g_c, g_s = ds_c[i], ds_s[i]
        n = int(g_c.n_node)
        ec, es = int(g_c.n_edge), int(g_s.n_edge)
        pairs_c = set(zip(np.asarray(g_c.senders[:ec]).tolist(),
                          np.asarray(g_c.receivers[:ec]).tolist()))
        pairs_mesh = set(zip(np.asarray(g_s.senders[:es]).tolist(),
                             np.asarray(g_s.receivers[:es]).tolist()))
        wm = np.asarray(g_s.wedge_mask)
        wpairs = set(zip(np.asarray(g_s.wedge_senders)[wm].tolist(),
                         np.asarray(g_s.wedge_receivers)[wm].tolist()))
        assert wpairs, "plate fixture must produce world edges"
        assert pairs_mesh | wpairs == pairs_c
        assert pairs_mesh.isdisjoint(wpairs)
        np.testing.assert_allclose(np.asarray(g_c.x[:n]),
                                   np.asarray(g_s.x[:n]))
        # inactive slots follow the pad convention
        assert (np.asarray(g_s.wedge_senders)[~wm] == 0).all()
        assert (np.asarray(g_s.wedge_receivers)[~wm]
                == g_s.x.shape[0] - 1).all()
        # wedge features: same math as shared-edge features
        k = int(wm.sum())
        pos = np.asarray(g_s.pos)
        ws = np.asarray(g_s.wedge_senders)[:k]
        wr = np.asarray(g_s.wedge_receivers)[:k]
        rel = pos[ws] - pos[wr]
        np.testing.assert_allclose(
            np.asarray(g_s.wedge_attr[:k, :3]), rel, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_s.wedge_attr[:k, 3]),
            np.linalg.norm(rel, axis=-1), atol=1e-6)


@pytest.mark.parametrize("model_block", [TRANSFORMER, EPD],
                         ids=["transformer", "epd"])
def test_sidecar_model_parity(tmp_path, model_block):
    """Sidecar forward == concat forward: outputs, grads, normalizer."""
    param = _plate_param(tmp_path, model_block)
    ds_c, ds_s = _both_datasets(param)
    g_c, g_s = ds_c[2], ds_s[2]
    n = int(g_c.n_node)
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    gj_c = jax.tree.map(jnp.asarray, g_c)
    gj_s = jax.tree.map(jnp.asarray, g_s)
    params = sim.init_params(jax.random.PRNGKey(0), gj_s)

    res_c = sim.forward(params, sim.init_state(), gj_c, is_training=True)
    res_s = sim.forward(params, sim.init_state(), gj_s, is_training=True)
    np.testing.assert_allclose(
        np.asarray(res_s.net_out[:n]), np.asarray(res_c.net_out[:n]),
        atol=2e-5, rtol=1e-4,
    )
    # accumulated normalizer statistics identical (same row multiset)
    for name in ("output_norm", "node_norm", "edge_norm"):
        sc, ss = getattr(res_c.state, name), getattr(res_s.state, name)
        if sc is None:
            assert ss is None
            continue
        for f in ("acc_sum", "acc_sum_sq", "acc_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(ss, f)), np.asarray(getattr(sc, f)),
                rtol=1e-5, atol=1e-6, err_msg=f"{name}.{f}")

    def loss_of(g):
        def f(p):
            r = sim.forward(p, sim.init_state(), g, is_training=True)
            return jnp.mean(
                (r.net_out - r.target_norm) ** 2 * g.node_mask[:, None])
        return jax.grad(f)(params)

    gr_c, gr_s = loss_of(gj_c), loss_of(gj_s)
    for a, b in zip(jax.tree.leaves(gr_c), jax.tree.leaves(gr_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-6, rtol=2e-3)


@pytest.mark.parametrize("model_block", [TRANSFORMER, EPD],
                         ids=["transformer", "epd"])
def test_sidecar_packed_matches_per_sample(tmp_path, model_block):
    from graph_physics_tpu.training.packed import pack_frames

    param = _plate_param(tmp_path, model_block)
    _, ds_s = _both_datasets(param)
    frames = [ds_s[i] for i in range(3)]
    packed = pack_frames(frames)
    assert packed.wedge_senders.shape == (256, 3)
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    pj = jax.tree.map(jnp.asarray, packed)
    params = sim.init_params(jax.random.PRNGKey(1), pj)
    g_in_p, _, _, _ = sim.prepare(sim.init_state(), pj, is_training=False)
    out_p = sim.apply_model(params, g_in_p)
    for b in range(3):
        gb = jax.tree.map(jnp.asarray, frames[b])
        g_in_b, _, _, _ = sim.prepare(sim.init_state(), gb,
                                      is_training=False)
        out_b = sim.apply_model(params, g_in_b)
        np.testing.assert_allclose(
            np.asarray(out_p[:, b]), np.asarray(out_b),
            atol=2e-5, rtol=1e-4)


def test_device_world_features_extend_wedge_attr(tmp_path):
    """append_world_pos_features appends the same Δworld_pos columns to
    the sidecar as the concat layout sees on its world rows."""
    from graph_physics_tpu.training.transforms import (
        WorldPosConfig,
        append_world_pos_features,
    )

    param = _plate_param(tmp_path, EPD)
    ds_c, ds_s = _both_datasets(param)
    g_c = jax.tree.map(jnp.asarray, ds_c[1])
    g_s = jax.tree.map(jnp.asarray, ds_s[1])
    cfg = WorldPosConfig(0, 3)
    t_c = append_world_pos_features(g_c, cfg)
    t_s = append_world_pos_features(g_s, cfg)
    assert t_s.wedge_attr.shape[-1] == g_s.wedge_attr.shape[-1] + 4
    # match world rows between layouts by (sender, receiver) pair
    wm = np.asarray(g_s.wedge_mask)
    ws = np.asarray(g_s.wedge_senders)[wm]
    wr = np.asarray(g_s.wedge_receivers)[wm]
    side_rows = {
        (s, r): np.asarray(t_s.wedge_attr)[i]
        for i, (s, r) in zip(np.nonzero(wm)[0], zip(ws.tolist(), wr.tolist()))
    }
    ec = int(g_c.n_edge)
    sc = np.asarray(g_c.senders[:ec])
    rc = np.asarray(g_c.receivers[:ec])
    matched = 0
    for i, (s, r) in enumerate(zip(sc.tolist(), rc.tolist())):
        if (s, r) in side_rows:
            np.testing.assert_allclose(
                side_rows[(s, r)], np.asarray(t_c.edge_attr[i]), atol=1e-6)
            matched += 1
    assert matched == len(side_rows)


@pytest.mark.parametrize("kernel", ["csr", "nk"])
def test_fused_attention_world_parity(kernel):
    """Fused attention kernels with world_parts == the XLA joint
    mesh+world softmax (fwd + q/k/v grads), interpret mode."""
    from graph_physics_tpu.ops import edge_attention as ea
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.ops.fused_edge_attention import (
        fused_edge_attention,
    )
    from graph_physics_tpu.ops.fused_edge_attention_nk import (
        build_nk_tiling,
        fused_edge_attention_nk,
    )
    from tests.test_fused_gnblock import _toy_graph

    b, h, dh = 4, 4, 8
    pos, ei = _toy_graph()
    n_real = len(pos)
    senders, receivers = ei
    if kernel == "csr":
        t = tiling_lib.build_edge_tiling(senders, receivers, n_real,
                                         node_block=128)
        kern = fused_edge_attention
    else:
        t = build_nk_tiling(senders, receivers, n_real, node_block=128)
        kern = fused_edge_attention_nk
    assert t is not None
    n = t.num_nodes
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n, b, h, dh)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, b, h, dh)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, b, h, dh)) * 0.5
    rng = np.random.default_rng(0)
    W = 64
    ws = jnp.asarray(rng.integers(0, n_real, (W, b)).astype(np.int32))
    wr = jnp.asarray(rng.integers(0, n_real, (W, b)).astype(np.int32))
    wm = jnp.asarray(rng.random((W, b)) < 0.7)
    cot = jax.random.normal(jax.random.fold_in(key, 3), (n, b, h, dh))

    def xla_loss(q, k, v):
        out = ea.edge_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
            jnp.asarray(senders), jnp.asarray(receivers), None,
            wedge_senders=ws, wedge_receivers=wr, wedge_mask=wm)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def fused_loss(q, k, v):
        qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))
        parts = ea.world_attention_parts(qb, kb, vb, ws, wr, wm)
        out = kern(qb, kb, vb, t, interpret=True, world_parts=parts)
        return jnp.sum(out.astype(jnp.float32) * cot)

    vx, gx = jax.value_and_grad(xla_loss, argnums=(0, 1, 2))(q, k, v)
    vf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(vf) - float(vx)) / (abs(float(vx)) + 1) < 0.03
    for a, b_ in zip(gf, gx):
        err = np.abs(np.asarray(a, np.float32)
                     - np.asarray(b_, np.float32)).max()
        scale = np.abs(np.asarray(b_, np.float32)).max() + 1e-3
        assert err / scale < 0.1, (err, scale)


def test_fused_plate_trainer_e2e(tmp_path):
    """World-edge workload through the FUSED packed trainer (VERDICT r4
    item 1): the plate config trains --packed --bf16 --fused end-to-end,
    the fused attention kernels stay ACTIVE (sidecar world edges never
    touch the static mesh tiling), and the loss is finite/decreasing."""
    import json as _json
    import os

    from graph_physics_tpu.cli.train import main as train_main

    param = _plate_param(tmp_path, dict(TRANSFORMER))
    cfg_path = str(tmp_path / "cfg.json")
    out = str(tmp_path / "runs")
    rc = train_main([
        "--training_parameters_path", cfg_path,
        "--epochs", "1",
        "--batch_size", "4",
        "--warmup", "2",
        "--packed", "--bf16", "--fused",
        "--out_dir", out,
        "--run_name", "plate_fused",
    ])
    assert rc == 0
    metrics = [
        _json.loads(l)
        for l in open(os.path.join(out, "plate_fused",
                                   "plate_fused.metrics.jsonl"))
    ]
    val = [m for m in metrics if "val_all_rollout_rmse" in m][-1]
    assert np.isfinite(val["val_all_rollout_rmse"])
    assert np.isfinite(val["train_loss_epoch"])


@pytest.mark.parametrize("kernel", ["csr", "nk"])
def test_fused_gn_extra_agg_parity(kernel):
    """The kernels' node-aligned extra-aggregate seam: fwd + gradients
    (including the extra input's cotangent) match the blocked reference."""
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.ops.fused_edge_attention_nk import build_nk_tiling
    from graph_physics_tpu.ops.fused_gnblock import (
        blocked_reference,
        fused_gn_block,
    )
    from graph_physics_tpu.ops.fused_gnblock_nk import (
        blocked_reference_nk,
        fused_gn_block_nk,
    )
    from tests.test_fused_gnblock import _params, _toy_graph

    f, b = 32, 4
    pos, ei = _toy_graph()
    senders, receivers = ei
    if kernel == "csr":
        t = tiling_lib.build_edge_tiling(senders, receivers, len(pos),
                                         node_block=128)
        fused, ref = fused_gn_block, blocked_reference
    else:
        t = build_nk_tiling(senders, receivers, len(pos), node_block=128)
        fused, ref = fused_gn_block_nk, blocked_reference_nk
    assert t is not None
    n = t.num_nodes
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, b, f)) * 0.5
    e_vals = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1),
                          (senders.shape[0], b, f))) * 0.5
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)
    extra = jax.random.normal(jax.random.fold_in(key, 9), (n, b, f)) * 0.3
    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))
    eb = jnp.asarray(t.expand_edges(e_vals))

    def loss_f(x, extra, ep, np_):
        xo, _ = fused(x.astype(jnp.bfloat16), eb.astype(jnp.bfloat16),
                      ep, np_, t, interpret=True, extra_agg=extra)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    def loss_r(x, extra, ep, np_):
        xo, _ = ref(x, eb, ep, np_, t, compute_dtype=jnp.bfloat16,
                    extra_agg=extra)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    vf, gf = jax.value_and_grad(loss_f, argnums=(0, 1, 2, 3))(
        x, extra, ep, np_)
    vr, gr = jax.value_and_grad(loss_r, argnums=(0, 1, 2, 3))(
        x, extra, ep, np_)
    assert abs(float(vf) - float(vr)) / (abs(float(vr)) + 1) < 0.03
    for a, b_ in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        err = np.abs(np.asarray(a, np.float32)
                     - np.asarray(b_, np.float32)).max()
        scale = np.abs(np.asarray(b_, np.float32)).max() + 1e-3
        assert err / scale < 0.08, (err, scale)


def test_dp_shardmap_world_sidecar_matches_single_device(tmp_path):
    """Packed [W, B] sidecar leaves are PER-SAMPLE data and must shard
    with the batch over 'dp' (dp_batch_specs wedge entries): the fused
    dp shard_map step on the 8-device mesh matches the single-device
    step on a plate-shaped world-edge batch."""
    import copy

    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib, make_mesh
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack_frames
    from graph_physics_tpu.training.schedule import make_optimizer
    from graph_physics_tpu.training.step import (
        init_train_state,
        make_train_step,
    )
    from graph_physics_tpu.training.transforms import (
        WorldPosConfig,
        make_device_preprocess,
    )

    param = _plate_param(tmp_path, TRANSFORMER)
    _, ds_s = _both_datasets(param)
    mgr = FusedTopologyManager(build_nk=True)
    frames = [mgr.transform_frame(ds_s[i % len(ds_s)]) for i in range(8)]
    batch = jax.tree.map(jnp.asarray, pack_frames(frames))
    assert batch.wedge_senders.shape[1] == 8
    # tiny fixture may reject the NK layout (degree skew) — CSR serves it;
    # either way a fused tiling must ride the batch
    assert batch.tiling_idx is not None or batch.tiling_idx_nk is not None

    model = config_lib.get_model(param, dtype=jnp.bfloat16)
    sim = config_lib.get_simulator(param, model)
    sim_t, _ = mgr.step_for(batch, sim, lambda s: (lambda *a: None))
    assert sim_t is not sim, "fused attention must be ACTIVE for this test"
    sim_dp = copy.copy(sim_t)
    sim_dp.axis_name = "dp"
    opt = make_optimizer(1e-3, warmup=10, num_steps=100)
    # no noise (the dp path folds axis_index into the rng — bitwise
    # different draws); world features exercise the wedge_attr extension
    dev_pp = make_device_preprocess(None, WorldPosConfig(0, 3))

    ref_step = make_train_step(sim_t, opt, LossType.L2LOSS, donate=False,
                               device_preprocess=dev_pp)
    state = init_train_state(sim_t, opt, jax.random.PRNGKey(0), batch)
    st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False,
        device_preprocess=dev_pp,
    )
    specs = dp_lib.dp_batch_specs(batch, packed=True)
    # the per-sample wedge leaves shard on the batch axis
    assert specs.wedge_senders == P(None, "dp")
    assert specs.wedge_mask == P(None, "dp")
    assert specs.wedge_attr == P(None, "dp")
    batch_sh = jax.device_put(
        batch,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    repl = NamedSharding(mesh, P())
    state2 = init_train_state(sim_dp, opt, jax.random.PRNGKey(0), batch)
    state2 = jax.device_put(state2, jax.tree.map(lambda _: repl, state2))
    st_dp, m_dp = dp_step(state2, batch_sh, jax.random.PRNGKey(1))

    # bf16 model + psum-ed normalizer partial sums: shard reduction order
    # perturbs the normalized inputs at ~1e-4 (the fp32 cylinder variant
    # of this check sits at 1e-5; see test_dp_shardmap_fused_step_*)
    assert abs(float(m_ref["loss"]) - float(m_dp["loss"])) < 2e-4
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ),
        st_ref.params, st_dp.params,
    )
    assert max(jax.tree.leaves(deltas)) < 5e-4
    ds = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                            - jnp.asarray(b, jnp.float32)))
        ),
        st_ref.sim_state, st_dp.sim_state,
    )
    assert max(jax.tree.leaves(ds)) < 1e-2
