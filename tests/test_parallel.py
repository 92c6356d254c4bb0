"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4:
the JAX-native replacement for fake NCCL backends)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.processors import EncodeProcessDecode
from graph_physics_tpu.parallel import make_mesh, sp
from tests.helpers import tiny_graph


def test_make_mesh_axes():
    mesh = make_mesh(dp=2, sp=4)
    assert mesh.shape == {"dp": 2, "sp": 4}


def test_shard_graph_roundtrip():
    g = tiny_graph(nx=10, ny=8)
    sharded, order = sp.shard_graph(g, 4)
    assert sharded.x.shape[0] == 4
    # every valid original node appears exactly once
    valid = order[order >= 0]
    assert len(np.unique(valid)) == int(np.sum(np.asarray(g.node_mask)))
    # unshard recovers x
    rec = sp.unshard_nodes(sharded.x, order, g.x.shape[0])
    n = int(g.n_node)
    np.testing.assert_allclose(rec[:n], np.asarray(g.x)[:n], atol=1e-6)
    # edge budget: all valid edges preserved
    assert int(np.sum(sharded.edge_mask)) == int(g.n_edge)


def test_sp_forward_matches_single_device():
    """Node-sharded EPD forward == single-device forward (exact math)."""
    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    sharded, order = sp.shard_graph(g, n_shards)

    kwargs = dict(
        message_passing_num=2,
        node_input_size=4,
        edge_input_size=3,
        output_size=2,
        hidden_size=16,
    )
    model_single = EncodeProcessDecode(**kwargs)
    model_sp = EncodeProcessDecode(sp_axis_name="sp", **kwargs)

    g_j = jax.tree.map(jnp.asarray, g)
    params = model_single.init(jax.random.PRNGKey(0), g_j)
    out_single = model_single.apply(params, g_j)

    mesh = make_mesh(dp=1, sp=n_shards)
    fwd = sp.make_sp_forward(model_sp, mesh)
    sharded_j = jax.tree.map(jnp.asarray, sharded)
    out_sharded = fwd(params, sharded_j)

    rec = sp.unshard_nodes(np.asarray(out_sharded), order, g.x.shape[0])
    n = int(g.n_node)
    np.testing.assert_allclose(rec[:n], np.asarray(out_single)[:n], atol=2e-4)


def test_sp_transformer_matches_single_device():
    """Edge-attention path under sp sharding == single device."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode

    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    sharded, order = sp.shard_graph(g, n_shards)
    kwargs = dict(
        message_passing_num=2,
        node_input_size=4,
        output_size=2,
        hidden_size=16,
        num_heads=4,
    )
    model_single = EncodeTransformDecode(**kwargs)
    model_sp = EncodeTransformDecode(sp_axis_name="sp", **kwargs)
    g_j = jax.tree.map(jnp.asarray, g)
    params = model_single.init(jax.random.PRNGKey(0), g_j)
    out_single = model_single.apply(params, g_j)
    mesh = make_mesh(dp=1, sp=n_shards)
    fwd = sp.make_sp_forward(model_sp, mesh)
    out_sharded = fwd(params, jax.tree.map(jnp.asarray, sharded))
    rec = sp.unshard_nodes(np.asarray(out_sharded), order, g.x.shape[0])
    n = int(g.n_node)
    np.testing.assert_allclose(rec[:n], np.asarray(out_single)[:n], atol=2e-4)


def test_sp_halo_exchange_matches_full_gather():
    """Boundary-only halo exchange == full all_gather == single device."""
    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    sharded, order, hb = sp.shard_graph(g, n_shards, halo=True)
    assert hb < sharded.x.shape[1]  # halo strictly smaller than a shard

    kwargs = dict(
        message_passing_num=2,
        node_input_size=4,
        edge_input_size=3,
        output_size=2,
        hidden_size=16,
    )
    model_single = EncodeProcessDecode(**kwargs)
    model_sp = EncodeProcessDecode(sp_axis_name="sp", sp_halo_size=hb, **kwargs)
    g_j = jax.tree.map(jnp.asarray, g)
    params = model_single.init(jax.random.PRNGKey(0), g_j)
    out_single = model_single.apply(params, g_j)

    mesh = make_mesh(dp=1, sp=n_shards)
    fwd = sp.make_sp_forward(model_sp, mesh)
    out_sharded = fwd(params, jax.tree.map(jnp.asarray, sharded))
    rec = sp.unshard_nodes(np.asarray(out_sharded), order, g.x.shape[0])
    n = int(g.n_node)
    np.testing.assert_allclose(rec[:n], np.asarray(out_single)[:n], atol=2e-4)


def test_dp_train_step_matches_single_device():
    """GSPMD dp sharding: same numerics as unsharded execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=11, edge_input_size=3,
        output_size=2, hidden_size=8,
    )
    sim = Simulator(11, 3, 2, 0, 2, 0, 2, 2, model)
    opt = schedule.make_optimizer(1e-3, 5, 100)
    step = make_train_step(sim, opt, LossType.L2LOSS, donate=False)

    gs = [tiny_graph(frame=i) for i in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *gs)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)

    _, m_plain = step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=4, sp=1)
    shard = lambda leaf: NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))
    batch_sh = jax.device_put(batch, jax.tree.map(shard, batch))
    state_sh = jax.device_put(
        state, jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    )
    _, m_dp = step(state_sh, batch_sh, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_dp["loss"]), rtol=1e-5
    )


def _sp_sim_pair(n_shards, hb=None, mp=2, hidden=16):
    """(single-device simulator, sp simulator) with identical params."""
    from graph_physics_tpu.models.simulator import Simulator

    kwargs = dict(
        message_passing_num=mp, node_input_size=11, edge_input_size=3,
        output_size=2, hidden_size=hidden,
    )
    sim_kwargs = dict(
        node_input_size=11, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    model_single = EncodeProcessDecode(**kwargs)
    model_sp = EncodeProcessDecode(
        sp_axis_name="sp", sp_halo_size=hb, **kwargs
    )
    sim_single = Simulator(model=model_single, **sim_kwargs)
    sim_sp = Simulator(model=model_sp, axis_name="sp", **sim_kwargs)
    return sim_single, sim_sp


@pytest.mark.parametrize("halo", [False, True])
def test_sp_train_step_matches_single_device(halo):
    """sp training (grads through the ICI gathers): one AdamW step over a
    node-sharded mesh produces EXACTLY the single-device params + loss."""
    import optax

    from graph_physics_tpu.training.step import init_train_state, make_train_step

    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    if halo:
        sharded, order, hb = sp.shard_graph(g, n_shards, halo=True)
    else:
        sharded, order = sp.shard_graph(g, n_shards)
        hb = None
    sim_single, sim_sp = _sp_sim_pair(n_shards, hb)
    # SGD: params after one step differ by exactly lr*grad, so this is a
    # gradient-parity test (AdamW's g/(sqrt(g^2)+eps) amplifies fp32
    # summation-order noise on near-zero gradients into visible diffs)
    opt = optax.sgd(1e-2)

    g_j = jax.tree.map(jnp.asarray, g)
    batch1 = jax.tree.map(lambda a: a[None], g_j)  # [1, N, ...]
    state0 = init_train_state(sim_single, opt, jax.random.PRNGKey(0), batch1)

    from graph_physics_tpu.training.loss import LossType

    step_single = make_train_step(sim_single, opt, LossType.L2LOSS, donate=False)
    s1, m1 = step_single(state0, batch1, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=1, sp=n_shards)
    step_sp = sp.make_sp_train_step(sim_sp, opt, mesh)
    s2, m2 = step_sp(state0, jax.tree.map(jnp.asarray, sharded), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # normalizer statistics are global and identical (incl. call count)
    np.testing.assert_allclose(
        float(s1.sim_state.output_norm.acc_count),
        float(s2.sim_state.output_norm.acc_count),
    )
    np.testing.assert_allclose(
        float(s1.sim_state.output_norm.num_accumulations),
        float(s2.sim_state.output_norm.num_accumulations),
    )
    np.testing.assert_allclose(
        np.asarray(s1.sim_state.output_norm.acc_sum),
        np.asarray(s2.sim_state.output_norm.acc_sum),
        rtol=1e-6, atol=1e-6,
    )


def test_sp_rollout_matches_single_device():
    """sp rollout: sharded autoregressive prediction == single device."""
    from graph_physics_tpu.training.rollout import make_rollout_fn
    from graph_physics_tpu.training.step import init_train_state
    import optax

    frames_list = [tiny_graph(nx=10, ny=8, frame=i) for i in range(4)]
    frames = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *frames_list
    )
    n_shards = 4
    sharded, order = sp.shard_trajectory(frames, n_shards)
    sim_single, sim_sp = _sp_sim_pair(n_shards)

    g_j = jax.tree.map(jnp.asarray, frames_list[0])
    params = sim_single.init_params(jax.random.PRNGKey(0), g_j)
    sim_state = sim_single.init_state()

    rollout_single = make_rollout_fn(sim_single)
    res = rollout_single(params, sim_state, jax.tree.map(jnp.asarray, frames))

    mesh = make_mesh(dp=1, sp=n_shards)
    rollout_sp = sp.make_sp_rollout(sim_sp, mesh)
    preds_sh, rmse_sh = rollout_sp(
        params, sim_state, jax.tree.map(jnp.asarray, sharded)
    )

    np.testing.assert_allclose(
        float(res.rmse_all_rollout), float(rmse_sh), rtol=1e-5, atol=1e-6
    )
    # per-frame predictions agree after unsharding
    n = frames_list[0].x.shape[0]
    for t in range(4):
        rec = sp.unshard_nodes(np.asarray(preds_sh[:, t]), order, n)
        nvalid = int(frames_list[0].n_node)
        np.testing.assert_allclose(
            rec[:nvalid], np.asarray(res.predictions[t])[:nvalid],
            rtol=1e-4, atol=1e-5,
        )


def test_dp_packed_sharding_matches_unsharded():
    """Packed layout + dp: batch axis (axis 1 of [N, B, F] leaves) sharded
    over the mesh; loss matches the unsharded packed step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    g = tiny_graph(nx=10, ny=8)
    b = 4
    batch = pack(jax.tree.map(lambda a: np.stack([np.asarray(a)] * b), g))
    model = EncodeProcessDecode(
        message_passing_num=2, node_input_size=11, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    sim = Simulator(
        node_input_size=11, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=model,
    )
    opt = optax.adamw(1e-3)
    step = make_train_step(sim, opt, LossType.L2LOSS, donate=False)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    _, m_ref = step(state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1))

    mesh = make_mesh(dp=4, sp=1)

    def spec_for(leaf):
        if np.ndim(leaf) >= 3:
            return NamedSharding(mesh, P(None, "dp", *([None] * (np.ndim(leaf) - 2))))
        return NamedSharding(mesh, P())

    batch_sharded = jax.device_put(
        jax.tree.map(jnp.asarray, batch),
        jax.tree.map(spec_for, batch),
    )
    _, m_dp = step(state, batch_sharded, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )


@pytest.mark.parametrize("halo", [False, True])
def test_sp_multiloss_train_step_matches_single_device(halo):
    """MultiLoss (physics terms) under sp: the FD gradients cross shards
    via sp_gradient_fd and every term psums through make_sp_mean — loss,
    grads and the post-step params match the single-device MultiLoss step
    (round-2 verdict sp completion #7)."""
    import optax

    from graph_physics_tpu.training.loss import LossType, MultiLoss
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    if halo:
        sharded, order, hb = sp.shard_graph(g, n_shards, halo=True)
    else:
        sharded, order = sp.shard_graph(g, n_shards)
        hb = None
    sim_single, sim_sp = _sp_sim_pair(n_shards, hb)
    opt = optax.sgd(1e-2)

    loss_fn = MultiLoss(
        [LossType.L2LOSS, LossType.GRADIENTL2LOSS,
         LossType.DIVERGENCEL2LOSS, LossType.CONVECTIONL2LOSS],
        [1.0, 0.1, 0.05, 0.05],
    )

    g_j = jax.tree.map(jnp.asarray, g)
    batch1 = jax.tree.map(lambda a: a[None], g_j)
    state0 = init_train_state(sim_single, opt, jax.random.PRNGKey(0), batch1)

    step_single = make_train_step(
        sim_single, opt, loss_fn, donate=False,
        gradient_method="finite_diff",
    )
    s1, m1 = step_single(state0, batch1, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=1, sp=n_shards)
    step_sp = sp.make_sp_train_step(
        sim_sp, opt, mesh, loss_fn=loss_fn, gradient_method="finite_diff"
    )
    s2, m2 = step_sp(
        state0, jax.tree.map(jnp.asarray, sharded), jax.random.PRNGKey(1)
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sp_gradient_fd_matches_unsharded():
    """sp_gradient_fd == voperators.gradient_fd after unsharding."""
    from graph_physics_tpu.ops import voperators

    g = tiny_graph(nx=10, ny=8)
    n = g.x.shape[0]
    rng = np.random.default_rng(0)
    field = rng.normal(size=(n, 2)).astype(np.float32)
    ref = np.asarray(voperators.gradient_fd(
        jnp.asarray(g.pos), jnp.asarray(field),
        jnp.asarray(g.senders), jnp.asarray(g.receivers),
        edge_mask=jnp.asarray(g.edge_mask),
    ))

    n_shards = 4
    gf = g.replace(x=np.concatenate([np.asarray(g.x), field], axis=-1))
    sharded, order = sp.shard_graph(gf, n_shards)
    mesh = make_mesh(dp=1, sp=n_shards)
    from jax.sharding import PartitionSpec as P

    def local(graph):
        gg = jax.tree.map(lambda a: a[0] if a is not None else None, graph)
        fld = gg.x[:, -2:]
        grad = sp.sp_gradient_fd(gg, fld, "sp")  # [N_s, F, D]
        return grad.reshape(grad.shape[0], -1)[None]

    out = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("sp"),), out_specs=P("sp"),
        check_vma=False,
    ))(jax.tree.map(jnp.asarray, sharded))
    rec = sp.unshard_nodes(np.asarray(out), order, n)
    nvalid = int(g.n_node)
    np.testing.assert_allclose(
        rec[:nvalid], ref.reshape(n, -1)[:nvalid], rtol=1e-4, atol=1e-5
    )


def test_sp_ring_halo_matches_single_device():
    """ppermute-ring halo: boundary rows exchanged with ring neighbours
    only; forward + one train step match the single device exactly."""
    import optax

    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    g = tiny_graph(nx=10, ny=8)
    n_shards = 4
    sharded, order, hb_ring = sp.shard_graph(g, n_shards, halo=True, ring=True)
    assert isinstance(hb_ring, tuple)
    hb, ring_d = hb_ring
    assert ring_d >= 1
    sim_single, sim_sp = _sp_sim_pair(n_shards, hb_ring)
    opt = optax.sgd(1e-2)

    g_j = jax.tree.map(jnp.asarray, g)
    batch1 = jax.tree.map(lambda a: a[None], g_j)
    state0 = init_train_state(sim_single, opt, jax.random.PRNGKey(0), batch1)
    step_single = make_train_step(sim_single, opt, LossType.L2LOSS, donate=False)
    s1, m1 = step_single(state0, batch1, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=1, sp=n_shards)
    step_sp = sp.make_sp_train_step(sim_sp, opt, mesh)
    s2, m2 = step_sp(
        state0, jax.tree.map(jnp.asarray, sharded), jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dp_sp_2d_mesh_train_step():
    """dp×sp 2-D mesh: batch sharded over dp, nodes over sp; loss/params
    match the single-device stacked step (round-2 verdict sp #7)."""
    import optax

    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    n_dp, n_sp = 2, 4
    frames = [tiny_graph(nx=10, ny=8, frame=i) for i in range(n_dp)]
    shards, orders = [], []
    # same mesh → same partition for every frame (deterministic RCB)
    for f in frames:
        sh, order = sp.shard_graph(f, n_sp)
        shards.append(sh)
        orders.append(order)
    stacked_sh = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *shards
    )  # [B, S, ...]

    kwargs = dict(
        message_passing_num=2, node_input_size=11, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    sim_kwargs = dict(
        node_input_size=11, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
    )
    sim_single = Simulator(model=EncodeProcessDecode(**kwargs), **sim_kwargs)
    sim_2d = Simulator(
        model=EncodeProcessDecode(sp_axis_name="sp", **kwargs),
        axis_name=("dp", "sp"), **sim_kwargs,
    )
    opt = optax.sgd(1e-2)

    batch = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *frames
    )
    state0 = init_train_state(sim_single, opt, jax.random.PRNGKey(0), batch)
    step_single = make_train_step(sim_single, opt, LossType.L2LOSS, donate=False)
    s1, m1 = step_single(state0, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=n_dp, sp=n_sp)
    step_2d = sp.make_sp_train_step(sim_2d, opt, mesh, dp_axis_name="dp")
    s2, m2 = step_2d(state0, stacked_sh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # normalizer statistics global over BOTH axes
    np.testing.assert_allclose(
        float(s1.sim_state.output_norm.acc_count),
        float(s2.sim_state.output_norm.acc_count),
    )


def test_sp_ring_halo_distance_two():
    """ppermute-ring halo with ring distance ≥ 2: the slot arithmetic
    (slot = 2(|d|-1) + (d > 0)) for far neighbours is exercised by
    permuting the RCB part order so spatially adjacent parts land two
    ring positions apart; forward parity must still be exact."""
    from graph_physics_tpu.dataset.partition import rcb_partition

    g = tiny_graph(nx=10, ny=8)
    n_valid = int(g.n_node)
    parts = rcb_partition(np.asarray(g.pos)[:n_valid], 4)
    # reorder shards so neighbours sit at ring distance 2
    parts = [parts[0], parts[2], parts[1], parts[3]]
    sharded, order, hb = sp.shard_graph(
        g, 4, halo=True, ring=True, parts=parts
    )
    assert isinstance(hb, tuple)
    assert hb[1] >= 2, f"expected ring distance >= 2, got {hb[1]}"

    kwargs = dict(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    model_single = EncodeProcessDecode(**kwargs)
    model_sp = EncodeProcessDecode(sp_axis_name="sp", sp_halo_size=hb, **kwargs)
    g_j = jax.tree.map(jnp.asarray, g)
    params = model_single.init(jax.random.PRNGKey(0), g_j)
    out_single = model_single.apply(params, g_j)

    mesh = make_mesh(dp=1, sp=4)
    fwd = sp.make_sp_forward(model_sp, mesh)
    out_sh = fwd(params, jax.tree.map(jnp.asarray, sharded))
    rec = sp.unshard_nodes(np.asarray(out_sh), order, g.x.shape[0])
    n = int(g.n_node)
    np.testing.assert_allclose(rec[:n], np.asarray(out_single)[:n], atol=2e-4)


# ---------------------------------------------------------------------------
# shard_map data parallelism (parallel/dp.py) — the fused multi-chip path
# ---------------------------------------------------------------------------


def _fused_dp_setup(batch=32):
    """(sim_plain, sim_dp, optimizer, packed fused batch) — cylinder-style
    synthetic mesh through the REAL fused blocked layout."""
    import copy

    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.training import schedule

    sim, _, _, g = _cylinder_setup(
        nx=8, ny=6, hidden=32, mp_steps=2, batch=batch, packed=True, fused=True
    )
    sim_dp = copy.copy(sim)
    sim_dp.axis_name = "dp"
    opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=1000)
    return sim, sim_dp, opt, g


def test_dp_shardmap_fused_step_matches_single_device():
    """GSPMD replicates Pallas custom calls (all-gather of the batch), so
    the fused dp path runs inside shard_map — and must match the
    single-device step: loss, params, and psum-ed normalizer stats."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    sim, sim_dp, opt, batch = _fused_dp_setup()
    ref_step = make_train_step(sim, opt, LossType.L2LOSS, donate=False)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False
    )
    specs = dp_lib.dp_batch_specs(batch, packed=True)
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

    assert abs(float(m_ref["loss"]) - float(m_dp["loss"])) < 1e-5
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ),
        st_ref.params, st_dp.params,
    )
    assert max(jax.tree.leaves(deltas)) < 1e-4  # bf16 reduction-order noise
    # normalizer statistics psum-ed to the global values
    ds = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))
        ),
        st_ref.sim_state, st_dp.sim_state,
    )
    assert max(jax.tree.leaves(ds)) < 1e-2


def test_dp_shardmap_multi_step_matches_sequential():
    """K fused optimizer steps in ONE shard_map dispatch == K sequential
    dp steps (rng unused: no noise configured)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state

    _, sim_dp, opt, batch = _fused_dp_setup()
    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False
    )
    multi = dp_lib.make_dp_multi_step(
        sim_dp, opt, LossType.L2LOSS, mesh, unroll=2, packed=True, donate=False
    )
    specs = dp_lib.dp_batch_specs(batch, packed=True)
    shard = lambda g: jax.device_put(
        g,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    batch_sh = shard(batch)
    repl = NamedSharding(mesh, P())
    state = init_train_state(sim_dp, opt, jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, jax.tree.map(lambda _: repl, state))

    st_seq = state
    for i in range(2):
        st_seq, m_seq = dp_step(st_seq, batch_sh, jax.random.PRNGKey(i))

    super_batch = jax.tree.map(lambda a: jnp.stack([a, a]), batch_sh)
    st_multi, ms = multi(state, super_batch, jax.random.PRNGKey(0))
    assert int(st_multi.step) == 2
    assert ms["loss"].shape == (2,)
    assert abs(float(ms["loss"][1]) - float(m_seq["loss"])) < 1e-5
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ),
        st_seq.params, st_multi.params,
    )
    assert max(jax.tree.leaves(deltas)) < 1e-4


def test_dp_shardmap_requires_axis_name():
    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training.loss import LossType

    sim, _, opt, _ = _fused_dp_setup(batch=8)
    mesh = make_mesh(dp=8, sp=1)
    with pytest.raises(ValueError, match="axis_name"):
        dp_lib.make_dp_train_step(sim, opt, LossType.L2LOSS, mesh)


def test_dp_shardmap_multiloss_matches_single_device():
    """Physics losses (MultiLoss, FD gradients) compose with the
    shard_map dp path: per-shard packed vmap-over-axis-1 physics terms +
    grad pmean must reproduce the single-device step exactly (equal
    shard sizes make the mean of per-shard means the global mean)."""
    import copy

    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training import packed as pk
    from graph_physics_tpu.training.loss import LossType, MultiLoss
    from graph_physics_tpu.training.step import init_train_state, make_train_step
    from tests.test_train_step import make_setup

    sim, opt, _ = make_setup(noise_scale=0.0)
    loss_fn = MultiLoss(
        [LossType.L2LOSS, LossType.GRADIENTL2LOSS, LossType.DIVERGENCEL2LOSS],
        [1.0, 0.1, 0.05],
    )
    gs = [tiny_graph(frame=i, num_steps=16) for i in range(8)]
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *gs
    )
    batch = jax.tree.map(jnp.asarray, pk.pack(stacked))

    ref_step = make_train_step(
        sim, opt, loss_fn, None, gradient_method="finite_diff",
        num_steps=10, donate=False,
    )
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(1))

    sim_dp = copy.copy(sim)
    sim_dp.axis_name = "dp"
    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, loss_fn, mesh, packed=True, donate=False,
        gradient_method="finite_diff", num_steps=10,
    )
    specs = dp_lib.dp_batch_specs(batch, packed=True)
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

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5, atol=1e-6
    )
    for key in m_ref:
        if key.startswith("loss_term"):
            np.testing.assert_allclose(
                float(m_dp[key]), float(m_ref[key]), rtol=1e-5, atol=1e-6,
                err_msg=key,
            )
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ),
        st_ref.params, st_dp.params,
    )
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_dp_shardmap_uneven_mask_exactness():
    """The dp masked mean must equal the GLOBAL masked mean even when
    deselected counts differ per sample (and so per shard): the
    numerator stays local (×axis_size), the denominator psums — a naive
    mean-of-shard-means would weight shards with fewer masked nodes
    more heavily."""
    import copy

    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training import packed as pk
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step
    from tests.test_train_step import make_setup

    sim, opt, _ = make_setup(noise_scale=0.0)
    gs = [tiny_graph(frame=i, num_steps=16) for i in range(8)]
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *gs
    )
    # wildly uneven deselection across samples: sample i masks out its
    # first 3*i valid nodes
    n_nodes = stacked.x.shape[1]
    desel = np.zeros((8, n_nodes), bool)
    for i in range(8):
        desel[i, : 3 * i] = True
    stacked = stacked.replace(deselected=desel)
    batch = jax.tree.map(jnp.asarray, pk.pack(stacked))

    ref_step = make_train_step(sim, opt, LossType.L2LOSS, None, donate=False)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    st_ref, m_ref = ref_step(state, batch, jax.random.PRNGKey(1))

    sim_dp = copy.copy(sim)
    sim_dp.axis_name = "dp"
    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False
    )
    specs = dp_lib.dp_batch_specs(batch, packed=True)
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

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_ref["loss"]), rtol=1e-5, atol=1e-6
    )
    deltas = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
        ),
        st_ref.params, st_dp.params,
    )
    assert max(jax.tree.leaves(deltas)) < 1e-5


def test_dp_shardmap_mtp_smoke():
    """Spatial-MTP aux loss composes with the dp shard_map path (per-shard
    center sampling from the folded rng; stats pmean-ed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import packed as pk
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state

    param = {
        "model": {
            "type": "epd", "message_passing_num": 1, "hidden_size": 16,
            "node_input_size": 2, "output_size": 2, "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0, "feature_index_end": 2,
            "output_index_start": 0, "output_index_end": 2, "node_type_index": 2,
        },
        "training": {
            "use_spatial_mtp": True, "spatial_mtp_centers_per_step": 8,
            "spatial_mtp_max_neighbors": 6,
        },
    }
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model, axis_name="dp")
    mtp = config_lib.get_mtp_setup(param)
    opt = schedule.make_optimizer(1e-3, 5, 100)
    mesh = make_mesh(dp=8, sp=1)
    step_fn = dp_lib.make_dp_train_step(
        sim, opt, LossType.L2LOSS, mesh, packed=True, donate=False, mtp=mtp
    )
    gs = [tiny_graph(frame=i, num_steps=16) for i in range(8)]
    batch = pk.pack(jax.tree.map(lambda *xs: np.stack(xs), *gs))
    batch = jax.tree.map(jnp.asarray, batch)
    specs = dp_lib.dp_batch_specs(batch, packed=True)
    batch = jax.device_put(
        batch,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )
    repl = NamedSharding(mesh, P())
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch, mtp=mtp)
    state = jax.device_put(state, jax.tree.map(lambda _: repl, state))
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["sp_mtp/pairs"]) > 0
    assert int(s1.step) == 1


def test_dp_shardmap_broadcast_static_exact():
    """Compact broadcast-static leaves ([E, 1, F] edge features) ride the
    dp shard_map path REPLICATED and re-expand per shard — identical
    metrics and params to the full host-repeated layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state

    _, sim_dp, opt, batch = _fused_dp_setup()
    ea = np.asarray(batch.edge_attr)
    assert (ea == ea[:, :1]).all()
    compact = batch.replace(edge_attr=ea[:, :1])

    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False
    )
    repl = NamedSharding(mesh, P())

    outs = []
    for b in (batch, compact):
        specs = dp_lib.dp_batch_specs(b, packed=True)
        # the compact leaf must resolve to a replicated spec
        if b is compact:
            assert specs.edge_attr == P()
        b_sh = jax.device_put(
            b,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
        state = init_train_state(sim_dp, opt, jax.random.PRNGKey(0), batch)
        state = jax.device_put(state, jax.tree.map(lambda _: repl, state))
        outs.append(dp_step(state, b_sh, jax.random.PRNGKey(1)))

    (st_full, m_full), (st_cmp, m_cmp) = outs
    for k in m_full:
        np.testing.assert_array_equal(
            np.asarray(m_full[k]), np.asarray(m_cmp[k]), err_msg=k
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        st_full.params, st_cmp.params,
    )


def test_dp_shardmap_mixed_compact_and_full_batches():
    """One dp step object serves full-width AND compact batches in the
    same run (each trajectory's first batch goes through the per-frame
    full-width path before the vectorized compact lane warms) — the
    spec cache must key them apart."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graph_physics_tpu.parallel import dp as dp_lib
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state

    _, sim_dp, opt, batch = _fused_dp_setup()
    compact = batch.replace(edge_attr=np.asarray(batch.edge_attr)[:, :1])

    mesh = make_mesh(dp=8, sp=1)
    dp_step = dp_lib.make_dp_train_step(
        sim_dp, opt, LossType.L2LOSS, mesh, packed=True, donate=False
    )
    repl = NamedSharding(mesh, P())
    state = init_train_state(sim_dp, opt, jax.random.PRNGKey(0), batch)
    state = jax.device_put(state, jax.tree.map(lambda _: repl, state))

    def put(b):
        return jax.device_put(
            b,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                dp_lib.dp_batch_specs(b, packed=True),
                is_leaf=lambda x: isinstance(x, P),
            ),
        )

    # full → compact → full through ONE step object; per-step losses on
    # identical inputs must agree exactly regardless of dispatch order
    st1, m1 = dp_step(state, put(batch), jax.random.PRNGKey(1))
    st2, m2 = dp_step(st1, put(compact), jax.random.PRNGKey(2))
    st3, m3 = dp_step(st2, put(batch), jax.random.PRNGKey(3))
    assert np.isfinite(float(m3["loss"]))

    # same sequence with full-width batches only
    st1b, n1 = dp_step(state, put(batch), jax.random.PRNGKey(1))
    st2b, n2 = dp_step(st1b, put(batch), jax.random.PRNGKey(2))
    st3b, n3 = dp_step(st2b, put(batch), jax.random.PRNGKey(3))
    for m, nn in ((m1, n1), (m2, n2), (m3, n3)):
        np.testing.assert_array_equal(
            np.asarray(m["loss"]), np.asarray(nn["loss"])
        )
