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
