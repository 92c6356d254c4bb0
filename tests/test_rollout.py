import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.training.rollout import bc_mask, make_rollout_fn, stack_frames
from tests.test_train_step import make_setup
from tests.helpers import tiny_graph


@pytest.fixture(scope="module")
def frames():
    return [tiny_graph(frame=i, num_steps=8) for i in range(6)]


def test_bc_mask(frames):
    g = jax.tree.map(jnp.asarray, frames[0])
    m = np.asarray(bc_mask(g))
    nt = np.asarray(g.node_type)
    assert (m[nt == NodeType.NORMAL] == False).all()
    assert (m[nt == NodeType.OUTFLOW] == False).all()
    assert (m[nt == NodeType.WALL_BOUNDARY] == True).all()
    assert (m[nt == NodeType.INFLOW] == True).all()


def test_rollout_shapes_and_metrics(frames):
    sim, opt, _ = make_setup()
    stacked = stack_frames(frames)
    params = sim.init_params(jax.random.PRNGKey(0), jax.tree.map(lambda a: a[0], stacked))
    state = sim.init_state()
    rollout = make_rollout_fn(sim)
    res = rollout(params, state, stacked)
    t, n = stacked.x.shape[0], stacked.x.shape[1]
    assert res.predictions.shape == (t, n, 2)
    assert res.val_loss.shape == (t,)
    assert np.isfinite(float(res.rmse_all_rollout))
    assert np.isfinite(float(res.rmse_1step))
    # rmse_all aggregates the per-step sums
    agg = np.sqrt(np.sum(np.asarray(res.sq_sum)) / np.sum(np.asarray(res.count)))
    np.testing.assert_allclose(float(res.rmse_all_rollout), agg, rtol=1e-5)


def test_bc_nodes_match_targets(frames):
    sim, opt, _ = make_setup()
    stacked = stack_frames(frames)
    params = sim.init_params(jax.random.PRNGKey(0), jax.tree.map(lambda a: a[0], stacked))
    rollout = make_rollout_fn(sim)
    res = rollout(params, sim.init_state(), stacked)
    g0 = jax.tree.map(lambda a: a[0], stacked)
    m = np.asarray(bc_mask(g0))
    preds = np.asarray(res.predictions)
    targs = np.asarray(res.targets)
    np.testing.assert_allclose(preds[:, m, :], targs[:, m, :], atol=1e-6)


def test_batched_rollout_matches_sequential(frames):
    """vmap-batched rollout over stacked trajectories == per-trajectory."""
    from graph_physics_tpu.training.rollout import make_batched_rollout_fn

    sim, opt, _ = make_setup()
    stacked = stack_frames(frames)
    params = sim.init_params(jax.random.PRNGKey(0), jax.tree.map(lambda a: a[0], stacked))
    state = sim.init_state()
    single = make_rollout_fn(sim)
    res1 = single(params, state, stacked)

    # two "trajectories" (same frames twice), batched
    batched = jax.tree.map(lambda a: jnp.stack([a, a]), stacked)
    multi = make_batched_rollout_fn(sim)
    res2 = multi(params, state, batched)
    assert res2.rmse_1step.shape == (2,)
    np.testing.assert_allclose(
        float(res2.rmse_all_rollout[0]), float(res1.rmse_all_rollout), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res2.predictions[1]), np.asarray(res1.predictions), atol=1e-5
    )


def test_perfect_model_zero_rmse(frames):
    """A simulator whose net_out equals the normalized target rolls out with
    zero error — validates the write-back + inverse-normalization chain."""
    from graph_physics_tpu.models.simulator import Simulator
    from flax import linen as nn

    class Oracle(nn.Module):
        @nn.compact
        def __call__(self, graph):
            # graph.y is the normalized target inside prepare()
            self.param("dummy", nn.initializers.zeros, (1,))
            return graph.y

    sim = Simulator(
        node_input_size=11,
        edge_input_size=3,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
        model=Oracle(),
    )
    stacked = stack_frames(frames)
    params = sim.init_params(jax.random.PRNGKey(0), jax.tree.map(lambda a: a[0], stacked))
    rollout = make_rollout_fn(sim)
    res = rollout(params, sim.init_state(), stacked)
    assert float(res.rmse_all_rollout) < 1e-5
