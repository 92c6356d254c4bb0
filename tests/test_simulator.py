import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from graph_physics_tpu.models.simulator import Simulator
from tests.helpers import tiny_graph


class MockModel(nn.Module):
    """Returns a learned constant per node (like reference MockModel)."""

    output_size: int = 2

    @nn.compact
    def __call__(self, graph):
        w = self.param("w", nn.initializers.normal(), (self.output_size,))
        return jnp.broadcast_to(w, (graph.x.shape[0], self.output_size))


def make_sim():
    return Simulator(
        node_input_size=2 + 9,
        edge_input_size=3,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
        model=MockModel(),
    )


def test_prepare_shapes_and_stats():
    g = tiny_graph()
    sim = make_sim()
    state = sim.init_state()
    g_in, target_norm, pre_t, state = sim.prepare(state, g, is_training=True)
    assert g_in.x.shape[-1] == 11  # 2 features + 9 one-hot
    assert target_norm.shape[-1] == 2
    assert float(state.node_norm.acc_count) == float(np.sum(np.asarray(g.node_mask)))
    # padded rows normalized but masked stats
    assert np.isfinite(np.asarray(g_in.x)).all()


def test_eval_does_not_accumulate():
    g = tiny_graph()
    sim = make_sim()
    state = sim.init_state()
    _, _, _, s2 = sim.prepare(state, g, is_training=False)
    assert float(s2.node_norm.acc_count) == 0


def test_build_outputs_roundtrip():
    """inverse(normalize(Δ)) + pre_target == y (reference round-trip)."""
    g = tiny_graph()
    sim = make_sim()
    state = sim.init_state()
    g_in, target_norm, pre_t, state = sim.prepare(state, g, is_training=True)
    rebuilt = sim.build_outputs_from_pre(state, target_norm, pre_t)
    valid = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        np.asarray(rebuilt)[valid], np.asarray(g.y)[valid], atol=1e-4
    )


def test_forward_training_vs_eval():
    g = tiny_graph()
    sim = make_sim()
    state = sim.init_state()
    params = sim.init_params(jax.random.PRNGKey(0), g)
    out_t = sim.forward(params, state, g, is_training=True)
    assert out_t.outputs is None
    out_e = sim.forward(params, out_t.state, g, is_training=False)
    assert out_e.outputs is not None
    assert out_e.outputs.shape == g.y.shape


def test_batched_forward():
    g = tiny_graph()
    batched = jax.tree.map(lambda a: np.stack([np.asarray(a)] * 3), g)
    sim = make_sim()
    state = sim.init_state()
    params = sim.init_params(jax.random.PRNGKey(0), batched)
    out = sim.forward(params, state, batched, is_training=True)
    assert out.net_out.shape == (3, g.x.shape[0], 2)
    # stats counted across the whole batch
    assert float(out.state.node_norm.acc_count) == 3 * float(
        np.sum(np.asarray(g.node_mask))
    )
