import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.processors import TransolverProcessor
from graph_physics_tpu.models.transolver import (
    PhysicsAttention,
    TransolverModel,
    gumbel_softmax,
)
from tests.helpers import tiny_graph


def test_gumbel_softmax_deterministic():
    logits = jnp.array([[1.0, 2.0, 3.0]])
    tau = jnp.array([[1.0]])
    out = gumbel_softmax(logits, tau, rng=None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.softmax(logits)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-6)


def test_gumbel_softmax_hard_straight_through():
    logits = jnp.array([[1.0, 5.0, 3.0]])
    out = gumbel_softmax(logits, jnp.array([[1.0]]), rng=None, hard=True)
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_physics_attention_shapes_and_mask():
    n, c = 20, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    mask = jnp.arange(n) < 15
    mod = PhysicsAttention(dim=c, heads=2, dim_head=8, slice_num=4)
    params = mod.init(jax.random.PRNGKey(1), x, None, mask)
    out = mod.apply(params, x, None, mask)
    assert out.shape == (n, c)
    # padded rows must not influence valid outputs: change padding, compare
    x2 = x.at[15:].set(100.0)
    out2 = mod.apply(params, x2, None, mask)
    np.testing.assert_allclose(
        np.asarray(out[:15]), np.asarray(out2[:15]), atol=1e-4
    )


def test_gumbel_rng_changes_assignment():
    n, c = 10, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    mod = PhysicsAttention(dim=c, heads=1, dim_head=8, slice_num=4)
    params = mod.init(jax.random.PRNGKey(1), x)
    out_det = mod.apply(params, x)
    out_g1 = mod.apply(params, x, rngs={"gumbel": jax.random.PRNGKey(2)})
    out_g2 = mod.apply(params, x, rngs={"gumbel": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(out_g1), np.asarray(out_g2))
    assert not np.allclose(np.asarray(out_det), np.asarray(out_g1))


def test_transolver_model_forward():
    n, f = 30, 11
    x = jax.random.normal(jax.random.PRNGKey(0), (n, f))
    pos = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    mod = TransolverModel(
        n_layers=2, n_hidden=16, n_head=2, fun_dim=f, out_dim=3, slice_num=4
    )
    params = mod.init(jax.random.PRNGKey(2), x, pos)
    out = mod.apply(params, x, pos)
    assert out.shape == (n, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unified_pos():
    n, f = 12, 5
    x = jax.random.normal(jax.random.PRNGKey(0), (n, f))
    pos = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    mod = TransolverModel(
        n_layers=1, n_hidden=16, n_head=2, fun_dim=f, out_dim=2,
        slice_num=4, ref=4, unified_pos=True,
    )
    params = mod.init(jax.random.PRNGKey(2), x, pos)
    # preprocess first Dense must see fun_dim + ref^3 inputs
    k = params["params"]["preprocess"]["Dense_0"]["kernel"]
    assert k.shape[0] == f + 4**3
    out = mod.apply(params, x, pos)
    assert out.shape == (n, 2)


def test_temporal_block_variant():
    n, f = 12, 5
    x = jax.random.normal(jax.random.PRNGKey(0), (n, f))
    mod = TransolverModel(
        n_layers=2, n_hidden=16, n_head=2, fun_dim=f, out_dim=2,
        slice_num=4, use_temporal_block=True,
    )
    params = mod.init(jax.random.PRNGKey(2), x)
    out = mod.apply(params, x)
    assert out.shape == (n, 2)
    assert "temporal_block" in params["params"]


def test_processor_on_graph():
    g = jax.tree.map(jnp.asarray, tiny_graph())
    # simulator contract: x normalized features [N, node_input]; just use x
    proc = TransolverProcessor(
        message_passing_num=2,
        node_input_size=int(g.x.shape[-1]),
        output_size=2,
        hidden_size=16,
        num_heads=2,
        slice_num=4,
    )
    params = proc.init(jax.random.PRNGKey(0), g)
    out = proc.apply(params, g)
    assert out.shape == (g.x.shape[0], 2)
    assert out.dtype == jnp.float32


def test_psum_slice_stats_under_shard_map():
    """dp psum parity: full-batch stats == sharded stats with psum."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    n, c = 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    mod_local = PhysicsAttention(dim=c, heads=1, dim_head=8, slice_num=4)
    params = mod_local.init(jax.random.PRNGKey(1), x)

    mod_dp = PhysicsAttention(
        dim=c, heads=1, dim_head=8, slice_num=4, dp_axis_name="dp"
    )

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("dp",))

    def sharded(xs):
        return mod_dp.apply(params, xs)

    out_sharded = jax.jit(
        jax.shard_map(
            sharded, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
        )
    )(x)
    out_full = mod_local.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_full), atol=1e-4
    )
