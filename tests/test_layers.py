import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models import layers


def _init_apply(mod, *args, seed=0, **kwargs):
    params = mod.init(jax.random.PRNGKey(seed), *args, **kwargs)
    return params, mod.apply(params, *args, **kwargs)


class TestRMSNorm:
    def test_matches_manual(self):
        x = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        mod = layers.RMSNorm(dim=4)
        _, out = _init_apply(mod, x)
        rms = np.linalg.norm(x) / np.sqrt(4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) / (rms + 1e-8), atol=1e-6)

    def test_partial(self):
        x = jnp.ones((2, 8))
        mod = layers.RMSNorm(dim=8, p=0.5)
        _, out = _init_apply(mod, x)
        assert out.shape == (2, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestMLP:
    def test_shapes_and_layers(self):
        x = jnp.ones((5, 7))
        mod = layers.MLP(hidden_size=16, out_size=3, nb_of_layers=4)
        params, out = _init_apply(mod, x)
        assert out.shape == (5, 3)
        dense_layers = [k for k in params["params"] if k.startswith("Dense")]
        assert len(dense_layers) == 4

    def test_no_norm_tail(self):
        x = jnp.ones((5, 7))
        mod = layers.MLP(hidden_size=16, out_size=3, layer_norm=False)
        params, _ = _init_apply(mod, x)
        assert not any("RMSNorm" in k for k in params["params"])

    def test_bad_activation(self):
        with pytest.raises(NotImplementedError):
            layers.resolve_activation("tanh")


class TestGatedMLP:
    def test_expansion(self):
        x = jnp.ones((3, 8))
        mod = layers.GatedMLP(hidden_size=8, expansion_factor=3)
        _, out = _init_apply(mod, x)
        assert out.shape == (3, 24)

    def test_block(self):
        x = jnp.ones((3, 8))
        mod = layers.GatedMLPBlock(in_size=8, hidden_size=8, out_size=5)
        _, out = _init_apply(mod, x)
        assert out.shape == (3, 5)


class TestRoPE:
    def test_inv_freq(self):
        inv = layers.make_inv_freq(4, 10000.0)
        assert inv.shape == (4,)
        assert float(inv[0]) == 1.0

    def test_spatial_rope_preserves_norm(self):
        n, h, dh, p = 6, 2, 12, 3
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, dh))
        pos = jax.random.normal(jax.random.PRNGKey(1), (n, p))
        m = dh // (p * 2)
        out = layers.apply_spatial_rope(x, pos, layers.make_inv_freq(m, 10000.0))
        assert out.shape == x.shape
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            atol=1e-4,
        )

    def test_zero_pos_identity(self):
        n, h, dh = 4, 1, 12
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, dh))
        pos = jnp.zeros((n, 3))
        out = layers.apply_spatial_rope(x, pos, layers.make_inv_freq(2, 10000.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_relative_rope(self):
        e, c = 5, 12
        x = jax.random.normal(jax.random.PRNGKey(0), (e, c))
        delta = jax.random.normal(jax.random.PRNGKey(1), (e, 3))
        out = layers.apply_relative_rope(x, delta, layers.make_inv_freq(2, 10000.0), 3)
        assert out.shape == x.shape
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            atol=1e-4,
        )


def _ring_edges(n):
    senders = jnp.array([(i + 1) % n for i in range(n)] + [(i - 1) % n for i in range(n)])
    receivers = jnp.array(list(range(n)) * 2)
    return senders, receivers


class TestAttention:
    def test_sparse_shapes(self):
        n, c = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        s, r = _ring_edges(n)
        mod = layers.Attention(hidden_size=c, num_heads=4)
        _, out = _init_apply(mod, x, s, r)
        assert out.shape == (n, c)

    def test_dense_fallback(self):
        n, c = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        mod = layers.Attention(hidden_size=c, num_heads=4)
        _, out = _init_apply(mod, x)
        assert out.shape == (n, c)

    def test_rope_requires_pos(self):
        mod = layers.Attention(hidden_size=16, num_heads=4, use_rope_embeddings=True)
        x = jnp.ones((4, 16))
        with pytest.raises(ValueError):
            mod.init(jax.random.PRNGKey(0), x)

    def test_gated(self):
        n, c = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        s, r = _ring_edges(n)
        mod = layers.Attention(hidden_size=c, num_heads=4, use_gated_attention=True)
        params, out = _init_apply(mod, x, s, r)
        assert "gate_proj" in params["params"]

    def test_shared_qkv(self):
        n, c = 4, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        mod = layers.Attention(hidden_size=c, num_heads=2, use_separate_proj_weight=False)
        params, out = _init_apply(mod, x)
        assert "k_proj" not in params["params"]


class TestTransformerBlock:
    def test_forward_and_grad(self):
        n, c = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        s, r = _ring_edges(n)
        mod = layers.TransformerBlock(hidden_size=c, num_heads=4)
        params = mod.init(jax.random.PRNGKey(0), x, s, r)

        def f(p):
            return jnp.sum(mod.apply(p, x, s, r) ** 2)

        g = jax.grad(f)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestTemporalAttention:
    def test_shapes(self):
        n, c = 8, 16
        hp = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        hq = jax.random.normal(jax.random.PRNGKey(1), (n, c))
        s, r = _ring_edges(n)
        mod = layers.TemporalAttention(hidden_size=c, num_heads=4)
        _, out = _init_apply(mod, hp, hq, s, r)
        assert out.shape == (n, c)


class TestGraphNetBlock:
    def _setup(self, **kw):
        n, c = 8, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
        e_attr = jax.random.normal(jax.random.PRNGKey(1), (2 * n, c))
        s, r = _ring_edges(n)
        mod = layers.GraphNetBlock(hidden_size=c, **kw)
        return mod, x, e_attr, s, r

    def test_residual_updates(self):
        mod, x, e, s, r = self._setup()
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r)
        xo, eo = mod.apply(params, x, e, s, r)
        assert xo.shape == x.shape and eo.shape == e.shape
        assert not np.allclose(np.asarray(xo), np.asarray(x))

    def test_edge_mask_blocks_messages(self):
        mod, x, e, s, r = self._setup()
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r)
        mask_none = jnp.zeros(len(s), dtype=bool)
        xo, _ = mod.apply(params, x, e, s, r, mask_none)
        # with all edges masked, aggregation is zero but node MLP still runs
        xo2, _ = mod.apply(params, x, e, jnp.zeros_like(s), jnp.zeros_like(r), mask_none)
        np.testing.assert_allclose(np.asarray(xo), np.asarray(xo2), atol=1e-5)

    def test_rope_variant(self):
        mod, x, e, s, r = self._setup(use_rope=True, rope_axes=2)
        pos = jax.random.normal(jax.random.PRNGKey(3), (8, 2))
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r, None, pos)
        xo, eo = mod.apply(params, x, e, s, r, None, pos)
        assert xo.shape == x.shape

    def test_rope_requires_pos(self):
        mod, x, e, s, r = self._setup(use_rope=True)
        with pytest.raises(ValueError):
            mod.init(jax.random.PRNGKey(2), x, e, s, r)

    def test_gate_variant(self):
        mod, x, e, s, r = self._setup(use_gate=True)
        phi = jnp.ones(8)
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r, None, None, phi)
        xo, _ = mod.apply(params, x, e, s, r, None, None, phi)
        assert "gate_proj" in params["params"]

    def test_gated_mlp_variant(self):
        mod, x, e, s, r = self._setup(use_gated_mlp=True)
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r)
        xo, _ = mod.apply(params, x, e, s, r)
        assert xo.shape == x.shape

    def test_gradients_flow(self):
        mod, x, e, s, r = self._setup()
        params = mod.init(jax.random.PRNGKey(2), x, e, s, r)

        def f(p):
            xo, eo = mod.apply(p, x, e, s, r)
            return jnp.sum(xo**2) + jnp.sum(eo**2)

        g = jax.grad(f)(params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_graphnet_gate_phi_conditioning():
    """graph.phi conditions the aggregation gate (reference
    layers.py:1091-1098): with use_gate, phi shifts gate logits through
    the learned gate_pos direction; without phi the gate still applies."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_physics_tpu.models.layers import GraphNetBlock

    n, e, h = 8, 14, 16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h))
    eattr = jax.random.normal(jax.random.PRNGKey(1), (e, h))
    senders = jnp.arange(e) % n
    receivers = (jnp.arange(e) * 3) % n
    emask = jnp.ones(e, bool)
    phi = jnp.linspace(-2.0, 2.0, n)

    blk = GraphNetBlock(hidden_size=h, use_gate=True)
    params = blk.init(
        jax.random.PRNGKey(2), x, eattr, senders, receivers, emask, None, phi
    )
    assert "gate_pos" in params["params"]

    out_phi, _ = blk.apply(params, x, eattr, senders, receivers, emask, None, phi)
    out_nophi, _ = blk.apply(params, x, eattr, senders, receivers, emask, None, None)
    # zero-init gate_pos: phi has no effect until trained
    np.testing.assert_allclose(np.asarray(out_phi), np.asarray(out_nophi), atol=1e-6)

    p2 = jax.tree.map(lambda a: a, params)
    p2["params"]["gate_pos"] = jnp.ones_like(p2["params"]["gate_pos"])
    out2, _ = blk.apply(p2, x, eattr, senders, receivers, emask, None, phi)
    assert not np.allclose(np.asarray(out2), np.asarray(out_phi), atol=1e-5)

    # gradient flows into gate_pos when phi is provided
    def loss(p):
        o, _ = blk.apply(p, x, eattr, senders, receivers, emask, None, phi)
        return jnp.sum(o**2)

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["params"]["gate_pos"])).max() > 0


def test_epd_reads_graph_phi():
    """EncodeProcessDecode wires graph.phi into its blocks when the gate
    is active (reference processors.py:193)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from tests.helpers import tiny_graph

    g = jax.tree.map(jnp.asarray, tiny_graph())
    g = g.replace(phi=jnp.linspace(0.0, 1.0, g.x.shape[0]))
    m = EncodeProcessDecode(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16, use_gated_attention=True,
    )
    params = m.init(jax.random.PRNGKey(0), g)

    # force a nonzero gate_pos so phi actually matters, then flip phi
    params = jax.tree_util.tree_map_with_path(
        lambda path, a: (
            jnp.ones_like(a) if any(
                getattr(k, "key", None) == "gate_pos" for k in path
            ) else a
        ),
        params,
    )
    out1 = m.apply(params, g)
    out2 = m.apply(params, g.replace(phi=g.phi + 1.0))
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    # and with the gate off, phi is ignored entirely
    m0 = EncodeProcessDecode(
        message_passing_num=1, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=16,
    )
    p0 = m0.init(jax.random.PRNGKey(0), g)
    np.testing.assert_allclose(
        np.asarray(m0.apply(p0, g)),
        np.asarray(m0.apply(p0, g.replace(phi=None))),
        atol=0,
    )
