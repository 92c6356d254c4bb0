import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.hierarchical_pooling import DownSampler, UpSampler
from graph_physics_tpu.ops import knn as knn_lib
from graph_physics_tpu.utils import meshmask
from tests.helpers import tiny_graph


class TestKNN:
    def test_knn_exact(self):
        ref = jnp.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [5.0, 0.0]])
        q = jnp.array([[0.1, 0.0]])
        idx, d2 = knn_lib.knn(q, ref, 2)
        assert set(np.asarray(idx[0]).tolist()) == {0, 1}

    def test_knn_masked(self):
        ref = jnp.array([[0.0, 0.0], [0.01, 0.0], [1.0, 0.0]])
        mask = jnp.array([True, False, True])
        idx, _ = knn_lib.knn(jnp.array([[0.0, 0.0]]), ref, 2, ref_mask=mask)
        assert 1 not in np.asarray(idx[0]).tolist()

    def test_knn_graph_undirected(self):
        pos = jax.random.normal(jax.random.PRNGKey(0), (10, 2))
        s, r, m = knn_lib.knn_graph(pos, 3)
        pairs = set(zip(np.asarray(s)[np.asarray(m)].tolist(), np.asarray(r)[np.asarray(m)].tolist()))
        assert all((b, a) in pairs for a, b in pairs)
        assert all(a != b for a, b in pairs)

    def test_knn_interpolate_exact_at_ref(self):
        ref_pos = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        x_ref = jnp.array([[1.0], [2.0], [3.0]])
        out = knn_lib.knn_interpolate(x_ref, ref_pos, ref_pos, k=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x_ref), atol=1e-4)

    def test_radius_edges(self):
        a = jnp.array([[0.0, 0.0], [5.0, 0.0]])
        b = jnp.array([[0.05, 0.0], [5.01, 0.0], [9.0, 9.0]])
        ai, bi, valid = knn_lib.radius_edges(a, b, radius=0.1, budget=4)
        got = set(zip(np.asarray(ai)[np.asarray(valid)].tolist(), np.asarray(bi)[np.asarray(valid)].tolist()))
        assert got == {(0, 0), (1, 1)}


class TestPooling:
    def test_downsample_shapes_and_mask(self):
        n, d = 64, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        pos = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
        mask = jnp.arange(n) < 40
        mod = DownSampler(d_out=16, ratio=0.25, k=4)
        params = mod.init(jax.random.PRNGKey(2), x, pos, mask)
        cg = mod.apply(params, x, pos, mask)
        assert cg.x.shape == (16, 16)
        # selected nodes are valid fine nodes
        sel = np.asarray(cg.node_index)[np.asarray(cg.node_mask)]
        assert (sel < 40).all()

    def test_down_then_up(self):
        n, d = 64, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        pos = jax.random.normal(jax.random.PRNGKey(1), (n, 2))
        down = DownSampler(d_out=16, ratio=0.25, k=4)
        dp = down.init(jax.random.PRNGKey(2), x, pos)
        cg = down.apply(dp, x, pos)
        up = UpSampler(d_out=8, k=3)
        upar = up.init(jax.random.PRNGKey(3), cg.x, cg.pos, pos, cg.node_mask)
        fine = up.apply(upar, cg.x, cg.pos, pos, cg.node_mask)
        assert fine.shape == (n, 8)
        assert np.isfinite(np.asarray(fine)).all()


class TestMeshMask:
    def test_filter_and_build(self):
        g = jax.tree.map(jnp.asarray, tiny_graph())
        n = g.x.shape[0]
        keep = jnp.arange(n) % 2 == 0
        masked, edges_kept = meshmask.build_masked_graph(g, keep)
        # every kept edge has both endpoints kept
        ek = np.asarray(edges_kept)
        s = np.asarray(g.senders)[ek]
        r = np.asarray(g.receivers)[ek]
        kn = np.asarray(keep)
        assert kn[s].all() and kn[r].all()
        # masked node features zeroed
        assert np.asarray(masked.x)[~np.asarray(masked.node_mask)].sum() == 0

    def test_reconstruct(self):
        g = jax.tree.map(jnp.asarray, tiny_graph())
        n = g.x.shape[0]
        keep = jnp.arange(n) % 2 == 0
        latent = jnp.ones((n, 4)) * 7.0
        token = jnp.full((4,), -3.0)
        out = meshmask.reconstruct_graph(g, latent, keep, token)
        xr = np.asarray(out.x)
        assert (xr[np.asarray(keep)] == 7.0).all()
        assert (xr[~np.asarray(keep)] == -3.0).all()


class TestRotate:
    def test_rotation_preserves_lengths(self):
        from graph_physics_tpu.dataset.preprocessing import random_3d_rotate

        rng = np.random.default_rng(0)
        pos = rng.normal(size=(10, 3)).astype(np.float32)
        x = rng.normal(size=(10, 7)).astype(np.float32)
        y = rng.normal(size=(10, 3)).astype(np.float32)
        p2, x2, y2 = random_3d_rotate(pos, x, y, [(0, 3)], rng)
        np.testing.assert_allclose(
            np.linalg.norm(p2, axis=1), np.linalg.norm(pos, axis=1), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.linalg.norm(x2[:, :3], axis=1), np.linalg.norm(x[:, :3], axis=1), rtol=1e-4
        )
        # non-listed columns untouched
        np.testing.assert_array_equal(x2[:, 3:], x[:, 3:])
        np.testing.assert_allclose(
            np.linalg.norm(y2, axis=1), np.linalg.norm(y, axis=1), rtol=1e-4
        )

    def test_min_distance_to_type(self):
        from graph_physics_tpu.core.nodetype import NodeType
        from graph_physics_tpu.dataset.preprocessing import (
            compute_min_distance_to_type,
        )

        pos = np.array([[0.0, 0.0], [1.0, 0.0], [3.0, 0.0]])
        nt = np.array([int(NodeType.OBSTACLE), 0, 0])
        d = compute_min_distance_to_type(pos, nt, NodeType.OBSTACLE)
        np.testing.assert_allclose(d, [0.0, 1.0, 3.0], atol=1e-6)


def test_radius_edges_truncation_stats():
    """with_stats reports how many nodes hit the k_per_node cap (ADVICE
    r2: dense-contact workloads must be able to notice the truncation)."""
    import jax.numpy as jnp

    from graph_physics_tpu.ops import knn as knn_lib

    # 20 points in a tiny cluster: every node has 19 in-radius partners
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(20, 3)) * 0.01)
    ai, bi, valid, capped = knn_lib.radius_edges(
        pts, pts, radius=1.0, budget=64, k_per_node=4, with_stats=True
    )
    assert int(capped) == 20  # every node's 4th candidate still in radius
    # spread-out points: nobody capped
    far = jnp.asarray(np.arange(20, dtype=np.float32)[:, None] * [10.0, 0, 0])
    _, _, _, capped2 = knn_lib.radius_edges(
        far, far, radius=1.0, budget=64, k_per_node=4, with_stats=True
    )
    assert int(capped2) == 0
