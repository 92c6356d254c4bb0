import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.core import mesh
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import edge_attention as ea
from graph_physics_tpu.ops import segment, voperators


class TestSegment:
    def test_segment_sum_masked(self):
        vals = jnp.array([[1.0], [2.0], [4.0], [100.0]])
        ids = jnp.array([0, 0, 1, 0])
        mask = jnp.array([True, True, True, False])
        out = segment.segment_sum(vals, ids, 3, mask)
        np.testing.assert_allclose(out, [[3.0], [4.0], [0.0]])

    def test_segment_mean(self):
        vals = jnp.array([2.0, 4.0, 6.0])
        ids = jnp.array([0, 0, 1])
        out = segment.segment_mean(vals, ids, 3)
        np.testing.assert_allclose(out, [3.0, 6.0, 0.0])

    def test_segment_softmax(self):
        logits = jnp.array([1.0, 2.0, 3.0, 50.0])
        ids = jnp.array([0, 0, 1, 1])
        mask = jnp.array([True, True, True, False])
        out = segment.segment_softmax(logits, ids, 2, mask)
        e = np.exp([1.0, 2.0])
        np.testing.assert_allclose(out[:2], e / e.sum(), rtol=1e-5)
        np.testing.assert_allclose(out[2], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out[3], 0.0)

    def test_segment_softmax_empty_segment(self):
        logits = jnp.array([1.0])
        out = segment.segment_softmax(logits, jnp.array([0]), 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_segment_softmax_grad_finite(self):
        logits = jnp.array([1.0, 2.0, 3.0])
        ids = jnp.array([0, 0, 1])

        def f(l):
            return jnp.sum(segment.segment_softmax(l, ids, 2) ** 2)

        g = jax.grad(f)(logits)
        assert np.isfinite(np.asarray(g)).all()


class TestEdgeAttention:
    def test_matches_dense_softmax(self):
        # fully-connected graph == dense attention
        n, h, d = 4, 2, 8
        key = jax.random.PRNGKey(0)
        q, k, v = jax.random.normal(key, (3, n, h, d))
        send, recv = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        senders = jnp.array(send.ravel())
        receivers = jnp.array(recv.ravel())
        out = ea.edge_attention(q, k, v, senders, receivers)
        logits = jnp.einsum("nhd,mhd->hnm", q, k) / np.sqrt(d)
        alpha = jax.nn.softmax(logits, axis=-1)
        ref = jnp.einsum("hnm,mhd->nhd", alpha, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_padded_edges_ignored(self):
        n, h, d = 3, 1, 4
        key = jax.random.PRNGKey(1)
        q, k, v = jax.random.normal(key, (3, n, h, d))
        senders = jnp.array([0, 1, 2, 0])
        receivers = jnp.array([1, 1, 1, 0])
        mask = jnp.array([True, True, False, False])
        out = ea.edge_attention(q, k, v, senders, receivers, mask)
        out2 = ea.edge_attention(
            q, k, v, senders[:2], receivers[:2], jnp.array([True, True])
        )
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out2[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)


def _graph_for_field():
    pos, cells = synthetic.grid_mesh(10, 10, 1.0, 1.0)
    ei = mesh.faces_to_edges(cells, len(pos))
    return pos, cells, ei


class TestVoperators:
    """Analytic-field tests (pattern from reference test_vectorial_operators)."""

    def test_fd_gradient_matches_spec(self):
        """Parity with a direct numpy transcription of the reference FD
        estimator (vectorial_operators.py:81-128: undirected-unique edges,
        outer(du,dx)·w² accumulated symmetrically, divided by Σw).
        The estimator itself is biased on anisotropic meshes — the
        reference only shape-tests it — so we test parity, not accuracy.
        """
        pos, cells, ei = _graph_for_field()
        field = np.stack(
            [2 * pos[:, 0] + 3 * pos[:, 1], -pos[:, 0]], axis=-1
        ).astype(np.float32)
        g = np.asarray(
            voperators.gradient_fd(
                jnp.array(pos), jnp.array(field), jnp.array(ei[0]), jnp.array(ei[1])
            )
        )
        # numpy reference on unique undirected edges
        n, d = pos.shape
        f = field.shape[1]
        und = {tuple(sorted(p)) for p in zip(ei[0].tolist(), ei[1].tolist())}
        grad = np.zeros((n, f, d))
        wsum = np.zeros(n)
        eps = 1e-8
        for i, j in und:
            dx = pos[j] - pos[i]
            du = field[j] - field[i]
            d2 = float(dx @ dx)
            w = 1.0 / (d2 + eps)
            ge = np.outer(du, dx) / (d2 + eps) * w
            grad[i] += ge
            grad[j] += ge
            wsum[i] += w
            wsum[j] += w
        ref = grad / (wsum[:, None, None] + eps)
        np.testing.assert_allclose(g, ref, rtol=1e-4, atol=1e-5)

    def test_wls_gradient_linear_field(self):
        pos, cells, ei = _graph_for_field()
        field = np.stack(
            [2 * pos[:, 0] + 3 * pos[:, 1], -pos[:, 0]], axis=-1
        ).astype(np.float32)
        g = voperators.gradient_wls(jnp.array(pos), jnp.array(field), jnp.array(cells))
        g = np.asarray(g)
        np.testing.assert_allclose(g[:, 0, 0], 2.0, atol=1e-3)
        np.testing.assert_allclose(g[:, 0, 1], 3.0, atol=1e-3)

    def test_wls_face_mask(self):
        pos, cells, ei = _graph_for_field()
        field = pos[:, :1].astype(np.float32)
        padded = np.concatenate([cells, np.zeros((5, 3), np.int64)], axis=0)
        fmask = np.concatenate([np.ones(len(cells), bool), np.zeros(5, bool)])
        g1 = voperators.gradient_wls(jnp.array(pos), jnp.array(field), jnp.array(cells))
        g2 = voperators.gradient_wls(
            jnp.array(pos), jnp.array(field), jnp.array(padded), jnp.array(fmask)
        )
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def test_divergence(self):
        # grad tensor with known trace
        g = jnp.array([[[1.0, 5.0], [7.0, 2.0]]])  # div = 1+2
        np.testing.assert_allclose(voperators.divergence(g), [3.0])

    def test_convection_matches_reference_einsum(self):
        # reference semantics: product[n,f] = field[n,f] * Σ_d grad[n,f,d]
        field = jnp.array([[1.0, 2.0]])
        grad = jnp.array([[[1.0, 1.0], [2.0, 3.0]]])
        np.testing.assert_allclose(
            voperators.convection(field, grad), [[2.0, 10.0]]
        )

    def test_wls_3d_tet(self):
        # unit tet, linear field u = x + 2y + 3z
        pos = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32
        )
        tets = np.array([[0, 1, 2, 3]])
        field = (pos @ np.array([[1.0], [2.0], [3.0]])).astype(np.float32)
        g = voperators.gradient_wls(jnp.array(pos), jnp.array(field), jnp.array(tets))
        np.testing.assert_allclose(np.asarray(g)[:, 0, :], [[1, 2, 3]] * 4, atol=1e-4)
