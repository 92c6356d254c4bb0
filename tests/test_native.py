"""Native meshops (C++/ctypes) parity with the numpy reference paths."""

import numpy as np
import pytest

from graph_physics_tpu import native
from graph_physics_tpu.dataset import synthetic

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain unavailable"
)


def _numpy_faces_to_edges(faces, n):
    # the pure-numpy path from core.mesh (native disabled)
    from graph_physics_tpu.core import mesh

    faces = np.asarray(faces, dtype=np.int64)
    if faces.shape[-1] == 4:
        faces = mesh.tetra_to_faces(faces)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    key = lo * n + hi
    _, first = np.unique(key, return_index=True)
    lo, hi = lo[first], hi[first]
    send = np.concatenate([lo, hi])
    recv = np.concatenate([hi, lo])
    order = np.lexsort((send, recv))
    return np.stack([send[order], recv[order]]).astype(np.int32)


def test_faces_to_edges_parity():
    pos, cells = synthetic.grid_mesh(9, 7)
    ref = _numpy_faces_to_edges(cells, len(pos))
    out = native.faces_to_edges(cells, len(pos))
    np.testing.assert_array_equal(out, ref)


def test_faces_to_edges_tets():
    tets = np.array([[0, 1, 2, 3], [1, 2, 3, 4]], np.int32)
    out = native.faces_to_edges(tets, 5)
    # K4 + K4 sharing a face: nodes {0..4}, undirected edges = 9 -> 18 dir
    assert out.shape == (2, 18)
    pairs = set(zip(out[0].tolist(), out[1].tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_k_hop_parity():
    import scipy.sparse as sp

    pos, cells = synthetic.grid_mesh(7, 6)
    ei = native.faces_to_edges(cells, len(pos))
    out = native.k_hop(ei, len(pos), 2)
    # scipy reference
    a = sp.csr_matrix(
        (np.ones(ei.shape[1], bool), (ei[0], ei[1])), shape=(len(pos), len(pos))
    )
    acc = (a + a @ a).astype(bool)
    acc.setdiag(False)
    acc.eliminate_zeros()
    coo = acc.tocoo()
    order = np.lexsort((coo.row, coo.col))
    ref = np.stack([coo.row[order], coo.col[order]])
    np.testing.assert_array_equal(out, ref)


def test_radius_pairs_parity():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    pos = rng.uniform(size=(200, 2)).astype(np.float32)
    r = 0.13
    out = native.radius_pairs(pos, r)
    ref = cKDTree(pos).query_pairs(r, output_type="ndarray")
    key = lambda p: {tuple(sorted(x)) for x in p.tolist()}
    assert key(out) == key(ref)


def test_radius_pairs_3d():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(1)
    pos = rng.uniform(size=(150, 3)).astype(np.float32)
    r = 0.2
    out = native.radius_pairs(pos, r)
    ref = cKDTree(pos).query_pairs(r, output_type="ndarray")
    key = lambda p: {tuple(sorted(x)) for x in p.tolist()}
    assert key(out) == key(ref)


def test_rcb_labels_balanced():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(1001, 2)).astype(np.float32)
    labels = native.rcb_labels(pos, 4)
    counts = np.bincount(labels, minlength=4)
    assert counts.max() - counts.min() <= 1
