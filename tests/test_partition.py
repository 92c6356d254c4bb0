import numpy as np
import pytest

from graph_physics_tpu.core import mesh
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.partition import (
    extract_subgraph,
    num_parts_for,
    rcb_partition,
)
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.preprocessing import FrameConfig


class TestRCB:
    def test_balanced_and_disjoint(self):
        rng = np.random.default_rng(0)
        pos = rng.normal(size=(1000, 2))
        for p in (2, 3, 4, 7):
            parts = rcb_partition(pos, p)
            assert len(parts) == p
            sizes = [len(x) for x in parts]
            assert max(sizes) - min(sizes) <= 1
            all_ids = np.concatenate(parts)
            assert len(np.unique(all_ids)) == 1000

    def test_locality(self):
        # parts should be spatially compact: mean intra-part distance much
        # smaller than global
        pos, cells = synthetic.grid_mesh(30, 30, 1.0, 1.0)
        parts = rcb_partition(pos, 4)
        global_spread = pos.std(axis=0).sum()
        for ids in parts:
            assert pos[ids].std(axis=0).sum() < global_spread * 0.8

    def test_num_parts_for(self):
        assert num_parts_for(1000, 4, None) == 4
        assert num_parts_for(1000, None, 300) == 4
        assert num_parts_for(1000, None, None) == 1


def test_extract_subgraph():
    pos, cells = synthetic.grid_mesh(6, 6, 1.0, 1.0)
    ei = mesh.faces_to_edges(cells, len(pos))
    parts = rcb_partition(pos, 2)
    local_ei, mapping = extract_subgraph(parts[0], ei, len(pos))
    assert local_ei.max() < len(parts[0])
    # every local edge corresponds to a global intra-part edge
    glob = parts[0][local_ei]
    pairs = set(zip(ei[0].tolist(), ei[1].tolist()))
    assert all((a, b) in pairs for a, b in zip(glob[0], glob[1]))


def test_partitioned_dataset(tmp_path):
    path, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=1, nx=12, ny=10, num_steps=4,
        meta_path=str(tmp_path / "meta.json"),
    )
    full = H5Dataset(path, meta, FrameConfig(targets=("velocity",)))
    ds = H5Dataset(
        path, meta, FrameConfig(targets=("velocity",)), num_partitions=4
    )
    assert len(ds) == len(full) * 4
    t, f, p = ds.indices_for(5)
    assert (t, f) == (0, 1) and p == 1
    g = ds[0]
    n_full = int(full[0].n_node)
    assert int(g.n_node) < n_full
    # partitions cover all nodes
    total = sum(int(ds[i].n_node) for i in range(4))
    assert total == n_full
    # per-partition graphs are self-consistent
    assert int(g.senders[: int(g.n_edge)].max()) < int(g.n_node)
