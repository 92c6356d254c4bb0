import numpy as np
import pytest

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.loader import BatchLoader, stack_batch
from graph_physics_tpu.dataset.preprocessing import FrameConfig
from graph_physics_tpu.core.nodetype import NodeType


@pytest.fixture(scope="module")
def h5_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("h5data")
    return synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=2, nx=8, ny=6, num_steps=6
    )


@pytest.fixture(scope="module")
def dataset(h5_paths):
    path, meta = h5_paths
    return H5Dataset(path, meta, FrameConfig(targets=("velocity",)))


class TestH5Dataset:
    def test_length_and_index_math(self, dataset):
        # 2 trajectories, 6 steps each -> 5 supervised frames per traj
        assert dataset.num_trajectories == 2
        assert len(dataset) == 10
        assert dataset.indices_for(0) == (0, 0, 0)
        assert dataset.indices_for(4) == (0, 4, 0)
        assert dataset.indices_for(5) == (1, 0, 0)

    def test_frame_contract(self, dataset):
        g = dataset[0]
        n_true = int(g.n_node)
        # x = [velocity(2), node_type, time]
        assert g.x.shape[-1] == 4
        assert g.y.shape[-1] == 2
        nt_col = np.asarray(g.x[:n_true, 2])
        np.testing.assert_array_equal(nt_col, np.asarray(g.node_type[:n_true]))
        assert np.asarray(g.x[:n_true, 3] == 0.0).all()  # frame 0 time
        g1 = dataset[1]
        np.testing.assert_allclose(np.asarray(g1.x[:n_true, 3]), 0.01, rtol=1e-5)

    def test_target_is_next_frame(self, dataset):
        g0 = dataset[0]
        g1 = dataset[1]
        n = int(g0.n_node)
        np.testing.assert_allclose(
            np.asarray(g0.y[:n]), np.asarray(g1.x[:n, :2]), atol=1e-6
        )

    def test_buckets_aligned(self, dataset):
        n_pad, e_pad, _c_pad = dataset.bucket_of(0)
        assert n_pad % 128 == 0 and e_pad % 128 == 0

    def test_trajectory_frames(self, dataset):
        frames = dataset.trajectory_frames(0)
        assert len(frames) == 5
        assert all(f.x.shape == frames[0].x.shape for f in frames)

    def test_previous_data(self, h5_paths):
        path, meta = h5_paths
        ds = H5Dataset(
            path, meta, FrameConfig(targets=("velocity",), use_previous_data=True)
        )
        # first usable frame shifts to 1
        assert ds.indices_for(0) == (0, 1, 0)
        g = ds[0]
        assert g.prev is not None
        n = int(g.n_node)
        g0 = ds.get_frame(0, 0, train=False)
        np.testing.assert_allclose(
            np.asarray(g.prev[:n]), np.asarray(g0.x[:n, :2]), atol=1e-6
        )

    def test_khop_increases_edges(self, h5_paths):
        path, meta = h5_paths
        ds1 = H5Dataset(path, meta, FrameConfig(targets=("velocity",), khop=1))
        ds2 = H5Dataset(path, meta, FrameConfig(targets=("velocity",), khop=2))
        assert int(ds2[0].n_edge) > int(ds1[0].n_edge)

    def test_masking(self, h5_paths):
        path, meta = h5_paths
        ds = H5Dataset(
            path, meta, FrameConfig(targets=("velocity",), masking_ratio=0.3)
        )
        g = ds[0]
        n = int(g.n_node)
        assert g.deselected is not None
        assert int(np.sum(np.asarray(g.deselected))) == int(n * 0.3)

    def test_random_edges(self, h5_paths):
        path, meta = h5_paths
        ds = H5Dataset(
            path, meta, FrameConfig(targets=("velocity",), new_edges_ratio=0.2)
        )
        base = H5Dataset(path, meta, FrameConfig(targets=("velocity",)))
        assert int(ds[0].n_edge) > int(base[0].n_edge)


class TestLoader:
    def test_batches_same_bucket(self, dataset):
        loader = BatchLoader(dataset, batch_size=2, shuffle=True, device_put=False)
        seen = 0
        for batch in loader:
            assert batch.x.ndim == 3
            assert batch.x.shape[0] == 2
            seen += batch.x.shape[0]
        assert seen >= len(dataset)

    def test_deterministic_with_seed(self, dataset):
        l1 = BatchLoader(dataset, batch_size=2, shuffle=True, seed=7, device_put=False)
        l2 = BatchLoader(dataset, batch_size=2, shuffle=True, seed=7, device_put=False)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(b1.x, b2.x)


def test_loader_buckets_split_on_face_padding(tmp_path):
    """Meshes sharing (n_pad, e_pad) but not the cells bucket must not
    land in one batch: 10x8 (126 cells -> 128) and 11x8 (140 -> 256)
    grids share the 128-node / 512-edge buckets, and a mixed-face batch
    cannot stack (round-5 regression, found by the runbook smoke)."""
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.dataset import synthetic

    h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=2, nx=10, ny=8,
        num_steps=6, meta_path=str(tmp_path / "m.json"),
    )
    ds = H5Dataset(h5, meta, FrameConfig(targets=("velocity",)))
    buckets = {ds.bucket_of(i) for i in range(len(ds))}
    assert len(buckets) == 2, buckets  # face padding differs
    for batch in BatchLoader(ds, 4, shuffle=True, seed=0, device_put=False):
        assert batch.x.ndim == 3  # every batch stacked fine
