"""H5 trajectory dataset → padded MeshGraph frames.

Spec: graphphysics/dataset/h5_dataset.py:23-242 + utils/hierarchical.py.
Layout: one h5 group per trajectory, one dataset per field with shape
[T, N, C]; dtype/shape authority is the meta.json ``features`` block.

Re-design notes (TPU): frames of one trajectory share a pinned
(n_pad, e_pad) bucket so the whole dataset compiles a handful of XLA
programs; trajectory arrays are LRU-cached like the reference (:105-118);
batching lives in graph_physics_tpu/dataset/loader.py. Partitioning
(Cluster-GCN sub-meshes) comes from BaseDataset.
"""

from __future__ import annotations

import json
import threading
from collections import OrderedDict
from typing import Any, Dict, List, Optional

import numpy as np

from graph_physics_tpu.dataset.base import BaseDataset
from graph_physics_tpu.dataset.preprocessing import FrameConfig


def read_meta(meta_path: str) -> Dict[str, Any]:
    with open(meta_path) as f:
        return json.load(f)


class H5Dataset(BaseDataset):
    def __init__(
        self,
        dataset_path: str,
        meta_path: str,
        frame_config: FrameConfig,
        trajectory_cache_size: int = 8,
        seed: int = 0,
        num_partitions: Optional[int] = None,
        max_nodes_per_partition: Optional[int] = None,
    ):
        import h5py

        super().__init__(
            frame_config,
            read_meta(meta_path),
            seed=seed,
            num_partitions=num_partitions,
            max_nodes_per_partition=max_nodes_per_partition,
        )
        self.path = dataset_path
        self._h5: Optional[Any] = None
        self._h5py = h5py
        self._cache: "OrderedDict[str, Dict[str, np.ndarray]]" = OrderedDict()
        self._cache_size = trajectory_cache_size
        # h5py is not thread-safe; the prefetch thread (loader) and the
        # main thread (validation rollouts) may both read — serialize.
        # (The reference works around this with per-worker file handles,
        # h5_dataset.py:96-103.)
        self._lock = threading.Lock()

        with h5py.File(dataset_path, "r") as f:
            self.traj_keys: List[str] = sorted(f.keys(), key=lambda k: (len(k), k))
            dyn = [
                name
                for name, ft in self.meta["features"].items()
                if ft["type"] == "dynamic"
            ]
            self._traj_len = [int(f[k][dyn[0]].shape[0]) for k in self.traj_keys]

        self._setup_index()

    # ------------------------------------------------------------------
    @property
    def num_trajectories(self) -> int:
        return len(self.traj_keys)

    def _file(self):
        if self._h5 is None:
            self._h5 = self._h5py.File(self.path, "r")
        return self._h5

    def _trajectory(self, t: int) -> Dict[str, np.ndarray]:
        key = self.traj_keys[t]
        with self._lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                return self._cache[key]
            g = self._file()[key]
            traj = {}
            for name, ft in self.meta["features"].items():
                data = np.asarray(g[name][()], dtype=ft["dtype"])
                traj[name] = data.reshape(list(ft["shape"]))
            self._cache[key] = traj
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
            return traj

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None
