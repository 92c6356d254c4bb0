"""H5 trajectory dataset → padded MeshGraph frames.

Spec: graphphysics/dataset/h5_dataset.py:23-242 + utils/hierarchical.py.
Layout: one h5 group per trajectory, one dataset per field with shape
[T, N, C]; dtype/shape authority is the meta.json ``features`` block.

Re-design notes (TPU): frames of one trajectory share a pinned
(n_pad, e_pad) bucket so the whole dataset compiles a handful of XLA
programs; trajectory arrays are LRU-cached like the reference (:105-118);
there is no torch DataLoader — the loader in
graph_physics_tpu/dataset/loader.py batches same-bucket frames and feeds
the device asynchronously.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from graph_physics_tpu.core import padding
from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.dataset.preprocessing import FrameBuilder, FrameConfig


def read_meta(meta_path: str) -> Dict[str, Any]:
    with open(meta_path) as f:
        return json.load(f)


class H5Dataset:
    def __init__(
        self,
        dataset_path: str,
        meta_path: str,
        frame_config: FrameConfig,
        trajectory_cache_size: int = 8,
        seed: int = 0,
        max_buckets: Optional[int] = None,
    ):
        import h5py

        self.path = dataset_path
        self.meta = read_meta(meta_path)
        self.cfg = frame_config
        self.builder = FrameBuilder(frame_config, self.meta)
        self._h5: Optional[Any] = None
        self._h5py = h5py
        self._cache: "OrderedDict[str, Dict[str, np.ndarray]]" = OrderedDict()
        self._cache_size = trajectory_cache_size
        self._rng = np.random.default_rng(seed)

        with h5py.File(dataset_path, "r") as f:
            self.traj_keys: List[str] = sorted(f.keys(), key=lambda k: (len(k), k))
            # per-trajectory sizes for index math + bucket pinning
            self._traj_nodes = []
            self._traj_len = []
            for k in self.traj_keys:
                shape = f[k]["mesh_pos"].shape
                self._traj_nodes.append(int(shape[-2]) if len(shape) >= 2 else 0)
                dyn = [
                    name
                    for name, ft in self.meta["features"].items()
                    if ft["type"] == "dynamic"
                ]
                self._traj_len.append(int(f[k][dyn[0]].shape[0]))

        # samples per trajectory: need frame+1 for targets; frame>=1 when
        # previous data is used (h5_dataset.py:68-79 semantics)
        self._start = 1 if frame_config.use_previous_data else 0
        self._samples = [max(t - 1 - self._start, 0) for t in self._traj_len]
        self._cum = np.cumsum([0] + self._samples)

        # pin per-trajectory buckets
        self._n_pad: List[int] = []
        self._e_pad: List[int] = []
        self._c_pad: List[int] = []
        for i, k in enumerate(self.traj_keys):
            traj = self._get_trajectory(k)
            n = traj["mesh_pos"].shape[-2]
            cells = traj["cells"][0] if traj["cells"].ndim > 2 else traj["cells"]
            ei = self.builder.mesh_edges(i, cells, n)
            self._n_pad.append(padding.bucket_size(n))
            self._e_pad.append(self.builder.edge_budget_for(ei.shape[1]))
            self._c_pad.append(padding.bucket_size(len(cells)))

    # ------------------------------------------------------------------
    def _file(self):
        if self._h5 is None:
            self._h5 = self._h5py.File(self.path, "r")
        return self._h5

    def _get_trajectory(self, key: str) -> Dict[str, np.ndarray]:
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        g = self._file()[key]
        traj = {}
        for name, ft in self.meta["features"].items():
            data = np.asarray(g[name][()], dtype=ft["dtype"])
            shape = list(ft["shape"])
            traj[name] = data.reshape(shape)
        self._cache[key] = traj
        while len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return traj

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return int(self._cum[-1])

    @property
    def num_trajectories(self) -> int:
        return len(self.traj_keys)

    def indices_for(self, idx: int) -> Tuple[int, int]:
        """flat idx → (trajectory, frame) (spec: dataset.py:110-126)."""
        t = int(np.searchsorted(self._cum, idx, side="right") - 1)
        frame = int(idx - self._cum[t]) + self._start
        return t, frame

    def bucket_of(self, idx: int) -> Tuple[int, int]:
        t, _ = self.indices_for(idx)
        return self._n_pad[t], self._e_pad[t]

    def __getitem__(self, idx: int) -> MeshGraph:
        t, frame = self.indices_for(idx)
        return self.get_frame(t, frame, train=True)

    def get_frame(self, t: int, frame: int, train: bool = True) -> MeshGraph:
        traj = self._get_trajectory(self.traj_keys[t])
        return self.builder.build(
            traj,
            frame,
            traj_index=t,
            rng=self._rng if train else None,
            n_pad=self._n_pad[t],
            e_pad=self._e_pad[t],
            c_pad=self._c_pad[t],
            train=train,
            cache_key=t,
        )

    def trajectory_frames(self, t: int) -> List[MeshGraph]:
        """All rollout frames of trajectory ``t`` (eval: no augmentation)."""
        frames = []
        for frame in range(self._start, self._traj_len[t] - 1):
            frames.append(self.get_frame(t, frame, train=False))
        return frames

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None
