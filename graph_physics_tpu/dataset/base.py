"""BaseDataset: index math, bucket pinning, partitioning, frame access.

Spec: graphphysics/dataset/dataset.py:21-355 — flat index → (trajectory,
frame, partition) mapping, per-trajectory caches, sub-mesh partitioning.
Subclasses provide ``_trajectory(t) -> field dict`` and trajectory sizes;
everything else (augmentation pipeline, padding, partition slicing) is
shared.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from graph_physics_tpu.core import padding
from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.dataset.partition import PartitionCache
from graph_physics_tpu.dataset.preprocessing import FrameBuilder, FrameConfig


class BaseDataset:
    def __init__(
        self,
        frame_config: FrameConfig,
        meta: Dict[str, Any],
        seed: int = 0,
        num_partitions: Optional[int] = None,
        max_nodes_per_partition: Optional[int] = None,
    ):
        self.meta = meta
        self.cfg = frame_config
        self.builder = FrameBuilder(frame_config, meta)
        self._rng = np.random.default_rng(seed)
        self._partitions: Optional[PartitionCache] = None
        if num_partitions or max_nodes_per_partition:
            self._partitions = PartitionCache(num_partitions, max_nodes_per_partition)

        # subclasses fill these in _setup_index()
        self._traj_len: List[int] = []
        self._traj_parts: List[int] = []
        self._n_pad: List[int] = []
        self._e_pad: List[int] = []
        self._c_pad: List[Optional[int]] = []
        self._start = 1 if frame_config.use_previous_data else 0

    # ------------------------------------------------------------------
    # subclass interface
    def _trajectory(self, t: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    @property
    def num_trajectories(self) -> int:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _setup_index(self) -> None:
        """Pin buckets + index map; call at the end of subclass __init__."""
        self._n_pad, self._e_pad, self._c_pad, self._traj_parts = [], [], [], []
        for t in range(self.num_trajectories):
            traj = self._trajectory(t)
            pos = traj["mesh_pos"][0] if traj["mesh_pos"].ndim > 2 else traj["mesh_pos"]
            n = pos.shape[0]
            cells = traj["cells"][0] if traj["cells"].ndim > 2 else traj["cells"]
            ei = self.builder.mesh_edges(t, cells, n)
            if self._partitions is not None:
                parts, subs = self._partitions.parts_for(t, pos, ei)
                self._traj_parts.append(len(parts))
                max_part_n = max(len(p) for p in parts)
                max_part_e = max(s[0].shape[1] for s in subs)
                self._n_pad.append(padding.bucket_size(max_part_n))
                self._e_pad.append(
                    self.builder.edge_budget_for(max_part_e)
                )
                self._c_pad.append(None)
            else:
                self._traj_parts.append(1)
                self._n_pad.append(padding.bucket_size(n))
                self._e_pad.append(self.builder.edge_budget_for(ei.shape[1]))
                self._c_pad.append(padding.bucket_size(len(cells)))
        self._samples = [
            max(tl - 1 - self._start, 0) * p
            for tl, p in zip(self._traj_len, self._traj_parts)
        ]
        self._cum = np.cumsum([0] + self._samples)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return int(self._cum[-1])

    def indices_for(self, idx: int) -> Tuple[int, int, int]:
        """flat idx → (trajectory, frame, partition) (dataset.py:110-170)."""
        t = int(np.searchsorted(self._cum, idx, side="right") - 1)
        rem = int(idx - self._cum[t])
        parts = self._traj_parts[t]
        frame = rem // parts + self._start
        part = rem % parts
        return t, frame, part

    def bucket_of(self, idx: int) -> Tuple[int, int, Optional[int]]:
        """Static-shape bucket of a sample — the loader batches ONLY
        within one bucket. Includes the cells bucket: the face padding
        moves independently of (n_pad, e_pad) (e.g. 126 vs 140 cells on
        meshes that share node/edge buckets), and a mixed-face batch
        cannot stack."""
        t, _, _ = self.indices_for(idx)
        return self._n_pad[t], self._e_pad[t], self._c_pad[t]

    def __getitem__(self, idx: int) -> MeshGraph:
        t, frame, part = self.indices_for(idx)
        return self.get_frame(t, frame, part=part, train=True)

    def get_frame(
        self, t: int, frame: int, part: int = 0, train: bool = True
    ) -> MeshGraph:
        traj = self._trajectory(t)
        part_ids = None
        if self._partitions is not None:
            pos = traj["mesh_pos"][0] if traj["mesh_pos"].ndim > 2 else traj["mesh_pos"]
            cells = traj["cells"][0] if traj["cells"].ndim > 2 else traj["cells"]
            ei = self.builder.mesh_edges(t, cells, pos.shape[0])
            parts, _ = self._partitions.parts_for(t, pos, ei)
            part_ids = parts[part]
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
            part_ids=part_ids,
        )

    def get_frames_packed(
        self, idxs, train: bool = True
    ) -> Optional[MeshGraph]:
        """Whole same-trajectory batch → half-packed MeshGraph, vectorized.

        The packed loader's fast lane: one ``FrameBuilder.build_packed``
        call instead of B per-frame builds + a host interleave. Returns
        None whenever the vectorized regime doesn't hold (mixed
        trajectories/partitions, sub-mesh partitions, masking, no
        skeleton yet, ...) — the caller falls back to the per-frame path.
        """
        if self._partitions is not None:
            return None
        tfp = [self.indices_for(int(i)) for i in idxs]
        t0 = tfp[0][0]
        if any(t != t0 or p != 0 for t, _, p in tfp):
            return None
        return self.builder.build_packed(
            self._trajectory(t0),
            np.asarray([f for _, f, _ in tfp], np.int64),
            traj_index=t0,
            n_pad=self._n_pad[t0],
            e_pad=self._e_pad[t0],
            c_pad=self._c_pad[t0],
            train=train,
            cache_key=t0,
        )

    def trajectory_frames(self, t: int, part: int = 0) -> List[MeshGraph]:
        """All rollout frames of trajectory ``t`` (eval: no augmentation)."""
        return [
            self.get_frame(t, f, part=part, train=False)
            for f in range(self._start, self._traj_len[t] - 1)
        ]
