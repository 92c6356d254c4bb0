"""XDMF time-series dataset → padded MeshGraph frames.

Spec: graphphysics/dataset/xdmf_dataset.py:14-193 — a directory of .xdmf
files, one trajectory per file; per sample it reads frame t (features),
t+1 (targets + dynamic non-target ``next_data``) and t−1 (previous data);
triangle/tetra cells. The meshio reader is replaced by the native
:class:`graph_physics_tpu.utils.xdmf.XdmfTimeSeriesReader`.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from graph_physics_tpu.core import padding
from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.dataset.h5_dataset import read_meta
from graph_physics_tpu.dataset.preprocessing import FrameBuilder, FrameConfig
from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesReader


class XDMFDataset:
    def __init__(
        self,
        dataset_dir: str,
        meta_path: str,
        frame_config: FrameConfig,
        seed: int = 0,
    ):
        self.dir = dataset_dir
        self.meta = read_meta(meta_path)
        self.cfg = frame_config
        self.builder = FrameBuilder(frame_config, self.meta)
        self._rng = np.random.default_rng(seed)

        self.files: List[str] = sorted(glob.glob(os.path.join(dataset_dir, "*.xdmf")))
        if not self.files:
            raise FileNotFoundError(f"no .xdmf files in {dataset_dir}")
        self._readers: Dict[int, XdmfTimeSeriesReader] = {}
        self._traj_cache: Dict[int, Dict[str, np.ndarray]] = {}

        self._traj_len = []
        for f in self.files:
            r = XdmfTimeSeriesReader(f)
            self._traj_len.append(len(r))
            r.close()

        self._start = 1 if frame_config.use_previous_data else 0
        self._samples = [max(t - 1 - self._start, 0) for t in self._traj_len]
        self._cum = np.cumsum([0] + self._samples)

        # pin buckets from frame 0 of each file
        self._n_pad, self._e_pad, self._c_pad = [], [], []
        for t in range(len(self.files)):
            traj = self._trajectory(t)
            n = traj["mesh_pos"].shape[-2]
            cells = traj["cells"][0] if traj["cells"].ndim > 2 else traj["cells"]
            ei = self.builder.mesh_edges(t, cells, n)
            self._n_pad.append(padding.bucket_size(n))
            self._e_pad.append(self.builder.edge_budget_for(ei.shape[1]))
            self._c_pad.append(padding.bucket_size(len(cells)))

    # ------------------------------------------------------------------
    def _trajectory(self, t: int) -> Dict[str, np.ndarray]:
        """Load a whole trajectory into the h5-style field dict.

        node_type is taken from a 'node_type' point field when present,
        else all-NORMAL (use-case builders typically derive it —
        external/*, spec: aneurysm.py:9-26).
        """
        if t in self._traj_cache:
            return self._traj_cache[t]
        r = XdmfTimeSeriesReader(self.files[t])
        frames = [r.read_frame(i) for i in range(len(r))]
        r.close()
        pos0, cells0, pd0, _ = frames[0]
        tlen = len(frames)
        traj: Dict[str, np.ndarray] = {
            "mesh_pos": np.stack([f[0][:, : pos0.shape[1]] for f in frames]),
            "cells": np.stack([f[1] for f in frames]),
        }
        # drop padded z column for genuinely-2D meshes
        if np.allclose(traj["mesh_pos"][..., -1], 0) and traj["mesh_pos"].shape[-1] == 3:
            if (cells0.shape[1] == 3):
                traj["mesh_pos"] = traj["mesh_pos"][..., :2]
        for name in pd0.keys():
            traj[name] = np.stack([f[2][name] for f in frames])
        if "node_type" not in traj:
            traj["node_type"] = np.zeros((tlen, len(pos0), 1), np.int32)
        else:
            traj["node_type"] = traj["node_type"].reshape(tlen, len(pos0), -1).astype(np.int32)
        if len(self._traj_cache) > 4:
            self._traj_cache.clear()
        self._traj_cache[t] = traj
        return traj

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return int(self._cum[-1])

    @property
    def num_trajectories(self) -> int:
        return len(self.files)

    def indices_for(self, idx: int) -> Tuple[int, int]:
        t = int(np.searchsorted(self._cum, idx, side="right") - 1)
        return t, int(idx - self._cum[t]) + self._start

    def bucket_of(self, idx: int) -> Tuple[int, int]:
        t, _ = self.indices_for(idx)
        return self._n_pad[t], self._e_pad[t]

    def __getitem__(self, idx: int) -> MeshGraph:
        t, frame = self.indices_for(idx)
        return self.get_frame(t, frame, train=True)

    def get_frame(self, t: int, frame: int, train: bool = True) -> MeshGraph:
        traj = self._trajectory(t)
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
        return [
            self.get_frame(t, f, train=False)
            for f in range(self._start, self._traj_len[t] - 1)
        ]
