"""XDMF time-series dataset → padded MeshGraph frames.

Spec: graphphysics/dataset/xdmf_dataset.py:14-193 — a directory of .xdmf
files, one trajectory per file; per sample it reads frame t (features),
t+1 (targets + dynamic non-target ``next_data``) and t−1 (previous data);
triangle/tetra cells. The meshio reader is replaced by the native
:class:`graph_physics_tpu.utils.xdmf.XdmfTimeSeriesReader`. Index math,
bucket pinning and partitioning come from BaseDataset.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np

from graph_physics_tpu.dataset.base import BaseDataset
from graph_physics_tpu.dataset.h5_dataset import read_meta
from graph_physics_tpu.dataset.preprocessing import FrameConfig
from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesReader


class XDMFDataset(BaseDataset):
    def __init__(
        self,
        dataset_dir: str,
        meta_path: str,
        frame_config: FrameConfig,
        seed: int = 0,
        num_partitions: Optional[int] = None,
        max_nodes_per_partition: Optional[int] = None,
    ):
        super().__init__(
            frame_config,
            read_meta(meta_path),
            seed=seed,
            num_partitions=num_partitions,
            max_nodes_per_partition=max_nodes_per_partition,
        )
        self.dir = dataset_dir
        self.files = sorted(glob.glob(os.path.join(dataset_dir, "*.xdmf")))
        if not self.files:
            raise FileNotFoundError(f"no .xdmf files in {dataset_dir}")
        self._traj_cache: Dict[int, Dict[str, np.ndarray]] = {}

        self._traj_len = []
        for f in self.files:
            r = XdmfTimeSeriesReader(f)
            self._traj_len.append(len(r))
            r.close()

        self._setup_index()

    # ------------------------------------------------------------------
    @property
    def num_trajectories(self) -> int:
        return len(self.files)

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
        if traj["mesh_pos"].shape[-1] == 3 and np.allclose(traj["mesh_pos"][..., -1], 0):
            if cells0.shape[1] == 3:
                traj["mesh_pos"] = traj["mesh_pos"][..., :2]
        for name in pd0.keys():
            traj[name] = np.stack([f[2][name] for f in frames])
        if "node_type" not in traj:
            traj["node_type"] = np.zeros((tlen, len(pos0), 1), np.int32)
        else:
            traj["node_type"] = (
                traj["node_type"].reshape(tlen, len(pos0), -1).astype(np.int32)
            )
        if len(self._traj_cache) > 4:
            self._traj_cache.clear()
        self._traj_cache[t] = traj
        return traj
