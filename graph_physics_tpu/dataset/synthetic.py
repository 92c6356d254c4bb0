"""Deterministic synthetic trajectories — test fixtures + benchmarks.

The reference commits binary mesh fixtures (tests/mock_vtu/*, mock_h5/*);
we instead generate small CylinderFlow-like trajectories procedurally
(SURVEY.md §4 recommends deterministic generation over committed blobs):
a triangulated rectangle with an analytic divergence-free-ish velocity
field evolving smoothly in time, with INFLOW/OUTFLOW/WALL node types.

``write_h5_dataset`` emits the reference's h5 trajectory layout
(one group per trajectory, one dataset per field, shapes [T, N, C];
spec: graphphysics/utils/hierarchical.py:25-133 + dataset_config/
cylinder_meta.json) so the real loaders can be tested end-to-end.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from graph_physics_tpu.core.nodetype import NodeType


def grid_mesh(nx: int = 12, ny: int = 8, lx: float = 1.6, ly: float = 0.4):
    """Structured triangulated rectangle: returns (pos [N,2], cells [C,3])."""
    xs = np.linspace(0.0, lx, nx)
    ys = np.linspace(0.0, ly, ny)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    pos = np.stack([xx.ravel(), yy.ravel()], axis=-1).astype(np.float32)
    cells = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = (i + 1) * ny + j + 1
            d = i * ny + j + 1
            cells.append([a, b, c])
            cells.append([a, c, d])
    return pos, np.asarray(cells, dtype=np.int32)


def node_types_for(pos: np.ndarray, lx: float = 1.6, ly: float = 0.4) -> np.ndarray:
    t = np.full(pos.shape[0], int(NodeType.NORMAL), dtype=np.int32)
    eps = 1e-6
    t[np.abs(pos[:, 1]) < eps] = int(NodeType.WALL_BOUNDARY)
    t[np.abs(pos[:, 1] - ly) < eps] = int(NodeType.WALL_BOUNDARY)
    t[np.abs(pos[:, 0]) < eps] = int(NodeType.INFLOW)
    t[np.abs(pos[:, 0] - lx) < eps] = int(NodeType.OUTFLOW)
    return t


def velocity_field(pos: np.ndarray, t: float) -> np.ndarray:
    """Smooth analytic 2D velocity evolving in time (deterministic)."""
    x, y = pos[:, 0], pos[:, 1]
    u = 1.0 + 0.3 * np.sin(2 * np.pi * (x - 0.5 * t)) * np.cos(np.pi * y)
    v = 0.2 * np.cos(2 * np.pi * (x - 0.5 * t)) * np.sin(np.pi * y)
    return np.stack([u, v], axis=-1).astype(np.float32)


def make_trajectory(
    nx: int = 12,
    ny: int = 8,
    num_steps: int = 12,
    dt: float = 0.01,
) -> Dict[str, np.ndarray]:
    """One trajectory dict in the reference h5 field layout ([T,N,C])."""
    pos, cells = grid_mesh(nx, ny)
    types = node_types_for(pos)
    tlen = num_steps
    vel = np.stack(
        [velocity_field(pos, k * dt) for k in range(tlen)], axis=0
    )  # [T, N, 2]
    return {
        "cells": np.repeat(cells[None], tlen, axis=0).astype(np.int32),
        "mesh_pos": np.repeat(pos[None], tlen, axis=0).astype(np.float32),
        "node_type": np.repeat(types[None, :, None], tlen, axis=0).astype(np.int32),
        "velocity": vel.astype(np.float32),
    }


def make_plate_trajectory(
    nx: int = 8,
    ny: int = 6,
    num_steps: int = 8,
    dt: float = 0.01,
) -> Dict[str, np.ndarray]:
    """DeformingPlate-like Lagrangian trajectory (world_pos target).

    A deformable sheet (NORMAL nodes, one HANDLE edge) rests at z=0 while
    a rigid OBSTACLE bar descends towards it — exercises world-edge
    discovery between OBSTACLE and NORMAL nodes within a radius
    (reference plate.json + preprocessing.py:92-140 semantics).
    """
    pos2d, cells = grid_mesh(nx, ny, 1.0, 0.6)
    n_sheet = len(pos2d)
    sheet = np.concatenate([pos2d, np.zeros((n_sheet, 1))], axis=1)

    # obstacle bar: a line of nodes above the sheet center, moving down
    n_obs = 6
    obs_x = np.linspace(0.3, 0.7, n_obs)
    obs0 = np.stack([obs_x, np.full(n_obs, 0.3), np.full(n_obs, 0.08)], axis=1)

    pos = np.concatenate([sheet, obs0]).astype(np.float32)
    n = len(pos)
    types = np.full(n, int(NodeType.NORMAL), np.int32)
    types[:n_sheet][np.abs(pos2d[:, 0]) < 1e-6] = int(NodeType.HANDLE)
    types[n_sheet:] = int(NodeType.OBSTACLE)

    world = np.zeros((num_steps, n, 3), np.float32)
    for k in range(num_steps):
        w = pos.copy()
        drop = 0.01 * k
        w[n_sheet:, 2] -= drop  # obstacle descends
        # sheet deflects where the obstacle is close
        d = np.linalg.norm(
            pos[:n_sheet, None, :2] - w[None, n_sheet:, :2], axis=-1
        ).min(axis=1)
        deflect = np.clip(0.08 - drop - d * 0.2, a_min=None, a_max=0.0)
        w[:n_sheet, 2] += np.where(d < 0.2, deflect * 0.5, 0.0)
        world[k] = w

    # cells cover only the sheet (obstacle nodes are isolated in the mesh
    # graph and connect through world edges only)
    return {
        "cells": np.repeat(cells[None], num_steps, axis=0).astype(np.int32),
        "mesh_pos": np.repeat(pos[None], num_steps, axis=0).astype(np.float32),
        "node_type": np.repeat(types[None, :, None], num_steps, axis=0).astype(np.int32),
        "world_pos": world,
    }


def write_plate_h5_dataset(
    path: str,
    num_trajectories: int = 2,
    nx: int = 8,
    ny: int = 6,
    num_steps: int = 8,
    dt: float = 0.01,
    meta_path: Optional[str] = None,
) -> Tuple[str, str]:
    """Plate-style dataset + meta.json (3D world_pos dynamic target)."""
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        for i in range(num_trajectories):
            traj = make_plate_trajectory(nx + i, ny, num_steps, dt)
            g = f.create_group(str(i))
            for k, v in traj.items():
                g.create_dataset(k, data=v)
    meta = {
        "dt": dt,
        "features": {
            "cells": {"type": "static", "shape": [num_steps, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [num_steps, -1, 3], "dtype": "float32"},
            "node_type": {"type": "static", "shape": [num_steps, -1, 1], "dtype": "int32"},
            "world_pos": {"type": "dynamic", "shape": [num_steps, -1, 3], "dtype": "float32"},
        },
        "field_names": ["cells", "mesh_pos", "node_type", "world_pos"],
        "trajectory_length": num_steps,
    }
    meta_path = meta_path or os.path.join(os.path.dirname(path) or ".", "plate_meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return path, meta_path


def meta_dict(num_steps: int, dt: float = 0.01) -> Dict:
    """meta.json matching dataset_config/cylinder_meta.json's schema."""
    def feat(name, typ, c, dtype):
        return {
            "type": typ,
            "shape": [num_steps, -1, c],
            "dtype": dtype,
        }

    return {
        "dt": dt,
        "features": {
            "cells": feat("cells", "static", 3, "int32"),
            "mesh_pos": feat("mesh_pos", "static", 2, "float32"),
            "node_type": feat("node_type", "static", 1, "int32"),
            "velocity": feat("velocity", "dynamic", 2, "float32"),
        },
        "field_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "trajectory_length": num_steps,
    }


def write_h5_dataset(
    path: str,
    num_trajectories: int = 2,
    nx: int = 12,
    ny: int = 8,
    num_steps: int = 12,
    dt: float = 0.01,
    meta_path: Optional[str] = None,
) -> Tuple[str, str]:
    """Write trajectories + meta.json; returns (h5_path, meta_path)."""
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        for i in range(num_trajectories):
            # vary mesh size slightly per trajectory to exercise bucketing
            traj = make_trajectory(nx + i, ny, num_steps, dt)
            g = f.create_group(str(i))
            for k, v in traj.items():
                g.create_dataset(k, data=v)
    meta_path = meta_path or os.path.join(os.path.dirname(path) or ".", "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta_dict(num_steps, dt), f)
    return path, meta_path
