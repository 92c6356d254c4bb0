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


# ----------------------------------------------------------------------
# canonical-workload fixtures (training_config/*.json e2e matrix)
# ----------------------------------------------------------------------

def make_aneurysm_trajectory(
    nx: int = 7,
    ny: int = 6,
    num_steps: int = 6,
    dt: float = 0.01,
) -> Dict[str, np.ndarray]:
    """Aneurysm-meta-shaped trajectory (dataset_config/aneurysm_meta.json):
    3D tri mesh, dynamic Vitesse [N,3], static wall_mask [N,1].

    Geometry exercises the external aneurysm builder's node-typing
    (external/aneurysm.py): inlet plane at y=0 (INFLOW where x<=0,
    OUTFLOW where x>=0), wall_mask=1 on the lateral boundaries.
    """
    xs = np.linspace(-0.5, 0.5, nx)
    ys = np.linspace(0.0, 1.0, ny)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    zz = 0.05 * np.sin(np.pi * yy) * np.cos(np.pi * xx)  # gentle 3D bulge
    pos = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1).astype(np.float32)
    _, cells = grid_mesh(nx, ny)  # same index topology

    wall = ((np.abs(pos[:, 0] - xs[0]) < 1e-6) | (np.abs(pos[:, 0] - xs[-1]) < 1e-6))
    # inlet-plane nodes are typed by the builder, not walls
    wall &= pos[:, 1] > 1e-6
    wall_mask = wall.astype(np.float32)[:, None]

    def vitesse(t):
        u = 0.1 * np.sin(2 * np.pi * (pos[:, 1] - t)) * pos[:, 0]
        v = 1.0 + 0.4 * np.cos(2 * np.pi * t) * (1.0 - np.abs(pos[:, 0]))
        w = 0.05 * np.sin(np.pi * pos[:, 1] + 4 * t)
        out = np.stack([u, v, w], -1).astype(np.float32)
        out[wall] = 0.0
        return out

    vel = np.stack([vitesse(k * dt) for k in range(num_steps)], 0)
    return {
        "cells": np.repeat(cells[None], num_steps, 0).astype(np.int32),
        "mesh_pos": np.repeat(pos[None], num_steps, 0).astype(np.float32),
        "Vitesse": vel,
        "wall_mask": np.repeat(wall_mask[None], num_steps, 0).astype(np.float32),
    }


def make_panels_trajectory(
    nx: int = 7,
    ny: int = 6,
    num_steps: int = 6,
    dt: float = 0.2,
) -> Dict[str, np.ndarray]:
    """Panels-meta-shaped trajectory (dataset_config/panels_meta.json):
    3D tri mesh, dynamic Vitesse [N,3] + Pression [N,1], static
    LevelSetObject + NodeType fields (external/panels.py layout)."""
    pos2d, cells = grid_mesh(nx, ny, 1.0, 1.0)
    pos = np.concatenate([pos2d, np.zeros((len(pos2d), 1), np.float32)], -1)
    types = np.full(len(pos), int(NodeType.NORMAL), np.float32)
    types[np.abs(pos[:, 0]) < 1e-6] = float(NodeType.INFLOW)
    types[np.abs(pos[:, 0] - 1.0) < 1e-6] = float(NodeType.OUTFLOW)
    types[(np.abs(pos[:, 1]) < 1e-6) | (np.abs(pos[:, 1] - 1.0) < 1e-6)] = float(
        NodeType.WALL_BOUNDARY
    )
    levelset = (
        np.linalg.norm(pos[:, :2] - np.array([0.5, 0.5]), axis=-1) < 0.25
    ).astype(np.float32)

    def fields(t):
        u = 1.0 + 0.2 * np.sin(2 * np.pi * (pos[:, 0] - 0.3 * t))
        v = 0.1 * np.cos(2 * np.pi * (pos[:, 1] - 0.3 * t))
        p = 0.5 * np.cos(np.pi * pos[:, 0]) * np.cos(np.pi * t)
        return (
            np.stack([u, v, np.zeros_like(u)], -1).astype(np.float32),
            p.astype(np.float32)[:, None],
        )

    vels, press = zip(*[fields(k * dt) for k in range(num_steps)])
    rep = lambda a: np.repeat(a[None], num_steps, 0)
    return {
        "cells": rep(cells).astype(np.int32),
        "mesh_pos": rep(pos).astype(np.float32),
        "Vitesse": np.stack(vels, 0),
        "Pression": np.stack(press, 0),
        "LevelSetObject": rep(levelset[:, None]).astype(np.float32),
        "NodeType": rep(types[:, None]).astype(np.float32),
    }


def make_plate_tet_trajectory(
    nx: int = 4,
    ny: int = 3,
    nz: int = 2,
    num_steps: int = 6,
) -> Dict[str, np.ndarray]:
    """DeformingPlate-meta-shaped trajectory (dataset_config/
    plate_meta.json): TETRAHEDRAL cells [C,4], dynamic world_pos [N,3],
    plus isolated OBSTACLE nodes that descend into world-edge range."""
    xs = np.linspace(0.0, 1.0, nx)
    ys = np.linspace(0.0, 0.6, ny)
    zs = np.linspace(0.0, 0.1, nz)
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
    bar = grid.reshape(-1, 3).astype(np.float32)

    def vid(i, j, k):
        return (i * ny + j) * nz + k

    # 6-tet decomposition of each cube
    tets = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                c = [
                    vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
                    vid(i + 1, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
                    vid(i, j + 1, k + 1), vid(i + 1, j + 1, k + 1),
                ]
                for t in ((0, 1, 3, 7), (0, 1, 7, 5), (0, 5, 7, 4),
                          (0, 3, 2, 7), (0, 2, 6, 7), (0, 6, 4, 7)):
                    tets.append([c[t[0]], c[t[1]], c[t[2]], c[t[3]]])
    tets = np.asarray(tets, np.int32)

    n_bar = len(bar)
    n_obs = 4
    obs = np.stack([
        np.linspace(0.35, 0.65, n_obs),
        np.full(n_obs, 0.3),
        np.full(n_obs, 0.16),
    ], -1).astype(np.float32)
    pos = np.concatenate([bar, obs])
    types = np.full(len(pos), int(NodeType.NORMAL), np.int32)
    types[:n_bar][np.abs(bar[:, 0]) < 1e-6] = int(NodeType.HANDLE)
    types[n_bar:] = int(NodeType.OBSTACLE)

    world = np.zeros((num_steps, len(pos), 3), np.float32)
    for k in range(num_steps):
        w = pos.copy()
        w[n_bar:, 2] -= 0.01 * k  # obstacle descends toward the bar top
        d = np.linalg.norm(bar[:, None, :2] - w[None, n_bar:, :2], axis=-1).min(1)
        press = np.clip(0.16 - 0.01 * k - 0.1, None, 0.0)
        w[:n_bar, 2] += np.where(d < 0.25, press * 0.3, 0.0)
        world[k] = w

    rep = lambda a: np.repeat(a[None], num_steps, 0)
    return {
        "cells": rep(tets).astype(np.int32),
        "node_type": rep(types[:, None]).astype(np.int32),
        "mesh_pos": rep(pos).astype(np.float32),
        "world_pos": world,
    }


def write_workload_fixture(
    workload: str,
    out_dir: str,
    num_trajectories: int = 1,
    num_steps: int = 6,
    size: Optional[Tuple[int, ...]] = None,
) -> Tuple[str, str, str]:
    """Fabricate a dataset matching one canonical workload's meta schema.

    ``workload`` ∈ {cylinder, plate, aneurysm, panels}. Returns
    (train_path, test_path, meta_path) ready to drop into the
    corresponding training_config JSON. h5 workloads write one file with
    all trajectories; xdmf workloads write one series per trajectory in
    train/ and test/ subdirectories. ``size`` overrides the default tiny
    grid dimensions — (nx, ny) for the grid workloads, (nx, ny, nz) for
    the tet plate — e.g. for throughput benches at representative mesh
    sizes (scripts/bench_canonical.py).
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "meta.json")

    if workload == "cylinder":
        cnx, cny = size or (7, 5)
        train, _ = write_h5_dataset(
            os.path.join(out_dir, "train.h5"), num_trajectories, nx=cnx,
            ny=cny, num_steps=num_steps, meta_path=meta_path,
        )
        test, _ = write_h5_dataset(
            os.path.join(out_dir, "test.h5"), 1, nx=cnx, ny=cny,
            num_steps=num_steps, meta_path=os.path.join(out_dir, "_m.json"),
        )
        return train, test, meta_path

    import h5py

    if workload == "plate":
        feats = {
            "cells": ("static", 4, "int32"),
            "node_type": ("static", 1, "int32"),
            "mesh_pos": ("static", 3, "float32"),
            "world_pos": ("dynamic", 3, "float32"),
        }
        meta = {
            "dt": 0,
            "trajectory_length": num_steps,
            "field_names": list(feats),
            "features": {
                k: {"type": t, "shape": [num_steps, -1, c], "dtype": d}
                for k, (t, c, d) in feats.items()
            },
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        for split, n in (("train.h5", num_trajectories), ("test.h5", 1)):
            with h5py.File(os.path.join(out_dir, split), "w") as f:
                for i in range(n):
                    pnx, pny, pnz = size or (4, 3, 2)
                    traj = make_plate_tet_trajectory(
                        pnx + i, pny, pnz, num_steps
                    )
                    g = f.create_group(str(i))
                    for k, v in traj.items():
                        g.create_dataset(k, data=v)
        return (
            os.path.join(out_dir, "train.h5"),
            os.path.join(out_dir, "test.h5"),
            meta_path,
        )

    # xdmf workloads
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesWriter

    make = {"aneurysm": make_aneurysm_trajectory, "panels": make_panels_trajectory}[
        workload
    ]
    dt = 0.01 if workload == "aneurysm" else 0.2
    meta = {
        "dt": dt,
        "trajectory_length": num_steps,
        "features": {},
        "field_names": [],
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    for split, n in (("train", num_trajectories), ("test", 1)):
        d = os.path.join(out_dir, split)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            gnx, gny = size or (7, 6)
            traj = make(gnx + i, gny, num_steps, dt)
            w = XdmfTimeSeriesWriter(os.path.join(d, f"traj_{i}.xdmf"))
            point_fields = [
                k for k in traj.keys() if k not in ("cells", "mesh_pos")
            ]
            for s in range(num_steps):
                w.append(
                    traj["mesh_pos"][s],
                    traj["cells"][s],
                    {k: traj[k][s].astype(np.float64) for k in point_fields},
                    s * dt,
                )
    return os.path.join(out_dir, "train"), os.path.join(out_dir, "test"), meta_path
