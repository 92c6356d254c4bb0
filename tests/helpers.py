"""Shared test fixtures: tiny synthetic graphs."""

import numpy as np

from graph_physics_tpu.core import mesh
from graph_physics_tpu.dataset import synthetic


def tiny_graph(nx=6, ny=5, frame=0, num_steps=8, dt=0.01, n_pad=None, e_pad=None):
    """CylinderFlow-like frame as a padded MeshGraph.

    x layout matches the reference contract: [velocity(2), node_type, time];
    y = next-frame velocity.
    """
    traj = synthetic.make_trajectory(nx, ny, num_steps, dt)
    pos = traj["mesh_pos"][0]
    cells = traj["cells"][0]
    nt = traj["node_type"][0, :, 0]
    vel = traj["velocity"][frame]
    vel_next = traj["velocity"][frame + 1]
    time_col = np.full((len(pos), 1), frame * dt, np.float32)
    x = np.concatenate([vel, nt[:, None].astype(np.float32), time_col], axis=-1)
    ei = mesh.faces_to_edges(cells, len(pos))
    return mesh.build_mesh_graph(
        x, pos, nt, ei, y=vel_next, faces=cells, n_pad=n_pad, e_pad=e_pad, time=frame * dt
    )


def to_jax(graph):
    import jax

    return jax.tree.map(lambda a: a, graph)


def stack_graphs(graphs):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *graphs)
