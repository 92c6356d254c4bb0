"""Relative throughput smoke-benchmarks (dataset pipeline + model step).

Mirrors the reference's pytest-benchmark suites
(tests/graphphysics/dataset/test_performance.py:85-97 and
tests/{graphphysics,jraphphysics}/models/test_performance_transformer.py)
— the reference commits no absolute baselines either ("relative
benchmarking only", SURVEY.md §4/§6). These tests time the hot host-side
paths on CPU and assert LOOSE floors that only catch order-of-magnitude
regressions (a 10x slowdown in frame building or the prefetch loader),
never scheduler jitter. Absolute TPU throughput is tracked separately by
bench.py / scripts/bench_models.py against BASELINE.md bars.
"""

import time

import numpy as np
import pytest

from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.dataset.h5_dataset import H5Dataset
from graph_physics_tpu.dataset.loader import BatchLoader
from graph_physics_tpu.dataset.preprocessing import FrameConfig


@pytest.fixture(scope="module")
def h5_workspace(tmp_path_factory):
    w = tmp_path_factory.mktemp("perf")
    train_h5, meta = synthetic.write_h5_dataset(
        str(w / "train.h5"), num_trajectories=2, nx=14, ny=10, num_steps=24,
        meta_path=str(w / "meta.json"),
    )
    return train_h5, meta


def _frames_per_sec(it, n, warmup=3):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    got = 0
    for _ in range(n):
        next(it)
        got += 1
    return got / (time.perf_counter() - t0)


def test_dataset_getitem_throughput(h5_workspace):
    """Frame building (extract -> assemble -> edges -> pad) must sustain
    well over 20 frames/s on a ~140-node mesh (measured ~100-1000/s)."""
    train_h5, meta = h5_workspace
    ds = H5Dataset(train_h5, meta, FrameConfig(targets=("velocity",), khop=1))
    # warm the khop cache like a real epoch does
    _ = ds[0]
    t0 = time.perf_counter()
    n = 40
    for i in range(n):
        _ = ds[i % len(ds)]
    rate = n / (time.perf_counter() - t0)
    assert rate > 20.0, f"frame building collapsed: {rate:.1f} frames/s"


def test_loader_prefetch_throughput(h5_workspace):
    """The prefetch loader must not serialize: batch rate with prefetch
    must beat 5 batches/s on tiny meshes (measured far higher)."""
    train_h5, meta = h5_workspace
    ds = H5Dataset(train_h5, meta, FrameConfig(targets=("velocity",), khop=1))
    loader = BatchLoader(
        ds, batch_size=4, shuffle=True, prefetch=2, device_put=False
    )
    def batches():
        while True:
            yield from loader

    rate = _frames_per_sec(batches(), n=8)
    assert rate > 5.0, f"loader collapsed: {rate:.1f} batches/s"


def test_transformer_step_relative(h5_workspace):
    """Transformer forward throughput, relative guard: the edge-attention
    path on a tiny graph must stay within 50x of the EPD forward (they
    are within ~2-3x when healthy; 50x catches an accidental O(N^2)
    densification or a lost jit cache)."""
    import jax
    import jax.numpy as jnp

    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
    )

    rng = np.random.default_rng(0)
    nx, ny = 12, 9
    xs, ys = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny))
    pos = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
    cells = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            a = j * nx + i
            cells += [[a, a + 1, a + nx], [a + 1, a + nx + 1, a + nx]]
    cells = np.asarray(cells, np.int32)
    ei = mesh_lib.faces_to_edges(cells, len(pos))
    x = rng.normal(size=(len(pos), 7)).astype(np.float32)
    node_type = np.zeros(len(pos), np.int32)
    g = mesh_lib.build_mesh_graph(
        x, pos, node_type, ei, faces=cells, with_edge_features=True
    )
    g = jax.tree.map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, g
    )

    def rate_of(model):
        params = model.init(jax.random.PRNGKey(0), g)
        fwd = jax.jit(lambda p, gg: model.apply(p, gg))
        out = fwd(params, g)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = fwd(params, g)
        jax.block_until_ready(out)
        return n / (time.perf_counter() - t0)

    epd = rate_of(EncodeProcessDecode(
        message_passing_num=2, node_input_size=7, edge_input_size=3,
        output_size=2, hidden_size=32,
    ))
    tf = rate_of(EncodeTransformDecode(
        message_passing_num=2, node_input_size=7, output_size=2,
        hidden_size=32, num_heads=4,
    ))
    assert tf > epd / 50.0, f"transformer collapsed: {tf:.1f}/s vs epd {epd:.1f}/s"
