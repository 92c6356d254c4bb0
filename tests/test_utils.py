import os

import numpy as np
import pytest

from graph_physics_tpu.utils.meter import AverageValueMeter


def test_meter_mean_std():
    m = AverageValueMeter()
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        m.add(v)
    mean, std = m.value()
    np.testing.assert_allclose(mean, np.mean(vals))
    np.testing.assert_allclose(std, np.std(vals, ddof=1))
    m.reset()
    assert m.n == 0


def test_meter_weighted():
    m = AverageValueMeter()
    m.add(2.0, n=3)
    m.add(5.0)
    np.testing.assert_allclose(m.mean, (2.0 * 3 + 5.0) / 4)


def test_visualization_renders(tmp_path):
    import jax

    from graph_physics_tpu.training.callback import (
        render_field_comparison,
        render_rollout_animation,
    )
    from graph_physics_tpu.dataset import synthetic

    pos, cells = synthetic.grid_mesh(8, 6)
    vals = synthetic.velocity_field(pos, 0.0)
    png = render_field_comparison(
        pos, cells, vals, vals * 1.1, str(tmp_path / "f.png"), title="test"
    )
    assert os.path.getsize(png) > 1000
    preds = np.stack([synthetic.velocity_field(pos, t * 0.1) for t in range(4)])
    gif = render_rollout_animation(
        pos, cells, preds, preds, str(tmp_path / "r.gif"), fps=2
    )
    assert os.path.getsize(gif) > 1000


def test_vtu_roundtrip(tmp_path):
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.utils.vtu import graph_to_vtu, read_vtu, vtu_to_xdmf
    from tests.helpers import tiny_graph

    g = tiny_graph()
    p = graph_to_vtu(str(tmp_path / "f.vtu"), g)
    pos, cells, pd = read_vtu(p)
    n = int(g.n_node)
    np.testing.assert_allclose(pos[:, :2], np.asarray(g.pos)[:n], atol=1e-6)
    assert "x0" in pd and "y0" in pd
    np.testing.assert_allclose(pd["x0"], np.asarray(g.x)[:n, 0], atol=1e-6)

    # vtu series -> xdmf
    p2 = graph_to_vtu(str(tmp_path / "f2.vtu"), g)
    xdmf = vtu_to_xdmf([p, p2], str(tmp_path / "series.xdmf"), dt=0.5)
    from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesReader

    r = XdmfTimeSeriesReader(xdmf)
    assert len(r) == 2
    _, _, pdx, t1 = r.read_frame(1)
    assert abs(t1 - 0.5) < 1e-9 and "x0" in pdx


def test_throughput_counter():
    from graph_physics_tpu.utils.profiling import Throughput

    t = Throughput(ema=0.0)
    assert t.tick() is None
    import time

    time.sleep(0.01)
    st = t.tick()
    assert st is not None and st > 0
    assert t.graphs_per_sec(16) > 0
