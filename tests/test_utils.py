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


def test_throughput_counter():
    from graph_physics_tpu.utils.profiling import Throughput

    t = Throughput(ema=0.0)
    assert t.tick() is None
    import time

    time.sleep(0.01)
    st = t.tick()
    assert st is not None and st > 0
    assert t.graphs_per_sec(16) > 0
