"""Golden-output regression fixtures (SURVEY.md §4 recommendation).

Deterministic tiny-graph forwards with PRNGKey(0) parameters, checked
against committed golden values. Catches silent numerical regressions in
the layer zoo / simulator composition. Regenerate with:

    python tests/test_golden.py regenerate
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_values.json")


def _cases():
    from graph_physics_tpu.models.processors import (
        EncodeProcessDecode,
        EncodeTransformDecode,
        TransolverProcessor,
    )
    from graph_physics_tpu.models.simulator import Simulator
    from tests.helpers import tiny_graph

    g = jax.tree.map(jnp.asarray, tiny_graph(nx=5, ny=4, n_pad=128, e_pad=256))

    def sim_for(model, edge_in):
        return Simulator(11, edge_in, 2, 0, 2, 0, 2, 2, model)

    cases = {}
    cases["epd"] = sim_for(
        EncodeProcessDecode(
            message_passing_num=2, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=16,
        ),
        3,
    )
    cases["transformer"] = sim_for(
        EncodeTransformDecode(
            message_passing_num=2, node_input_size=11, output_size=2,
            hidden_size=16, num_heads=4,
        ),
        0,
    )
    cases["transolver"] = sim_for(
        TransolverProcessor(
            message_passing_num=2, node_input_size=11, output_size=2,
            hidden_size=16, num_heads=2, slice_num=4,
        ),
        0,
    )
    return g, cases


def _fingerprint(sim, g):
    params = sim.init_params(jax.random.PRNGKey(0), g)
    out = sim.forward(params, sim.init_state(), g, is_training=False)
    net = np.asarray(out.net_out, dtype=np.float64)
    valid = np.asarray(g.node_mask)
    v = net[valid]
    return {
        "sum": float(v.sum()),
        "abs_sum": float(np.abs(v).sum()),
        "first_row": [float(x) for x in v[0]],
        "last_row": [float(x) for x in v[-1]],
    }


def regenerate():
    g, cases = _cases()
    golden = {name: _fingerprint(sim, g) for name, sim in cases.items()}
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=2)
    print(f"wrote {GOLDEN_PATH}")


@pytest.mark.parametrize("name", ["epd", "transformer", "transolver"])
def test_golden(name):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("no golden file; run `python tests/test_golden.py regenerate`")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    g, cases = _cases()
    got = _fingerprint(cases[name], g)
    want = golden[name]
    np.testing.assert_allclose(got["sum"], want["sum"], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(got["abs_sum"], want["abs_sum"], rtol=2e-3)
    np.testing.assert_allclose(got["first_row"], want["first_row"], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(got["last_row"], want["last_row"], rtol=2e-3, atol=1e-4)


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        regenerate()
