"""End-to-end Simulator parity against the actual reference PyTorch code.

Wraps the SAME EncodeProcessDecode weights in both frameworks' Simulator
(reference models/simulator.py:13-275 vs graph_physics_tpu/models/
simulator.py) and drives the full normalize → model → denormalize
contract through two TRAINING frames (running statistics accumulating)
and one EVAL frame, asserting agreement of:

* net_out and the normalized Δ target each training step,
* every normalizer's internal statistics (count / num_accumulations /
  sum / sum-of-squares) after accumulation — this also proves our
  mask-aware statistics are EXACT under padding (padded rows contribute
  nothing, matching the reference's unpadded arrays),
* the eval-mode physical outputs (inverse-normalized Δ + pre-target,
  reference simulator.py:178-191).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_stub import REF_ROOT, install_reference

if not os.path.isdir(os.path.join(REF_ROOT, "graphphysics")):
    pytest.skip("reference tree not available", allow_module_level=True)
install_reference()

from graphphysics.models import processors as ref_processors  # noqa: E402
from graphphysics.models.simulator import Simulator as RefSimulator  # noqa: E402

from graph_physics_tpu.models import processors as our_processors  # noqa: E402
from graph_physics_tpu.models.simulator import Simulator  # noqa: E402

from tests.test_reference_parity import _mesh  # noqa: E402
from tests.test_reference_parity_models import (  # noqa: E402
    _gnb_params,
    _mlp_params,
    _our_padded_graph,
)

H = 24
FEAT = 2  # velocity columns; node_type sits at index 2
NODE_IN = FEAT + 9  # + one-hot(NodeType.SIZE)
EDGE_IN = 3
OUT = 2


def _frame(pos, node_type, seed):
    """One trajectory frame: x = [vel(2), node_type], y = next vel."""
    rng = np.random.default_rng(seed)
    n = len(pos)
    vel = rng.normal(size=(n, FEAT)).astype(np.float32)
    x = np.concatenate([vel, node_type[:, None].astype(np.float32)], axis=1)
    y = vel + 0.1 * rng.normal(size=(n, FEAT)).astype(np.float32)
    return x, y


def _edge_attr(ei, seed):
    rng = np.random.default_rng(seed + 500)
    return rng.normal(size=(ei.shape[1], EDGE_IN)).astype(np.float32)


def _norm_stats(ref_norm):
    return (
        float(ref_norm._acc_count),
        float(ref_norm._num_accumulations),
        ref_norm._acc_sum.detach().numpy()[0],
        ref_norm._acc_sum_squared.detach().numpy()[0],
    )


def _assert_state_matches(our_state, ref_norm):
    count, num, s, ss = _norm_stats(ref_norm)
    assert float(our_state.acc_count) == count
    assert float(our_state.num_accumulations) == num
    np.testing.assert_allclose(np.asarray(our_state.acc_sum), s,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_state.acc_sum_sq), ss,
                               rtol=1e-5, atol=1e-5)


def test_simulator_train_eval_parity():
    pos, cells, ei, node_type, _out, _tgt, _d = _mesh(41)
    # receiver-sorted so both frameworks see the identical edge order
    # (build_mesh_graph's stable resort is then the identity)
    ei = ei[:, np.argsort(ei[1], kind="stable")]
    n = len(pos)

    torch.manual_seed(11)
    ref_model = ref_processors.EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=EDGE_IN, output_size=OUT, hidden_size=H,
    )
    ref_sim = RefSimulator(
        node_input_size=NODE_IN, edge_input_size=EDGE_IN, output_size=OUT,
        feature_index_start=0, feature_index_end=FEAT,
        output_index_start=0, output_index_end=FEAT,
        node_type_index=FEAT, model=ref_model, device="cpu",
    )

    params = {
        "nodes_encoder": _mlp_params(ref_model.nodes_encoder),
        "edges_encoder": _mlp_params(ref_model.edges_encoder),
        "decode_module": _mlp_params(ref_model.decode_module),
    }
    for i, blk in enumerate(ref_model.processor_list):
        params[f"block_{i}"] = _gnb_params(blk)
    params = {"params": params}

    our_model = our_processors.EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=EDGE_IN, output_size=OUT, hidden_size=H,
    )
    our_sim = Simulator(
        NODE_IN, EDGE_IN, OUT, 0, FEAT, 0, FEAT, FEAT, our_model
    )
    state = our_sim.init_state()

    from torch_geometric.data import Data
    import dataclasses

    def ref_inputs(x, y, ea):
        return Data(
            x=torch.tensor(x), y=torch.tensor(y),
            edge_attr=torch.tensor(ea),
            edge_index=torch.tensor(ei.astype(np.int64)),
            pos=torch.tensor(pos),
        )

    def our_graph(x, y, ea):
        g = _our_padded_graph(pos, cells, ei, node_type, x, ea)
        y_pad = np.zeros((g.x.shape[0], OUT), np.float32)
        y_pad[:n] = y
        return dataclasses.replace(g, y=jnp.asarray(y_pad))

    # two TRAINING frames: statistics accumulate across both
    ref_sim.train()
    for step in range(2):
        x, y = _frame(pos, node_type, seed=60 + step)
        ea = _edge_attr(ei, seed=60 + step)
        with torch.no_grad():
            net_ref, tgt_ref, none_ref = ref_sim(ref_inputs(x, y, ea))
        assert none_ref is None
        out = our_sim.forward(params, state, our_graph(x, y, ea),
                              is_training=True)
        state = out.state
        assert out.outputs is None
        np.testing.assert_allclose(
            np.asarray(out.net_out)[:n], net_ref.numpy(),
            rtol=2e-4, atol=2e-5, err_msg=f"net_out step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(out.target_norm)[:n], tgt_ref.numpy(),
            rtol=2e-4, atol=2e-5, err_msg=f"target step {step}",
        )

    # the running statistics agree exactly (padding excluded by masks)
    _assert_state_matches(state.output_norm, ref_sim._output_normalizer)
    _assert_state_matches(state.node_norm, ref_sim._node_normalizer)
    _assert_state_matches(state.edge_norm, ref_sim._edge_normalizer)

    # EVAL frame: no accumulation + physical-space outputs
    ref_sim.eval()
    x, y = _frame(pos, node_type, seed=70)
    ea = _edge_attr(ei, seed=70)
    with torch.no_grad():
        net_ref, tgt_ref, outputs_ref = ref_sim(ref_inputs(x, y, ea))
    out = our_sim.forward(params, state, our_graph(x, y, ea),
                          is_training=False)
    np.testing.assert_allclose(
        np.asarray(out.net_out)[:n], net_ref.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.outputs)[:n], outputs_ref.numpy(),
        rtol=2e-4, atol=2e-5,
    )
    # eval must not have accumulated
    _assert_state_matches(out.state.node_norm, ref_sim._node_normalizer)
