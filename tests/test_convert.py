"""Checkpoint migration (gpt-convert) tested against the ACTUAL reference
PyTorch code.

Proves the reference→TPU migration seam end to end: reference Simulator
checkpoints (simulator.py:248-275), Lightning containers and raw
state_dicts convert into parameter trees that (a) are numerically
identical to the cross-framework parity harness's hand-copied weights,
(b) reproduce the reference's eval outputs through our Simulator, and
(c) restore through the same orbax path gpt-predict uses.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_stub import REF_ROOT, install_reference

if not os.path.isdir(os.path.join(REF_ROOT, "graphphysics")):
    pytest.skip("reference tree not available", allow_module_level=True)
install_reference()

from graphphysics.models import processors as ref_processors  # noqa: E402
from graphphysics.models.simulator import Simulator as RefSimulator  # noqa: E402

from graph_physics_tpu.models import processors as our_processors  # noqa: E402
from graph_physics_tpu.models.simulator import Simulator  # noqa: E402
from graph_physics_tpu.utils import convert as convert_lib  # noqa: E402

from tests.test_reference_parity import _mesh  # noqa: E402
from tests.test_reference_parity_models import (  # noqa: E402
    _gnb_params,
    _mlp_params,
    _our_padded_graph,
    _temporal_params,
    _transformer_params,
)
from tests.test_reference_parity_simulator import (  # noqa: E402
    EDGE_IN,
    FEAT,
    H,
    NODE_IN,
    OUT,
    _assert_state_matches,
    _edge_attr,
    _frame,
)

PARAM = {
    "model": {
        "type": "epd",
        "message_passing_num": 2,
        "node_input_size": FEAT,  # + NodeType.SIZE = NODE_IN
        "edge_input_size": EDGE_IN,
        "output_size": OUT,
        "hidden_size": H,
    },
    "index": {
        "feature_index_start": 0,
        "feature_index_end": FEAT,
        "output_index_start": 0,
        "output_index_end": FEAT,
        "node_type_index": FEAT,
    },
}


def _tree_equal(ours, expected):
    js, es = jax.tree.structure(ours), jax.tree.structure(expected)
    assert js == es, f"param tree structure mismatch:\n{js}\nvs\n{es}"
    for o, e in zip(jax.tree.leaves(ours), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(e), rtol=0, atol=0)


def _ref_epd_simulator(seed=11):
    torch.manual_seed(seed)
    model = ref_processors.EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=EDGE_IN, output_size=OUT, hidden_size=H,
    )
    return RefSimulator(
        node_input_size=NODE_IN, edge_input_size=EDGE_IN, output_size=OUT,
        feature_index_start=0, feature_index_end=FEAT,
        output_index_start=0, output_index_end=FEAT,
        node_type_index=FEAT, model=model, device="cpu",
    )


def _expected_epd_tree(ref_model):
    tree = {
        "nodes_encoder": _mlp_params(ref_model.nodes_encoder),
        "edges_encoder": _mlp_params(ref_model.edges_encoder),
        "decode_module": _mlp_params(ref_model.decode_module),
    }
    for i, blk in enumerate(ref_model.processor_list):
        tree[f"block_{i}"] = _gnb_params(blk)
    return {"params": tree}


def _accumulate(ref_sim, pos, node_type, ei, steps=2):
    from torch_geometric.data import Data

    ref_sim.train()
    for step in range(steps):
        x, y = _frame(pos, node_type, seed=60 + step)
        ea = _edge_attr(ei, seed=60 + step)
        with torch.no_grad():
            ref_sim(Data(
                x=torch.tensor(x), y=torch.tensor(y),
                edge_attr=torch.tensor(ea),
                edge_index=torch.tensor(ei.astype(np.int64)),
                pos=torch.tensor(pos),
            ))


def test_convert_epd_simulator_checkpoint(tmp_path):
    """Simulator.save_checkpoint file → identical weights, identical
    normalizer statistics, reference-identical eval outputs."""
    pos, cells, ei, node_type, *_ = _mesh(41)
    ei = ei[:, np.argsort(ei[1], kind="stable")]
    n = len(pos)
    ref_sim = _ref_epd_simulator()
    _accumulate(ref_sim, pos, node_type, ei)

    ck = tmp_path / "ref" / "sim.pt"
    ref_sim.save_checkpoint(str(ck))
    params, sim_state = convert_lib.convert_torch_checkpoint(str(ck), PARAM)

    _tree_equal(params, _expected_epd_tree(ref_sim.model))
    _assert_state_matches(sim_state.output_norm, ref_sim._output_normalizer)
    _assert_state_matches(sim_state.node_norm, ref_sim._node_normalizer)
    _assert_state_matches(sim_state.edge_norm, ref_sim._edge_normalizer)

    # eval-frame forward: converted params drive OUR simulator to the
    # reference's physical outputs
    from torch_geometric.data import Data

    ref_sim.eval()
    x, y = _frame(pos, node_type, seed=70)
    ea = _edge_attr(ei, seed=70)
    with torch.no_grad():
        _, _, outputs_ref = ref_sim(Data(
            x=torch.tensor(x), y=torch.tensor(y),
            edge_attr=torch.tensor(ea),
            edge_index=torch.tensor(ei.astype(np.int64)),
            pos=torch.tensor(pos),
        ))

    our_model = our_processors.EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=EDGE_IN, output_size=OUT, hidden_size=H,
    )
    our_sim = Simulator(NODE_IN, EDGE_IN, OUT, 0, FEAT, 0, FEAT, FEAT, our_model)
    g = _our_padded_graph(pos, cells, ei, node_type, x, ea)
    y_pad = np.zeros((g.x.shape[0], OUT), np.float32)
    y_pad[:n] = y
    g = dataclasses.replace(g, y=jnp.asarray(y_pad))
    out = our_sim.forward(params, sim_state, g, is_training=False)
    np.testing.assert_allclose(
        np.asarray(out.outputs)[:n], outputs_ref.numpy(), rtol=2e-4, atol=2e-5
    )


def test_convert_lightning_and_raw_containers(tmp_path):
    """Lightning .ckpt and raw state_dict containers map to the same tree;
    Lightning-module tensors outside the Simulator are ignored."""
    ref_sim = _ref_epd_simulator(seed=13)
    expected = _expected_epd_tree(ref_sim.model)

    raw = {k: v for k, v in ref_sim.state_dict().items()}
    params_raw, _ = convert_lib.convert_state_dict(
        convert_lib.flatten_reference_checkpoint(raw), PARAM
    )
    _tree_equal(params_raw, expected)

    lightning = {
        "epoch": 3,
        "state_dict": {
            **{f"model.{k}": v for k, v in raw.items()},
            "mtp_head.weight": torch.zeros(2, 2),  # outside the Simulator
        },
    }
    p = tmp_path / "lightning.ckpt"
    torch.save(lightning, str(p))
    params_l, _ = convert_lib.convert_torch_checkpoint(str(p), PARAM)
    _tree_equal(params_l, expected)


def test_convert_rejects_unmapped_tensors():
    ref_sim = _ref_epd_simulator(seed=17)
    flat = {k: v for k, v in ref_sim.state_dict().items()}
    flat["model.mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(convert_lib.ConversionError, match="mystery"):
        convert_lib.convert_state_dict(
            convert_lib.flatten_reference_checkpoint(flat), PARAM
        )


def test_convert_transformer_temporal_gated():
    """ETD with gated attention + temporal block: every projection's head
    permutation must match the hand-verified parity mapping."""
    heads = 4
    torch.manual_seed(5)
    ref = ref_processors.EncodeTransformDecode(
        message_passing_num=2, node_input_size=7, output_size=OUT,
        hidden_size=H, num_heads=heads,
        use_gated_attention=True, use_temporal_block=True,
    )
    flat = {f"model.{k}": v for k, v in ref.state_dict().items()}
    param = {"model": {
        "type": "transformer", "message_passing_num": 2,
        "node_input_size": 7 - 9, "edge_input_size": EDGE_IN,
        "output_size": OUT, "hidden_size": H, "num_heads": heads,
    }}
    params, _ = convert_lib.convert_state_dict(flat, param)

    expected = {
        "nodes_encoder": _mlp_params(ref.nodes_encoder),
        "decode_module": _mlp_params(ref.decode_module),
        "temporal_block": _temporal_params(ref.temporal_block, H, heads),
    }
    for i, blk in enumerate(ref.processor_list):
        expected[f"block_{i}"] = _transformer_params(blk, H, heads)
    _tree_equal(params, {"params": expected})


def test_convert_epd_option_variants():
    """EPD with gated MLP blocks + φ-gated aggregation + RoPE + temporal
    block: every optional parameter group maps (gate_proj/gate_pos,
    GatedMLP structure, the temporal projections with head perms)."""
    torch.manual_seed(19)
    ref = ref_processors.EncodeProcessDecode(
        message_passing_num=2, node_input_size=NODE_IN,
        edge_input_size=EDGE_IN, output_size=OUT, hidden_size=H,
        use_rope_embeddings=True, use_gated_attention=True,
        use_gated_mlp=True, use_temporal_block=True,
    )
    sd = ref.state_dict()
    flat = {f"model.{k}": v for k, v in sd.items()}
    params, _ = convert_lib.convert_state_dict(flat, {"model": {
        "type": "epd", "message_passing_num": 2, "node_input_size": FEAT,
        "edge_input_size": EDGE_IN, "output_size": OUT, "hidden_size": H,
    }})
    expected = {
        "nodes_encoder": _mlp_params(ref.nodes_encoder),
        "edges_encoder": _mlp_params(ref.edges_encoder),
        "decode_module": _mlp_params(ref.decode_module),
        "temporal_block": _temporal_params(ref.temporal_block, H, 4),
    }
    for i, blk in enumerate(ref.processor_list):
        expected[f"block_{i}"] = _gnb_params(blk)
    _tree_equal(params, {"params": expected})


def test_convert_transformer_rope_buffer():
    """RoPE-enabled reference checkpoints carry a persistent
    'rope_inv_freq' buffer (reference layers.py:619) — it must be consumed
    (it is deterministic from config), not crash the strict mapping."""
    heads = 4
    torch.manual_seed(7)
    ref = ref_processors.EncodeTransformDecode(
        message_passing_num=1, node_input_size=7, output_size=OUT,
        hidden_size=H, num_heads=heads, use_rope_embeddings=True,
        rope_pos_dimension=2,
    )
    sd = ref.state_dict()
    assert any(k.endswith("rope_inv_freq") for k in sd)
    flat = {f"model.{k}": v for k, v in sd.items()}
    param = {"model": {
        "type": "transformer", "message_passing_num": 1,
        "node_input_size": 7 - 9, "edge_input_size": EDGE_IN,
        "output_size": OUT, "hidden_size": H, "num_heads": heads,
    }}
    params, _ = convert_lib.convert_state_dict(flat, param)
    expected = {
        "nodes_encoder": _mlp_params(ref.nodes_encoder),
        "decode_module": _mlp_params(ref.decode_module),
        "block_0": _transformer_params(ref.processor_list[0], H, heads),
    }
    _tree_equal(params, {"params": expected})


def test_convert_transolver():
    """TransolverProcessor checkpoint (heads-first layouts — no perms);
    the dead condition-embedding Linear is consumed but not emitted."""
    from tests.test_reference_parity_transolver import _model_params

    heads = 4
    torch.manual_seed(9)
    ref = ref_processors.TransolverProcessor(
        message_passing_num=2, node_input_size=NODE_IN, output_size=OUT,
        hidden_size=H, num_heads=heads, slice_num=8,
    )
    flat = {f"model.{k}": v for k, v in ref.state_dict().items()}
    param = {"model": {
        "type": "transolver", "message_passing_num": 2,
        "node_input_size": FEAT, "edge_input_size": EDGE_IN,
        "output_size": OUT, "hidden_size": H, "num_heads": heads,
        "slice_num": 8,
    }}
    params, _ = convert_lib.convert_state_dict(flat, param)
    _tree_equal(params, {"params": {"model": _model_params(ref.model, heads)}})


def test_convert_cli_restores_through_predict_path(tmp_path):
    """gpt-convert's output restores through the exact orbax path
    gpt-predict uses (abstract TrainState from init_train_state)."""
    from graph_physics_tpu.cli.convert import main as convert_main
    from graph_physics_tpu.training import checkpoint as ckpt_lib
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule as schedule_lib
    from graph_physics_tpu.training.step import init_train_state

    pos, cells, ei, node_type, *_ = _mesh(41)
    ei = ei[:, np.argsort(ei[1], kind="stable")]
    ref_sim = _ref_epd_simulator(seed=23)
    _accumulate(ref_sim, pos, node_type, ei)
    ck = tmp_path / "sim.pt"
    ref_sim.save_checkpoint(str(ck))

    cfg = tmp_path / "params.json"
    cfg.write_text(json.dumps(PARAM))
    out_dir = tmp_path / "converted"
    convert_main([
        "--torch_checkpoint", str(ck),
        "--training_parameters_path", str(cfg),
        "--output_dir", str(out_dir),
    ])

    # the predict CLI's restore recipe (cli/predict.py:77-87)
    model = config_lib.get_model(PARAM)
    simulator = config_lib.get_simulator(PARAM, model)
    optimizer = schedule_lib.make_optimizer(1e-3, 1, 1)
    x, y = _frame(pos, node_type, seed=70)
    ea = _edge_attr(ei, seed=70)
    example = _our_padded_graph(pos, cells, ei, node_type, x, ea)
    abstract = init_train_state(
        simulator, optimizer, jax.random.PRNGKey(0), example
    )
    manager = ckpt_lib.make_manager(str(out_dir))
    state, meta = ckpt_lib.restore_checkpoint(manager, abstract)

    _tree_equal(state.params, _expected_epd_tree(ref_sim.model))
    _assert_state_matches(state.sim_state.output_norm,
                          ref_sim._output_normalizer)
    assert meta["converted_from"] == str(ck)


def test_convert_then_finetune(tmp_path):
    """A migrated reference checkpoint fine-tunes through the real train
    CLI (gpt-convert → gpt-train --resume_training)."""
    from graph_physics_tpu.cli.convert import main as convert_main
    from graph_physics_tpu.cli.train import main as train_main
    from graph_physics_tpu.dataset import synthetic

    w = str(tmp_path)
    train_h5, meta = synthetic.write_h5_dataset(
        f"{w}/train.h5", num_trajectories=1, nx=8, ny=6, num_steps=5,
        meta_path=f"{w}/meta.json",
    )
    hidden, mp = 16, 2
    cfg = {
        "dataset": {"extension": "h5", "train_path": train_h5,
                    "test_path": train_h5, "meta_path": meta,
                    "targets": ["velocity"], "khop": 1},
        "model": {"type": "epd", "message_passing_num": mp,
                  "hidden_size": hidden, "node_input_size": 2,
                  "output_size": 2, "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {"preprocessing": {"noise": 0, "masking": 0},
                            "world_pos_parameters": {"use": False}},
        "training": {},
    }
    cfg_path = f"{w}/config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    torch.manual_seed(31)
    model = ref_processors.EncodeProcessDecode(
        message_passing_num=mp, node_input_size=2 + 9, edge_input_size=3,
        output_size=2, hidden_size=hidden,
    )
    ref_sim = RefSimulator(
        node_input_size=2 + 9, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2,
        node_type_index=2, model=model, device="cpu",
    )
    ref_sim.save_checkpoint(f"{w}/ref/sim.pt")

    convert_main([
        "--torch_checkpoint", f"{w}/ref/sim.pt",
        "--training_parameters_path", cfg_path,
        "--output_dir", f"{w}/runs/ft/checkpoints",
    ])
    train_main([
        "--training_parameters_path", cfg_path,
        "--epochs", "1", "--batch_size", "1", "--warmup", "2",
        "--out_dir", f"{w}/runs", "--run_name", "ft",
        "--resume_training",
    ])
    lines = [json.loads(l) for l in
             open(f"{w}/runs/ft/ft.metrics.jsonl").read().splitlines()]
    assert lines and np.isfinite(lines[-1]["val_all_rollout_rmse"])
    assert lines[-1]["step"] > 0  # it actually trained past the converted step


def test_convert_transformer_multigrid():
    """ETD + manually-wired reference pooling (README.md:430-462):
    DownSampler's SelectTopK projection ([1, d_in] -> our [d_in, 1]) and
    both lin layers convert; the tree loads into our config-wired
    multigrid model and runs."""
    heads = 4
    torch.manual_seed(23)
    ref = ref_processors.EncodeTransformDecode(
        message_passing_num=2, node_input_size=7, output_size=OUT,
        hidden_size=H, num_heads=heads,
    )
    from graphphysics.models.hierarchical_pooling import (
        DownSampler as RefDown,
        UpSampler as RefUp,
    )

    down = RefDown(H, H, ratio=0.5)
    up = RefUp(H, H)
    flat = {f"model.{k}": v for k, v in ref.state_dict().items()}
    flat.update({f"model.down_sampler.{k}": v
                 for k, v in down.state_dict().items()})
    flat.update({f"model.up_sampler.{k}": v
                 for k, v in up.state_dict().items()})
    param = {"model": {
        "type": "transformer", "message_passing_num": 2,
        "node_input_size": 7 - 9, "edge_input_size": 0,
        "output_size": OUT, "hidden_size": H, "num_heads": heads,
        "use_multigrid": True, "multigrid_ratio": 0.5,
    }}
    params, _ = convert_lib.convert_state_dict(flat, param)

    ds = params["params"]["down_sampler"]
    np.testing.assert_allclose(
        np.asarray(ds["select_weight"]),
        down.select.weight.detach().numpy().reshape(-1, 1), atol=0)
    np.testing.assert_allclose(
        np.asarray(ds["lin"]["kernel"]),
        down.lin.weight.detach().numpy().T, atol=0)
    np.testing.assert_allclose(
        np.asarray(params["params"]["up_sampler"]["lin"]["kernel"]),
        up.lin.weight.detach().numpy().T, atol=0)

    # the converted tree must drive OUR multigrid forward
    model = our_processors.EncodeTransformDecode(
        message_passing_num=2, node_input_size=7, output_size=OUT,
        hidden_size=H, num_heads=heads, use_multigrid=True,
        multigrid_ratio=0.5,
    )
    pos, cells, ei, node_type, *_ = _mesh(23)
    rng = np.random.default_rng(23)
    x7 = rng.normal(size=(len(pos), 7)).astype(np.float32)
    ea = np.zeros((ei.shape[1], 1), np.float32)
    g = _our_padded_graph(pos, cells, ei, node_type, x7, ea)
    init = model.init(jax.random.PRNGKey(0), g)
    assert jax.tree.structure(init) == jax.tree.structure(params)
    out = model.apply(params, g)
    assert np.isfinite(np.asarray(out)).all()
