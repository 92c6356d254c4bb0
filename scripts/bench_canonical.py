"""Canonical-workload perf matrix on the TPU (VERDICT r4 item 3).

One row per reference training config (training_config/*.json = the
reference's 5 canonical workloads), each measured through the COMMITTED
fast path — the exact object assembly cli/train.py performs for
``--packed --fused --bf16``: FusedTopologyManager conversions (NK
attention / NK slot layouts), device preprocess (noise + world
features), the config's full loss stack (MultiLoss incl. least_squares
/ finite_diff gradient terms), and the external feature builders
(aneurysm / panels). Datasets are synthetic fixtures matching each
workload's meta schema at a REPRESENTATIVE mesh size (documented per
row below; the real releases are not in this image — BASELINE.md
"real datasets" section).

Per row, three numbers:

  graph_steps/s  best (and p25) 100-step dispatch over a 120 s window,
                 device-resident batch (the bench.py protocol)
  issued TF/s    dot_general flops of the traced train step — including
                 Pallas kernel bodies multiplied by their grid size
                 (scripts/flops_model._count) — divided by the measured
                 step time: what the MXU actually streams
  useful TF/s    the reference torch model's fwd+bwd matmul flops at the
                 same valid mesh (torch FlopCounterMode over the ACTUAL
                 reference modules via tests/reference_stub; gathers/
                 scatters are memory ops = 0 flops) divided by the
                 measured step time: what a perfect implementation of
                 the model math needs. MFU = useful / 197 TF/s v5e bf16
                 peak. The issued/useful gap is dominated by the one-hot
                 gather/scatter contractions and (at hidden 32) the
                 kron-packed weight lanes — BASELINE.md roofline
                 section.

Representative sizes: cylinder 48x40=1,920 nodes (CylinderFlow mean
1,885); plate 44x30 sheet + obstacle (DeformingPlate mean 1,271);
panels 48x40=1,920 (same node count as cylinder so the h128-vs-h32
comparison is apples-to-apples); aneurysm 60x50=3,000-node 3D surface.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python scripts/bench_canonical.py [workload ...]

BM_ASSERT=1 turns committed-floor misses into a hard failure.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

V5E_BF16_PEAK = 197e12

#: (fixture workload, external builder, fixture size, batch, frames)
WORKLOADS = {
    "cylinder": ("cylinder", None, (48, 40), 128, 130),
    "plate": ("plate_sheet", None, (44, 30), 64, 66),
    "panels": ("panels", "panels", (48, 40), 64, 66),
    "coarse-aneurysm": ("aneurysm", "aneurysm", (60, 50), 64, 66),
    "pinn-aneurysm": ("aneurysm", "aneurysm", (60, 50), 64, 66),
}

#: committed regression floors, graph-steps/s (~86-88% of the round-5
#: measured p25s: 5,002 / 1,222 / 486 / 938 / 868 — BASELINE.md matrix;
#: plate re-based after the scatter-free + 2-D-flat world seams)
FLOORS = {
    "cylinder": 4500.0,
    "plate": 1050.0,
    "panels": 430.0,
    "coarse-aneurysm": 830.0,
    "pinn-aneurysm": 760.0,
}


def _fixture(name, d):
    """(config_path, n_valid_hint) — canonical config JSON pointed at a
    synthetic fixture of this workload's meta schema."""
    from graph_physics_tpu.dataset import synthetic

    wl, _ext, size, _b, frames = WORKLOADS[name]
    wdir = os.path.join(d, name)
    if wl == "plate_sheet":
        # the sheet+obstacle generator (world-edge contact between the
        # OBSTACLE bar and NORMAL nodes — scripts/bench_plate.py mesh)
        train_p, meta_p = synthetic.write_plate_h5_dataset(
            os.path.join(wdir, "train.h5"), num_trajectories=1,
            nx=size[0], ny=size[1], num_steps=frames,
            meta_path=os.path.join(wdir, "meta.json"),
        )
        test_p = train_p
    else:
        train_p, test_p, meta_p = synthetic.write_workload_fixture(
            wl, wdir, num_trajectories=1, num_steps=frames, size=size,
        )
    cfg = json.load(open(os.path.join(REPO, "training_config",
                                      f"{name}.json")))
    cfg["dataset"].update(
        train_path=train_p, test_path=test_p, meta_path=meta_p
    )
    p = os.path.join(wdir, "config.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


def build_workload(name, d):
    """(sim_t, step, state, device batch, param) through the committed
    --packed --fused --bf16 assembly (cli/train.py)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from graph_physics_tpu.training.step import (
        init_train_state, make_train_step,
    )
    from graph_physics_tpu.training.transforms import make_device_preprocess

    _wl, external, _size, batch, _frames = WORKLOADS[name]
    param = config_lib.load_params(_fixture(name, d))

    model = config_lib.get_model(param, dtype=jnp.bfloat16)
    sim = config_lib.get_simulator(param, model)
    loss_fn, _names = config_lib.get_loss(param)
    gm = config_lib.get_gradient_method(param)
    noise_cfg = config_lib.get_noise_config(param)
    _world_host, world_dev = config_lib.get_world_configs(param)

    extra = None
    if external:
        from graph_physics_tpu.external import get_feature_builder

        extra = get_feature_builder(external)
    frame_cfg = config_lib.get_frame_config(
        param, use_previous_data=bool(extra), extra_node_features=extra,
    )
    if frame_cfg.world is not None:
        frame_cfg = dataclasses.replace(
            frame_cfg,
            world=dataclasses.replace(frame_cfg.world, sidecar=True),
        )
    ds = config_lib.get_dataset(param, frame_cfg)

    dev_pp = make_device_preprocess(noise_cfg, world_dev, num_steps=10000)
    opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)

    mgr = FusedTopologyManager(
        build_nk=True, nk_layout=isinstance(model, EncodeProcessDecode),
    )
    loader = BatchLoader(
        ds, batch, shuffle=False, device_put=False, packed=True,
        frame_transform=mgr.transform_frame,
        packed_transform=mgr.transform_packed,
    )
    g = next(iter(loader))

    def build_step(sim_t):
        return make_train_step(
            sim_t, opt, loss_fn, device_preprocess=dev_pp,
            gradient_method=gm, num_steps=10000,
        )

    raw = ds[0]  # unconverted frame: valid mesh ids for the flop count
    g = jax.device_put(g)
    sim_t, step = mgr.step_for(g, sim, build_step)
    if sim_t is sim and hasattr(sim.model, "edge_tiling"):
        print(f"[bench_canonical] {name}: fused path INACTIVE (XLA "
              "fallback)", flush=True)
    state = init_train_state(sim_t, opt, jax.random.PRNGKey(0), g)
    return sim_t, step, state, g, raw, param


def measure(step, state, g, inner=100, window=120.0):
    """(best_s, p25_s) per-dispatch over the window; forces host fetch."""
    import jax

    from graph_physics_tpu.training.step import make_multi_step

    multi = make_multi_step(step, unroll=inner)
    rng = jax.random.PRNGKey(1)
    state, m = multi(state, g, rng)
    _ = float(np.asarray(m["loss"])[-1])  # compile + settle
    times = []
    deadline = time.time() + window
    while time.time() < deadline:
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, m = multi(state, g, k)
        _ = float(np.asarray(m["loss"])[-1])
        times.append(time.perf_counter() - t0)
    return min(times), float(np.percentile(times, 25))


def issued_flops_per_graph(step, state, g, batch):
    """Traced dot_general flops (incl. Pallas grids) per GRAPH."""
    import jax

    from flops_model import _count

    jaxpr = jax.make_jaxpr(step)(state, g, jax.random.PRNGKey(1))
    total = sum(tot for _cnt, tot in _count(jaxpr).values())
    return total / batch


def useful_flops_per_graph(param, g):
    """Reference torch model fwd+bwd matmul flops on a RAW frame's valid
    mesh (B=1; FlopCounterMode counts mm/einsum at true dims, index ops
    at 0). Conservative: loss-side gradient terms (FD/WLS) and the
    attention weighted-sum (index_add in the stub) are not counted."""
    import torch
    from torch.utils.flop_counter import FlopCounterMode

    from tests.reference_stub import install_reference

    install_reference()
    from graphphysics.models import processors as ref_p  # noqa: E402
    from torch_geometric.data import Data  # noqa: E402

    m = param["model"]
    ni = m["node_input_size"] + 9  # one-hot node types (simulator contract)
    n_valid = int(np.asarray(g.n_node))
    e_valid = int(np.asarray(g.n_edge))
    send = np.asarray(g.senders)[:e_valid]
    recv = np.asarray(g.receivers)[:e_valid]
    if g.wedge_mask is not None:
        # plate-style: the reference concatenates the ACTIVE world edges
        # into edge_index (preprocessing.py:92-140)
        wm = np.asarray(g.wedge_mask).astype(bool).reshape(-1)
        send = np.concatenate([send, np.asarray(g.wedge_senders)[wm]])
        recv = np.concatenate([recv, np.asarray(g.wedge_receivers)[wm]])
    ei = torch.tensor(np.stack([send, recv]).astype(np.int64))
    x = torch.randn(n_valid, ni, dtype=torch.float32, requires_grad=False)

    torch.manual_seed(0)
    if m["type"] == "epd":
        ref = ref_p.EncodeProcessDecode(
            message_passing_num=m["message_passing_num"],
            node_input_size=ni, edge_input_size=m["edge_input_size"],
            output_size=m["output_size"], hidden_size=m["hidden_size"],
        )
        ea = torch.randn(ei.shape[1], m["edge_input_size"])
        data = Data(x=x, edge_index=ei, edge_attr=ea)
    else:
        ref = ref_p.EncodeTransformDecode(
            message_passing_num=m["message_passing_num"],
            node_input_size=ni, output_size=m["output_size"],
            hidden_size=m["hidden_size"], num_heads=m["num_heads"],
        )
        data = Data(x=x, edge_index=ei)
    with FlopCounterMode(display=False) as fc:
        out = ref(data)
        out.sum().backward()
    return float(fc.get_total_flops())


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    names = sys.argv[1:] or list(WORKLOADS)
    d = tempfile.mkdtemp()
    misses = {}
    for name in names:
        batch = WORKLOADS[name][3]
        sim_t, step, state, g, raw, param = build_workload(name, d)
        best_s, p25_s = measure(step, state, g)
        gps_best = 100 * batch / best_s
        gps_p25 = 100 * batch / p25_s
        issued = issued_flops_per_graph(step, state, g, batch)
        useful = useful_flops_per_graph(param, raw)
        step_time = best_s / 100  # per optimizer step (one batch)
        floor = FLOORS.get(name)
        row = {
            "workload": name,
            "graph_steps_per_sec_per_chip": round(gps_best, 2),
            "p25": round(gps_p25, 2),
            "batch": batch,
            "n_nodes": int(np.asarray(g.n_node)),
            "issued_tf_per_graph": round(issued / 1e12, 4),
            "issued_tf_s": round(issued * gps_best / 1e12, 1),
            "useful_tf_per_graph": round(useful / 1e12, 5),
            "useful_tf_s": round(useful * gps_best / 1e12, 2),
            "mfu_useful": round(useful * gps_best / V5E_BF16_PEAK, 4),
            "floor": floor,
            "above_floor": None if floor is None else bool(gps_p25 >= floor),
        }
        print(json.dumps(row), flush=True)
        if floor is not None and gps_p25 < floor:
            misses[name] = gps_p25
        del sim_t, step, state, g
    if os.environ.get("BM_ASSERT") and misses:
        raise SystemExit(f"canonical floors missed: {misses}")


if __name__ == "__main__":
    main()
