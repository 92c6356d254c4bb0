"""Fused-path train throughput on the REAL 27k-node airfoil mesh.

Usage: python scripts/bench_airfoil.py [wb_buckets] [batch] [inner] [budget_s]

Measures graph-steps/s/chip for the fused Pallas path on the reference's
airfoil fixture (graded mesh), under TODAY'S DEFAULT dispatch: the
FusedTopologyManager in nk_layout mode, exactly as the trainer
configures it for epd models — the NK builder decides per topology
whether the slot layout serves this mesh or degree skew falls it back
to the blocked-CSR kernel (the planner/fallback path bench.py's uniform
cylinder never exercises). AIRFOIL_NK=0 forces the CSR layout (the
round-3 protocol: 160.8 g/s, wb_buckets=1, B=16).

Prints one JSON line; BM_ASSERT=1 enforces the committed floor
(BASELINE.md round 5).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

#: committed floor, graph-steps/s (BASELINE.md round 5; default dispatch
#: = CSR via the NK-vs-CSR row pricing: measured 156.2, floor ~87%)
FLOOR = 135.0

AIRFOIL = "/root/reference/tests/mock_airfoil/sample_000000005.h5"


def airfoil_graph():
    import h5py

    from graph_physics_tpu.core import mesh as mesh_lib

    with h5py.File(AIRFOIL, "r") as f:
        pos = np.asarray(f["data0"])[:, :2].astype(np.float32)
        cells = np.asarray(f["data1"], np.int64)
        vel = np.stack(
            [np.asarray(f["data2"]), np.asarray(f["data3"])], axis=-1
        ).astype(np.float32)
        node_type = np.asarray(f["data7"], np.int64).astype(np.int32)
    ei = mesh_lib.faces_to_edges(cells, len(pos))
    x = np.concatenate(
        [vel, node_type[:, None].astype(np.float32),
         np.zeros((len(pos), 1), np.float32)], axis=-1)
    return mesh_lib.build_mesh_graph(x, pos, node_type, ei, y=vel,
                                     faces=cells)


def main():
    wb_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    inner = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0

    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack
    from graph_physics_tpu.training.step import (
        NoiseConfig, init_train_state, make_multi_step, make_train_step,
    )

    g = airfoil_graph().replace(traj_index=np.asarray(0, np.int32))
    # today's trainer default for epd: NK slot layout with the bucketed-K
    # builder and NK-vs-CSR row pricing (training/fused.py) — on this
    # graded mesh the pricing selects CSR. AIRFOIL_NK=0 skips the NK
    # build entirely; AIRFOIL_NK_RATIO=<float> overrides the acceptance
    # ratio (e.g. 100 to force the NK layout for A/Bs).
    use_nk = os.environ.get("AIRFOIL_NK", "1") != "0"
    mgr = FusedTopologyManager(wb_buckets=wb_buckets, nk_layout=use_nk,
                               build_nk=use_nk)
    if os.environ.get("AIRFOIL_NK_RATIO"):
        mgr.nk_accept_ratio = float(os.environ["AIRFOIL_NK_RATIO"])
    t0 = time.time()
    conv = mgr.transform_frame(g)
    t, _perm = mgr.tiling_of(0)
    assert t is not None, "airfoil must tile"
    kernel = ("nk" if use_nk and conv.tiling_idx_nk is not None
              and conv.tiling_idx is None else "csr")
    print(f"tiling: groups={t.num_groups} wb={t.window_blocks} "
          f"epb={t.edges_per_block} buckets={t.buckets} kernel={kernel} "
          f"({time.time()-t0:.1f}s host)", flush=True)

    stacked = jax.tree.map(lambda a: np.stack([np.asarray(a)] * batch), conv)
    batch_graph = pack(stacked)

    model = EncodeProcessDecode(
        message_passing_num=5, node_input_size=2 + 9, edge_input_size=3,
        output_size=2, hidden_size=32, dtype=jnp.bfloat16, edge_tiling=None,
    )
    sim = Simulator(
        node_input_size=2 + 9, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2, output_index_start=0,
        output_index_end=2, node_type_index=2, model=model,
    )
    opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)
    noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))

    def make_step(s):
        return make_train_step(s, opt, LossType.L2LOSS, noise,
                               num_steps=10000)

    sim_t, step_fn = mgr.step_for(batch_graph, sim, make_step)
    state = init_train_state(sim_t, opt, jax.random.PRNGKey(0), batch_graph)
    multi = make_multi_step(step_fn, unroll=inner)

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = multi(state, batch_graph, rng)
    loss0 = float(np.asarray(metrics["loss"])[-1])
    print(f"compile+first dispatch {time.time()-t0:.1f}s loss={loss0:.4f}",
          flush=True)

    times = []
    deadline = time.time() + budget
    while time.time() < deadline:
        rng, k = jax.random.split(rng)
        t1 = time.perf_counter()
        state, metrics = multi(state, batch_graph, k)
        _ = float(np.asarray(metrics["loss"])[-1])
        times.append(time.perf_counter() - t1)
    best = min(times)
    gs = inner * batch / best
    print(f"wb_buckets={wb_buckets} B={batch}: {gs:.1f} graph-steps/s "
          f"({best*1e3/inner:.2f} ms/step, {len(times)} trials)", flush=True)
    print(json.dumps({
        "metric": "airfoil_fused_graph_steps_per_sec_per_chip",
        "value": round(gs, 1), "unit": "graphs/s", "kernel": kernel,
        "wb_buckets": wb_buckets, "batch": batch, "floor": FLOOR,
        "above_floor": None if FLOOR is None else bool(gs >= FLOOR),
    }), flush=True)
    if os.environ.get("BM_ASSERT") and FLOOR is not None and gs < FLOOR:
        raise SystemExit(f"airfoil floor missed: {gs:.1f} < {FLOOR}")


if __name__ == "__main__":
    main()
