"""DeformingPlate-class (world-edge) train-step throughput on the TPU.

The plate workload (reference training_config/plate.json: transformer
h64 / 10 blocks / 4 heads, 3D world_pos target, per-frame world edges
via preprocessing.py:92-140) was the one canonical config stuck on the
stacked XLA path: per-frame topology churn disabled packed batching and
the fused kernels. The world-edge SIDECAR layout (MeshGraph.wedge_*,
dataset/preprocessing.py WorldConfig.sidecar) keeps the shared edge
arrays mesh-static and rides world edges as per-sample [W, B] arrays, so
the same fused NK attention kernels serve plate-shaped training.

This script measures both paths on a plate-shaped synthetic workload
(~1.3k-node sheet + obstacle, world-edge budget 1024, B=64):

  plate_xla    concat layout, stacked [B, N, F] batch, XLA train step
               (what the plate config ran before the sidecar)
  plate_fused  sidecar layout, packed [N, B, F] batch, fused NK edge
               attention via FusedTopologyManager (the committed
               --packed --fused path)

Protocol matches scripts/bench_models.py: device-resident batch, 100
steps per dispatch via make_multi_step, best dispatch over a 120 s
window. Run on the TPU host; BM_ASSERT=1 turns floor misses into a hard
failure.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python scripts/bench_plate.py [xla|fused]
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

#: committed regression floors (BASELINE.md round 5). Measured 2026-08-20:
#: plate_fused 1,222.2 g/s (B=64; 251.7 before the scatter-free world
#: seams, 450.3 before the 2-D-flat row gathers), plate_xla 32.55 g/s
#: (B=16 — B>=32 OOMs the chip on padded attention-gather temps)
#: -> 37.5x. Floor at ~86% of the fused measurement; the xla leg is a
#: comparison, not a guard.
FLOORS = {"plate_xla": None, "plate_fused": 1050.0}


def plate_param(d, nx=44, ny=30, num_steps=80, edge_budget=1024):
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.training import config as config_lib

    train_h5, meta = synthetic.write_plate_h5_dataset(
        os.path.join(d, "train.h5"), num_trajectories=1, nx=nx, ny=ny,
        num_steps=num_steps, meta_path=os.path.join(d, "meta.json"),
    )
    cfg = {
        "dataset": {
            "extension": "h5", "train_path": train_h5, "test_path": train_h5,
            "meta_path": meta, "targets": ["world_pos"], "khop": 1,
        },
        # reference training_config/plate.json model/index blocks
        "model": {
            "type": "transformer", "message_passing_num": 10,
            "node_input_size": 6, "edge_input_size": 0, "output_size": 3,
            "hidden_size": 64, "num_heads": 4,
        },
        "index": {
            "feature_index_start": 0, "feature_index_end": 6,
            "output_index_start": 0, "output_index_end": 3,
            "node_type_index": 6,
        },
        "transformations": {
            "preprocessing": {
                "noise": 0.003, "noise_index_start": [0],
                "noise_index_end": [3], "masking": 0,
            },
            "world_pos_parameters": {
                "use": True, "world_pos_index_start": 0,
                "world_pos_index_end": 3, "radius": 0.03,
                "edge_budget": edge_budget,
            },
        },
        "training": {},
    }
    p = os.path.join(d, "cfg.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return config_lib.load_params(p)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import (
        init_train_state, make_multi_step, make_train_step,
    )
    from graph_physics_tpu.training.transforms import make_device_preprocess

    only = sys.argv[1] if len(sys.argv) > 1 else None
    # The stacked XLA path OOMs at B=64 on one v5e chip (each attention
    # block gathers a [B*E, H, 16] bf16 temp whose T(4,128) padding
    # expands 8x -> ~560 MB per block; 20+ live under remat). The fused
    # sidecar path runs B=64 fine — measure XLA at its feasible batch
    # and report per-graph rates.
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    inner = 100
    d = tempfile.mkdtemp()
    param = plate_param(d)

    model = config_lib.get_model(param, dtype=jnp.bfloat16)
    sim = config_lib.get_simulator(param, model)
    noise_cfg = config_lib.get_noise_config(param)
    _, world_dev = config_lib.get_world_configs(param)
    dev_pp = make_device_preprocess(noise_cfg, world_dev, num_steps=10000)
    opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)

    def build_step(sim_t):
        return make_train_step(
            sim_t, opt, LossType.L2LOSS, device_preprocess=dev_pp,
            num_steps=10000,
        )

    results = {}

    def bench(name, multi, state, batch_graph):
        rng = jax.random.PRNGKey(1)
        state, m = multi(state, batch_graph, rng)
        _ = float(np.asarray(m["loss"])[-1])
        best = float("inf")
        deadline = time.time() + 120
        while time.time() < deadline:
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, m = multi(state, batch_graph, k)
            _ = float(np.asarray(m["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
        val = inner * batch / best
        results[name] = val
        floor = FLOORS.get(name)
        print(json.dumps({
            "metric": f"{name}_graph_steps_per_sec_per_chip",
            "value": round(val, 2),
            "unit": "graphs/s",
            "floor": floor,
            "above_floor": None if floor is None else bool(val >= floor),
        }), flush=True)

    frame_cfg = config_lib.get_frame_config(param)

    if only in (None, "xla"):
        # concat layout + stacked batch: the pre-sidecar path
        ds = config_lib.get_dataset(param, frame_cfg)
        loader = BatchLoader(ds, batch, shuffle=False, device_put=False)
        g = jax.device_put(next(iter(loader)))
        step = build_step(sim)
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
        bench("plate_xla", make_multi_step(step, unroll=inner), state, g)

    if only in (None, "fused"):
        # sidecar layout + packed batch + fused NK attention (the
        # committed --packed --fused plate path, cli/train.py)
        fc_side = dataclasses.replace(
            frame_cfg,
            world=dataclasses.replace(frame_cfg.world, sidecar=True),
        )
        ds = config_lib.get_dataset(param, fc_side)
        mgr = FusedTopologyManager(build_nk=True)
        loader = BatchLoader(
            ds, batch, shuffle=False, device_put=False, packed=True,
            frame_transform=mgr.transform_frame,
            packed_transform=mgr.transform_packed,
        )
        g = next(iter(loader))
        wm = np.asarray(g.wedge_mask)
        print(json.dumps({
            "metric": "plate_world_edges_active_mean", "unit": "edges",
            "value": round(float(wm.sum(0).mean()), 1),
            "budget": int(wm.shape[0]),
        }), flush=True)
        g = jax.device_put(g)
        sim_t, step = mgr.step_for(g, sim, build_step)
        state = init_train_state(sim_t, opt, jax.random.PRNGKey(0), g)
        bench("plate_fused", make_multi_step(step, unroll=inner), state, g)

    if "plate_xla" in results and "plate_fused" in results:
        print(json.dumps({
            "metric": "plate_fused_vs_xla_speedup",
            "value": round(results["plate_fused"] / results["plate_xla"], 2),
            "unit": "x",
        }), flush=True)

    if os.environ.get("BM_ASSERT"):
        misses = {k: v for k, v in results.items()
                  if FLOORS.get(k) is not None and v < FLOORS[k]}
        assert not misses, f"plate floors missed: {misses}"


if __name__ == "__main__":
    main()
