"""Rollout (validation) throughput on the TPU — VERDICT r4 item 6a.

Training throughput is guarded by bench.py; validation was not, and the
live-train demo showed it at ~half of each epoch. Two legs, measured
through the COMMITTED rollout machinery (training/rollout.py — the same
scan the Trainer's validate() dispatches):

  rollout_cylinder   600-step autoregressive rollout, cylinder-sized
                     mesh (48x40 = 1,920 nodes — CylinderFlow's 600-step
                     trajectory shape), epd h32/5, bf16
  rollout_plate_dwe  200-step rollout with DYNAMIC world edges (on-device
                     radius rediscovery each step, rollout.py
                     DynamicWorldEdges), plate transformer h64/10

Prints one JSON line per leg: rollout steps/s (best full-trajectory
dispatch over the window). BM_ASSERT=1 enforces the committed floors.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python scripts/bench_rollout.py [cylinder|plate]
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

#: committed floors, rollout steps/s (round-5 measured: cylinder
#: 1,043.1 — matching round 1's 1,021 despite batched vmap + dynamic
#: world edges + chunked streaming landing since; plate+dwe 76.9)
FLOORS = {"rollout_cylinder": 900.0, "rollout_plate_dwe": 65.0}


def bench(name, rollout_fn, params, sim_state, frames, steps, window=120.0):
    import jax

    res = rollout_fn(params, sim_state, frames)
    _ = float(np.sum(np.asarray(res.sq_sum)))  # compile + settle
    best = float("inf")
    deadline = time.time() + window
    while time.time() < deadline:
        t0 = time.perf_counter()
        res = rollout_fn(params, sim_state, frames)
        _ = float(np.sum(np.asarray(res.sq_sum)))
        best = min(best, time.perf_counter() - t0)
    val = steps / best
    floor = FLOORS.get(name)
    print(json.dumps({
        "metric": f"{name}_steps_per_sec", "value": round(val, 1),
        "unit": "rollout steps/s", "trajectory_steps": steps,
        "floor": floor,
        "above_floor": None if floor is None else bool(val >= floor),
    }), flush=True)
    return val


def main():
    import jax
    import jax.numpy as jnp

    from graph_physics_tpu.cli.train import _honor_platform_env

    _honor_platform_env()  # JAX_PLATFORMS=cpu actually lands on CPU
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training.rollout import make_rollout_fn
    from graph_physics_tpu.training.step import init_train_state, model_params
    from graph_physics_tpu.training import schedule

    only = sys.argv[1] if len(sys.argv) > 1 else None
    # BR_SMOKE=1: tiny shapes + 2 s windows (CPU CI smoke of the full path)
    smoke = bool(os.environ.get("BR_SMOKE"))
    d = tempfile.mkdtemp()
    results = {}

    def stack_traj(ds, t=0):
        return jax.tree.map(
            lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
            *ds.trajectory_frames(t),
        )

    if only in (None, "cylinder"):
        steps = 12 if smoke else 600
        nx, ny = (10, 8) if smoke else (48, 40)
        train_h5, meta = synthetic.write_h5_dataset(
            os.path.join(d, "cyl.h5"), num_trajectories=1, nx=nx, ny=ny,
            num_steps=steps + 2, meta_path=os.path.join(d, "cyl_meta.json"),
        )
        cfg = {
            "dataset": {"extension": "h5", "train_path": train_h5,
                        "test_path": train_h5, "meta_path": meta,
                        "targets": ["velocity"], "khop": 1},
            "model": {"type": "epd", "message_passing_num": 5,
                      "hidden_size": 32, "node_input_size": 2,
                      "output_size": 2, "edge_input_size": 3},
            "index": {"feature_index_start": 0, "feature_index_end": 2,
                      "output_index_start": 0, "output_index_end": 2,
                      "node_type_index": 2},
            "transformations": {"preprocessing": {"noise": 0,
                                                  "masking": 0},
                                "world_pos_parameters": {"use": False}},
            "training": {},
        }
        p = os.path.join(d, "cyl_cfg.json")
        json.dump(cfg, open(p, "w"))
        param = config_lib.load_params(p)
        model = config_lib.get_model(param, dtype=jnp.bfloat16)
        sim = config_lib.get_simulator(param, model)
        ds = config_lib.get_dataset(param, config_lib.get_frame_config(param))
        frames = stack_traj(ds)
        opt = schedule.make_optimizer(1e-3, warmup=10, num_steps=100)
        state = init_train_state(
            sim, opt, jax.random.PRNGKey(0),
            jax.tree.map(lambda a: a[0], frames),
        )
        rollout = make_rollout_fn(sim)
        results["rollout_cylinder"] = bench(
            "rollout_cylinder", rollout, model_params(state.params),
            state.sim_state, frames, frames.x.shape[0],
            window=2.0 if smoke else 120.0,
        )

    if only in (None, "plate"):
        steps = 8 if smoke else 200
        import bench_plate

        param = bench_plate.plate_param(
            os.path.join(d, "plate"), num_steps=steps + 2,
            **(dict(nx=10, ny=8, edge_budget=64) if smoke else {}),
        )
        # dynamic on-device world edges during rollout (host leaves the
        # reserved tail free — the cli/train.py radius=1e-12 trick)
        param["transformations"]["world_pos_parameters"]["dynamic_rollout"] \
            = True
        model = config_lib.get_model(param, dtype=jnp.bfloat16)
        sim = config_lib.get_simulator(param, model)
        dwe = config_lib.get_dynamic_world_edges(param)
        assert dwe is not None
        fc = config_lib.get_frame_config(param)
        fc = dataclasses.replace(
            fc, world=dataclasses.replace(fc.world, radius=1e-12)
        )
        ds = config_lib.get_dataset(param, fc)
        frames = stack_traj(ds)
        opt = schedule.make_optimizer(1e-3, warmup=10, num_steps=100)
        state = init_train_state(
            sim, opt, jax.random.PRNGKey(0),
            jax.tree.map(lambda a: a[0], frames),
        )
        rollout = make_rollout_fn(sim, dynamic_world_edges=dwe)
        results["rollout_plate_dwe"] = bench(
            "rollout_plate_dwe", rollout, model_params(state.params),
            state.sim_state, frames, frames.x.shape[0],
            window=2.0 if smoke else 120.0,
        )

    if os.environ.get("BM_ASSERT"):
        misses = {k: v for k, v in results.items()
                  if FLOORS.get(k) is not None and v < FLOORS[k]}
        assert not misses, f"rollout floors missed: {misses}"


if __name__ == "__main__":
    main()
