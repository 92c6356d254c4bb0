"""Serving-artifact throughput on the TPU (docs/SERVING.md path).

Training (bench.py) and validation (bench_rollout.py) are floor-guarded;
the DEPLOYMENT path — ahead-of-time `jax.export` StableHLO artifacts
loaded without model code (serving/export.py) — was not. Three legs on
the cylinder workload (48x40 = 1,920 nodes, epd h32/5, bf16), all
through `save_exported` -> `load_exported` round trips, i.e. exactly
what a serving host with only jax installed executes:

  serving_eval          single-frame exported eval step (graphs/s)
  serving_eval_batched  B=64 vmapped exported eval step (graphs/s)
  serving_rollout       600-step exported autoregressive rollout
                        (rollout steps/s; the in-process scan measured
                        1,043 steps/s — bench_rollout.py — so parity
                        here shows the export boundary costs nothing)

Prints one JSON line per leg; BM_ASSERT=1 enforces the committed floors
(BASELINE.md round 5).

    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python scripts/bench_serving.py [eval|batched|rollout]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

#: committed floors (round-5 measured: eval 1,226 it/s single-frame,
#: batched B=64 14,096 graphs/s, rollout 1,062 steps/s == the
#: in-process scan within noise; floors ~85%)
FLOORS = {"serving_eval": 1000.0, "serving_eval_batched": 11000.0,
          "serving_rollout": 900.0}


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
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.step import init_train_state, model_params
    from graph_physics_tpu.serving import (
        export_eval_step, export_rollout, load_exported, save_exported,
    )

    only = sys.argv[1] if len(sys.argv) > 1 else None
    smoke = bool(os.environ.get("BR_SMOKE"))
    steps = 12 if smoke else 600
    nx, ny = (10, 8) if smoke else (48, 40)
    window = 2.0 if smoke else 60.0
    d = tempfile.mkdtemp()
    results = {}

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
        "transformations": {"preprocessing": {"noise": 0, "masking": 0},
                            "world_pos_parameters": {"use": False}},
        "training": {},
    }
    p = os.path.join(d, "cyl_cfg.json")
    json.dump(cfg, open(p, "w"))
    param = config_lib.load_params(p)
    model = config_lib.get_model(param, dtype=jnp.bfloat16)
    sim = config_lib.get_simulator(param, model)
    ds = config_lib.get_dataset(param, config_lib.get_frame_config(param))
    frames = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])),
        *ds.trajectory_frames(0),
    )
    g = jax.tree.map(lambda a: a[0], frames)
    opt = schedule.make_optimizer(1e-3, warmup=10, num_steps=100)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
    params, sim_state = model_params(state.params), state.sim_state

    # export on the REAL platform only: multi-platform lowering is the
    # artifact default (tested in test_serving.py); the bench measures
    # execution, not lowering breadth
    platform = jax.devices()[0].platform
    art = {}
    if only in (None, "eval"):
        art["eval_step"] = export_eval_step(
            sim, params, sim_state, g, platforms=(platform,))
    if only in (None, "batched"):
        art["batched_eval_step"] = export_eval_step(
            sim, params, sim_state, g, platforms=(platform,),
            batch_size=4 if smoke else 64)
    if only in (None, "rollout"):
        art["rollout"] = export_rollout(
            sim, params, sim_state, frames, platforms=(platform,))
    out_dir = os.path.join(d, "artifact")
    save_exported(out_dir, **art)
    loaded = load_exported(out_dir)

    def bench(name, fn, per_call, fetch=None):
        # fetch: which output to materialize per call. The rollout dict
        # carries the full [T, N, out] predictions (~9 MB) — a serving
        # host consumes them locally, but pulling them through the
        # benchmark tunnel would measure the wire, not the chip; the
        # RMSE scalar still synchronizes the whole scan.
        fetch = fetch or (lambda r: r)
        r = fn()
        _ = jax.tree.map(lambda a: np.asarray(a), fetch(r))  # compile
        best = float("inf")
        deadline = time.time() + window
        while time.time() < deadline:
            t0 = time.perf_counter()
            r = fn()
            _ = jax.tree.map(lambda a: np.asarray(a), fetch(r))
            best = min(best, time.perf_counter() - t0)
        val = per_call / best
        floor = FLOORS.get(name)
        results[name] = val
        print(json.dumps({
            "metric": name, "value": round(val, 1),
            "unit": "graphs/s" if "eval" in name else "rollout steps/s",
            "per_dispatch": per_call, "floor": floor,
            "above_floor": None if floor is None else bool(val >= floor),
        }), flush=True)

    if "eval_step" in art:
        # 50 sequential single-frame evals per dispatch timing window
        # would under-count the per-call host boundary a real server
        # pays; dispatch one call per timing to keep it honest
        gd = jax.device_put(g)
        bench("serving_eval", lambda: loaded.eval_step(params, sim_state, gd),
              per_call=1)
    if "batched_eval_step" in art:
        B = 4 if smoke else 64
        bg = jax.device_put(
            jax.tree.map(lambda a: jnp.stack([a] * B), g))
        bench("serving_eval_batched",
              lambda: loaded.eval_step_batched(params, sim_state, bg),
              per_call=B)
    if "rollout" in art:
        fd = jax.device_put(frames)
        bench("serving_rollout",
              lambda: loaded.rollout(params, sim_state, fd),
              per_call=int(frames.x.shape[0]),
              fetch=lambda r: r["rmse_all_rollout"])

    if os.environ.get("BM_ASSERT"):
        misses = {k: v for k, v in results.items()
                  if FLOORS.get(k) is not None and v < FLOORS[k]}
        assert not misses, f"serving floors missed: {misses}"


if __name__ == "__main__":
    main()
