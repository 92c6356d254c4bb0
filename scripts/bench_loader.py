"""Loader/step balance (VERDICT r3 item 7).

Measures BatchLoader HOST throughput (frames/s: h5 read + FrameBuilder +
fused layout conversion + packing) against the fused train step's demand
(the headline graph-steps/s consumes one frame per graph-step), for:

* the cylinder-bench-sized synthetic mesh (1,920 nodes, the headline
  workload), and
* the reference's real 27k-node airfoil fixture when present.

Prints one JSON line per workload with the demand ratio. Run on any
host; the numbers are CPU-side (device transfer excluded via
device_put=False — H2D overlaps the step in real training).

Usage: python scripts/bench_loader.py [--workers N] [--batches K]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the committed headline step demand (BENCH round 4; frames == graphs)
STEP_DEMAND_FRAMES_PER_S = 4982.0


def bench_loader(name, ds, batch_size, batches, workers, transform, demand):
    from graph_physics_tpu.dataset.loader import BatchLoader

    loader = BatchLoader(
        ds, batch_size, shuffle=True, seed=0, device_put=False,
        packed=True, frame_transform=transform, workers=workers,
    )
    it = iter(loader)
    next(it)  # warm the caches (h5 LRU, tilings)
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += batch_size
        if n >= batches * batch_size:
            break
    dt = time.perf_counter() - t0
    fps = n / dt
    print(json.dumps({
        "metric": f"loader_frames_per_sec[{name}]",
        "value": round(fps, 1),
        "workers": workers,
        "frames": n,
        "step_demand": demand,
        "loader_vs_step": round(fps / demand, 3),
    }), flush=True)
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=None,
                    help="FrameBuilder thread-pool size (default: both 1 "
                         "and 8 for the A/B)")
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import tempfile

    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.training.fused import FusedTopologyManager

    d = tempfile.mkdtemp()
    train_h5, meta = synthetic.write_h5_dataset(
        os.path.join(d, "train.h5"), num_trajectories=4, nx=48, ny=40,
        num_steps=64, meta_path=os.path.join(d, "meta.json"),
    )
    ds = H5Dataset(train_h5, meta, FrameConfig(targets=("velocity",)))
    mgr = FusedTopologyManager(nk_layout=True)

    worker_list = [args.workers] if args.workers else [1, 8]
    for w in worker_list:
        bench_loader("cylinder_nk", ds, 128, args.batches, w,
                     mgr.transform_frame, STEP_DEMAND_FRAMES_PER_S)

    # real airfoil fixture (27k nodes): fused-path demand measured at
    # 160.8 g/s (BASELINE round 3)
    airfoil = "/root/reference/tests/mock_airfoil/sample.h5"
    airfoil_meta = "/root/reference/tests/mock_airfoil/meta.json"
    if os.path.exists(airfoil) and os.path.exists(airfoil_meta):
        ads = H5Dataset(airfoil, airfoil_meta,
                        FrameConfig(targets=("velocity",)))
        amgr = FusedTopologyManager(nk_layout=True)
        for w in worker_list:
            bench_loader("airfoil_nk", ads, 16, min(args.batches, 10), w,
                         amgr.transform_frame, 160.8)


if __name__ == "__main__":
    main()
