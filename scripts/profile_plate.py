"""Device-op time breakdown of the PLATE fused train step.

The round-5 canonical matrix measured the plate (world-edge sidecar)
fused step at 251.6 g/s with only 7.9 TF/s issued — the MXU idles ~90%
of the wall time while the same-width aneurysm transformer runs 64
TF/s. This captures an XLA trace of the committed plate step
(bench_canonical.build_workload) and prints the op-level accounting to
find the glue.

    JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache \
        python scripts/profile_plate.py [workload]
"""

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bench_canonical import build_workload
from graph_physics_tpu.training.step import make_multi_step

name = sys.argv[1] if len(sys.argv) > 1 else "plate"
d = tempfile.mkdtemp()
sim_t, step, state, g, raw, param = build_workload(name, d)
multi = make_multi_step(step, unroll=10)
rng = jax.random.PRNGKey(1)

state, metrics = multi(state, g, rng)
_ = float(np.asarray(metrics["loss"])[-1])

os.system("rm -rf /tmp/plate_trace")
with jax.profiler.trace("/tmp/plate_trace"):
    state, metrics = multi(state, g, rng)
    _ = float(np.asarray(metrics["loss"])[-1])

path = sorted(glob.glob("/tmp/plate_trace/**/*.trace.json.gz",
                        recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

events = [e for e in trace["traceEvents"] if e.get("ph") == "X" and "dur" in e]
pid_names = {e["pid"]: e["args"].get("name", "")
             for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
             for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "thread_name"}

by_name = defaultdict(float)
for e in events:
    if e["pid"] not in tpu_pids:
        continue
    tname = tid_names.get((e["pid"], e["tid"]), "")
    by_name[(tname, e["name"])] += e["dur"]

print("== threads ==")
tdur = defaultdict(float)
for (t, n), dur in by_name.items():
    tdur[t] += dur
for t, dur in sorted(tdur.items(), key=lambda kv: -kv[1]):
    print(f"{t:40s} {dur/1e3:9.2f} ms")

main_t = max(tdur, key=tdur.get)
print(f"\n== top ops ({main_t}) ==")
ops = defaultdict(float)
cnt = defaultdict(int)
for (t, n), dur in by_name.items():
    if t == main_t:
        ops[n] += dur
for e in events:
    if e["pid"] in tpu_pids and tid_names.get((e["pid"], e["tid"])) == main_t:
        cnt[e["name"]] += 1
for n, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur/1e3:9.2f} ms  x{cnt[n]:5d}  {n[:110]}")
