"""Device-time breakdown of the transformer train step (where do the
6 ms/graph go: edge attention segment ops vs FFN matmuls?)."""
import glob, gzip, json, os, sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.models.processors import EncodeTransformDecode
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training import schedule
from graph_physics_tpu.training.loss import LossType
from graph_physics_tpu.training.packed import pack
from graph_physics_tpu.training.step import NoiseConfig, init_train_state, make_multi_step, make_train_step

traj = synthetic.make_trajectory(48, 40, num_steps=3)
pos = traj["mesh_pos"][0]; nt = traj["node_type"][0, :, 0]
x = np.concatenate([traj["velocity"][0], nt[:, None].astype(np.float32),
                    np.zeros((len(pos), 1), np.float32)], -1)
ei = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
g = mesh_lib.build_mesh_graph(x, pos, nt, ei, y=traj["velocity"][1])
from graph_physics_tpu.ops import tiling as tiling_lib
TILING = tiling_lib.build_edge_tiling(np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node), edge_mask=np.asarray(g.edge_mask))
g = tiling_lib.apply_to_graph(g, TILING)
model = EncodeTransformDecode(message_passing_num=10, node_input_size=11,
                              output_size=2, hidden_size=64, num_heads=4,
                              dtype=jnp.bfloat16, edge_tiling=TILING)
sim = Simulator(node_input_size=11, edge_input_size=0, output_size=2,
    feature_index_start=0, feature_index_end=2, output_index_start=0,
    output_index_end=2, node_type_index=2, model=model)
opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)
step = make_train_step(sim, opt, LossType.L2LOSS,
                       NoiseConfig((0,), (2,), (0.02,)), num_steps=10000)
B = 64
bg = pack(jax.tree.map(lambda a: np.stack([np.asarray(a)] * B), g))
state = init_train_state(sim, opt, jax.random.PRNGKey(0), bg)
multi = make_multi_step(step, unroll=10)
rng = jax.random.PRNGKey(1)
state, m = multi(state, bg, rng)
_ = float(np.asarray(m["loss"])[-1])

os.system("rm -rf /tmp/tf_trace")
with jax.profiler.trace("/tmp/tf_trace"):
    state, m = multi(state, bg, jax.random.PRNGKey(2))
    _ = float(np.asarray(m["loss"])[-1])

path = sorted(glob.glob("/tmp/tf_trace/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)
events = [e for e in trace["traceEvents"] if e.get("ph") == "X" and "dur" in e]
pid_names = {e["pid"]: e["args"].get("name", "") for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
             for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
by = defaultdict(float); cnt = defaultdict(int)
tdur = defaultdict(float)
for e in events:
    if e["pid"] not in tpu_pids:
        continue
    tn = tid_names.get((e["pid"], e["tid"]), "")
    tdur[tn] += e["dur"]
    by[(tn, e["name"])] += e["dur"]; cnt[(tn, e["name"])] += 1
main_t = max(tdur, key=tdur.get)
print("total", round(tdur[main_t]/1e3, 2), "ms for 10 steps")
ops = sorted(((d, n) for (t, n), d in by.items() if t == main_t), reverse=True)
for d, n in ops[:30]:
    print(f"{d/1e3:9.2f} ms x{cnt[(main_t,n)]:4d}  {n[:90]}")
