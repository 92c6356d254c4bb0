import sys, os, time, json
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
import h5py, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.training.fused import FusedTopologyManager
from graph_physics_tpu.models.processors import EncodeProcessDecode
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training import schedule
from graph_physics_tpu.training.loss import LossType
from graph_physics_tpu.training.packed import pack
from graph_physics_tpu.training.step import NoiseConfig, init_train_state, make_multi_step, make_train_step

f = h5py.File("/root/reference/tests/mock_airfoil/sample_000000005.h5", "r")
pos = np.asarray(f["data0"])[:, :2].astype(np.float32)
cells = np.asarray(f["data1"], np.int64)
vel = np.stack([np.asarray(f["data2"]), np.asarray(f["data3"])], -1).astype(np.float32)
nt = np.zeros(len(pos), np.int32)
x = np.concatenate([vel, nt[:, None].astype(np.float32), np.zeros((len(pos),1), np.float32)], -1)
ei = mesh_lib.faces_to_edges(cells, len(pos))
g = mesh_lib.build_mesh_graph(x, pos, nt, ei, y=vel, faces=None)
g = g.replace(traj_index=np.asarray(0, np.int32), faces=None)
mgr = FusedTopologyManager()
gf = mgr.transform_frame(g)
t, _ = mgr.tiling_of(0)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
batch = pack(jax.tree.map(lambda a: np.stack([np.asarray(a)]*B), gf))
model = EncodeProcessDecode(message_passing_num=5, node_input_size=2+9, edge_input_size=3,
                            output_size=2, hidden_size=32, edge_tiling=t, dtype=jnp.bfloat16)
sim = Simulator(node_input_size=2+9, edge_input_size=3, output_size=2,
                feature_index_start=0, feature_index_end=2, output_index_start=0,
                output_index_end=2, node_type_index=2, model=model)
opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)
step = make_train_step(sim, opt, LossType.L2LOSS, NoiseConfig((0,), (2,), (0.02,)), num_steps=10000)
state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
multi = make_multi_step(step, unroll=20)
rng = jax.random.PRNGKey(1)
state, m = multi(state, batch, rng)
_ = float(np.asarray(m["loss"])[-1])
best = float("inf")
deadline = time.time() + 90
while time.time() < deadline:
    rng, k = jax.random.split(rng)
    t0 = time.perf_counter()
    state, m = multi(state, batch, k)
    _ = float(np.asarray(m["loss"])[-1])
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"metric": f"airfoil27k_fused_B{B}", "value": round(20*B/best, 2),
                  "ms_per_step": round(best*1e3/20, 2)}))
