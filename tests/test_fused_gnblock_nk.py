"""Uniform-degree (NK) fused GraphNetBlock: layout + fwd/bwd parity.

Checks mirror tests/test_fused_gnblock.py for the CSR kernel:
  * NK slot layout round-trip (apply_to_graph_nk vs original edges);
  * fused NK kernel (interpret mode) vs the pure-JAX NK reference;
  * fused NK kernel vs the CSR fused kernel on the SAME edge set
    (the layouts must agree on every valid value and every gradient);
  * full EncodeProcessDecode with edge_tiling_nk vs the XLA path.
Contract being accelerated: graphphysics/models/layers.py:1015-1102.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_edge_attention_nk import build_nk_tiling
from graph_physics_tpu.ops.fused_gnblock import fused_gn_block
from graph_physics_tpu.ops.fused_gnblock_nk import (
    blocked_reference_nk,
    fused_gn_block_nk,
)
from tests.test_fused_gnblock import _params, _toy_graph


def _nk_tiling(senders, receivers, n):
    nk = build_nk_tiling(senders, receivers, n, node_block=128)
    assert nk is not None
    return nk


def test_nk_layout_roundtrip():
    pos, ei = _toy_graph()
    n = len(pos)
    senders, receivers = ei
    t = _nk_tiling(senders, receivers, n)
    e = senders.shape[0]
    vals = np.random.default_rng(0).normal(size=(e, 3)).astype(np.float32)
    slotted = t.expand_edges(vals)
    back = t.reduce_edges(slotted, e)
    np.testing.assert_array_equal(back, vals)
    # every valid slot's sender/receiver reconstructs the original edge
    gids = np.repeat(np.arange(t.num_groups), t.slots)
    loc_r = np.tile(np.arange(t.slots) % t.node_block, t.num_groups)
    valid = t.perm >= 0
    glob_r = gids * t.node_block + loc_r
    sidx_flat = t.sidx.reshape(-1)
    rank = np.minimum(sidx_flat // t.window_unit, t.window_blocks - 1)
    glob_s = t.win_start[gids, rank] * t.window_unit + sidx_flat % t.window_unit
    np.testing.assert_array_equal(glob_r[valid], receivers[t.perm[valid]])
    np.testing.assert_array_equal(glob_s[valid], senders[t.perm[valid]])


def test_apply_to_graph_nk():
    from tests.helpers import tiny_graph

    g = tiny_graph(nx=14, ny=10)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    mask = np.asarray(g.edge_mask)
    t = build_nk_tiling(s, r, g.x.shape[0], edge_mask=mask, node_block=128)
    assert t is not None
    gn = tiling_lib.apply_to_graph_nk(g, t)
    assert gn.x.shape[0] == t.num_nodes
    assert gn.senders.shape[0] == t.num_groups * t.slots
    assert gn.tiling_idx_nk is not None
    # valid slots reproduce the original (mask-filtered) edge pairs
    valid = np.asarray(gn.edge_mask)
    orig = t.perm[valid]
    np.testing.assert_array_equal(np.asarray(gn.senders)[valid], s[orig])
    np.testing.assert_array_equal(np.asarray(gn.receivers)[valid], r[orig])


@pytest.mark.parametrize("activation", ["relu", "gelu"])
def test_nk_block_matches_reference(activation):
    f, b = 32, 4
    pos, ei = _toy_graph()
    n_real = len(pos)
    senders, receivers = ei
    t = _nk_tiling(senders, receivers, n_real)
    n = t.num_nodes

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_orig = jax.random.normal(jax.random.fold_in(key, 1),
                               (senders.shape[0], b, f), jnp.float32) * 0.5
    e_slots = jnp.asarray(t.expand_edges(np.asarray(e_orig)))

    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)

    x_ref, e_ref = blocked_reference_nk(x, e_slots, ep, np_, t,
                                        activation=activation,
                                        compute_dtype=jnp.bfloat16)
    x_f, e_f = fused_gn_block_nk(x.astype(jnp.bfloat16),
                                 e_slots.astype(jnp.bfloat16), ep, np_, t,
                                 activation=activation, interpret=True)
    np.testing.assert_allclose(np.asarray(x_f, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(e_f, np.float32),
                               np.asarray(e_ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_nk_matches_csr_fused_kernel():
    """Strongest check: NK vs CSR fused kernels on the SAME edge set —
    node outputs, per-edge outputs (through each layout's perm), dx and
    every weight gradient must agree to bf16 tolerance."""
    f, b = 32, 4
    pos, ei = _toy_graph(nx=14, ny=10)
    n_real = len(pos)
    senders, receivers = ei
    e = senders.shape[0]
    t_csr = tiling_lib.build_edge_tiling(senders, receivers, n_real,
                                         node_block=128)
    t_nk = _nk_tiling(senders, receivers, n_real)
    assert t_csr is not None and t_csr.num_nodes == t_nk.num_nodes
    n = t_nk.num_nodes

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_vals = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (e, b, f))) * 0.5
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))
    cot_e = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 5), (e, b, f)))

    def loss_csr(x, ep, np_):
        eb = jnp.asarray(t_csr.expand_edges(e_vals))
        ce = jnp.asarray(t_csr.expand_edges(cot_e))
        xo, eo = fused_gn_block(x, eb, ep, np_, t_csr, interpret=True)
        return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * ce))

    def loss_nk(x, ep, np_):
        eb = jnp.asarray(t_nk.expand_edges(e_vals))
        ce = jnp.asarray(t_nk.expand_edges(cot_e))
        xo, eo = fused_gn_block_nk(x, eb, ep, np_, t_nk, interpret=True)
        return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * ce))

    (v_c, g_c) = jax.value_and_grad(loss_csr, argnums=(0, 1, 2))(x, ep, np_)
    (v_n, g_n) = jax.value_and_grad(loss_nk, argnums=(0, 1, 2))(x, ep, np_)
    np.testing.assert_allclose(float(v_n), float(v_c), rtol=0.02)
    for tc, tn, name in zip(g_c, g_n, ["dx", "edge_w", "node_w"]):
        for a, c in zip(jax.tree.leaves(tc), jax.tree.leaves(tn)):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                       err_msg=name)

    # forward values agree edge-by-edge through each layout's perm
    xo_c, eo_c = fused_gn_block(
        x.astype(jnp.bfloat16), jnp.asarray(t_csr.expand_edges(e_vals)),
        ep, np_, t_csr, interpret=True)
    xo_n, eo_n = fused_gn_block_nk(
        x.astype(jnp.bfloat16), jnp.asarray(t_nk.expand_edges(e_vals)),
        ep, np_, t_nk, interpret=True)
    np.testing.assert_allclose(np.asarray(xo_n, np.float32),
                               np.asarray(xo_c, np.float32),
                               rtol=0.05, atol=0.05)
    back_c = t_csr.reduce_edges(np.asarray(eo_c, np.float32), e)
    back_n = t_nk.reduce_edges(np.asarray(eo_n, np.float32), e)
    np.testing.assert_allclose(back_n, back_c, rtol=0.05, atol=0.05)


def test_nk_folded_encoder_and_last_block():
    """Folded-encoder NK kernel vs unfolded (XLA-encoded) NK kernel, and
    last_block value/grad identity when eout is unused."""
    from graph_physics_tpu.models.layers import MLP

    f, b = 32, 4
    pos, ei = _toy_graph(nx=12, ny=8)
    senders, receivers = ei
    t = _nk_tiling(senders, receivers, len(pos))
    n = t.num_nodes
    fe = 3

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_raw = jnp.asarray(
        t.expand_edges(
            np.asarray(jax.random.normal(
                jax.random.fold_in(key, 1), (senders.shape[0], b, fe)))))
    enc = MLP(hidden_size=f, out_size=f, dtype=jnp.bfloat16)
    enc_params = enc.init(jax.random.fold_in(key, 2),
                          jnp.zeros((1, fe)))["params"]
    ep = _params(jax.random.fold_in(key, 3), f, 3)
    np_ = _params(jax.random.fold_in(key, 4), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 5), (n, b, f))
    cot_e = jax.random.normal(jax.random.fold_in(key, 6),
                              (e_raw.shape[0], b, f))

    from tests.test_fused_gnblock import test_fused_block_folded_encoder_matches  # noqa: F401
    # dtype-faithful encoder mirror (same as the CSR folded test)
    import math as _m

    def enc_ref(p, h):
        def dense(z, kern):
            return jax.lax.dot_general(
                z.astype(jnp.bfloat16), kern.astype(jnp.bfloat16),
                dimension_numbers=(((z.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        n_dense = len([k for k in p if k.startswith("Dense_")])
        h = dense(h, p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"].astype(
            jnp.bfloat16)
        for i in range(1, n_dense):
            h = dense(jax.nn.relu(h), p[f"Dense_{i}"]["kernel"])
            h = h + p[f"Dense_{i}"]["bias"].astype(jnp.bfloat16)
        gs = jnp.sum((h * h).astype(jnp.float32), -1, keepdims=True)
        rms = jnp.sqrt(gs + 1e-24) / _m.sqrt(f)
        inv = 1.0 / (rms + 1e-8)
        return h * inv.astype(jnp.bfloat16) * p["RMSNorm_0"]["scale"].astype(
            jnp.bfloat16)

    def loss_ref(x, enc_p, ep, np_):
        e_enc = enc_ref(enc_p, e_raw.astype(jnp.bfloat16))
        xo, eo = fused_gn_block_nk(x, e_enc, ep, np_, t, interpret=True)
        return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * cot_e))

    def loss_folded(x, enc_p, ep, np_):
        xo, eo = fused_gn_block_nk(
            x, e_raw, ep, np_, t, interpret=True, edge_encoder_params=enc_p)
        return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * cot_e))

    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        x, enc_params, ep, np_)
    v_f, g_f = jax.value_and_grad(loss_folded, argnums=(0, 1, 2, 3))(
        x, enc_params, ep, np_)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=0.02)
    for tr, tf, name in zip(g_r, g_f, ["dx", "enc_w", "edge_w", "node_w"]):
        for a, c in zip(jax.tree.leaves(tr), jax.tree.leaves(tf)):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                       err_msg=name)

    # last_block: x output/grads identical when eout is unused
    e_hidden = jnp.asarray(
        t.expand_edges(np.asarray(jax.random.normal(
            jax.random.fold_in(key, 7), (senders.shape[0], b, f))) * 0.5))

    def loss_last(last, x):
        xo, _eo = fused_gn_block_nk(x, e_hidden, ep, np_, t, interpret=True,
                                    last_block=last)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    v0, g0 = jax.value_and_grad(loss_last, argnums=1)(False, x)
    v1, g1 = jax.value_and_grad(loss_last, argnums=1)(True, x)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g0, np.float32),
                               rtol=1e-3, atol=1e-5)


def test_epd_nk_matches_xla():
    """Full EncodeProcessDecode with edge_tiling_nk (folded encoder +
    last-block elision + runtime tiling_idx_nk) vs the plain XLA path."""
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from tests.helpers import tiny_graph

    f, b = 32, 4
    g = tiny_graph(nx=14, ny=10)
    t = build_nk_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), g.x.shape[0],
        edge_mask=np.asarray(g.edge_mask), node_block=128)
    assert t is not None
    gt = tiling_lib.apply_to_graph_nk(g, t)

    key = jax.random.PRNGKey(5)
    gp = jax.tree.map(jnp.asarray, g)
    e_cnt = gp.senders.shape[0]
    n = gp.x.shape[0]
    gp = gp.replace(
        x=jax.random.normal(key, (n, b, 4), jnp.float32) * 0.5,
        edge_attr=jax.random.normal(jax.random.fold_in(key, 1),
                                    (e_cnt, b, 3)) * 0.5,
    )
    ea_slots = jnp.asarray(t.expand_edges(np.asarray(gp.edge_attr)))
    x_pad = jnp.zeros((t.num_nodes, b, 4)).at[:n].set(gp.x)
    gt = jax.tree.map(jnp.asarray, gt)
    gt = gt.replace(x=x_pad, edge_attr=ea_slots)

    kwargs = dict(
        message_passing_num=3, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=f, dtype=jnp.bfloat16,
    )
    m_xla = EncodeProcessDecode(**kwargs)
    m_nk = EncodeProcessDecode(edge_tiling_nk=t, **kwargs)
    params = m_xla.init(jax.random.fold_in(key, 2), gp)
    out_xla = m_xla.apply(params, gp)
    out_nk = m_nk.apply(params, gt)

    n_real = int(g.n_node)
    np.testing.assert_allclose(
        np.asarray(out_nk, np.float32)[:n_real],
        np.asarray(out_xla, np.float32)[:n_real],
        rtol=0.15, atol=0.15)

    def loss(p):
        return jnp.sum(m_nk.apply(p, gt).astype(jnp.float32)[:n_real] ** 2)

    grads = jax.grad(loss)(params)
    enc_g = grads["params"]["edges_encoder"]
    assert max(
        float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(enc_g)
    ) > 0


def test_trainer_fused_gn_nk(tmp_path):
    """Trainer(fused=True, fused_gn_nk=True): frames convert to the NK
    slot layout, steps key on the NK bucket, loss matches the unfused
    Trainer to bf16 tolerance."""
    import json

    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

    # mesh large enough that K·n_pad clears the NK row-inflation guard
    # (tiny meshes pad a whole 128-node block and get rejected)
    h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=2, nx=20, ny=16,
        num_steps=6, meta_path=str(tmp_path / "meta.json"),
    )
    fc = FrameConfig(targets=("velocity",))

    def make_trainer(nk):
        model = EncodeProcessDecode(
            message_passing_num=2, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=32, dtype=jnp.bfloat16,
        )
        sim = Simulator(
            node_input_size=11, edge_input_size=3, output_size=2,
            feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
            model=model,
        )
        cfg = TrainerConfig(
            epochs=1, batch_size=4, warmup=2, packed=True, fused=nk,
            fused_gn_nk=nk,
            out_dir=str(tmp_path / ("rn" if nk else "rx")), run_name="r",
        )
        return Trainer(sim, H5Dataset(h5, meta, fc), None, LossType.L2LOSS,
                       cfg)

    t_n = make_trainer(True)
    t_n.fit()
    # every trajectory got an NK tiling and an NK-keyed step
    assert all(e[2] is not None for e in t_n._fused_mgr._tilings.values())
    assert all(k[0] == "nk" for k in t_n._fused_mgr._steps), (
        list(t_n._fused_mgr._steps))

    t_x = make_trainer(False)
    t_x.fit()
    mf = [json.loads(l) for l in open(tmp_path / "rn" / "r" / "r.metrics.jsonl")]
    mx = [json.loads(l) for l in open(tmp_path / "rx" / "r" / "r.metrics.jsonl")]
    lf = [m["train_loss_epoch"] for m in mf if "train_loss_epoch" in m][-1]
    lx = [m["train_loss_epoch"] for m in mx if "train_loss_epoch" in m][-1]
    assert abs(lf - lx) / max(abs(lx), 1e-6) < 0.05, (lf, lx)


# ----------------------------------------------------------------------
# per-block-K buckets (NKBucketTiling)
# ----------------------------------------------------------------------

def _graded_graph(n=700, seed=0):
    """Chain mesh with a high-degree hub cluster in the first 100 nodes:
    per-block max in-degree is strongly graded, so a global K inflates
    rows ~4x while 3 K-buckets stay under 1.6x."""
    rng = np.random.default_rng(seed)
    s_list, r_list = [], []
    for i in range(n - 1):
        s_list += [i, i + 1]
        r_list += [i + 1, i]
    for i in range(0, n, 7):
        for _ in range(rng.integers(0, 9)):
            t = int(rng.integers(0, 100))
            u = min(n - 1, t + int(rng.integers(1, 60)))
            s_list.append(u)
            r_list.append(t)
    return np.asarray(s_list, np.int64), np.asarray(r_list, np.int64)


def _bucketed(senders, receivers, n, **kw):
    from graph_physics_tpu.ops.fused_edge_attention_nk import (
        build_nk_bucket_tiling,
    )

    res = build_nk_bucket_tiling(senders, receivers, n, k_buckets=3,
                                 min_groups=1, max_row_inflation=100.0, **kw)
    assert res is not None
    t, node_perm = res
    if node_perm is not None:
        inv = np.argsort(np.concatenate(
            [node_perm, np.arange(len(node_perm), t.num_nodes)]))
        senders, receivers = inv[senders], inv[receivers]
    return t, senders, receivers


def test_k_bucketed_layout_invariants():
    from graph_physics_tpu.ops.fused_edge_attention_nk import (
        build_nk_tiling, nk_row_maps, nk_total_rows,
    )

    senders, receivers = _graded_graph()
    n = 700
    t, s2, r2 = _bucketed(senders, receivers, n)
    assert len(t.buckets) > 1, t.buckets
    t_single = build_nk_tiling(s2, r2, n, max_row_inflation=100.0)
    # the whole point: bucketed rows well under the global-K rows
    assert t.total_rows < 0.6 * nk_total_rows(t_single)

    gids, loc_r, sidx_flat = nk_row_maps(t)
    wu, wb, nb = t.window_unit, t.window_blocks, t.node_block
    valid = t.perm >= 0
    rank = np.minimum(sidx_flat[valid] // wu, wb - 1)
    glob_s = t.win_start[gids[valid], rank] * wu + sidx_flat[valid] % wu
    glob_r = gids[valid] * nb + loc_r[valid]
    np.testing.assert_array_equal(glob_r, r2[t.perm[valid]])
    np.testing.assert_array_equal(glob_s, s2[t.perm[valid]])
    # each edge exactly once; gap rows carry the sentinel
    assert valid.sum() == len(senders)
    assert len(np.unique(t.perm[valid])) == len(senders)
    assert (sidx_flat[~valid] == wb * wu).all()

    # expand/reduce round-trip through the bucketed perm
    vals = np.random.default_rng(1).normal(
        size=(len(senders), 3)).astype(np.float32)
    np.testing.assert_array_equal(
        t.reduce_edges(t.expand_edges(vals), len(senders)), vals)


def test_k_bucketed_kernel_matches_reference_and_single():
    """Bucketed NK kernel vs (a) the bucketed pure-JAX reference and
    (b) the single-bucket NK kernel on the SAME permuted edge set —
    values, dx and every weight gradient."""
    from graph_physics_tpu.ops.fused_edge_attention_nk import build_nk_tiling

    f, b = 32, 4
    senders, receivers = _graded_graph()
    n_real = 700
    t, s2, r2 = _bucketed(senders, receivers, n_real)
    t1 = build_nk_tiling(s2, r2, n_real, max_row_inflation=100.0)
    assert t1 is not None and t1.num_nodes == t.num_nodes
    n = t.num_nodes
    e = len(senders)

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_vals = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (e, b, f))) * 0.5
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))
    cot_e = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 5), (e, b, f)))

    # (a) kernel vs bucketed reference
    e_slots = jnp.asarray(t.expand_edges(e_vals))
    x_ref, e_ref = blocked_reference_nk(x, e_slots, ep, np_, t,
                                        compute_dtype=jnp.bfloat16)
    x_f, e_f = fused_gn_block_nk(
        x.astype(jnp.bfloat16), e_slots.astype(jnp.bfloat16), ep, np_, t,
        interpret=True)
    np.testing.assert_allclose(np.asarray(x_f, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    # edge stream: compare VALID slots only (alignment-gap rows between
    # bucket segments are undefined by contract — never read by kernels)
    valid_rows = t.perm >= 0
    np.testing.assert_allclose(np.asarray(e_f, np.float32)[valid_rows],
                               np.asarray(e_ref, np.float32)[valid_rows],
                               rtol=0.05, atol=0.05)

    # (b) gradients vs the single-bucket NK kernel (same edge set)
    def loss(tt, x, ep, np_):
        eb = jnp.asarray(tt.expand_edges(e_vals))
        ce = jnp.asarray(tt.expand_edges(cot_e))
        ok = jnp.asarray(tt.perm >= 0)[:, None, None]
        xo, eo = fused_gn_block_nk(x, eb, ep, np_, tt, interpret=True)
        eo = jnp.where(ok, eo, jnp.zeros((), eo.dtype))  # mask gap rows
        return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * ce))

    v1, g1 = jax.value_and_grad(
        lambda *a: loss(t1, *a), argnums=(0, 1, 2))(x, ep, np_)
    v2, g2 = jax.value_and_grad(
        lambda *a: loss(t, *a), argnums=(0, 1, 2))(x, ep, np_)
    np.testing.assert_allclose(float(v2), float(v1), rtol=0.02)
    for ta, tb, name in zip(g1, g2, ["dx", "edge_w", "node_w"]):
        for a, c in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                       err_msg=name)


def test_k_bucketed_folded_and_last_block():
    """Folded-encoder + last-block variants through the bucketed dispatch
    agree with the unfolded bucketed kernel (same params, dtype-faithful
    encoder mirror — same as the single-bucket folded test)."""
    import math as _m

    from graph_physics_tpu.models.layers import MLP

    f, b, fe = 32, 4, 8
    senders, receivers = _graded_graph(n=560, seed=2)
    t, s2, r2 = _bucketed(senders, receivers, 560)
    n = t.num_nodes
    e = len(senders)

    key = jax.random.PRNGKey(21)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    raw = np.asarray(jax.random.normal(
        jax.random.fold_in(key, 1), (e, b, fe))) * 0.5
    enc = MLP(hidden_size=f, out_size=f, dtype=jnp.bfloat16)
    enc_p = enc.init(jax.random.fold_in(key, 2),
                     jnp.zeros((1, fe)))["params"]
    ep = _params(jax.random.fold_in(key, 3), f, 3)
    np_ = _params(jax.random.fold_in(key, 4), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 5), (n, b, f))

    raw_slots = jnp.asarray(t.expand_edges(raw))

    def enc_ref(p, h):
        def dense(z, kern):
            return jax.lax.dot_general(
                z.astype(jnp.bfloat16), kern.astype(jnp.bfloat16),
                dimension_numbers=(((z.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        n_dense = len([k for k in p if k.startswith("Dense_")])
        h = dense(h, p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"].astype(
            jnp.bfloat16)
        for i in range(1, n_dense):
            h = dense(jax.nn.relu(h), p[f"Dense_{i}"]["kernel"])
            h = h + p[f"Dense_{i}"]["bias"].astype(jnp.bfloat16)
        gs = jnp.sum((h * h).astype(jnp.float32), -1, keepdims=True)
        rms = jnp.sqrt(gs + 1e-24) / _m.sqrt(f)
        inv = 1.0 / (rms + 1e-8)
        return h * inv.astype(jnp.bfloat16) * p["RMSNorm_0"]["scale"].astype(
            jnp.bfloat16)

    def loss_folded(x, enc_p, ep, np_):
        xo, _ = fused_gn_block_nk(
            x, raw_slots.astype(jnp.bfloat16), ep, np_, t, interpret=True,
            edge_encoder_params=enc_p, last_block=True)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    def loss_unfolded(x, enc_p, ep, np_):
        encoded = enc_ref(enc_p, raw_slots.astype(jnp.bfloat16))
        xo, _ = fused_gn_block_nk(
            x, encoded.astype(jnp.bfloat16), ep, np_, t, interpret=True,
            last_block=True)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    v_f, g_f = jax.value_and_grad(
        loss_folded, argnums=(0, 1, 2, 3))(
        x.astype(jnp.bfloat16), enc_p, ep, np_)
    v_u, g_u = jax.value_and_grad(
        loss_unfolded, argnums=(0, 1, 2, 3))(
        x.astype(jnp.bfloat16), enc_p, ep, np_)
    np.testing.assert_allclose(float(v_f), float(v_u), rtol=0.03)
    for ta, tb, name in zip(g_u, g_f, ["dx", "enc_w", "edge_w", "node_w"]):
        for a, c in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.05,
                                       err_msg=name)


def test_manager_bucket_nk_graded_mesh():
    """FusedTopologyManager(nk_layout, nk_k_buckets>1) on a graded mesh:
    the per-block-K bucket layout is priced against the global-K one and
    chosen when it cuts slot rows; the runtime ``tiling_idx_nk`` tuple
    reconstructs the exact bucket structure (group ranges, aligned
    bases, total rows); and the full EPD model through the bucketed NK
    kernel matches the XLA path on the same (degree-sorted) graph."""
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.ops.fused_edge_attention_nk import NKBucketTiling
    from graph_physics_tpu.training.fused import (
        FusedTopologyManager, _permute_nodes,
    )

    rng = np.random.default_rng(3)
    n = 2600
    s_list, r_list = [], []
    for i in range(n - 1):
        s_list += [i, i + 1]
        r_list += [i + 1, i]
    # hub cluster: the first ~600 nodes (≈5 blocks) take extra in-edges,
    # so the per-block max in-degree profile is strongly graded
    for i in range(0, n, 5):
        for _ in range(int(rng.integers(0, 9))):
            t_ = int(rng.integers(0, 600))
            u = min(n - 1, t_ + int(rng.integers(1, 60)))
            s_list.append(u)
            r_list.append(t_)
    ei = np.stack([np.asarray(s_list, np.int64),
                   np.asarray(r_list, np.int64)])
    x = rng.normal(size=(n, 4)).astype(np.float32)
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    nt = np.zeros(n, np.int32)
    g = mesh_lib.build_mesh_graph(x, pos, nt, ei)

    mgr = FusedTopologyManager(build_nk=True, nk_layout=True)
    out = mgr.transform_frame(g)
    _key, (t, perm, nk) = mgr._tiling_for(g)  # cache hit
    assert t is not None
    assert isinstance(nk, NKBucketTiling), type(nk)
    assert len(nk.buckets) > 1, nk.buckets
    assert len(out.tiling_idx_nk) == 1 + len(nk.buckets)

    # runtime reconstruction: exact bucket structure from sidx shapes
    rt = mgr._batch_nk_tiling(out)
    assert isinstance(rt, NKBucketTiling)
    assert rt.buckets == nk.buckets
    assert rt.bases == nk.bases
    assert rt.total_rows == nk.total_rows
    assert rt.num_nodes == out.x.shape[0] == nk.num_nodes
    k = mgr.key_for(out)
    assert k[0] == "nk" and k[1] == mgr.nk_bucket_key(nk)

    # EPD parity vs XLA on the SAME node order (manager-permuted graph).
    # b*f must reach the kernel's LANES so the fused gate actually opens
    # (b=2 would silently fall back to XLA and void the parity check).
    f, b = 32, 4
    gq = _permute_nodes(g, perm) if perm is not None else g
    key = jax.random.PRNGKey(7)
    gp = jax.tree.map(jnp.asarray, gq)
    n_g = gp.x.shape[0]
    e_cnt = gp.senders.shape[0]
    gp = gp.replace(
        x=jax.random.normal(key, (n_g, b, 4), jnp.float32) * 0.5,
        edge_attr=jax.random.normal(jax.random.fold_in(key, 1),
                                    (e_cnt, b, 3)) * 0.5,
    )
    n_real = min(n_g, nk.num_nodes)
    x_pad = jnp.zeros((nk.num_nodes, b, 4)).at[:n_real].set(
        gp.x[:n_real])
    ea_slots = jnp.asarray(nk.expand_edges(np.asarray(gp.edge_attr)))
    gt = jax.tree.map(jnp.asarray, out)
    gt = gt.replace(x=x_pad, edge_attr=ea_slots)

    kwargs = dict(
        message_passing_num=2, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=f, dtype=jnp.bfloat16,
    )
    from graph_physics_tpu.models import layers as layers_lib

    # the gate sees the ENCODED node stream ([N, b, hidden]) and the raw
    # slot edge stream; probe it with those shapes
    assert layers_lib.fused_path_ok_nk(
        rt, jnp.zeros((nk.num_nodes, b, f), jnp.bfloat16), gt.edge_attr,
        f, jnp.bfloat16, False, False, False,
        None, raw_edge=True), "fused NK gate must open for this shape"
    m_xla = EncodeProcessDecode(**kwargs)
    m_nk = EncodeProcessDecode(edge_tiling_nk=rt, **kwargs)
    params = m_xla.init(jax.random.fold_in(key, 2), gp)
    out_xla = m_xla.apply(params, gp)
    out_nk = m_nk.apply(params, gt)
    np.testing.assert_allclose(
        np.asarray(out_nk, np.float32)[:n],
        np.asarray(out_xla, np.float32)[:n],
        rtol=0.15, atol=0.15)


def test_manager_bucket_nk_uniform_mesh_stays_single_k():
    """Near-uniform meshes (the cylinder family) must NOT move to the
    bucketed layout: the DP can only shave <10% of slot rows there, so
    the pricing rule keeps the single-K NKTiling (and the headline
    cylinder step/caches stay byte-identical)."""
    from graph_physics_tpu.ops.fused_edge_attention_nk import NKTiling
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from tests.helpers import tiny_graph

    g = tiny_graph(nx=20, ny=16)
    mgr = FusedTopologyManager(build_nk=True, nk_layout=True)
    out = mgr.transform_frame(g)
    _key, (_t, _perm, nk) = mgr._tiling_for(g)
    assert isinstance(nk, NKTiling), type(nk)
    assert len(out.tiling_idx_nk) == 2
