"""Window-count bucketing: plan invariants + bucketed-dispatch parity.

Graded meshes (airfoil: 3..18 touched window units per group, median 12)
pay the global max window width in every group under single dispatch.
plan_wb_buckets splits the (sorted) groups into contiguous window-width
buckets and fused_gn_block dispatches one pallas_call per bucket, chained
through buffer aliasing. These tests pin:

  * the plan covers all groups, respects per-range maxima, never costs
    more than single dispatch, and derives identically from the runtime
    ``win_start`` copy (build/dispatch agreement);
  * the block sort keeps valid nodes a contiguous prefix (pinned last
    block);
  * bucketed fwd+bwd matches the pure-JAX blocked reference bit-for-
    tolerance on a graded topology (interpret mode).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_gnblock import blocked_reference, fused_gn_block
from tests.test_fused_gnblock import _params


def _graded_edges(n_groups=6, nb=128, seed=0):
    """First groups see only nearby senders; last two see the whole mesh."""
    n = n_groups * nb
    rng = np.random.default_rng(seed)
    senders, receivers = [], []
    for g in range(n_groups):
        base = g * nb
        r = np.arange(base, base + nb)
        s = np.clip(r + rng.integers(-32, 33, nb), 0, n - 1)
        senders.append(s)
        receivers.append(r)
        if g >= n_groups - 2:
            extra_r = rng.integers(base, base + nb, 2 * nb)
            extra_s = rng.integers(0, n, 2 * nb)
            senders.append(extra_s)
            receivers.append(extra_r)
    return (np.concatenate(senders).astype(np.int64),
            np.concatenate(receivers).astype(np.int64), n)


def test_plan_covers_and_improves():
    counts = np.array([1, 1, 2, 2, 3, 3, 11, 12])
    plan = tiling_lib.plan_wb_buckets(counts, 3, window_blocks_multiple=1,
                                      min_groups=2)
    assert plan[0][0] == 0 and plan[-1][1] == len(counts)
    for (lo, hi, wb_b) in plan:
        assert wb_b >= counts[lo:hi].max()
    cost = sum((hi - lo) * wb_b for lo, hi, wb_b in plan)
    single = len(counts) * counts.max()
    assert cost < single
    # quantization: multiple=4 rounds widths up
    plan4 = tiling_lib.plan_wb_buckets(counts, 3, window_blocks_multiple=4,
                                       min_groups=2)
    assert all(wb_b % 4 == 0 for (_, _, wb_b) in plan4)


def test_plan_single_bucket_when_uniform():
    counts = np.full(20, 4)
    plan = tiling_lib.plan_wb_buckets(counts, 4, min_groups=2)
    assert plan == ((0, 20, 4),)


def test_unit_counts_roundtrip():
    s, r, n = _graded_edges()
    t = tiling_lib.build_edge_tiling(s, r, n, window_unit=64)
    counts = tiling_lib.unit_counts_from_win(t.win_start)
    # independently recompute from the raw edges
    for g in range(t.num_groups):
        seg = s[r // t.node_block == g]
        assert counts[g] == len(np.unique(seg // t.window_unit))


def test_sort_pins_last_block_and_prefix():
    counts = np.array([9, 2, 7, 1, 5, 3])
    order = tiling_lib.sort_blocks_for_buckets(counts)
    assert order[-1] == len(counts) - 1  # boundary block pinned
    assert sorted(order.tolist()) == list(range(len(counts)))
    n_valid = 6 * 128 - 37  # partial last block
    perm = tiling_lib.block_order_to_node_perm(order, 128, n_valid)
    assert len(perm) == n_valid
    assert sorted(perm.tolist()) == list(range(n_valid))  # valid stays prefix


def test_bucketed_fused_matches_reference():
    f, b = 32, 4
    s, r, n_real = _graded_edges()
    t = tiling_lib.build_edge_tiling(s, r, n_real, window_unit=64)
    assert t is not None
    counts = tiling_lib.unit_counts_from_win(t.win_start)
    plan = tiling_lib.plan_wb_buckets(counts, 3, min_groups=2)
    assert len(plan) > 1, f"graded fixture must plan >1 bucket, got {plan}"
    tb = dataclasses.replace(t, buckets=plan)
    n = t.num_nodes

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_blocked = jnp.asarray(
        t.expand_edges(
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, 1), (s.shape[0], b, f))) * 0.5))
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)

    x_ref, e_ref = blocked_reference(x, e_blocked, ep, np_, t,
                                     compute_dtype=jnp.bfloat16)
    x_f, e_f = fused_gn_block(x.astype(jnp.bfloat16),
                              e_blocked.astype(jnp.bfloat16), ep, np_, tb,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(x_f, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(e_f, np.float32),
                               np.asarray(e_ref, np.float32),
                               rtol=0.05, atol=0.05)

    # gradients: bucketed vs single dispatch of the SAME tiling must agree
    # almost exactly (identical math, only the dispatch is split)
    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))
    cot_e = jax.random.normal(jax.random.fold_in(key, 5), e_blocked.shape)

    def loss(tt):
        def go(x, e, ep, np_):
            xo, eo = fused_gn_block(x, e, ep, np_, tt, interpret=True)
            return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                    + jnp.sum(eo.astype(jnp.float32) * cot_e))
        return go

    g_one = jax.grad(loss(t), argnums=(0, 1))(x.astype(jnp.bfloat16),
                                              e_blocked.astype(jnp.bfloat16),
                                              ep, np_)
    g_bkt = jax.grad(loss(tb), argnums=(0, 1))(x.astype(jnp.bfloat16),
                                               e_blocked.astype(jnp.bfloat16),
                                               ep, np_)
    for a, c, name in [(g_one[0], g_bkt[0], "dx"), (g_one[1], g_bkt[1], "de")]:
        a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / scale, a / scale, atol=0.01,
                                   err_msg=name)


def test_bucketed_folded_and_last_block_variants():
    """The folded-encoder (block 0: no de output, raw edge features) and
    last-block (dead edge stream) dispatch variants must agree with the
    single-bucket dispatch of the same tiling exactly (same math, split
    calls)."""
    from graph_physics_tpu.models.layers import MLP

    f, b, fe = 32, 4, 3
    s, r, n_real = _graded_edges(seed=7)
    t = tiling_lib.build_edge_tiling(s, r, n_real, window_unit=64)
    counts = tiling_lib.unit_counts_from_win(t.win_start)
    plan = tiling_lib.plan_wb_buckets(counts, 3, min_groups=2)
    assert len(plan) > 1
    tb = dataclasses.replace(t, buckets=plan)
    n = t.num_nodes

    key = jax.random.PRNGKey(13)
    x = (jax.random.normal(key, (n, b, f)) * 0.5).astype(jnp.bfloat16)
    e_raw = jnp.asarray(
        t.expand_edges(np.asarray(jax.random.normal(
            jax.random.fold_in(key, 1), (s.shape[0], b, fe))))
    ).astype(jnp.bfloat16)
    e_hidden = jnp.asarray(
        t.expand_edges(np.asarray(jax.random.normal(
            jax.random.fold_in(key, 2), (s.shape[0], b, f))) * 0.5)
    ).astype(jnp.bfloat16)
    enc = MLP(hidden_size=f, out_size=f, dtype=jnp.bfloat16)
    enc_params = enc.init(jax.random.fold_in(key, 3),
                          jnp.zeros((1, fe)))["params"]
    ep = _params(jax.random.fold_in(key, 4), f, 3)
    np_ = _params(jax.random.fold_in(key, 5), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 6), (n, b, f))
    cot_e = jax.random.normal(jax.random.fold_in(key, 7), (t.perm.shape[0], b, f))

    for variant, kwargs, e_in in [
        ("folded", dict(edge_encoder_params=enc_params), e_raw),
        ("last", dict(last_block=True), e_hidden),
    ]:
        def loss(tt, e_in=e_in, kwargs=kwargs):
            def go(x, e, ep, np_):
                xo, eo = fused_gn_block(x, e, ep, np_, tt, interpret=True,
                                        **kwargs)
                out = jnp.sum(xo.astype(jnp.float32) * cot_x)
                if not kwargs.get("last_block"):
                    out = out + jnp.sum(eo.astype(jnp.float32) * cot_e)
                return out
            return go

        v1, g1 = jax.value_and_grad(loss(t), argnums=(0, 2, 3))(
            x, e_in, ep, np_)
        v2, g2 = jax.value_and_grad(loss(tb), argnums=(0, 2, 3))(
            x, e_in, ep, np_)
        np.testing.assert_allclose(float(v2), float(v1), rtol=5e-3,
                                   err_msg=variant)
        for ta, tc in zip(g1, g2):
            for a, c in zip(jax.tree.leaves(ta), jax.tree.leaves(tc)):
                a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
                scale = max(np.abs(a).max(), 1e-3)
                np.testing.assert_allclose(c / scale, a / scale, atol=0.01,
                                           err_msg=variant)


def test_manager_sorts_and_buckets():
    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.training.fused import FusedTopologyManager

    s, r, n = _graded_edges(n_groups=18, seed=2)
    # scramble node order so the manager must recover grading by sorting
    rng = np.random.default_rng(5)
    shuf = rng.permutation(n)
    inv = np.argsort(shuf)
    s2, r2 = inv[s], inv[r]
    x = rng.normal(size=(n, 3)).astype(np.float32)
    pos = rng.normal(size=(n, 2)).astype(np.float32)
    nt = np.zeros(n, np.int32)
    g = mesh_lib.build_mesh_graph(x, pos, nt, np.stack([s2, r2]))
    g = g.replace(traj_index=np.asarray(0, np.int32))

    mgr = FusedTopologyManager(wb_buckets=3, window_blocks_multiple=2)
    conv = mgr.transform_frame(g)
    t, perm = mgr.tiling_of(0)
    assert t.buckets is not None and len(t.buckets) > 1
    # groups must be (weakly) sorted by unit count up to the pinned last
    counts = tiling_lib.unit_counts_from_win(t.win_start)
    assert (np.diff(counts[:-1]) >= 0).all()
    # converted graph: valid nodes stay a prefix
    mask = np.asarray(conv.node_mask)
    n_valid = int(mask.sum())
    assert mask[:n_valid].all() and not mask[n_valid:].any()
    # edge set survives the double permutation (compare as pair multisets)
    em = np.asarray(conv.edge_mask)
    pairs_conv = {
        (int(perm[a]), int(perm[b]))
        for a, b in zip(np.asarray(conv.senders)[em],
                        np.asarray(conv.receivers)[em])
    }
    pairs_orig = set(zip(s2.tolist(), r2.tolist()))
    assert pairs_conv == pairs_orig
    # the runtime-reconstructed tiling derives the SAME plan (dispatch
    # agreement between build time and step time)
    t_rt = mgr._batch_tiling(conv)
    assert t_rt.buckets == t.buckets
    assert mgr.bucket_key(t_rt) == mgr.bucket_key(
        dataclasses.replace(t, perm=np.empty(0, np.int32)))
