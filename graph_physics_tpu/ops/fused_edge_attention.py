"""Fused Pallas edge attention — the transformer-path hot kernel.

The XLA path (ops/edge_attention.py: gather q/k/v per edge → SDDMM →
segment softmax → segment-sum SpMM) runs its scatters at ~80 GB/s on TPU
(dynamic-index scatter serializes row updates); on the transformer
workload those gathers/scatters are ~half the step. This kernel replaces
them with the blocked-CSR one-hot MXU contractions of
:mod:`graph_physics_tpu.ops.tiling` — the same layout the fused
GraphNetBlock uses — one grid step per (lane-chunk, receiver node block):

  gather   q_e = oh_rNᵀ @ q_block,  k_e/v_e = oh_sTᵀ @ window
  SDDMM    per-(sample, head) dot via a dh-group-ones contraction
  softmax  exp(logit − global_shift) — ANY per-receiver-constant shift
           cancels in num/den, so one scalar shift per tile is exact —
           then per-receiver denominators via oh_rN @ p
  SpMM     out = (oh_rN @ (p · v_e)) / denom

Backward is a second kernel (custom VJP, rematerializes from q/k/v):
g_q is receiver-block local; g_k/g_v are emitted per-(block, window) and
reduced with the same XLA segment-sum epilogue as the GraphNetBlock's
window gradients. The q/k/v projections stay in XLA (dense matmuls are
already MXU-efficient).

Spec parity: ops/edge_attention.edge_attention (padded edges contribute
nothing; receivers with no valid incoming edges return zeros), which
itself replaces the reference's DGL bsddmm/bspmm path
(graphphysics/models/layers.py:493-556).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_physics_tpu.ops.fused_gnblock import LANES, _dot, _dot_t
from graph_physics_tpu.ops.tiling import EdgeTiling


def _dh_group_ones(dh: int) -> jnp.ndarray:
    """[LANES, LANES] bf16: 1 where i//dh == j//dh (per-head lane sums)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return ((i // dh) == (j // dh)).astype(jnp.bfloat16)


def _grouped_dot(a_bf, b_bf, ones_dh, emax, lanes):
    """Per-dh-group Σ a·b, broadcast back to every lane of the group.

    a, b: [Emax, lanes] bf16. Returns fp32 [Emax*k, LANES] rows view.
    """
    k = lanes // LANES
    prod = (a_bf * b_bf).reshape(emax * k, LANES)
    return _dot(prod, ones_dh)  # fp32 [rows, 128]


def _attn_common(cfg_dh, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref,
                 qj_ref, kw_refs, vw_refs, world_refs=None):
    k = lanes // LANES
    w_rows = wb * wu
    sid = sidx_ref[0]
    rid = ridx_ref[0]
    oh_sT = (
        jax.lax.broadcasted_iota(jnp.int32, (w_rows, emax), 0) == sid
    ).astype(jnp.bfloat16)
    oh_rN = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, emax), 0) == rid
    ).astype(jnp.bfloat16)
    kw = jnp.concatenate([r[:] for r in kw_refs], axis=0)
    vw = jnp.concatenate([r[:] for r in vw_refs], axis=0)
    qj = qj_ref[:]
    qe = _dot_t(oh_rN, qj).astype(jnp.bfloat16)  # [Emax, lanes]
    ke = _dot_t(oh_sT, kw).astype(jnp.bfloat16)
    ve = _dot_t(oh_sT, vw).astype(jnp.bfloat16)

    ones_dh = _dh_group_ones(cfg_dh)
    logits = _grouped_dot(qe, ke, ones_dh, emax, lanes) / math.sqrt(cfg_dh)
    # ANY constant shift cancels per softmax group; one scalar per tile
    # keeps exp in fp32 range exactly like the per-receiver max would.
    # CAVEAT (known edge case): if some receiver's whole logit group sits
    # more than ~88 below the TILE max, its exp underflows to 0 in fp32
    # and that receiver outputs zeros where the XLA path would return the
    # correct softmax. RMSNorm-bounded q/k keep the spread ~O(sqrt(dh))
    # (~8-30), far from the cliff; if unnormalized inputs are ever fed
    # here, switch to a per-receiver shift via an oh_rN max-reduction.
    shift = jnp.max(logits)
    wnum = wden = wscale = None
    if world_refs is not None:
        # per-sample world-edge softmax pieces (num_w, den_w, s_w — XLA-
        # computed, ops/edge_attention.world_attention_parts), node tiles
        # [nb, lanes] fp32; den_w/s_w repeat their (b, h) value over dh.
        # The joint softmax re-bases them from their own shift s_w to
        # this tile's shift, so mesh and world populations combine
        # EXACTLY as one concatenated softmax.
        nw_ref, dw_ref, sw_ref = world_refs
        sw = sw_ref[:]
        shift = jnp.maximum(shift, jnp.max(sw))
        wscale = jnp.exp(sw - shift)  # fp32 [nb, lanes]
        wnum = nw_ref[:] * wscale
        wden = dw_ref[:] * wscale
    # padded slots (sentinel sid -> all-zero one-hot column) produce
    # logits 0; they must contribute nothing to denominators: their oh_rN
    # column is zero too, so the oh_rN contraction drops them already.
    p = jnp.exp(logits - shift).astype(jnp.bfloat16)  # [rows, 128]
    p2 = p.reshape(emax, lanes)
    denom = _dot(oh_rN, p2)  # fp32 [nb, lanes] per-receiver Σp
    if wden is not None:
        denom = denom + wden
    return k, oh_sT, oh_rN, qj, qe, ke, ve, p2, denom, wnum, wscale


def _parse_world_refs(rest, has_world):
    if not has_world:
        return None, rest
    return tuple(rest[:3]), rest[3:]


def _fwd_kernel(dh, wb, wu, nb, emax, lanes, has_world,
                win_start_ref, sidx_ref, ridx_ref, qj_ref, *rest):
    kw_refs = rest[:wb]
    vw_refs = rest[wb : 2 * wb]
    rest = rest[2 * wb :]
    world_refs, rest = _parse_world_refs(rest, has_world)
    out_ref = rest[0]

    _k, _oh_sT, oh_rN, _qj, _qe, _ke, ve, p2, denom, wnum, _ws = _attn_common(
        dh, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref, qj_ref, kw_refs,
        vw_refs, world_refs)

    num = _dot(oh_rN, (p2 * ve).astype(jnp.bfloat16))  # fp32 [nb, lanes]
    if wnum is not None:
        num = num + wnum
    out = jnp.where(denom > 0.0, num / jnp.maximum(denom, 1e-30), 0.0)
    out_ref[:] = out.astype(jnp.bfloat16)


def _bwd_kernel(dh, wb, wu, nb, emax, lanes, has_world,
                win_start_ref, sidx_ref, ridx_ref, qj_ref, *rest):
    kw_refs = rest[:wb]
    vw_refs = rest[wb : 2 * wb]
    rest = rest[2 * wb :]
    world_refs, rest = _parse_world_refs(rest, has_world)
    g_out_ref = rest[0]
    if has_world:
        dq_ref, dkw_ref, dvw_ref, dnw_ref, ddw_ref = rest[1:]
    else:
        dq_ref, dkw_ref, dvw_ref = rest[1:]

    k, oh_sT, oh_rN, _qj, qe, ke, ve, p2, denom, wnum, wscale = _attn_common(
        dh, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref, qj_ref, kw_refs,
        vw_refs, world_refs)

    inv_denom = jnp.where(denom > 0.0, 1.0 / jnp.maximum(denom, 1e-30), 0.0)

    ones_dh = _dh_group_ones(dh)
    # softmax bwd with out = Σ_e alpha_e v_e, alpha = p/denom[r]:
    #   Ā_e = d out/d alpha_e = Σ_dh v_e·g_out[r]
    #   g_l_e = alpha_e (Ā_e − Σ_e' alpha_e' Ā_e')
    #   d v_e = alpha_e · g_out[r]
    # ONE receiver gather serves dv, Ā AND alpha: pre-scale g_out by
    # inv_denom on the (cheap) node rows and gather g' = inv·g_out once —
    # inv is constant within each dh lane group, so with Ā' := Σ_dh v·g'
    # = inv·Ā and S'_r := inv·Σ_e p Ā' = inv²Σ p Ā:
    #   dv_e      = p·g'_e        (= alpha·g_out_e)
    #   g_logit_e = p·(Ā'_e − S'_r[e])  (= alpha(Ā − S))
    # (the separate inv_denom gather this kernel used to do was redundant,
    # as was the g_out/denom double gather before it)
    gp = (g_out_ref[:].astype(jnp.float32) * inv_denom).astype(jnp.bfloat16)
    gpe = _dot_t(oh_rN, gp).astype(jnp.bfloat16)  # [Emax, lanes]
    g_ve = (p2 * gpe).astype(jnp.bfloat16)
    abar = _grouped_dot(ve, gpe, ones_dh, emax, lanes)  # fp32 rows = Ā'
    abar2 = abar.reshape(emax, lanes).astype(jnp.bfloat16)
    s_r = _dot(oh_rN, (p2 * abar2).astype(jnp.bfloat16)) * inv_denom
    if wnum is not None:
        # S'_r must see the TOTAL output: add the world numerator's share
        # Σ_dh (num_w·scale)·g' per (b, h) — one grouped dot on node rows
        w_sr = _grouped_dot(wnum.astype(jnp.bfloat16), gp, ones_dh,
                            nb, lanes).reshape(nb, lanes)
        s_r = s_r + w_sr * inv_denom
    s_e = _dot_t(oh_rN, s_r.astype(jnp.bfloat16)).astype(jnp.bfloat16)
    g_logit = (p2 * (abar2 - s_e)).astype(jnp.bfloat16)
    g_logit = (g_logit / math.sqrt(dh)).astype(jnp.bfloat16)

    # d q[r] = Σ_e g_logit k_e ; d k[s] = Σ_e g_logit q_e
    dq_ref[:] = _dot(oh_rN, (g_logit * ke).astype(jnp.bfloat16)).astype(
        jnp.bfloat16)
    dkw_ref[:] = _dot(oh_sT, (g_logit * qe).astype(jnp.bfloat16)).astype(
        jnp.bfloat16)
    dvw_ref[:] = _dot(oh_sT, g_ve).astype(jnp.bfloat16)
    if wnum is not None:
        # world cotangents (elementwise, node-aligned): num_w sees g'·scale;
        # den_w (its dh-broadcast VJP sums lanes outside) sees −out·g'·scale
        gp32 = g_out_ref[:].astype(jnp.float32) * inv_denom
        dnw_ref[:] = gp32 * wscale
        num = _dot(oh_rN, (p2 * ve).astype(jnp.bfloat16)) + wnum
        out = jnp.where(denom > 0.0, num / jnp.maximum(denom, 1e-30), 0.0)
        ddw_ref[:] = -out * gp32 * wscale


def fused_edge_attention(
    q: jnp.ndarray,  # [N, B, h, dh] packed
    k: jnp.ndarray,
    v: jnp.ndarray,
    tiling: EdgeTiling,
    interpret: bool = False,
    lanes: int = 1024,
    lanes_bwd: int = 512,
    tiling_idx=None,  # runtime (win_start, sidx, ridx) — see fused_gn_block
    world_parts=None,  # (num_w [N,B,h,dh], den_w [N,B,h], s_w [N,B,h]) fp32
) -> jnp.ndarray:
    """Edge-masked multi-head attention on the blocked layout.

    Node arrays must be padded/ordered per ``tiling`` (apply_to_graph);
    the edge set is taken from the tiling's local indices (padded slots
    have sentinel indices and contribute nothing). Returns [N, B, h, dh].

    ``world_parts``: per-sample world-edge softmax pieces from
    ops/edge_attention.world_attention_parts — the kernels fold them into
    the joint mesh+world softmax through node-aligned tiles (den_w/s_w
    broadcast over dh here so their VJPs reduce automatically; s_w is a
    stability shift and carries no gradient).
    """
    n, b, h, dh = q.shape
    hid = h * dh
    total_lanes = b * hid
    assert n == tiling.num_nodes, (n, tiling.num_nodes)
    assert LANES % dh == 0, f"head dim {dh} must divide {LANES}"
    assert total_lanes % LANES == 0

    def _fit(l):
        l = max(min(l, total_lanes), LANES)
        while total_lanes % l != 0:
            l -= LANES
        return l

    win_rows_ = tiling.window_blocks * tiling.window_unit
    if win_rows_ > 512:
        # wide-window tilings: see the matching caps in fused_gn_block;
        # the attention holds TWO window sets (k and v), so each tier is
        # one notch narrower than the gnblock's
        lanes = min(lanes, 512)
        lanes_bwd = min(lanes_bwd, 128)
    if win_rows_ > 1280:
        lanes = min(lanes, 256)
        lanes_bwd = min(lanes_bwd, 128)
    lanes = _fit(lanes)
    lanes_bwd = _fit(lanes_bwd)
    g_blocks = tiling.num_groups
    emax = tiling.edges_per_block
    nb = tiling.node_block
    wb = tiling.window_blocks
    wu = tiling.window_unit

    dtype = jnp.bfloat16
    q2 = q.reshape(n, total_lanes).astype(dtype)
    k2 = k.reshape(n, total_lanes).astype(dtype)
    v2 = v.reshape(n, total_lanes).astype(dtype)
    has_world = world_parts is not None
    world_ops = ()
    if has_world:
        num_w, den_w, s_w = world_parts
        # expand per-(b, h) pieces over dh in XLA: the broadcast's VJP
        # reduces the kernel's per-lane cotangents back to [N, B, h]
        nw2 = num_w.astype(jnp.float32).reshape(n, total_lanes)
        dw2 = jnp.broadcast_to(
            den_w.astype(jnp.float32)[..., None], (n, b, h, dh)
        ).reshape(n, total_lanes)
        sw2 = jax.lax.stop_gradient(
            jnp.broadcast_to(
                s_w.astype(jnp.float32)[..., None], (n, b, h, dh)
            ).reshape(n, total_lanes)
        )
        world_ops = (nw2, dw2, sw2)

    if tiling_idx is not None:
        win_in, sidx_in, ridx_in = tiling_idx
        win_start = jnp.asarray(win_in, jnp.int32)
        sidx = jnp.asarray(sidx_in, jnp.int32)[:, None, :]
        ridx = jnp.asarray(ridx_in, jnp.int32)[:, None, :]
    else:
        sidx = jnp.asarray(tiling.sidx)[:, None, :]
        ridx = jnp.asarray(tiling.ridx)[:, None, :]
        win_start = jnp.asarray(tiling.win_start)
    blk_node = win_start.reshape(-1).astype(jnp.int32)  # [G*wb] units

    def _vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _specs(l):
        grid = (total_lanes // l, g_blocks)
        group_spec = _vspec((1, 1, emax), lambda c, g, ws: (g, 0, 0))
        node_spec = _vspec((nb, l), lambda c, g, ws: (g, c))
        win_specs = [
            _vspec((wu, l), partial(lambda kk, c, g, ws: (ws[g, kk], c), kk))
            for kk in range(wb)
        ]
        dw_spec = _vspec((wb * wu, l), lambda c, g, ws: (g, c))
        return grid, group_spec, node_spec, win_specs, dw_spec

    def _fwd(q2, k2, v2, world):
        grid, group_spec, node_spec, win_specs, _ = _specs(lanes)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[group_spec, group_spec, node_spec]
            + win_specs + win_specs + [node_spec] * len(world),
            out_specs=[node_spec],
        )
        kernel = partial(_fwd_kernel, dh, wb, wu, nb, emax, lanes,
                         has_world)
        (out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n, total_lanes), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(win_start, sidx, ridx, q2, *([k2] * wb), *([v2] * wb), *world)
        return out

    @jax.custom_vjp
    def run(q2, k2, v2, *world):
        return _fwd(q2, k2, v2, world)

    def run_fwd(q2, k2, v2, *world):
        return run(q2, k2, v2, *world), (q2, k2, v2, world)

    def run_bwd(res, g_out):
        q2, k2, v2, world = res
        grid, group_spec, node_spec, win_specs, dw_spec = _specs(lanes_bwd)
        out_specs = [node_spec, dw_spec, dw_spec]
        out_shape = [
            jax.ShapeDtypeStruct((n, total_lanes), dtype),
            jax.ShapeDtypeStruct((g_blocks * wb * wu, total_lanes), dtype),
            jax.ShapeDtypeStruct((g_blocks * wb * wu, total_lanes), dtype),
        ]
        if has_world:  # dnum_w, dden_w (fp32 node tiles)
            out_specs += [node_spec, node_spec]
            out_shape += [
                jax.ShapeDtypeStruct((n, total_lanes), jnp.float32),
                jax.ShapeDtypeStruct((n, total_lanes), jnp.float32),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[group_spec, group_spec, node_spec]
            + win_specs + win_specs + [node_spec] * len(world)
            + [node_spec],  # g_out
            out_specs=out_specs,
        )
        kernel = partial(_bwd_kernel, dh, wb, wu, nb, emax, lanes_bwd,
                         has_world)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(win_start, sidx, ridx, q2, *([k2] * wb), *([v2] * wb), *world,
          g_out.astype(dtype))
        dq, dkw, dvw = outs[:3]

        def reduce_windows(dw):
            blocks = dw.reshape(g_blocks * wb, wu, total_lanes)
            return jax.ops.segment_sum(
                blocks, blk_node, num_segments=n // wu
            ).reshape(n, total_lanes).astype(dtype)

        grads = (dq, reduce_windows(dkw), reduce_windows(dvw))
        if has_world:
            dnw, ddw = outs[3], outs[4]
            grads = grads + (dnw, ddw, jnp.zeros_like(world[2]))
        return grads

    run.defvjp(run_fwd, run_bwd)
    out2 = run(q2, k2, v2, *world_ops)
    return out2.reshape(n, b, h, dh)
