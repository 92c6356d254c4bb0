"""Uniform-degree ("NK") fused GraphNetBlock — receiver ops for free.

The blocked-CSR GraphNetBlock kernel (:mod:`ops.fused_gnblock`) spends
four of its one-hot MXU contractions per backward grid step purely on
receiver-side moves (the ``x_recv`` gather and the message scatter in the
rematerialized forward, the ``g_agg`` broadcast and the ``P_r`` reduction
in the backward) — each one costs about as much MXU time as a full dense
layer of the edge MLP. This kernel removes ALL of them with the same
layout change the NK attention kernel uses
(:mod:`ops.fused_edge_attention_nk`):

  * every receiver gets exactly K edge slots (K = max in-degree, padded
    with sentinel senders), laid out **k-major**: slot ``k·nb + r`` holds
    receiver r's k-th incoming edge. Receiver-aligned [nb, lanes] tiles
    are then STATIC row slices of the [K·nb, lanes] edge tile:
      - broadcast node→edges (``x_recv`` gather, ``g_agg``) = concatenate
        K copies — a row concat, no MXU work;
      - reduce edges→node (message aggregation, ``P_r``) = Σ of K static
        slices — pure VPU adds.
  * the sender side keeps its windowed one-hot gathers/scatters and the
    MLP matmuls — 2 one-hot contractions fwd / 3 bwd vs the CSR kernel's
    4 / 7, at a row inflation of K·nb / Emax (zero on uniform meshes:
    the cylinder bench mesh has K·nb == the CSR Emax exactly).

Padded slots are masked ONCE at the edge-MLP output (``eh``), which keeps
the residual edge stream exactly zero on padding and — because the output
mask's VJP zeroes the incoming cotangent — keeps every weight-gradient
row clean without per-term masking.

Numerics match :func:`ops.fused_gnblock.fused_gn_block` on the shared
edge set (same gather-after-pre-dot order, same bf16/fp32 flow); the
contract being accelerated is the reference hot loop
graphphysics/models/layers.py:1015-1102.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_physics_tpu.ops import fused_gnblock as _gn
from graph_physics_tpu.ops.fused_gnblock import (
    FOLDED_LANES_CAP,
    LANES,
    FusedBlockConfig,
    _dot,
    _dot_bt,
    _dot_t,
    _encode_e_fwd,
    _enc_cfg,
    _flatten_encoder,
    _flatten_mlp,
    _group_ones,
    _mlp_bwd,
    _mlp_fwd,
    _parse_weight_refs,
    _predot_gather,
)
from graph_physics_tpu.ops.fused_edge_attention_nk import (
    NKBucketTiling,
    NKTiling,
    _ksum,
    _ktile,
)

#: NK-specific folded-backward lane cap. 256 (raw-edge channel packing
#: r=2) measured 5,027 g/s vs 4,982 at the CSR-shared cap of 128 (r=1 —
#: the 3-channel raw edge array padded to full hidden width) on the
#: round-4 cylinder headline; needs the 32 MiB scoped-VMEM limit below
#: (the 16 MiB default overflows by ~2 MiB at r=2). lb=512 (r=4)
#: measured 4,980 — worse. GP_FOLDED_LANES_BWD / GP_VMEM_LIMIT_MB
#: override for sweeps.
NK_FOLDED_LANES_BWD_CAP = int(os.environ.get("GP_FOLDED_LANES_BWD", "256"))
NK_VMEM_LIMIT_BYTES = (
    _gn.VMEM_LIMIT_BYTES
    if _gn.VMEM_LIMIT_BYTES is not None
    else 32 * 2**20
)


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

def _nk_prologue(wb, wu, nb, kk, lanes, sidx_ref, xj_ref, xw_refs):
    """Shared one-hot/valid builds. Only the SENDER side keeps a one-hot
    ([w_rows, slots]); the receiver side is implicit in the k-major slot
    order."""
    k = lanes // LANES
    slots = kk * nb
    w_rows = wb * wu
    xw = jnp.concatenate([r[:] for r in xw_refs], axis=0)  # [W, lanes]
    xj = xj_ref[:]  # [nb, lanes]
    sid = sidx_ref[0]  # [1, slots]
    oh_sT = (
        jax.lax.broadcasted_iota(jnp.int32, (w_rows, slots), 0) == sid
    ).astype(jnp.bfloat16)
    valid = sid.reshape(slots, 1) < w_rows  # padded slots: sentinel sender
    xjr = xj.reshape(nb * k, LANES)
    xwr = xw.reshape(w_rows * k, LANES)
    return k, slots, xj, xw, oh_sT, valid, xjr, xwr


def _edge_fwd(cfg, wb, wu, nb, kk, lanes, sidx_ref, xj_ref, xw_refs, e_ref,
              enc_refs, ew, ones_k):
    """Forward through the (optionally folded-encoder +) edge MLP; returns
    everything the node update and the backward need."""
    k, slots, xj, xw, oh_sT, valid, xjr, xwr = _nk_prologue(
        wb, wu, nb, kk, lanes, sidx_ref, xj_ref, xw_refs)
    ew_first, ew_mid, ew_b, ew_scale = ew

    enc_res = raw = None
    if enc_refs is not None:
        raw, er, enc_res = _encode_e_fwd(
            cfg, slots, lanes, e_ref, enc_refs, ones_k)
        e = er.reshape(slots, lanes)
    else:
        e = e_ref[:]  # [slots, lanes]
        er = e.reshape(slots * k, LANES)

    # x_recv gather = K-fold row concat of the pre-dotted node tile
    # (gather(x) @ Kr == ktile(x @ Kr) in the k-major slot order)
    pre_r = _dot(xjr, ew_first[1][:]).astype(jnp.bfloat16)
    hr = _ktile(pre_r.reshape(nb, lanes), kk)  # [slots, lanes]
    hs = _predot_gather(oh_sT, xw, ew_first[2], k)  # sender one-hot gather
    h0 = (_dot(er, ew_first[0][:])
          + hr.reshape(slots * k, LANES) + hs.reshape(slots * k, LANES))
    edge_upd, (e_pres, e_rms) = _mlp_fwd(h0, ew_mid, ew_b, ew_scale, ones_k,
                                         cfg)
    # mask padded slots ONCE at the MLP output: the residual edge stream
    # stays exactly zero on padding, and the mask's VJP keeps every
    # downstream gradient row clean
    ehm = jnp.where(valid, edge_upd.reshape(slots, lanes),
                    jnp.zeros((), jnp.bfloat16))
    agg = _ksum(ehm.astype(jnp.float32), kk, nb).astype(jnp.bfloat16)
    return (k, slots, xj, xjr, xwr, oh_sT, valid, e, er, raw, enc_res,
            e_pres, e_rms, ehm, agg)


def _nk_fwd_kernel(cfg: FusedBlockConfig, wb: int, wu: int, nb: int, kk: int,
                   lanes: int, win_start_ref, sidx_ref, xj_ref, *rest):
    xw_refs = rest[:wb]
    rest = rest[wb:]
    e_ref = rest[0]
    rest = rest[1:]
    ea_ref = None
    if cfg.has_extra_agg:
        ea_ref = rest[0]
        rest = rest[1:]
    enc_refs = None
    if cfg.n_enc_layers:
        enc_first, enc_mid, enc_b, enc_scale, rest = _parse_weight_refs(
            rest, 1, cfg.n_enc_layers, cfg.layer_norm)
        enc_refs = (enc_first, enc_mid, enc_b, enc_scale)
    ew = _parse_weight_refs(rest, 3, cfg.n_edge_layers, cfg.layer_norm)
    ew_first, ew_mid, ew_b, ew_scale, rest = ew
    nw_first, nw_mid, nw_b, nw_scale, rest = _parse_weight_refs(
        rest, 2, cfg.n_node_layers, cfg.layer_norm)
    if cfg.last_block:
        (xout_ref,) = rest
        eout_ref = None
    else:
        xout_ref, eout_ref = rest

    ones_k = _group_ones(cfg.feature_size)
    (k, slots, xj, xjr, _xwr, _oh, _valid, e, _er, _raw, _enc_res,
     _e_pres, _e_rms, ehm, agg) = _edge_fwd(
        cfg, wb, wu, nb, kk, lanes, sidx_ref, xj_ref, xw_refs, e_ref,
        enc_refs, (ew_first, ew_mid, ew_b, ew_scale), ones_k)

    if eout_ref is not None:
        eout_ref[:] = e + ehm

    if ea_ref is not None:
        agg = agg + ea_ref[:]
    aggr = agg.reshape(nb * k, LANES)
    hn0 = _dot(xjr, nw_first[0][:]) + _dot(aggr, nw_first[1][:])
    node_upd, _ = _mlp_fwd(hn0, nw_mid, nw_b, nw_scale, ones_k, cfg)
    xout_ref[:] = xj + node_upd.reshape(nb, lanes)


def _nk_bwd_kernel(cfg: FusedBlockConfig, wb: int, wu: int, nb: int, kk: int,
                   lanes: int, win_start_ref, sidx_ref, xj_ref, *rest):
    xw_refs = rest[:wb]
    rest = rest[wb:]
    e_ref = rest[0]
    rest = rest[1:]
    ea_ref = None
    if cfg.has_extra_agg:
        ea_ref = rest[0]
        rest = rest[1:]
    enc_refs = None
    if cfg.n_enc_layers:
        enc_first, enc_mid, enc_b, enc_scale, rest = _parse_weight_refs(
            rest, 1, cfg.n_enc_layers, cfg.layer_norm)
        enc_refs = (enc_first, enc_mid, enc_b, enc_scale)
    ew_first, ew_mid, ew_b, ew_scale, rest = _parse_weight_refs(
        rest, 3, cfg.n_edge_layers, cfg.layer_norm)
    nw_first, nw_mid, nw_b, nw_scale, rest = _parse_weight_refs(
        rest, 2, cfg.n_node_layers, cfg.layer_norm)
    if cfg.last_block:
        g_xout_ref = rest[0]
        g_eout_ref = None
        rest = rest[1:]
    else:
        g_xout_ref, g_eout_ref = rest[:2]
        rest = rest[2:]
    dx_ref, dxw_ref = rest[:2]
    rest = rest[2:]
    dea_ref = None
    if cfg.has_extra_agg:
        dea_ref = rest[0]
        rest = rest[1:]
    if cfg.n_enc_layers:
        de_ref = None  # raw edge features carry no gradient
        dw_all = rest
    else:
        de_ref = rest[0]
        dw_all = rest[1:]
    n_dw = len(dw_all) // 2
    dw_refs = dw_all[:n_dw]
    dw_scratch = dw_all[n_dw:]

    ones_k = _group_ones(cfg.feature_size)

    # ---- recompute forward ----
    (k, slots, xj, xjr, xwr, oh_sT, valid, _e, er, raw, enc_res,
     e_pres, e_rms, ehm, agg) = _edge_fwd(
        cfg, wb, wu, nb, kk, lanes, sidx_ref, xj_ref, xw_refs, e_ref,
        enc_refs, (ew_first, ew_mid, ew_b, ew_scale), ones_k)
    if ea_ref is not None:
        agg = agg + ea_ref[:]
    aggr = agg.reshape(nb * k, LANES)
    hn0 = _dot(xjr, nw_first[0][:]) + _dot(aggr, nw_first[1][:])
    _node_upd, (n_pres, n_rms) = _mlp_fwd(hn0, nw_mid, nw_b, nw_scale,
                                          ones_k, cfg)

    # ---- backward (bf16 gradient flow) ----
    g_xout = g_xout_ref[:]  # [nb, lanes]
    g_eout = g_eout_ref[:] if g_eout_ref is not None else None
    g_xout_r = g_xout.reshape(nb * k, LANES)

    (g_xj_n, g_agg_r), dn_flat, _ = _mlp_bwd(
        g_xout_r, [xjr, aggr], nw_first, nw_mid, nw_b, nw_scale, ones_k, cfg,
        n_pres, n_rms)

    # d(ehm) = g_eout + ktile(g_agg); the output mask's VJP zeroes padding
    g_agg = g_agg_r.reshape(nb, lanes)
    if dea_ref is not None:
        # identity-add seam: the extra aggregate's cotangent IS g_agg
        dea_ref[:] = g_agg
    g_ehm = _ktile(g_agg, kk)
    if g_eout is not None:
        g_ehm = g_eout + g_ehm
    g_eh = jnp.where(valid, g_ehm, jnp.zeros((), jnp.bfloat16))
    g_eh_r = g_eh.reshape(slots * k, LANES)

    (g_e_mlp,), de_flat, g_h0 = _mlp_bwd(
        g_eh_r, [er], ew_first[:1], ew_mid, ew_b, ew_scale, ones_k, cfg,
        e_pres, e_rms)
    g_h0_2d = g_h0.reshape(slots, lanes)  # zero rows at padded slots
    # P_r = Σ_k g_h0 slices (the CSR kernel's oh_rN scatter, now a VPU sum)
    p_r = _ksum(g_h0_2d.astype(jnp.float32), kk, nb).astype(jnp.bfloat16)
    p_s = _dot(oh_sT, g_h0_2d).astype(jnp.bfloat16)  # [W, lanes]
    p_r_rows = p_r.reshape(nb * k, LANES)
    p_s_rows = p_s.reshape(wb * wu * k, LANES)
    d_kr = _dot_t(xjr, p_r_rows)  # [128, 128] fp32
    d_ks = _dot_t(xwr, p_s_rows)
    de_flat = [de_flat[0], d_kr, d_ks] + de_flat[1:]

    # gradient wrt the residual-stream e (encoder output when folded)
    g_e_total_r = g_e_mlp
    if g_eout is not None:
        g_e_total_r = g_e_total_r + g_eout.reshape(slots * k, LANES)
    if de_ref is not None:
        de_ref[:] = g_e_total_r.reshape(slots, lanes)

    enc_flat: List[jnp.ndarray] = []
    if enc_refs is not None:
        enc_first, enc_mid, enc_b, enc_scale = enc_refs
        _gi, enc_tail, g_h0_enc = _mlp_bwd(
            g_e_total_r, [], [], enc_mid, enc_b, enc_scale, ones_k,
            _enc_cfg(cfg), enc_res[0], enc_res[1])
        r = cfg.enc_ratio
        k_raw = (lanes // r) // LANES
        g_h0e_2d = g_h0_enc.reshape(slots, lanes)
        d_enc_first = sum(
            _dot_t(
                raw[:, j * LANES : (j + 1) * LANES],
                g_h0e_2d[:, j * r * LANES : (j + 1) * r * LANES],
            )
            for j in range(k_raw)
        )
        enc_flat = [d_enc_first] + enc_tail

    g_x_kr = _dot_bt(p_r_rows, ew_first[1][:]).astype(jnp.bfloat16)
    dx_ref[:] = (
        g_xout + g_xj_n.reshape(nb, lanes) + g_x_kr.reshape(nb, lanes)
    )
    dxw_ref[:] = _dot_bt(p_s_rows, ew_first[2][:]).astype(
        jnp.bfloat16).reshape(wb * wu, lanes)

    # ---- weight-grad accumulation across all grid steps ----
    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    is_last = (pl.program_id(0) == pl.num_programs(0) - 1) & (
        pl.program_id(1) == pl.num_programs(1) - 1)
    for sref, oref, val in zip(dw_scratch, dw_refs,
                               enc_flat + de_flat + dn_flat):

        @pl.when(is_first)
        def _(sref=sref):
            sref[:] = jnp.zeros_like(sref)

        sref[:] += val.astype(jnp.float32)

        @pl.when(is_last)
        def _(sref=sref, oref=oref):
            oref[:] = sref[:]


# ----------------------------------------------------------------------
# host-side wrapper
# ----------------------------------------------------------------------

def fused_gn_block_nk(
    x: jnp.ndarray,  # [N, B, F] packed node features
    edge_attr: jnp.ndarray,  # [G*S, B, F] edge features in NK slot order
    #                          (raw [G*S, B, fe] with edge_encoder_params)
    edge_params: dict,
    node_params: dict,
    tiling: NKTiling,
    activation: str = "relu",
    layer_norm: bool = True,
    interpret: bool = False,
    lanes: int = 1024,
    lanes_bwd: int = 256,
    edge_encoder_params: Optional[dict] = None,
    last_block: bool = False,
    tiling_idx: Optional[Tuple] = None,
    clean_edge_grads: bool = False,
    extra_agg: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply one fused GraphNetBlock on the uniform-degree layout.

    Same contract as :func:`ops.fused_gnblock.fused_gn_block`, with
    ``edge_attr`` in the NK slot order (``tiling.perm`` /
    :func:`ops.tiling.apply_to_graph_nk`). ``tiling`` may be a plain
    :class:`NKTiling` or a per-block-K :class:`NKBucketTiling` — the
    latter dispatches one ``pallas_call`` per K-bucket (group ranges with
    their own K_b), later buckets writing into the previous call's output
    buffers via ``input_output_aliases`` exactly like the CSR kernel's
    window-count buckets. ``tiling_idx`` optionally carries runtime
    ``(win_start, sidx...)`` arrays (graph.tiling_idx_nk; one sidx per
    bucket) so one compiled program serves every same-bucket topology.

    Bucketed layouts carry ALIGNMENT-GAP edge rows between segments
    (``tiling.perm == -1`` there): the returned edge stream and the
    ``de`` cotangent are UNDEFINED on those rows — no kernel in a fused
    chain ever reads them (block specs cover segment rows only, and the
    last block's edge stream is elided), but an XLA consumer (e.g. the
    unfolded edge encoder's backward) must not see them: pass
    ``clean_edge_grads=True`` on the FIRST unfolded block to zero the
    gap rows of ``de`` (one select over the edge array — skip it on
    middle blocks, whose ``de`` feeds another fused kernel).
    """
    from graph_physics_tpu.ops.fused_gnblock import _drop_refs

    n, b, f = x.shape
    assert LANES % f == 0, f"feature size {f} must divide {LANES}"
    bg = LANES // f
    total_lanes = b * f
    assert total_lanes % LANES == 0

    def _fit(l):
        l = max(min(l, total_lanes), LANES)
        while total_lanes % l != 0:
            l -= LANES
        return l

    folded = edge_encoder_params is not None
    assert n == tiling.num_nodes, (n, tiling.num_nodes)
    g_blocks = tiling.num_groups
    nb = tiling.node_block
    wb = tiling.window_blocks
    wu = tiling.window_unit
    if isinstance(tiling, NKBucketTiling):
        buckets = tiling.buckets
        bases = tiling.bases
        sidx_host = tiling.sidx
        total_rows = tiling.total_rows
    else:
        buckets = ((0, g_blocks, tiling.k_slots),)
        bases = (0,)
        sidx_host = (tiling.sidx,)
        total_rows = g_blocks * tiling.slots
    assert edge_attr.shape[0] == total_rows, (edge_attr.shape, total_rows)
    assert buckets[0][0] == 0 and buckets[-1][1] == g_blocks, buckets

    # lane caps: same VMEM budget rules as the CSR kernel, plus a
    # slot-row budget so a high-K bucket's [slots_b, lanes] edge tile
    # stays within the working set the single-K bench shapes validated
    # ([768, 1024] fwd / [768·k, 256] bwd)
    win_rows = wb * wu

    def _caps(slots_b, l, lb, aliased):
        if folded:
            l = min(l, FOLDED_LANES_CAP)
            lb = min(lb, NK_FOLDED_LANES_BWD_CAP)
        if win_rows > 512:
            l = min(l, 512)
            lb = min(lb, 256 if total_lanes <= 512 else 128)
            if aliased:
                lb = min(lb, 128)
        if win_rows > 1280:
            l = min(l, 256)
            lb = min(lb, 128)
        budget = 768 * 1024
        l = min(l, max((budget // max(slots_b, 1)) // LANES, 1) * LANES)
        lb = min(lb, max(((budget // 4) // max(slots_b, 1)) // LANES, 1)
                 * LANES)
        return _fit(l), _fit(lb)

    lane_plan = [_caps(k_b * nb, lanes, lanes_bwd, bi > 0)
                 for bi, (_lo, _hi, k_b) in enumerate(buckets)]

    # folded-encoder channel ratio (same 128-alignment rule as CSR);
    # shared across buckets so the raw edge array has one layout
    r = 1
    if folded:
        ks = [v // LANES for pair in lane_plan for v in pair]
        fe = edge_attr.shape[-1]
        for cand in range(min(ks), 0, -1):
            if (all(kk_ % cand == 0 for kk_ in ks) and f % cand == 0
                    and f // cand >= fe):
                r = cand
                break
        assert f // r >= fe, "raw edge features wider than hidden size"

    n_edge_layers = len([k for k in edge_params if k.startswith("Dense_")])
    n_node_layers = len([k for k in node_params if k.startswith("Dense_")])
    n_enc_layers = 0
    if edge_encoder_params is not None:
        n_enc_layers = len(
            [k for k in edge_encoder_params if k.startswith("Dense_")])
    has_extra = extra_agg is not None
    cfg = FusedBlockConfig(
        feature_size=f,
        n_edge_layers=n_edge_layers,
        n_node_layers=n_node_layers,
        activation=activation,
        layer_norm=layer_norm,
        interpret=interpret,
        n_enc_layers=n_enc_layers,
        enc_ratio=r,
        last_block=last_block,
        has_extra_agg=has_extra,
    )

    dtype = jnp.bfloat16
    x2 = x.reshape(n, total_lanes).astype(dtype)
    ea2 = (extra_agg.reshape(n, total_lanes).astype(dtype)
           if has_extra else None)
    enc_flat: list = []
    if folded:
        fe = edge_attr.shape[-1]
        fe_pad = f // r
        raw = edge_attr.astype(dtype)
        if fe < fe_pad:
            raw = jnp.pad(raw, ((0, 0), (0, 0), (0, fe_pad - fe)))
        e2 = raw.reshape(total_rows, total_lanes // r)
        enc_flat, _ = _flatten_encoder(
            edge_encoder_params, r, f, dtype, layer_norm)
    else:
        e2 = edge_attr.reshape(total_rows, total_lanes).astype(dtype)

    ew_flat, _ = _flatten_mlp(edge_params, 3, bg, dtype, layer_norm)
    nw_flat, _ = _flatten_mlp(node_params, 2, bg, dtype, layer_norm)
    n_enc = len(enc_flat)

    if tiling_idx is not None:
        win_in = tiling_idx[0]
        sidx_in = tuple(tiling_idx[1:])
        assert len(sidx_in) == len(buckets), (len(sidx_in), buckets)
        win_start = jnp.asarray(win_in, jnp.int32)
        sidx_list = [jnp.asarray(sx, jnp.int32)[:, None, :]
                     for sx in sidx_in]
    else:
        sidx_list = [jnp.asarray(sx)[:, None, :] for sx in sidx_host]
        win_start = jnp.asarray(tiling.win_start)
    for sx, (lo, hi, k_b) in zip(sidx_list, buckets):
        assert sx.shape == (hi - lo, 1, k_b * nb), (sx.shape, lo, hi, k_b)
    # per-bucket win_start rows (pass-through when the bucket spans all
    # groups, keeping the single-bucket jaxpr unchanged)
    win_list = [
        win_start if (lo, hi) == (0, g_blocks) else win_start[lo:hi]
        for (lo, hi, _k) in buckets
    ]

    def _vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _const_spec(w):
        nd = len(w.shape)
        return _vspec(w.shape, partial(lambda nd_, c, g, ws: (0,) * nd_, nd))

    def _off_map(lo):
        if lo == 0:
            return lambda c, g, ws: (g, c)
        return partial(lambda lo_, c, g, ws: (g + lo_, c), lo)

    def _specs(l, lo, ng, k_b, base):
        """Specs for lane width ``l`` and the bucket covering groups
        [lo, lo+ng) with K = k_b, edge rows based at ``base`` (node/edge
        arrays stay FULL-sized; maps add static offsets - no slicing)."""
        slots_b = k_b * nb
        assert base % slots_b == 0, (base, slots_b)
        eb = base // slots_b
        grid = (total_lanes // l, ng)
        group_spec = _vspec((1, 1, slots_b), lambda c, g, ws: (g, 0, 0))
        node_spec = _vspec((nb, l), _off_map(lo))
        edge_spec = _vspec((slots_b, l), _off_map(eb))
        edge_in_spec = _vspec((slots_b, l // r), _off_map(eb))
        win_specs = [
            _vspec((wu, l), partial(lambda k_, c, g, ws: (ws[g, k_], c), k_))
            for k_ in range(wb)
        ]
        weight_specs = [_const_spec(w) for w in enc_flat + ew_flat + nw_flat]
        extra_specs = [node_spec] if has_extra else []
        in_specs = ([group_spec, node_spec] + win_specs
                    + [edge_in_spec if folded else edge_spec] + extra_specs
                    + weight_specs)
        dxw_spec = _vspec((wb * wu, l), lambda c, g, ws: (g, c))
        return grid, in_specs, node_spec, edge_spec, dxw_spec

    # aliased prev-bucket outputs ride as extra inputs with a tiny
    # constant-index spec (buffer-level alias; the kernel never reads
    # them) - nb divides total_rows because every bucket base/segment is
    # a multiple of node_block
    prev_node_spec = _vspec((nb, LANES), lambda c, g, ws: (0, 0))
    prev_edge_spec = _vspec((nb, LANES), lambda c, g, ws: (0, 0))

    def _fwd(x2, e2, ea2, weights):
        xout = eout = None
        for bi, (lo, hi, k_b) in enumerate(buckets):
            l, _lb = lane_plan[bi]
            ng = hi - lo
            grid, in_specs, node_spec, edge_spec, _ = _specs(
                l, lo, ng, k_b, bases[bi])
            extra_ops = [ea2] if has_extra else []
            out_specs = [node_spec]
            out_shape = [jax.ShapeDtypeStruct((n, total_lanes), dtype)]
            if not last_block:
                out_specs.append(edge_spec)
                out_shape.append(
                    jax.ShapeDtypeStruct((total_rows, total_lanes), dtype))
            n_reg = 3 + wb + 1 + len(extra_ops) + len(weights)
            prev_ops, prev_specs, aliases = [], [], {}
            if bi > 0:
                prev_ops.append(xout)
                prev_specs.append(prev_node_spec)
                aliases[n_reg] = 0
                if not last_block:
                    prev_ops.append(eout)
                    prev_specs.append(prev_edge_spec)
                    aliases[n_reg + 1] = 1
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs + prev_specs,
                out_specs=out_specs,
            )
            kernel = partial(_nk_fwd_kernel, cfg, wb, wu, nb, k_b, l)
            if prev_ops:
                kernel = partial(_drop_refs, kernel, n_reg, len(prev_ops))
            outs = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=NK_VMEM_LIMIT_BYTES,
                ),
                interpret=interpret,
                input_output_aliases=aliases,
            )(win_list[bi], sidx_list[bi], x2, *([x2] * wb), e2, *extra_ops,
              *weights, *prev_ops)
            xout = outs[0]
            if not last_block:
                eout = outs[1]
        if last_block:
            return xout, e2
        return xout, eout

    @jax.custom_vjp
    def run(x2, e2, *rest):
        ea2_, weights = (rest[0], rest[1:]) if has_extra else (None, rest)
        return _fwd(x2, e2, ea2_, weights)

    def run_fwd(x2, e2, *rest):
        out = run(x2, e2, *rest)
        return out, (x2, e2, rest)

    def run_bwd(res, g):
        x2, e2, rest = res
        ea2_, weights = (rest[0], rest[1:]) if has_extra else (None, rest)
        g_xout, g_eout = g
        g_xout = g_xout.astype(dtype)

        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in weights]
        dx_main = de = dx_extra = dea = None
        dws_acc = None
        for bi, (lo, hi, k_b) in enumerate(buckets):
            _l, lb = lane_plan[bi]
            ng = hi - lo
            grid, in_specs, node_spec, edge_spec, dxw_spec = _specs(
                lb, lo, ng, k_b, bases[bi])
            extra_ops = [ea2_] if has_extra else []
            cot_specs = [node_spec]
            cots = [g_xout]
            if not last_block:
                cot_specs.append(edge_spec)
                cots.append(g_eout.astype(dtype))
            out_specs = [node_spec, dxw_spec]
            out_shape = [
                jax.ShapeDtypeStruct((n, total_lanes), dtype),
                jax.ShapeDtypeStruct((ng * wb * wu, total_lanes), dtype),
            ]
            if has_extra:  # dea — node-aligned extra-aggregate cotangent
                out_specs.append(node_spec)
                out_shape.append(
                    jax.ShapeDtypeStruct((n, total_lanes), dtype))
            de_pos = len(out_specs)
            if n_enc == 0:
                out_specs.append(edge_spec)  # de
                out_shape.append(
                    jax.ShapeDtypeStruct((total_rows, total_lanes), dtype))
            n_reg = (3 + wb + 1 + len(extra_ops) + len(weights)
                     + len(cots))
            prev_ops, prev_specs, aliases = [], [], {}
            if bi > 0:
                prev_ops.append(dx_main)
                prev_specs.append(prev_node_spec)
                aliases[n_reg] = 0
                if has_extra:
                    prev_ops.append(dea)
                    prev_specs.append(prev_node_spec)
                    aliases[n_reg + len(prev_ops) - 1] = 2
                if n_enc == 0:
                    prev_ops.append(de)
                    prev_specs.append(prev_edge_spec)
                    aliases[n_reg + len(prev_ops) - 1] = de_pos
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs + cot_specs + prev_specs,
                out_specs=out_specs + [_const_spec(s) for s in dw_shapes],
                scratch_shapes=[pltpu.VMEM(s.shape, jnp.float32)
                                for s in dw_shapes],
            )
            kernel = partial(_nk_bwd_kernel, cfg, wb, wu, nb, k_b, lb)
            if prev_ops:
                kernel = partial(_drop_refs, kernel, n_reg, len(prev_ops))
            outs = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape + dw_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=NK_VMEM_LIMIT_BYTES,
                ),
                interpret=interpret,
                input_output_aliases=aliases,
            )(win_list[bi], sidx_list[bi], x2, *([x2] * wb), e2, *extra_ops,
              *weights, *cots, *prev_ops)
            dx_main, dxw = outs[0], outs[1]
            outs = outs[2:]
            if has_extra:
                dea = outs[0]
                outs = outs[1:]
            if n_enc == 0:
                de = outs[0]
                dws = outs[1:]
            else:
                dws = outs
            dws_acc = (list(dws) if dws_acc is None
                       else [a + d for a, d in zip(dws_acc, dws)])
            dxw_blocks = dxw.reshape(ng * wb, wu, total_lanes)
            contrib = jax.ops.segment_sum(
                dxw_blocks,
                win_list[bi].reshape(-1).astype(jnp.int32),
                num_segments=n // wu)
            dx_extra = contrib if dx_extra is None else dx_extra + contrib
        if n_enc != 0:
            de = jnp.zeros_like(e2)  # raw features carry no gradient
        elif clean_edge_grads and len(buckets) > 1:
            # zero the alignment-gap rows for XLA consumers (unfolded
            # encoder backward); segment rows pass through untouched
            seg = np.zeros(total_rows, bool)
            for (lo, hi, k_b), base in zip(buckets, bases):
                seg[base : base + (hi - lo) * k_b * nb] = True
            de = jnp.where(jnp.asarray(seg)[:, None], de,
                           jnp.zeros((), de.dtype))
        dws = [dw.astype(w.dtype) for dw, w in zip(dws_acc, weights)]
        dx = (dx_main.astype(jnp.float32)
              + dx_extra.reshape(n, total_lanes).astype(jnp.float32))
        if has_extra:
            return (dx.astype(dtype), de, dea, *dws)
        return (dx.astype(dtype), de, *dws)

    run.defvjp(run_fwd, run_bwd)

    extra_in = (ea2,) if has_extra else ()
    xout2, eout2 = run(x2, e2, *extra_in, *enc_flat, *ew_flat, *nw_flat)
    xout = xout2.reshape(n, b, f)
    if last_block:
        return xout, edge_attr  # dead edge stream, unchanged
    return xout, eout2.reshape(total_rows, b, f)


# ----------------------------------------------------------------------
# pure-JAX reference of the same NK-blocked semantics (tests)
# ----------------------------------------------------------------------

def blocked_reference_nk(x, edge_attr, edge_params, node_params,
                         tiling: NKTiling, activation="relu",
                         layer_norm=True, compute_dtype=jnp.float32,
                         extra_agg=None):
    """XLA implementation of exactly the NK-fused math, for parity tests
    (mirrors :func:`ops.fused_gnblock.blocked_reference`)."""
    import math

    from graph_physics_tpu.ops.fused_gnblock import _act

    n, b, f = x.shape
    act = _act(activation)
    cd = compute_dtype
    is_bf = cd == jnp.bfloat16

    def dense_f32(h, k):
        return jax.lax.dot_general(
            h.astype(cd), k.astype(cd),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dense(h, k):
        out = dense_f32(h, k)
        return out.astype(cd) if is_bf else out

    def mlp(parts, params, extra_h0=()):
        n_dense = len([k for k in params if k.startswith("Dense_")])
        k0 = params["Dense_0"]["kernel"]
        splits = np.cumsum([p.shape[-1] for p in parts])
        k0_parts = jnp.split(k0, splits, axis=0)
        h = sum(dense_f32(p, kp) for p, kp in zip(parts, k0_parts))
        for ex in extra_h0:
            h = h + ex.astype(jnp.float32)
        if is_bf:
            h = h.astype(cd)
        h = h + params["Dense_0"]["bias"].astype(h.dtype)
        for i in range(1, n_dense):
            h = dense(act(h), params[f"Dense_{i}"]["kernel"])
            h = h + params[f"Dense_{i}"]["bias"].astype(h.dtype)
        if layer_norm:
            s = params["RMSNorm_0"]["scale"]
            gs = jnp.sum((h * h).astype(jnp.float32), -1, keepdims=True)
            r_ = jnp.sqrt(gs + 1e-24) / math.sqrt(f)
            inv = 1.0 / (r_ + 1e-8)
            h = h * inv.astype(h.dtype) * s.astype(h.dtype)
        return h

    t = tiling
    nb = t.node_block
    from graph_physics_tpu.ops.fused_edge_attention_nk import nk_row_maps

    gids_np, loc_r_np, sid_np = nk_row_maps(t)
    sid = jnp.asarray(sid_np)
    gids = jnp.asarray(np.maximum(gids_np, 0))  # gap rows (-1) are masked
    loc_r = jnp.asarray(loc_r_np)
    wu_ = t.window_unit
    win_rows = t.window_blocks * wu_
    rank = jnp.minimum(sid // wu_, t.window_blocks - 1)
    glob_s = jnp.asarray(t.win_start)[gids, rank] * wu_ + sid % wu_
    glob_r = gids * nb + loc_r
    valid = sid < win_rows  # gap rows carry the sentinel sidx
    xc = x.astype(cd)
    ec = edge_attr.astype(cd)
    ek0 = edge_params["Dense_0"]["kernel"]
    f_e = ec.shape[-1]
    x_kr = dense(xc, ek0[f_e : f_e + f])
    x_ks = dense(xc, ek0[f_e + f :])
    hs = jnp.where(valid[:, None, None],
                   x_ks[jnp.clip(glob_s, 0, n - 1)],
                   jnp.zeros((), x_ks.dtype))
    hr = x_kr[glob_r]  # every slot maps to a real receiver (k-major)
    eh = mlp([ec], edge_params, extra_h0=(hr, hs))
    ehm = jnp.where(valid[:, None, None], eh, jnp.zeros((), eh.dtype))
    agg = jax.ops.segment_sum(
        ehm.astype(jnp.float32), glob_r, num_segments=n).astype(cd)
    if extra_agg is not None:
        agg = agg + extra_agg.astype(cd)
    nh = mlp([xc, agg], node_params)
    return (xc + nh).astype(x.dtype), (ec + ehm).astype(edge_attr.dtype)
