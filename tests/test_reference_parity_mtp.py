"""Spatial-MTP auxiliary-loss parity against the actual reference code.

Runs the reference ``SpatialMTP1Hop`` (spatial_mtp_1hop.py, pure torch —
no stubs needed beyond import shims) and this repo's ``spatial_mtp_loss``
on identical hidden states / targets / edge lists with copied weights,
and asserts the auxiliary loss and its stats agree.

Determinism: the reference samples neighbors only when a center's degree
exceeds ``max_neighbors``; with ``k >= max_degree`` both frameworks keep
EVERY neighbor and the star encoder is order-equivariant (full attention,
no positional encoding), so the per-center mean pair loss — and hence the
aux loss — is independent of neighbor order and of the center sampling
order. Centers cover ALL nodes (centers_per_step = N on an unpadded
graph) so our internal uniform center sampling reduces to a permutation
of the reference's ``centers=arange(N)``.

Reduction note: the reference's "mean_per_center" divides by ALL B
centers (zero-degree centers contribute 0 to the numerator,
spatial_mtp_1hop.py:243-248) while ours averages over centers that HAVE
neighbors; on a connected mesh every node has neighbors, so the two
coincide — the difference only arises for padding, which the reference
never sees.

torch MultiheadAttention weight copy: in_proj_weight is the packed
[3d, d] q/k/v stack with heads-first channel grouping (same as ours), so
rows [0:d), [d:2d), [2d:3d) map directly onto our q/k/v Dense kernels.
"""

import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_stub import REF_ROOT, install_reference

if not os.path.isdir(os.path.join(REF_ROOT, "graphphysics")):
    pytest.skip("reference tree not available", allow_module_level=True)
install_reference()

from graphphysics.models import spatial_mtp_1hop as ref_mtp  # noqa: E402

from graph_physics_tpu.core import mesh as mesh_lib  # noqa: E402
from graph_physics_tpu.models import spatial_mtp as our_mtp  # noqa: E402

from tests.test_reference_parity import _mesh  # noqa: E402
from tests.test_reference_parity_models import (  # noqa: E402
    _dense,
    _gated_mlp_params,
)

D = 24
HEADS = 4
YD = 2


def _w(t):
    return jnp.asarray(t.detach().numpy())


def _encoder_params(ref_enc_module):
    """reference SpatialMTP1Hop.{in_ln, enc} -> our StarEncoder params."""
    p = {"in_ln": {"scale": _w(ref_enc_module.in_ln.scale)}}
    for i, lyr in enumerate(ref_enc_module.enc.layers):
        w = lyr.attn.in_proj_weight.detach().numpy()  # [3d, d]
        bq, bk, bv = np.split(lyr.attn.in_proj_bias.detach().numpy(), 3)
        p[f"block_{i}"] = {
            "ln1": {"scale": _w(lyr.ln1.scale)},
            "ln2": {"scale": _w(lyr.ln2.scale)},
            "q": {"kernel": jnp.asarray(w[:D].T), "bias": jnp.asarray(bq)},
            "k": {"kernel": jnp.asarray(w[D : 2 * D].T), "bias": jnp.asarray(bk)},
            "v": {"kernel": jnp.asarray(w[2 * D :].T), "bias": jnp.asarray(bv)},
            "out": _dense(lyr.attn.out_proj),
            "ffn": _gated_mlp_params(lyr.ffn),
        }
    return p


@pytest.mark.parametrize("num_layers", [1, 2])
def test_spatial_mtp_aux_loss_parity(num_layers):
    pos, _cells, ei, _nt, _o, _t, _d = _mesh(51)
    n = len(pos)
    rng = np.random.default_rng(52)
    h_pen = rng.normal(size=(n, D)).astype(np.float32)
    h_enc = rng.normal(size=(n, D)).astype(np.float32)
    target = rng.normal(size=(n, YD)).astype(np.float32)

    # k >= max degree so neither side samples (see module docstring)
    deg = np.bincount(ei[0], minlength=n)
    k = int(deg.max()) + 2

    torch.manual_seed(13)
    ref = ref_mtp.SpatialMTP1Hop(
        d_model=D, num_heads=HEADS, num_layers=num_layers,
        assume_undirected=True, max_neighbors=None,
    )
    ref.eval()
    out_head = torch.nn.Linear(D, YD)
    with torch.no_grad():
        aux_ref, stats_ref = ref(
            H=torch.tensor(h_pen),
            edge_index=torch.tensor(ei.astype(np.int64)),
            centers=torch.arange(n),
            out_head=out_head,
            target=torch.tensor(target),
            H_neigh=torch.tensor(h_enc),
        )

    cfg = our_mtp.SpatialMTPConfig(
        d_model=D, centers_per_step=n, num_heads=HEADS,
        num_layers=num_layers, max_neighbors=k,
    )
    encoder = our_mtp.StarEncoder(
        d_model=D, num_heads=HEADS, num_layers=num_layers
    )
    graph = types.SimpleNamespace(
        senders=jnp.asarray(ei[0]),
        receivers=jnp.asarray(ei[1]),
        edge_mask=jnp.ones(ei.shape[1], bool),
        node_mask=jnp.ones(n, bool),
    )
    head_k = jnp.asarray(out_head.weight.detach().numpy().T)
    head_b = jnp.asarray(out_head.bias.detach().numpy())
    aux_our, stats_our = our_mtp.spatial_mtp_loss(
        {"params": _encoder_params(ref)},
        encoder,
        cfg,
        graph,
        jnp.asarray(h_pen),
        jnp.asarray(h_enc),
        jnp.asarray(target),
        lambda z: z @ head_k + head_b,
        jax.random.PRNGKey(3),
    )

    np.testing.assert_allclose(
        float(aux_our), float(aux_ref), rtol=2e-4, atol=2e-6
    )
    assert float(stats_our["sp_mtp/centers"]) == float(
        stats_ref["sp_mtp/centers"]
    )
    assert float(stats_our["sp_mtp/pairs"]) == float(stats_ref["sp_mtp/pairs"])
    np.testing.assert_allclose(
        float(stats_our["sp_mtp/mean_pair_loss"]),
        float(stats_ref["sp_mtp/mean_pair_loss"]),
        rtol=2e-4, atol=2e-6,
    )
