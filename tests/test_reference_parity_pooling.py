"""Hierarchical-pooling parity against the actual reference code.

Runs the reference ``DownSampler``/``UpSampler``
(hierarchical_pooling.py:13-77) through functional PyG stubs
(SelectTopK / KNNGraph / knn_interpolate in tests/reference_stub.py) and
asserts this repo's static-shape re-design selects the same coarse node
set (same order — both rank by the monotone projected score), maps
features identically, produces the same undirected kNN remesh EDGE SET
(this repo keeps duplicate directed entries instead of coalescing; sets
are compared), and interpolates identically on upsampling.
"""

import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.reference_stub import REF_ROOT, install_reference

if not os.path.isdir(os.path.join(REF_ROOT, "graphphysics")):
    pytest.skip("reference tree not available", allow_module_level=True)
install_reference()

from graphphysics.models import hierarchical_pooling as ref_pool  # noqa: E402

from graph_physics_tpu.models import hierarchical_pooling as our_pool  # noqa: E402

from tests.test_reference_parity_models import _dense  # noqa: E402

D_IN = 12
D_OUT = 8
N = 50


def _inputs(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, D_IN)).astype(np.float32)
    pos = rng.uniform(0.0, 1.0, size=(N, 2)).astype(np.float32)
    return x, pos


def _edge_set(senders, receivers, mask=None):
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    if mask is not None:
        m = np.asarray(mask)
        s, r = s[m], r[m]
    return set(zip(s.tolist(), r.tolist()))


def test_downsampler_parity():
    x, pos = _inputs(71)
    torch.manual_seed(17)
    ref = ref_pool.DownSampler(d_in=D_IN, d_out=D_OUT, ratio=0.25)
    ref.eval()
    with torch.no_grad():
        coarse_ref = ref(
            torch.tensor(x), torch.tensor(pos),
            batch=torch.zeros(N, dtype=torch.long),
        )

    ours = our_pool.DownSampler(d_out=D_OUT, ratio=0.25, k=6)
    params = {
        "select_weight": jnp.asarray(
            ref.select.weight.detach().numpy().T  # [1, d_in] -> [d_in, 1]
        ),
        "lin": _dense(ref.lin),
    }
    coarse = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(pos))

    c = math.ceil(0.25 * N)
    assert coarse.node_index.shape[0] == c
    assert bool(np.all(np.asarray(coarse.node_mask)))
    # same coarse node selection, same (descending-score) order
    perm_ref = ref.select(
        torch.tensor(x), torch.zeros(N, dtype=torch.long)
    ).node_index.numpy()
    np.testing.assert_array_equal(np.asarray(coarse.node_index), perm_ref)

    # same mapped features and positions
    np.testing.assert_allclose(
        np.asarray(coarse.x), coarse_ref.x.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(coarse.pos), coarse_ref.pos.numpy(), rtol=0, atol=0
    )

    # same undirected kNN remesh (compare sets; ours may hold duplicates)
    ref_edges = _edge_set(
        coarse_ref.edge_index[0].numpy(), coarse_ref.edge_index[1].numpy()
    )
    our_edges = _edge_set(coarse.senders, coarse.receivers, coarse.edge_mask)
    assert our_edges == ref_edges


def test_upsampler_parity():
    x, pos_fine = _inputs(72)
    rng = np.random.default_rng(73)
    c = 13
    x_c = rng.normal(size=(c, D_IN)).astype(np.float32)
    pos_c = rng.uniform(0.0, 1.0, size=(c, 2)).astype(np.float32)

    torch.manual_seed(19)
    ref = ref_pool.UpSampler(d_in=D_IN, d_out=D_OUT, k=6)
    ref.eval()
    with torch.no_grad():
        y_ref = ref(
            torch.tensor(x_c), torch.tensor(pos_c), torch.tensor(pos_fine)
        ).numpy()

    ours = our_pool.UpSampler(d_out=D_OUT, k=6)
    y_our = ours.apply(
        {"params": {"lin": _dense(ref.lin)}},
        jnp.asarray(x_c), jnp.asarray(pos_c), jnp.asarray(pos_fine),
    )
    # 1e-4: the inverse-square-distance weights amplify fp32 differences
    # between torch.cdist and the |a|^2+|b|^2-2ab expansion
    np.testing.assert_allclose(np.asarray(y_our), y_ref, rtol=1e-3, atol=1e-4)
