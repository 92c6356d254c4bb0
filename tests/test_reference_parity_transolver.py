"""Transolver++ numerical parity against the actual reference PyTorch code.

Runs the reference's ``graphphysics.models.transolver`` (the thuml
Transolver_plus adaptation) with weights copied into this repo's
:class:`TransolverModel` and asserts whole-forward agreement — covering
PhysicsAttention (default / RoPE / gated), the pre-LN block, unified_pos
grid features, the condition embedding, and the temporal-block head.

Determinism note: the reference's ``gumbel_softmax`` (reference
transolver.py:19-32) ALWAYS injects gumbel noise — there is no eval-mode
bypass. These tests monkeypatch ``torch.rand_like`` to the constant
``exp(-1)``, for which ``-log(-log(u + 1e-8) + 1e-8) ≈ 1.7e-8`` — i.e.
the noise term vanishes to float precision — and run our model WITHOUT a
'gumbel' PRNG so both sides compute the noise-free tempered softmax.

Device note: ``Model.get_grid`` (reference transolver.py:344-347) calls
``.cuda()`` unconditionally; the unified_pos test monkeypatches
``torch.Tensor.cuda`` to identity (no GPU in this image).

Aliasing quirk (temporal variant): the reference's eval path uses an
IN-PLACE residual ``fx += self.Attn(self.ln_1(fx), pos)`` (reference
transolver.py:220) which mutates the tensor ``prev_fx`` still references
(transolver.py:382-385) — so in eval mode the temporal head receives the
last block's post-attention intermediate, while in training mode (the
checkpoint path, out-of-place adds, transolver.py:212-218) it receives
the last block's INPUT. The two disagree; training semantics are what
gradient descent optimizes and are what this repo implements. The
temporal test therefore runs the reference in ``train()`` mode — with
dropout 0 and the gumbel noise patched out it is still deterministic.

Head layout: the reference reshapes in_project_x as (B, N, heads,
dim_head) — heads FIRST, same grouping as ours — so unlike the sparse
Attention tests no channel permutation is needed.
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

from graphphysics.models import transolver as ref_transolver  # noqa: E402

from graph_physics_tpu.models import transolver as our_transolver  # noqa: E402

from tests.test_reference_parity_models import (  # noqa: E402
    _dense,
    _mlp_params,
    _temporal_params,
)


@pytest.fixture(autouse=True)
def _zero_gumbel_noise(monkeypatch):
    """u = exp(-1) makes the reference's gumbel noise ~1.7e-8 (see module
    docstring)."""
    monkeypatch.setattr(
        torch, "rand_like", lambda t: torch.full_like(t, math.exp(-1.0))
    )


def _ln(ref_ln: torch.nn.LayerNorm):
    return {
        "scale": jnp.asarray(ref_ln.weight.detach().numpy()),
        "bias": jnp.asarray(ref_ln.bias.detach().numpy()),
    }


def _attn_params(ref_attn):
    p = {
        "in_project_x": _dense(ref_attn.in_project_x),
        "in_project_slice": _dense(ref_attn.in_project_slice),
        "proj_temperature_0": _dense(ref_attn.proj_temperature[0]),
        "proj_temperature_1": _dense(ref_attn.proj_temperature[2]),
        # ref bias is [1, H, 1, 1] (batched); ours is [1, H, 1]
        "bias": jnp.asarray(ref_attn.bias.detach().numpy()[..., 0]),
        "to_q": _dense(ref_attn.to_q),
        "to_k": _dense(ref_attn.to_k),
        "to_v": _dense(ref_attn.to_v),
        "to_out": _dense(ref_attn.to_out[0]),
    }
    if ref_attn.rope_projection is not None:
        p["rope_projection"] = _dense(ref_attn.rope_projection)
    if ref_attn.attn_gate is not None:
        p["attn_gate_0"] = _dense(ref_attn.attn_gate[0])
        p["attn_gate_1"] = _dense(ref_attn.attn_gate[2])
    return p


def _block_params(ref_block):
    p = {
        "ln_1": _ln(ref_block.ln_1),
        "ln_2": _ln(ref_block.ln_2),
        "Attn": _attn_params(ref_block.Attn),
        "mlp": _mlp_params(ref_block.mlp),
    }
    if ref_block.last_layer:
        p["ln_3"] = _ln(ref_block.ln_3)
        p["mlp2"] = _dense(ref_block.mlp2)
    return p


def _model_params(ref_model, heads):
    p = {
        "preprocess": _mlp_params(ref_model.preprocess),
        "placeholder": jnp.asarray(ref_model.placeholder.detach().numpy()),
    }
    for i, blk in enumerate(ref_model.blocks):
        p[f"blocks_{i}"] = _block_params(blk)
    if ref_model.temporal_block is not None:
        hid = ref_model.n_hidden
        p["temporal_block"] = _temporal_params(
            ref_model.temporal_block, hid, heads
        )
        p["output_proj"] = _dense(ref_model.output_proj)
    return p


H = 24
HEADS = 4
N = 37
FUN = 5
OUT = 2


def _inputs(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, FUN)).astype(np.float32)
    pos = rng.uniform(-1.0, 1.0, size=(N, 3)).astype(np.float32)
    return x, pos


@pytest.mark.parametrize(
    "variant", ["default", "rope", "gated", "unified_pos", "temporal"]
)
def test_transolver_model_parity(variant, monkeypatch):
    if variant == "unified_pos":
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
        )
    x, pos = _inputs(31)
    opts = dict(
        use_rope_embeddings=variant == "rope",
        use_gated_attention=variant == "gated",
        unified_pos=variant == "unified_pos",
        use_temporal_block=variant == "temporal",
    )
    torch.manual_seed(7)
    ref = ref_transolver.Model(
        space_dim=0,
        n_layers=2,
        n_hidden=H,
        n_head=HEADS,
        mlp_ratio=1,
        fun_dim=FUN,
        out_dim=OUT,
        slice_num=8,
        ref=4,
        rope_pos_dimension=3,
        **opts,
    )
    if variant == "temporal":
        ref.train()  # see module docstring: eval aliases prev_fx
    else:
        ref.eval()
    with torch.no_grad():
        y_ref = ref(
            torch.tensor(x)[None], torch.tensor(pos)[None], None
        ).numpy()[0]

    ours = our_transolver.TransolverModel(
        n_layers=2,
        n_hidden=H,
        n_head=HEADS,
        mlp_ratio=1,
        fun_dim=FUN,
        out_dim=OUT,
        slice_num=8,
        ref=4,
        space_dim=0,
        rope_pos_dimension=3,
        **opts,
    )
    y_our = ours.apply(
        {"params": _model_params(ref, HEADS)}, jnp.asarray(x), jnp.asarray(pos)
    )
    np.testing.assert_allclose(np.asarray(y_our), y_ref, rtol=2e-4, atol=2e-5)


def test_transolver_condition_parity():
    """The condition embedding seam (reference transolver.py:378-380)."""
    x, pos = _inputs(32)
    cond = np.asarray([0.3, -0.7, 1.1], np.float32)
    torch.manual_seed(9)
    ref = ref_transolver.Model(
        space_dim=0, n_layers=1, n_hidden=H, n_head=HEADS, mlp_ratio=1,
        fun_dim=FUN, out_dim=OUT, slice_num=8,
    )
    ref.eval()
    with torch.no_grad():
        y_ref = ref(
            torch.tensor(x)[None], torch.tensor(pos)[None],
            torch.tensor(cond)[None],
        ).numpy()[0]

    ours = our_transolver.TransolverModel(
        n_layers=1, n_hidden=H, n_head=HEADS, mlp_ratio=1,
        fun_dim=FUN, out_dim=OUT, slice_num=8, space_dim=0,
    )
    params = _model_params(ref, HEADS)
    params["embedding"] = _dense(ref.embedding)
    y_our = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(pos),
        condition=jnp.asarray(cond),
    )
    np.testing.assert_allclose(np.asarray(y_our), y_ref, rtol=2e-4, atol=2e-5)
