"""The single jitted train step — noise → forward → masked loss → AdamW.

Replaces the reference's Lightning training loop body
(lightning_module.py:270-372 + configure_optimizers:494-511) with one XLA
program. Scaling model (SURVEY.md §2.4): data parallelism is GSPMD-style —
the step is written global-view and jitted with the batch axis of the
input graph sharded over the device mesh ('dp'); XLA inserts the ICI
all-reduces for gradients and for the normalizer's global statistics
automatically. No NCCL translation, no per-rank code.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.models.simulator import Simulator, SimulatorState
from graph_physics_tpu.training import noise as noise_lib
from graph_physics_tpu.training import loss as loss_lib
from graph_physics_tpu.training import packed as packed_lib
from graph_physics_tpu.training.loss import LossInputs, LossType, MultiLoss


@struct.dataclass
class TrainState:
    params: Any
    opt_state: optax.OptState
    sim_state: SimulatorState
    step: jnp.ndarray  # [] int32


def _model_uses_gumbel(model) -> bool:
    """True for processors whose forward samples the 'gumbel' rng
    collection (Transolver++ slice assignment). Detection is by class —
    flax can't introspect rng collections without tracing."""
    from graph_physics_tpu.models.processors import TransolverProcessor

    return isinstance(model, TransolverProcessor) or bool(
        getattr(model, "uses_gumbel_rng", False)
    )


def model_params(params):
    """Unwrap the processor params (identity unless spatial MTP wraps them
    into {'model':..., 'mtp':...})."""
    if isinstance(params, dict) and set(params.keys()) == {"model", "mtp"}:
        return params["model"]
    return params


def wrap_mtp_params(params, mtp: "MTPSetup", rng: jax.Array):
    """Wrap processor params with a freshly-initialized MTP encoder — the
    single definition of the {'model':..., 'mtp':...} pytree shape (used
    by init_train_state and by gpt-convert, which must emit the exact
    structure the abstract restore expects)."""
    b, l, d = 2, 1 + mtp.cfg.max_neighbors, mtp.cfg.d_model
    mtp_params = mtp.encoder.init(
        rng, jnp.zeros((b, l, d)), jnp.zeros((b, l), bool)
    )
    return {"model": params, "mtp": mtp_params}


@dataclass(frozen=True)
class MTPSetup:
    """Spatial-MTP wiring: config + encoder module + shared-head applier.

    ``out_head_apply(model_params, z)`` runs the processor's decode MLP on
    MTP hidden states (the reference shares the decode head via hooks,
    lightning_module.py:165-231).
    """

    cfg: Any  # SpatialMTPConfig
    encoder: Any  # StarEncoder module
    out_head_apply: Callable


@dataclass(frozen=True)
class NoiseConfig:
    starts: Tuple[int, ...]
    ends: Tuple[int, ...]
    scales: Tuple[float, ...]
    curriculum: bool = False  # cosine curriculum over training progress

    @property
    def enabled(self) -> bool:
        return len(self.starts) > 0 and any(s > 0 for s in self.scales)


def init_train_state(
    simulator: Simulator,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example: MeshGraph,
    mtp: Optional["MTPSetup"] = None,
) -> TrainState:
    params = simulator.init_params(rng, example)
    if mtp is not None:
        params = wrap_mtp_params(params, mtp, jax.random.fold_in(rng, 1))
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        sim_state=simulator.init_state(),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    simulator: Simulator,
    optimizer: optax.GradientTransformation,
    loss_fn,  # LossType or MultiLoss
    noise_cfg: Optional[NoiseConfig] = None,
    mask_types: Sequence[int] = loss_lib.DEFAULT_MASK_TYPES,
    gradient_method: Optional[str] = None,
    num_steps: int = 1,
    donate: bool = True,
    device_preprocess: Optional[Callable] = None,
    mtp: Optional[MTPSetup] = None,
    dp_axis_name: Optional[str] = None,
) -> Callable[[TrainState, MeshGraph, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` is a MeshGraph with a leading batch axis (possibly sharded
    over the 'dp' mesh axis). ``loss_fn`` is a LossType member or a
    MultiLoss (spec: lightning_module.py:278-312). ``device_preprocess``
    (graph, rng, step) -> graph supersedes ``noise_cfg`` when given (use
    transforms.make_device_preprocess to compose noise + world features).

    ``dp_axis_name`` marks the step as running INSIDE ``shard_map`` over a
    data-parallel mesh axis (parallel/dp.py). Mechanism (check_vma is
    False there — Pallas calls carry no vma annotations — so AD through
    collectives is avoided entirely): plain losses use a global-denominator
    masked mean (numerator local ×axis_size, denominator psum-ed with no
    gradient path), and ``step_body`` pmeans the per-shard gradients after
    ``value_and_grad`` — together exactly the single-device masked mean
    and its gradient, even when deselected/mask counts differ per shard.
    MultiLoss batch vmaps are per-sample-complete means and are exact
    under the plain grad pmean already. Build the simulator with
    ``axis_name=dp_axis_name`` so normalizer statistics psum globally.
    Leave None for single-device or GSPMD execution.
    """
    is_multi = isinstance(loss_fn, MultiLoss)
    mask_types = tuple(int(m) for m in mask_types)
    # Transolver++ trains WITH gumbel noise in its slice assignment
    # (reference transolver.py:19-33,135 — the noise is unconditional
    # there); thread a 'gumbel' rng into the model apply during training.
    # Eval/rollout stays noise-free (models/transolver.py falls back to
    # the tempered softmax without the collection).
    uses_gumbel = _model_uses_gumbel(simulator.model)

    dp_mean = None
    if dp_axis_name is not None:
        def dp_mean(errors, mask):
            """Global masked mean, exact across uneven per-shard masks:
            num stays LOCAL (scaled by axis_size so the caller's grad/
            metric pmean reproduces the global sum), den is the psum-ed
            global mask count — shape contract from loss.masked_num_den.
            No differentiated collective: den has no parameter
            dependence, so check_vma=False psum transpose semantics
            never matter."""
            num, den = loss_lib.masked_num_den(errors, mask)
            den = jax.lax.psum(den, dp_axis_name)
            n = jax.lax.axis_size(dp_axis_name)
            return n * num / jnp.maximum(den, 1.0)

    def compute_loss(params, sim_state: SimulatorState, graph: MeshGraph, mtp_rng, model_rngs):
        mp = model_params(params)
        g_in, target_norm, pre_t, new_state = simulator.prepare(
            sim_state, graph, is_training=True
        )
        inter = None
        if mtp is not None:
            net_out, inter = simulator.apply_model_with_intermediates(
                mp, g_in, rngs=model_rngs
            )
        else:
            net_out = simulator.apply_model(mp, g_in, rngs=model_rngs)

        inp = LossInputs(
            graph=graph,
            target=target_norm,
            network_output=net_out,
            deselected=graph.deselected,
        )
        if is_multi:
            out_phys = simulator.build_outputs_from_pre(new_state, net_out, pre_t)
            tgt_phys = simulator.build_outputs_from_pre(new_state, target_norm, pre_t)
            inp = inp.replace(
                network_output_physical=out_phys, target_physical=tgt_phys
            )
            # vmap physics losses over the batch axis (they use per-graph
            # connectivity); data losses are shape-polymorphic.
            def per_graph(i):
                total, terms = loss_fn(
                    i,
                    mask_types=mask_types,
                    gradient_method=gradient_method,
                    return_all_losses=True,
                )
                return total, terms

            if simulator.is_packed(graph):
                # packed [N, B, F] fast path: topology is SHARED across the
                # batch, so vmap over axis 1 of the field leaves only, with
                # the (unbatched) connectivity closed over — per-sample
                # masked means match the stacked path exactly.
                desel = inp.deselected
                desel_ax = 1 if (desel is not None and desel.ndim == 2) else None

                def per_sample(tgt, out, out_p, tgt_p, dsel):
                    i = LossInputs(
                        graph=graph,
                        target=tgt,
                        network_output=out,
                        network_output_physical=out_p,
                        target_physical=tgt_p,
                        deselected=dsel,
                    )
                    return per_graph(i)

                totals, terms = jax.vmap(
                    per_sample, in_axes=(1, 1, 1, 1, desel_ax)
                )(inp.target, inp.network_output, out_phys, tgt_phys, desel)
                total = jnp.mean(totals)
                terms = [jnp.mean(t) for t in terms]
            elif graph.x.ndim == 3:
                totals, terms = jax.vmap(per_graph)(inp)
                total = jnp.mean(totals)
                terms = [jnp.mean(t) for t in terms]
            else:
                total, terms = per_graph(inp)
        else:
            total = loss_fn.fn(inp, mask_types=mask_types, mean_fn=dp_mean)
            terms = [total]

        stats: Dict[str, jnp.ndarray] = {}
        if mtp is not None:
            from graph_physics_tpu.models.spatial_mtp import spatial_mtp_loss

            def unwrap(v):
                # sow stores a tuple per name
                return v[0] if isinstance(v, (tuple, list)) else v

            h_pen = unwrap(inter["penultimate"])
            h_enc = unwrap(inter["node_encoding"])

            def head_apply(z):
                return mtp.out_head_apply(mp, z)

            def one(g, hp, he, tgt, key):
                return spatial_mtp_loss(
                    params["mtp"], mtp.encoder, mtp.cfg, g, hp, he, tgt,
                    head_apply, key,
                )

            if simulator.is_packed(graph):
                # shared topology: spatial_mtp_loss handles [N, B, d]
                aux, stats = one(graph, h_pen, h_enc, target_norm, mtp_rng)
            elif graph.x.ndim == 3:
                b = graph.x.shape[0]
                keys = jax.random.split(mtp_rng, b)
                aux, st = jax.vmap(one)(graph, h_pen, h_enc, target_norm, keys)
                aux = jnp.mean(aux)
                stats = {k: jnp.mean(v) for k, v in st.items()}
            else:
                aux, stats = one(graph, h_pen, h_enc, target_norm, mtp_rng)
            stats["sp_mtp/aux_loss"] = aux
            total = total + mtp.cfg.alpha * aux

        return total, (new_state, terms, stats)

    def step_body(state: TrainState, batch: MeshGraph, rng: jax.Array):
        # re-expand compact static leaves ([E, 1, F] from the loader's
        # broadcast_static mode) BEFORE anything else, so noise/world
        # features/normalizer statistics see the exact full-width layout
        graph = packed_lib.expand_static_leaves(batch)
        if device_preprocess is not None:
            graph = device_preprocess(graph, rng, state.step)
        elif noise_cfg is not None and noise_cfg.enabled:
            t = None
            if noise_cfg.curriculum:
                t = state.step.astype(jnp.float32) / max(num_steps, 1)
            graph = noise_lib.add_noise(
                graph,
                rng,
                list(noise_cfg.starts),
                list(noise_cfg.ends),
                list(noise_cfg.scales),
                t=t,
            )
        mtp_rng = jax.random.fold_in(rng, 7)
        model_rngs = (
            # rbg-impl key: the gumbel draw is the transolver step's
            # biggest RNG volume (N·H·G uniforms per block); threefry
            # generation measured 7,227 -> 4,592 g/s when the noise was
            # first threaded, rbg recovers most of it (same N(gumbel)
            # distribution, different-but-proper generator). The impl
            # rides the typed key through flax's fold_in/split.
            {
                "gumbel": jax.random.wrap_key_data(
                    jax.random.bits(
                        jax.random.fold_in(rng, 11), (4,), jnp.uint32
                    ),
                    impl="rbg",
                )
            }
            if uses_gumbel
            else None
        )
        (loss_val, (new_sim_state, terms, stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params, state.sim_state, graph, mtp_rng, model_rngs)

        if dp_axis_name is not None:
            # DDP reduction. Exactness: no differentiated path crosses
            # shards (normalizer psums sit behind stop_gradient; dp_mean's
            # denominator psum carries no parameter dependence), and the
            # per-shard loss is axis_size·local_num/global_den (plain
            # losses) or a mean of per-sample-complete means (MultiLoss
            # vmaps), so pmean of per-shard grads IS the global gradient —
            # including uneven deselected/mask counts per shard. Works
            # under check_vma=False — required because Pallas calls don't
            # carry vma annotations.
            grads = jax.lax.pmean(grads, dp_axis_name)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss_val, "grad_norm": gnorm}
        metrics.update(stats)
        for i, t_ in enumerate(terms):
            metrics[f"loss_term_{i}"] = t_
        if dp_axis_name is not None:
            # all metrics are shard-local at this point (including loss —
            # the dp_mean numerator is local); this pmean is what makes
            # them the global values. grad_norm is computed from the
            # already-pmean-ed grads, so its pmean is the identity.
            metrics = jax.tree.map(
                lambda m: jax.lax.pmean(m, dp_axis_name), metrics
            )
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            sim_state=new_sim_state,
            step=state.step + 1,
        )
        return new_state, metrics

    train_step = jax.jit(step_body, donate_argnums=(0,) if donate else ())
    train_step._step_body = step_body  # exposed for the multi-step scan
    return train_step


def make_multi_step(
    train_step,
    unroll: int = 1,
) -> Callable[[TrainState, MeshGraph, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Fuse K optimizer steps into ONE XLA program via ``lax.scan``.

    ``(state, batch, rng) -> (state, stacked metrics[K])`` — the batch is
    reused each inner step with a fresh PRNG key (fresh noise draw). One
    host dispatch per K steps: amortizes host→device latency (essential
    when the device sits behind a high-latency link) and lets XLA overlap
    step boundaries. Pass ``batch`` with a leading [K] axis to consume K
    distinct device-resident batches instead.
    """
    body = getattr(train_step, "_step_body", train_step)

    @partial(jax.jit, static_argnames=("num_inner",), donate_argnums=(0,))
    def multi_step(state: TrainState, batch: MeshGraph, rng: jax.Array, num_inner: int = unroll):
        keys = jax.random.split(rng, num_inner)
        batched_time = jax.tree.leaves(batch)[0].ndim >= 1 and hasattr(batch, "x") and batch.x.ndim == 4

        def scan_body(carry, xs):
            if batched_time:
                key, b = xs
            else:
                key, b = xs, batch
            new_state, metrics = body(carry, b, key)
            return new_state, metrics

        xs = (keys, batch) if batched_time else keys
        state, metrics = jax.lax.scan(scan_body, state, xs)
        return state, metrics

    return multi_step
