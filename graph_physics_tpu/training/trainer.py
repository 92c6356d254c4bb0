"""Training driver — epochs, validation rollouts, checkpointing, logging.

The functional replacement for Lightning's Trainer + LightningModule glue
(reference train.py:276-312, lightning_module.py). One object owns:

  * the jitted train step (training/step.py) fed by the bucketed loader;
  * per-epoch validation: full autoregressive rollouts per trajectory via
    the scan rollout (training/rollout.py), aggregated exactly like
    on_validation_epoch_end (lightning_module.py:467-493): RMSE over the
    concatenation of every step of every trajectory;
  * orbax checkpointing every epoch + resume;
  * JSONL/wandb metrics (training/logging.py);
  * optional XDMF dump of validation trajectory 0 per epoch
    (lightning_module.py:428-438).

Data parallelism: pass a ``jax.sharding.Mesh``; batches are placed with
the batch axis sharded over 'dp' and the same global-view jitted step runs
unchanged (XLA inserts ICI collectives).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_physics_tpu.dataset.loader import BatchLoader
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training import checkpoint as ckpt_lib
from graph_physics_tpu.training import schedule as schedule_lib
from graph_physics_tpu.training.logging import MetricsLogger
from graph_physics_tpu.training.rollout import make_rollout_fn, stack_frames
from graph_physics_tpu.training.step import (
    TrainState,
    init_train_state,
    make_train_step,
    model_params,
)


@dataclass
class TrainerConfig:
    epochs: int = 1
    batch_size: int = 1
    learning_rate: float = 1e-3
    warmup: int = 1000
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    seed: int = 42
    out_dir: str = "runs"
    run_name: str = "run"
    checkpoint_every_epochs: int = 1
    max_val_trajectories: Optional[int] = None
    #: at most this many same-shape validation trajectories live on the
    #: device at once: trajectory frames are cached HOST-side (numpy) and
    #: streamed to the chip per chunk, so validate()'s peak device memory
    #: is O(val_device_batch × trajectory bytes) — independent of the
    #: validation-set size (at CylinderFlow scale ~100 cached device
    #: trajectories would pin multiple GB of HBM for the whole run).
    #: None = single dispatch per shape group (small val sets).
    val_device_batch: Optional[int] = 8
    previous_data_slice: Optional[tuple] = None
    save_val_xdmf: bool = False
    save_val_visualizations: bool = False
    use_wandb: bool = False
    log_every: int = 50
    profile_dir: Optional[str] = None
    accumulate_grad_batches: int = 1
    #: keep the k best checkpoints by this validation metric instead of
    #: the k most recent (reference ModelCheckpoint monitor analog)
    monitor_metric: Optional[str] = None
    #: trajectory-major [N, B, F] batching (shared topology) — the TPU
    #: fast gather path (training/packed.py)
    packed: bool = False
    #: packed loader: emit shared static leaves (e.g. static edge
    #: features) as zero-copy [N, 1, F] views; the train step re-expands
    #: them on device (packed.expand_static_leaves — bit-identical).
    #: Cuts host batch assembly + H2D ~75% at cylinder scale. Auto-
    #: disabled by the loader when the batch axis is sharded (dp/sp/
    #: multi-host).
    broadcast_static: bool = True
    #: BatchLoader frame-building thread pool. Default 1: the skeleton
    #: fast paths are GIL-bound small ops and threads only help when the
    #: fast-path gates are off (world edges / partitions / feature hooks
    #: force full per-frame rebuilds, ~2x measured at 8 workers).
    loader_workers: int = 1
    #: fuse K optimizer steps into one XLA dispatch (lax.scan over K
    #: stacked batches) — amortizes host→device latency
    steps_per_dispatch: int = 1
    #: run GraphNetBlocks through the fused Pallas kernel: per-trajectory
    #: blocked-CSR tilings built host-side, one (model, step) clone per
    #: topology sharing the single param/opt state (training/fused.py).
    #: Requires packed batching and a static per-trajectory topology (no
    #: world edges / random extra edges). Accelerates BOTH model families:
    #: epd runs the fused GraphNetBlock kernel (ops/fused_gnblock) and
    #: transformer runs the fused edge attention (ops/fused_edge_attention,
    #: 3.7x measured); untileable topologies fall back to the XLA path per
    #: trajectory.
    fused: bool = False
    #: >1: dispatch the fused GraphNetBlock as up to this many
    #: window-width buckets (groups sorted by touched window units) so
    #: graded meshes don't pay the max sender-window width everywhere;
    #: uniform meshes plan a single bucket automatically. 1 = off.
    fused_wb_buckets: int = 1
    #: transformer models: also build the uniform-degree (NK) attention
    #: layout per topology — receiver-side moves become static K-slices
    #: (ops/fused_edge_attention_nk). Default ON since the round-4 TPU
    #: measurement (1,557 vs 1,292 g/s blocked-CSR on the cylinder-sized
    #: transformer); degree-skewed topologies fall back to CSR.
    fused_attn_nk: bool = True
    #: epd models: convert frames into the NK slot layout and run the
    #: fused NK GraphNetBlock (ops/fused_gnblock_nk) instead of the
    #: blocked-CSR kernel — receiver-side one-hot contractions become
    #: static K-slices (2 fwd / 3 bwd one-hot contractions vs 4 / 7).
    #: Default ON since the round-4 same-window A/B (NK 4,982 vs CSR
    #: 4,778 g/s on the cylinder bench, device-resident batch). Degree-
    #: skewed topologies fall back to the CSR kernel per trajectory.
    fused_gn_nk: bool = True
    #: with fused_gn_nk, graded meshes (airfoil-class degree skew) also
    #: price the per-block-K bucketed NK layout (≤ this many K_b
    #: segments, node blocks sorted by local max in-degree) and take it
    #: when it cuts slot rows ≥10% vs the global K; uniform meshes keep
    #: the single-K layout automatically. 1 = always global-K.
    fused_nk_k_buckets: int = 3


class Trainer:
    def __init__(
        self,
        simulator: Simulator,
        train_dataset,
        val_dataset,
        loss_fn,
        cfg: TrainerConfig,
        gradient_method: Optional[str] = None,
        device_preprocess=None,
        eval_transform=None,
        mesh: Optional[jax.sharding.Mesh] = None,
        run_metadata: Optional[Dict[str, Any]] = None,
        mtp=None,
        dynamic_world_edges=None,
    ):
        self.sim = simulator
        self.train_ds = train_dataset
        self.val_ds = val_dataset
        self.cfg = cfg
        self.run_metadata = run_metadata or {}

        steps_per_epoch = max(
            (len(train_dataset) + cfg.batch_size - 1) // cfg.batch_size, 1
        )
        self.num_steps = steps_per_epoch * cfg.epochs
        self.optimizer = schedule_lib.make_optimizer(
            cfg.learning_rate,
            warmup=cfg.warmup,
            num_steps=self.num_steps,
            weight_decay=cfg.weight_decay,
            grad_clip=cfg.grad_clip,
            accumulate_grad_batches=cfg.accumulate_grad_batches,
        )
        self.lr_schedule = schedule_lib.cosine_warmup_schedule(
            cfg.learning_rate, cfg.warmup, self.num_steps
        )
        self.mtp = mtp
        self.multi_step = None

        step_kwargs = dict(
            gradient_method=gradient_method,
            num_steps=self.num_steps,
            device_preprocess=device_preprocess,
            mtp=mtp,
        )
        # fused + mesh: GSPMD cannot partition a Pallas custom call (it
        # would all-gather the batch and replicate the kernel on every
        # chip), so the fused multi-chip path runs the step inside
        # shard_map over 'dp' instead (parallel/dp.py). The XLA path
        # stays on GSPMD.
        dp_shard_map = mesh is not None and cfg.fused

        def _build_step(sim):
            if dp_shard_map:
                from graph_physics_tpu.parallel.dp import make_dp_train_step

                return make_dp_train_step(
                    sim, self.optimizer, loss_fn, mesh,
                    packed=cfg.packed, **step_kwargs,
                )
            return make_train_step(sim, self.optimizer, loss_fn, **step_kwargs)

        def _build_multi(sim, unroll):
            if dp_shard_map:
                from graph_physics_tpu.parallel.dp import make_dp_multi_step

                return make_dp_multi_step(
                    sim, self.optimizer, loss_fn, mesh, unroll,
                    packed=cfg.packed, **step_kwargs,
                )
            from graph_physics_tpu.training.step import make_multi_step

            return make_multi_step(_build_step(sim), unroll=unroll)

        self._build_step = _build_step
        self._build_multi = _build_multi
        self.train_step = _build_step(simulator)
        if cfg.steps_per_dispatch > 1:
            self.multi_step = _build_multi(simulator, cfg.steps_per_dispatch)
        self._fused_mgr = None
        self._fused_multi = {}
        if cfg.fused:
            if not cfg.packed:
                raise ValueError("TrainerConfig.fused requires packed=True")
            from graph_physics_tpu.models.processors import (
                EncodeProcessDecode,
            )
            from graph_physics_tpu.training.fused import FusedTopologyManager

            # the NK SLOT frame layout feeds the fused NK GraphNetBlock —
            # EPD models only. Transformers carry a DIFFERENT edge_tiling_nk
            # (the NK attention indices ride ALONGSIDE the CSR edge layout,
            # gathering from nodes), so converting their frames to slot
            # layout would drop tiling_idx and silently disable the fused
            # attention kernels.
            self._fused_mgr = FusedTopologyManager(
                wb_buckets=cfg.fused_wb_buckets,
                build_nk=cfg.fused_attn_nk,
                nk_layout=(cfg.fused_gn_nk
                           and isinstance(simulator.model,
                                          EncodeProcessDecode)),
                nk_k_buckets=cfg.fused_nk_k_buckets)
        self.rollout_fn = make_rollout_fn(
            simulator,
            previous_data_slice=cfg.previous_data_slice,
            frame_transform=eval_transform,
            dynamic_world_edges=dynamic_world_edges,
        )
        from graph_physics_tpu.training.rollout import make_batched_rollout_fn

        self.batched_rollout_fn = make_batched_rollout_fn(
            simulator,
            previous_data_slice=cfg.previous_data_slice,
            frame_transform=eval_transform,
            dynamic_world_edges=dynamic_world_edges,
        )

        self.sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            packed = cfg.packed

            # batch axis over 'dp'. Stacked layout: axis 0 of every
            # leaf. Packed layout: the batch axis position depends on the
            # FIELD ([N, B, F] node / [E, B, F] edge arrays -> axis 1;
            # time [B] -> axis 0; topology/masks -> replicated), so the
            # spec resolves by tree path, not by rank — a rank-based rule
            # would mark time/deselected replicated, which single-process
            # GSPMD silently reshards but multi-host assembly
            # (make_array_from_process_local_data) would corrupt: a
            # "replicated" leaf built from process-LOCAL slices.
            PACKED_BATCH_AXIS = {
                "x": 1, "edge_attr": 1, "y": 1, "prev": 1,
                "next_data": 1, "phi": 1, "deselected": 1, "time": 0,
                "wedge_senders": 1, "wedge_receivers": 1,
                "wedge_mask": 1, "wedge_attr": 1,
            }

            def spec_for(path, leaf):
                name = None
                if path and hasattr(path[0], "name"):
                    name = path[0].name
                if packed:
                    ax = PACKED_BATCH_AXIS.get(name)
                    if (
                        ax is None
                        or np.ndim(leaf) <= ax
                        # broadcast-static compact leaf ([E, 1, F] view):
                        # identical for every sample — replicate; the
                        # step re-expands it per shard
                        or np.shape(leaf)[ax] == 1
                    ):
                        return NamedSharding(mesh, P())
                    spec = [None] * np.ndim(leaf)
                    spec[ax] = "dp"
                    return NamedSharding(mesh, P(*spec))
                if np.ndim(leaf) == 0:
                    return NamedSharding(mesh, P())
                return NamedSharding(
                    mesh, P("dp", *([None] * (np.ndim(leaf) - 1)))
                )

            spec_for.with_path = True  # loader: resolve via tree paths
            self._mesh = mesh
            self.sharding = spec_for

        #: multi-host: every process runs this same Trainer in SPMD
        #: lockstep; host-side effects (console, JSONL/wandb logging) are
        #: gated to process 0, data loading is process-sharded, and orbax
        #: coordinates the checkpoint writes itself (all processes call
        #: save). See docs/PARALLELISM.md.
        self._is_main = jax.process_index() == 0
        self._proc_shard = (
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1
            else None
        )
        if self._proc_shard is not None and self.sharding is None:
            raise ValueError(
                "multi-process training requires a device mesh (pass "
                "mesh=... spanning jax.devices())"
            )
        # multi-host × fused works as-is: the shard_map fused-dp step is
        # per-shard-local (parallel/dp.py), the per-topology step key is
        # derived host-side from REPLICATED leaves (tiling_idx — identical
        # bytes on every process under the identical global schedule), and
        # batches arrive as global arrays from the process-sharded loader.
        # steps_per_dispatch > 1 stacks pending batches through a jitted
        # stacker (_stack_pending): eager jnp.stack is rejected on
        # non-fully-addressable global arrays, an explicitly-jitted SPMD
        # stack is not.
        self._stack_fn_cache = {}

        self.ckpt_dir = os.path.join(cfg.out_dir, cfg.run_name, "checkpoints")
        self.manager = ckpt_lib.make_manager(
            self.ckpt_dir, best_metric=cfg.monitor_metric
        )
        #: cached stacked validation trajectories (ground truth is static;
        #: restacking every epoch cost O(val-set) host copies per call)
        self._val_groups = None
        # constructed lazily in init_or_resume: a resumed run must reattach
        # to its original wandb run id, which lives in the checkpoint
        # metadata (reference lightning_module.py:560-573)
        self._logger: Optional[MetricsLogger] = None
        self.state: Optional[TrainState] = None

    @property
    def logger(self) -> MetricsLogger:
        if self._logger is None:
            cfg = self.cfg
            self._logger = MetricsLogger(
                os.path.join(cfg.out_dir, cfg.run_name),
                run_name=cfg.run_name,
                use_wandb=cfg.use_wandb,
                wandb_config=self.run_metadata,
                resume_id=self.run_metadata.get("run_id"),
                enabled=self._is_main,
            )
            if self._logger.run_id is not None:
                self.run_metadata["run_id"] = self._logger.run_id
        return self._logger

    # ------------------------------------------------------------------
    def _example_batch(self):
        loader = BatchLoader(
            self.train_ds,
            self.cfg.batch_size,
            shuffle=False,
            device_put=False,
            packed=self.cfg.packed,
            frame_transform=(
                self._fused_mgr.transform_frame if self._fused_mgr else None
            ),
        )
        return next(iter(loader))

    def init_or_resume(self, resume: bool = False):
        example = self._example_batch()
        state = init_train_state(
            self.sim,
            self.optimizer,
            jax.random.PRNGKey(self.cfg.seed),
            example,
            mtp=self.mtp,
        )
        if self._proc_shard is not None:
            # every process init'd the same state from the same key; place
            # it REPLICATED on the global mesh so the first global-batch
            # step doesn't mix local-committed and mesh-sharded operands
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            state = jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    rep, np.asarray(a)
                ),
                jax.device_get(state),
            )
        if resume:
            self.manager.wait_until_finished()
            state, meta = ckpt_lib.restore_checkpoint(self.manager, state)
            if meta:
                self.run_metadata.update(meta)
            if self.sharding is not None:
                # orbax restores arrays COMMITTED to their save-time
                # device (single-device); under a dp mesh the jitted
                # shard_map step rejects that placement against the
                # mesh-sharded batch — re-place the state replicated.
                from jax.sharding import NamedSharding, PartitionSpec as P

                state = jax.device_put(
                    state, NamedSharding(self._mesh, P())
                )
        self.state = state
        return state

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _stack_pending(self, pending):
        """Stack K same-layout batches along a new leading axis.

        Explicitly jitted: multi-host global batches are not fully
        addressable, so eager ``jnp.stack`` raises under the default
        spmd mode; a jitted SPMD stack runs in lockstep on every process
        and keeps the dp axis sharded (no cross-host traffic). One jit
        per K; new leaf shapes re-trace inside it."""
        fn = self._stack_fn_cache.get(len(pending))
        if fn is None:
            fn = jax.jit(
                lambda *xs: jax.tree.map(lambda *ys: jnp.stack(ys), *xs)
            )
            self._stack_fn_cache[len(pending)] = fn
        return fn(*pending)

    # ------------------------------------------------------------------
    def fit(self, resume: bool = False) -> TrainState:
        cfg = self.cfg
        if self.state is None:
            self.init_or_resume(resume=resume)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        start_epoch = int(self.state.step) // max(
            (len(self.train_ds) + cfg.batch_size - 1) // cfg.batch_size, 1
        )

        for epoch in range(start_epoch, cfg.epochs):
            loader = BatchLoader(
                self.train_ds,
                cfg.batch_size,
                shuffle=True,
                seed=cfg.seed + epoch,
                sharding=self.sharding,
                packed=cfg.packed,
                frame_transform=(
                    self._fused_mgr.transform_frame if self._fused_mgr else None
                ),
                packed_transform=(
                    self._fused_mgr.transform_packed if self._fused_mgr else None
                ),
                # multi-host: identical global schedule everywhere (same
                # seed), each process loads only its 1/P slice
                process_shard=self._proc_shard,
                workers=cfg.loader_workers,
                broadcast_static=cfg.broadcast_static,
            )
            t_epoch = time.time()
            n_batches = 0
            loss_sum = 0.0
            profiling = False
            pending = []  # same-shape batches awaiting a fused dispatch

            def run_single(batch):
                nonlocal n_batches, loss_sum
                rng_local = self._next_rng()
                step_fn = self.train_step
                if self._fused_mgr is not None:
                    _, step_fn = self._fused_mgr.step_for(
                        batch, self.sim, self._build_step
                    )
                self.state, metrics = step_fn(self.state, batch, rng_local)
                n_batches += 1
                step = int(self.state.step)
                loss_sum += float(metrics["loss"])
                if step % cfg.log_every == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["lr"] = float(self.lr_schedule(step))
                    metrics["epoch"] = epoch
                    self.logger.log(metrics, step)

            def flush(force=False):
                nonlocal pending, n_batches, loss_sum
                k = cfg.steps_per_dispatch
                if self.multi_step is not None and len(pending) == k:
                    multi_fn = self.multi_step
                    if self._fused_mgr is not None:
                        # per-topology multi-step over the tiled clone
                        key = self._fused_mgr.key_for(pending[0], self.sim)
                        multi_fn = self._fused_multi.get(key)
                        if multi_fn is None:
                            sim_t, _ = self._fused_mgr.step_for(
                                pending[0], self.sim, self._build_step
                            )
                            multi_fn = self._build_multi(sim_t, k)
                            self._fused_multi[key] = multi_fn
                    super_batch = self._stack_pending(pending)
                    self.state, ms = multi_fn(
                        self.state, super_batch, self._next_rng()
                    )
                    n_batches += k
                    loss_sum += float(jnp.sum(ms["loss"]))
                    pending = []
                elif force:
                    for b in pending:
                        run_single(b)
                    pending = []

            self._rng = rng
            for batch in loader:
                if (
                    cfg.profile_dir
                    and epoch == start_epoch
                    and n_batches == 1  # skip the compile step
                ):
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                if self.multi_step is None:
                    run_single(batch)
                else:
                    # compare the fused BUCKET key, not the trajectory:
                    # same-bucket batches stack fine even across
                    # trajectories (each step consumes its own runtime
                    # tiling_idx), while same-trajectory partition
                    # topologies with different tilings must flush
                    bucket_changed = (
                        self._fused_mgr is not None
                        and pending
                        and self._fused_mgr.key_for(pending[0], self.sim)
                        != self._fused_mgr.key_for(batch, self.sim)
                    )
                    def stack_sig(b):
                        # x bounds the bucket; edge_attr additionally
                        # distinguishes compact broadcast-static batches
                        # ([E, 1, F]) from full-width ones — stacking a
                        # mix would fail
                        return (
                            jnp.shape(b.x),
                            None if b.edge_attr is None
                            else jnp.shape(b.edge_attr),
                        )

                    if pending and (
                        bucket_changed
                        or stack_sig(pending[0]) != stack_sig(batch)
                    ):
                        flush(force=True)  # bucket/topology changed
                    pending.append(batch)
                    flush()
                if profiling and n_batches >= 4:
                    jax.profiler.stop_trace()
                    profiling = False
            flush(force=True)
            rng = self._rng
            if profiling:
                jax.profiler.stop_trace()

            epoch_metrics = {
                "epoch": epoch,
                "train_loss_epoch": loss_sum / max(n_batches, 1),
                "epoch_time_s": time.time() - t_epoch,
            }
            val_metrics = self.validate(epoch)
            epoch_metrics.update(val_metrics)
            self.logger.log(epoch_metrics, int(self.state.step))
            if self._is_main:
                print(
                    f"epoch {epoch}: "
                    f"train_loss={epoch_metrics['train_loss_epoch']:.5f}"
                    + (
                        f" val_rmse={val_metrics['val_all_rollout_rmse']:.5f}"
                        if "val_all_rollout_rmse" in val_metrics
                        else ""
                    )
                    + f" ({epoch_metrics['epoch_time_s']:.1f}s)",
                    flush=True,
                )

            if (epoch + 1) % cfg.checkpoint_every_epochs == 0 or epoch == cfg.epochs - 1:
                # async: disk write overlaps the next epoch; fit() waits
                # before returning
                ckpt_lib.save_checkpoint(
                    self.manager,
                    self.state,
                    int(self.state.step),
                    wait=False,
                    # run id round-trips through the checkpoint so resumed
                    # runs reattach to the same wandb run
                    # (lightning_module.py:560-573 parity)
                    metadata={
                        **self.run_metadata,
                        "epoch": epoch,
                        "run_id": self.logger.run_id,
                    },
                    metrics=(
                        {self.cfg.monitor_metric: val_metrics[self.cfg.monitor_metric]}
                        if self.cfg.monitor_metric
                        and self.cfg.monitor_metric in val_metrics
                        else None
                    ),
                )
        self.manager.wait_until_finished()
        return self.state

    # ------------------------------------------------------------------
    def validate(self, epoch: int = 0) -> Dict[str, float]:
        """Rollout every validation trajectory; aggregate like the
        reference's on_validation_epoch_end. Same-shape trajectories are
        stacked and rolled out in one dispatch (batched vmap rollout)."""
        if self.val_ds is None:
            return {}
        n_traj = self.val_ds.num_trajectories
        if self.cfg.max_val_trajectories is not None:
            n_traj = min(n_traj, self.cfg.max_val_trajectories)

        # group trajectories by stacked-frame shape; stacks are cached
        # HOST-side (numpy) once — frames are ground truth, so they never
        # change across epochs — and streamed to the device per chunk so
        # peak device memory is bounded by cfg.val_device_batch, not the
        # validation-set size. Key on the dataset IDENTITY too: swapping
        # val datasets of equal trajectory count between fit()/validate()
        # calls must not silently reuse the previous dataset's stacks.
        cache_key = (id(self.val_ds), n_traj)
        if self._val_groups is None or self._val_groups[0] != cache_key:
            groups: Dict[tuple, list] = {}
            for t in range(n_traj):
                frames = jax.tree.map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *self.val_ds.trajectory_frames(t),
                )
                # key on EVERY leaf shape + the None pattern: node/edge
                # buckets are not the only axes that vary per trajectory
                # (e.g. the face bucket moves independently of senders)
                key = (
                    tuple(np.shape(a) for a in jax.tree.leaves(frames)),
                    jax.tree.structure(frames),
                )
                groups.setdefault(key, []).append((t, frames))
            prepared = []
            for entries in groups.values():
                ts = [t for t, _ in entries]
                prepared.append((ts, [f for _, f in entries]))
            self._val_groups = (cache_key, prepared)

        params = model_params(self.state.params)
        if self._proc_shard is not None:
            # validation runs as a PER-PROCESS local program (every
            # process redundantly computes the same metrics — ground
            # truth is replicated); fetch the global-mesh params to host
            # so the local jit doesn't mix device assignments
            params = jax.device_get(params)
        sq_sum = 0.0
        count = 0.0
        first_rmses = []
        val_losses = []
        for ts, host_frames in self._val_groups[1]:
            chunk = self.cfg.val_device_batch or len(ts)
            for s in range(0, len(ts), chunk):
                part = host_frames[s : s + chunk]
                stacked = jax.tree.map(
                    lambda *xs: jnp.asarray(np.stack(xs)), *part
                )
                res = self.batched_rollout_fn(
                    params, self.state.sim_state, stacked
                )
                sq_sum += float(np.sum(np.asarray(res.sq_sum)))
                count += float(np.sum(np.asarray(res.count)))
                first_rmses.extend(np.asarray(res.rmse_1step).tolist())
                val_losses.extend(
                    np.mean(np.asarray(res.val_loss), axis=-1).tolist()
                )
                part_ts = ts[s : s + chunk]
                if 0 in part_ts and self._is_main and (
                    self.cfg.save_val_xdmf or self.cfg.save_val_visualizations
                ):
                    i0 = part_ts.index(0)
                    res0 = jax.tree.map(lambda a: a[i0], res)
                    frames0 = part[i0]
                    if self.cfg.save_val_xdmf:
                        self._save_rollout_xdmf(res0, frames0, epoch)
                    if self.cfg.save_val_visualizations:
                        from graph_physics_tpu.training.callback import (
                            PredictionVisualizer,
                        )

                        PredictionVisualizer(
                            os.path.join(
                                self.cfg.out_dir, self.cfg.run_name, "viz"
                            ),
                            wandb_run=self.logger.wandb,
                        )(res0, frames0, epoch)
                del stacked, res  # device buffers die before the next chunk
        return {
            "val_all_rollout_rmse": float(np.sqrt(sq_sum / max(count, 1.0))),
            "val_1step_rmse": float(np.mean(first_rmses)),
            "val_loss": float(np.mean(val_losses)),
        }

    def _save_rollout_xdmf(self, res, frames, epoch: int):
        from graph_physics_tpu.utils.xdmf import XdmfTimeSeriesWriter

        path = os.path.join(
            self.cfg.out_dir, self.cfg.run_name, "meshes", f"epoch_{epoch}.xdmf"
        )
        w = XdmfTimeSeriesWriter(path)
        n = int(frames.n_node[0])
        c = int(np.sum(np.asarray(frames.face_mask[0]))) if frames.face_mask is not None else None
        preds = np.asarray(res.predictions)
        for i in range(preds.shape[0]):
            pos = np.asarray(frames.pos[i])[:n]
            cells = np.asarray(frames.faces[i])[:c] if c is not None else None
            w.append(
                pos,
                cells,
                {"prediction": preds[i, :n], "target": np.asarray(res.targets[i])[:n]},
                float(frames.time[i]) if frames.time is not None else float(i),
            )
