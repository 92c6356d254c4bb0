"""Bucketed batching loader with background prefetch.

Replaces the reference's PyG DataLoader + worker subprocesses
(train.py:162-198). TPU-shaped differences:

  * batches contain only frames of the SAME (n_pad, e_pad) bucket, stacked
    on a leading axis → one compiled program per bucket, batched GEMMs;
  * host→device transfer overlaps graph building via a prefetch thread
    (the spawn-subprocess machinery and h5 per-worker handles of the
    reference are unnecessary: building is numpy-light and h5 reads are
    LRU-cached).
"""

from __future__ import annotations

import queue
import threading
from collections import defaultdict
from typing import Iterator, List, Optional

import jax
import numpy as np

from graph_physics_tpu.core.graph import MeshGraph


def stack_batch(frames: List[MeshGraph]) -> MeshGraph:
    """Stack same-bucket frames along a new leading batch axis."""
    return jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *frames
    )


class BatchLoader:
    """Iterate (shuffled) same-bucket batches of padded MeshGraphs."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        device_put: bool = True,
        sharding=None,
        packed: bool = False,
        frame_transform=None,
        process_shard: Optional[tuple] = None,
        workers: int = 1,
        broadcast_static: bool = False,
        packed_transform=None,
    ):
        """``packed=True``: batches are built from frames of ONE trajectory
        (shared topology) and emitted in the [N, B, F] trajectory-major
        layout (training/packed.py) — the TPU-efficient gather path.
        ``frame_transform``: host-side per-frame graph hook applied before
        stacking (e.g. the fused-kernel blocked-layout conversion).

        ``process_shard=(process_index, process_count)``: multi-host data
        loading — every process computes the IDENTICAL global batch
        schedule (same seed → same rng stream), but materializes only its
        1/process_count slice of each batch and assembles the global
        jax.Array via ``jax.make_array_from_process_local_data`` against
        the (callable) ``sharding``. Replicated leaves (packed-layout
        topology arrays — same-trajectory groups share them exactly) are
        passed whole. Requires ``sharding`` and ``device_put``."""
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.device_put = device_put
        self.sharding = sharding
        self.packed = packed
        self.frame_transform = frame_transform
        #: packed-batch twin of ``frame_transform`` (e.g.
        #: FusedTopologyManager.transform_packed) — enables the
        #: vectorized whole-batch build lane; None disables that lane
        #: whenever ``frame_transform`` is set
        self.packed_transform = packed_transform
        self.process_shard = process_shard
        #: >1: build the batch's frames (dataset read + FrameBuilder +
        #: frame_transform) on a thread pool — h5py reads and the numpy
        #: FrameBuilder release the GIL for their heavy parts, so frame
        #: building scales across cores when the single prefetch thread
        #: would starve the fused step (scripts/bench_loader.py measures
        #: the balance). Dataset/tiling caches take internal locks.
        self.workers = workers
        #: compact shared leaves to [N, 1, F] views (the train step
        #: re-expands on device — packed.expand_static_leaves). Works on
        #: the plain path AND under dp shardings (the spec callables map
        #: size-1 batch-axis leaves to replicated; each shard re-expands
        #: to its local width — exact). Multi-host global assembly still
        #: pays the host repeat: its replicated-leaf contract is
        #: byte-identity across processes, which is guaranteed here, but
        #: the per-process slice bookkeeping assumes full-width leaves.
        self.broadcast_static = bool(
            broadcast_static and packed and process_shard is None
        )
        if process_shard is not None:
            pi, pc = process_shard
            if batch_size % pc != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over "
                    f"{pc} processes"
                )
            if not (device_put and callable(sharding)):
                raise ValueError(
                    "process_shard requires device_put and a per-leaf "
                    "sharding callable"
                )
        self._rng = np.random.default_rng(seed)

    def _batched_indices(self, shuffle: Optional[bool] = None) -> List[List[int]]:
        shuffle = self.shuffle if shuffle is None else shuffle
        by_bucket = defaultdict(list)
        for i in range(len(self.ds)):
            if self.packed:
                # same-trajectory (and same-partition) groups
                t, _, part = self.ds.indices_for(i)
                key = (t, part)
            else:
                key = self.ds.bucket_of(i)
            by_bucket[key].append(i)
        batches = []
        for idxs in by_bucket.values():
            idxs = np.asarray(idxs)
            if shuffle:
                self._rng.shuffle(idxs)
            for s in range(0, len(idxs), self.batch_size):
                chunk = idxs[s : s + self.batch_size].tolist()
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        continue
                    # repeat-pad so every batch of a bucket has one shape
                    chunk = (chunk * self.batch_size)[: self.batch_size]
                batches.append(chunk)
        if shuffle:
            order = self._rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches

    def __len__(self):
        # exact: group sizes depend on bucketing / same-trajectory packing
        # (shuffle=False so the rng stream driving batch order is untouched)
        return len(self._batched_indices(shuffle=False))

    def _produce(self, batches, q):
        try:
            for chunk in batches:
                if self.process_shard is not None:
                    pi, pc = self.process_shard
                    local = len(chunk) // pc
                    chunk = chunk[pi * local : (pi + 1) * local]
                batch = self._packed_fast(chunk) if self.packed else None
                if batch is None:
                    if self.workers > 1 and len(chunk) > 1:
                        frames = list(self._pool().map(self._build_one, chunk))
                    else:
                        frames = [self._build_one(i) for i in chunk]
                    if self.packed:
                        from graph_physics_tpu.training.packed import (
                            pack_frames,
                        )

                        # direct [N, B, F] assembly (single copy of
                        # dynamic leaves) when the frames share static-
                        # topology objects; checked stack+pack otherwise
                        batch = pack_frames(
                            frames, broadcast_static=self.broadcast_static
                        )
                    else:
                        batch = stack_batch(frames)
                if self.process_shard is not None:
                    batch = self._assemble_global(batch)
                elif self.device_put:
                    if callable(self.sharding):
                        batch = jax.device_put(batch, self._spec_tree(batch))
                    elif self.sharding is not None:
                        batch = jax.device_put(batch, self.sharding)
                    else:
                        batch = jax.device_put(batch)
                q.put(batch)
        except Exception as e:  # surface loader errors to the consumer
            q.put(e)
        finally:
            q.put(None)

    def _build_one(self, i):
        f = self.ds[i]
        if self.frame_transform is not None:
            f = self.frame_transform(f)
        return f

    def _packed_fast(self, chunk) -> Optional[MeshGraph]:
        """Vectorized whole-batch lane: one ``get_frames_packed`` build
        (all B frames' dynamic leaves in a handful of numpy ops) plus the
        template-based packed layout transform. None → the caller runs
        the per-frame path, which also WARMS this lane (first batch of a
        trajectory builds the skeleton and the conversion template)."""
        if not hasattr(self.ds, "get_frames_packed"):
            return None
        if self.frame_transform is not None and self.packed_transform is None:
            return None
        g = self.ds.get_frames_packed(chunk, train=True)
        if g is None:
            return None
        if self.packed_transform is not None:
            g = self.packed_transform(g)
            if g is None:
                return None
        from graph_physics_tpu.training.packed import finalize_packed

        return finalize_packed(g, len(chunk), self.broadcast_static)

    def _pool(self):
        if getattr(self, "_executor", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=self.workers)
        return self._executor

    def _spec_tree(self, batch):
        """Per-leaf shardings from the callable ``self.sharding`` —
        path-aware callables (``sharding.with_path``) receive
        (tree_path, leaf) so the spec can depend on the FIELD (packed
        layouts put the batch axis in different positions per field)."""
        if getattr(self.sharding, "with_path", False):
            return jax.tree_util.tree_map_with_path(self.sharding, batch)
        return jax.tree.map(self.sharding, batch)

    def _assemble_global(self, batch: MeshGraph) -> MeshGraph:
        """Build global jax.Arrays from this process's local batch slice.

        Leaves whose spec shards the batch axis contribute the local
        [B/process_count] slice; replicated leaves contribute the full
        array (identical on every process: the global batch schedule is
        deterministic, and packed topology arrays come from the shared
        trajectory)."""
        _, pc = self.process_shard
        specs = self._spec_tree(batch)

        def leaf(a, spec):
            a = np.asarray(a)
            sharded_axes = [s for s in spec.spec if s is not None]
            gshape = None
            if sharded_axes:
                # batch axis is the (single) sharded one — scale it back
                # to the global size
                gshape = list(a.shape)
                for ax, s in enumerate(spec.spec):
                    if s is not None:
                        gshape[ax] *= pc
                gshape = tuple(gshape)
            return jax.make_array_from_process_local_data(spec, a, gshape)

        return jax.tree.map(leaf, batch, specs)

    def __iter__(self) -> Iterator[MeshGraph]:
        batches = self._batched_indices()
        q: "queue.Queue" = queue.Queue(maxsize=max(self.prefetch, 1))
        t = threading.Thread(target=self._produce, args=(batches, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
