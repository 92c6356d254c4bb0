"""Shape bucketing — the static-shape policy that makes meshes jit-friendly.

XLA compiles one program per input shape. Meshes in a dataset vary in node
and edge count, so we round (N, E, C) up to a small ladder of buckets; every
frame of a trajectory (and usually the whole dataset) then shares one
compiled program. Buckets are multiples of the TPU lane width (128) so node
and edge tensors tile cleanly into VMEM.

This replaces the reference's dynamic PyG ``Data`` shapes; the reference has
no analogue because CUDA kernels tolerate dynamic sizes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

#: Lane-aligned rounding quantum.
ALIGN = 128


def round_up(n: int, multiple: int = ALIGN) -> int:
    """Smallest multiple of ``multiple`` that is >= max(n, 1)."""
    n = max(int(n), 1)
    return ((n + multiple - 1) // multiple) * multiple


def bucket_size(n: int, growth: float = 1.25, align: int = ALIGN) -> int:
    """Round ``n`` up to a geometric bucket boundary, then lane-align.

    With growth=1.25 there are ~13 buckets per decade, so a dataset with
    wildly varying mesh sizes still compiles only a handful of programs
    while wasting <25% padding.
    """
    n = max(int(n), 1)
    if n <= align:
        return align
    k = math.ceil(math.log(n / align) / math.log(growth))
    b = int(math.ceil(align * growth**k))
    return round_up(b, align)


def pad_axis(a: np.ndarray, size: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad ``a`` with ``fill`` along ``axis`` up to ``size`` (host-side)."""
    cur = a.shape[axis]
    if cur > size:
        raise ValueError(f"array dim {cur} exceeds bucket {size}")
    if cur == size:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, size - cur)
    return np.pad(a, widths, mode="constant", constant_values=fill)


def choose_buckets(
    sizes: Sequence[int], max_buckets: Optional[int] = None, align: int = ALIGN
) -> list:
    """Pick a monotone bucket ladder covering ``sizes``.

    Used at dataset-build time: scan all trajectory sizes once and pin
    buckets so the jit cache is bounded. If ``max_buckets`` is given the
    ladder is thinned to at most that many entries (keeping the largest).
    """
    raw = sorted({bucket_size(s, align=align) for s in sizes})
    if max_buckets is not None and len(raw) > max_buckets:
        # Always keep the largest bucket; thin from the bottom up.
        keep = [raw[-1]]
        step = len(raw) / max_buckets
        idxs = sorted({min(len(raw) - 1, int(i * step)) for i in range(max_buckets)})
        keep = sorted({raw[i] for i in idxs} | {raw[-1]})
        raw = keep
    return raw


def fit_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n, or a fresh geometric bucket if none fits."""
    for b in buckets:
        if n <= b:
            return b
    return bucket_size(n)
