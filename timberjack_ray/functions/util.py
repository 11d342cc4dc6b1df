"""Shared helpers for the training-data operators."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def scale_to_int(col, scale: float) -> pa.Array:
    """``floor(x*scale + 0.5)`` as int64 — the cent-scaling step every
    value-exact oracle query shares.  SQL ROUND is half-AWAY-FROM-ZERO
    while numpy/Arrow round() is half-to-even; on NON-NEGATIVE values
    (prices, latencies, sizes — the only inputs here) floor(x·s + 0.5)
    reproduces the SQL tie rule exactly, so data with values landing on
    .5 after scaling can't flip the gate (ADVICE r02).

    scale=1 on an already-integer column is an exact identity cast —
    the float round-trip would corrupt |v| > 2^53 (full-int64-domain
    callers like ``exact_quantile_bisect`` rely on this)."""
    typ = col.type if hasattr(col, "type") else None
    if float(scale) == 1.0 and typ is not None and pa.types.is_integer(typ):
        return pc.cast(col, pa.int64())
    return pc.cast(pc.floor(pc.add(pc.multiply(col, float(scale)), 0.5)),
                   pa.int64())


def scale_to_int_np(v: np.ndarray, scale: float) -> np.ndarray:
    """numpy twin of ``scale_to_int`` (same non-negative precondition,
    same scale=1 integer identity)."""
    v = np.asarray(v)
    if float(scale) == 1.0 and v.dtype.kind in "iu":
        return v.astype(np.int64)
    return np.floor(v.astype(np.float64) * float(scale) + 0.5) \
        .astype(np.int64)


def sorted_lookup(sorted_arr: np.ndarray, values: np.ndarray):
    """Vectorized membership probe returning ``(hit_mask, clamped_idx)`` —
    use ``idx`` to gather companion arrays aligned with ``sorted_arr``
    (only meaningful where ``hit``)."""
    hit = np.zeros(len(values), dtype=bool)
    idx = np.zeros(len(values), dtype=np.int64)
    if len(sorted_arr) and len(values):
        idx = np.searchsorted(sorted_arr, values)
        inb = idx < len(sorted_arr)
        hit[inb] = sorted_arr[idx[inb]] == values[inb]
        idx = np.minimum(idx, len(sorted_arr) - 1)
    return hit, idx


def sorted_member_mask(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: ``values ∈ sorted_arr`` as a bool mask.

    One searchsorted + bounds-guarded equality — the broadcast-side probe
    every anti-join / decontamination / span-hit pass shares (r03 review:
    the block had been copy-pasted five times)."""
    return sorted_lookup(sorted_arr, values)[0]


_REF_CACHE: dict = {}


def fetch_broadcast(ref):
    """Per-worker-process cache for ``ray.put`` broadcast objects: one
    ``ray.get`` per (process, ref) instead of one per batch.  Non-ObjectRef
    inputs pass through (lets local tests call the same closures without a
    Ray session).  Canonical home of the pattern — dedup's ``_fetch_bench``
    and the entry module's join/broadcast closures all route here (r03
    review: two parallel copies had grown)."""
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _REF_CACHE:
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


def collect_table_under(ds, limit_rows: int) -> pa.Table | None:
    """Optimistically stream a Dataset to one driver-side Arrow table.

    Returns None (bail-out) once more than ``limit_rows`` rows have been
    pulled — callers then fall back to the distributed plan.  This is the
    small-side pattern used across the dedup/similarity ops: Ray's
    all-to-all groupby has a multi-second fixed cost that dwarfs a pandas
    fold whenever the intermediate fits comfortably on the driver, while
    the bail-out keeps the op safe at any scale (one wasted partial pass,
    bounded by limit_rows, in the big case).
    """
    frames: list[pa.Table] = []
    total = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += b.num_rows
        if total > limit_rows:
            return None
        if b.num_rows:
            frames.append(b)
    if not frames:
        return None  # empty: let the caller's distributed path make the schema
    return pa.concat_tables(frames)
