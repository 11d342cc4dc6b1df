"""Shared helpers for the training-data operators."""

from __future__ import annotations

import pyarrow as pa


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
