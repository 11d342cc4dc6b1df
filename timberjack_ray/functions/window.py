"""Windowed aggregates over a timestamp column — tumbling and sliding.

The reference's only time bucketing is the string-sliced hour trend
(src/analyzer.rs:326-336); real telemetry pipelines need proper windows.
Both forms stay shuffle-light:

* tumbling — window id is a vectorized ``floor(ts / width)`` per batch →
  partial counts → small merge.  One window per row.
* sliding — each row belongs to ``width / slide`` windows; the membership
  fan-out happens INSIDE the batch (np.repeat on the int64 timestamp
  array, never materializing duplicated full rows), then partial counts
  per (window, key) → small merge.

Event-time semantics, arrival-order independent (windows are pure key
functions of the timestamp), matching the engine's bounded-streaming model
(SURVEY.md §2.9): results are exact at end-of-stream with no watermarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from timberjack_ray.aggregates import merge_partials


def _ts_seconds(col) -> np.ndarray:
    arr = np.asarray(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[s]").astype("int64")
    return arr.astype("int64")


def tumbling_counts(ds, ts_col: str, width_s: int, by: str | None = None,
                    name: str = "n") -> pd.DataFrame:
    """COUNT per [k·width, (k+1)·width) window (and optional key)."""
    keys = ["window_start"] + ([by] if by else [])

    def partial(t: pa.Table) -> pa.Table:
        secs = _ts_seconds(t[ts_col])
        ws = (secs // width_s) * width_s
        cols = {"window_start": pa.array(ws, pa.int64())}
        if by:
            cols[by] = t[by]
        g = pa.table(cols).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [name])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return merge_partials(p, keys, name).to_pandas()


def rate_anomalies(ds, ts_col: str, width_s: int = 3600,
                   factor: float = 1.5, name: str = "n") -> pd.DataFrame:
    """Burst detection: tumbling windows whose count exceeds ``factor ×``
    the mean count over OBSERVED windows (empty windows don't vote — the
    baseline is active traffic).  The merged count table is bounded by the
    time range (one row per window: a year of hours is 8 760 rows), so the
    mean + threshold filter run driver-side over the partials; the events
    themselves never leave the workers.  The mean is an exact int sum /
    count in float64, so any engine replays the cut identically — no
    variance term whose summation order could flip a borderline window.
    """
    counts = tumbling_counts(ds, ts_col, width_s, name=name)
    mu = counts[name].to_numpy().sum() / len(counts) if len(counts) else 0.0
    out = counts[counts[name] > factor * mu]
    return out.sort_values("window_start").reset_index(drop=True)


def sliding_counts(ds, ts_col: str, width_s: int, slide_s: int,
                   by: str | None = None, name: str = "n") -> pd.DataFrame:
    """COUNT per sliding window [k·slide, k·slide + width); width must be a
    multiple of slide.  A row at t lands in windows k ∈
    [floor(t/slide) − width/slide + 1, floor(t/slide)]."""
    assert width_s % slide_s == 0, "width must be a multiple of slide"
    fanout = width_s // slide_s
    keys = ["window_start"] + ([by] if by else [])

    def partial(t: pa.Table) -> pa.Table:
        secs = _ts_seconds(t[ts_col])
        base = secs // slide_s
        # membership fan-out on the int64 array only
        ks = np.repeat(base, fanout) - np.tile(np.arange(fanout, dtype=np.int64),
                                               len(base))
        cols = {"window_start": pa.array(ks * slide_s, pa.int64())}
        if by:
            by_arr = (t[by].combine_chunks() if isinstance(t[by], pa.ChunkedArray)
                      else t[by])
            idx = np.repeat(np.arange(len(base), dtype=np.int64), fanout)
            cols[by] = by_arr.take(pa.array(idx))
        g = pa.table(cols).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [name])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return merge_partials(p, keys, name).to_pandas()
