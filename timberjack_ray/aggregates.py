"""Distributed aggregates — the reference's AnalysisResult monoid, re-expressed
as partial-per-batch counts + one small Ray groupby.

The reference computes per-chunk hashmap counters merged at the end
(src/analyzer.rs:292-359, merge :510-549).  Ray Data's partial/final
aggregation replaces the hand-written merge, but a naive
``ds.groupby(key).count()`` would shuffle every row.  Instead:

1. ``map_batches`` emits ONE partial-count table per batch covering ALL
   aggregate families at once — rows ``(kind, key, n)`` where ``kind`` ∈
   {total, level, trend, error, msg, line} (pyarrow ``Table.group_by`` per
   batch, pure C).
2. a single ``groupby(["kind","key"]).aggregate(Sum("n"))`` over the tiny
   partials produces every aggregate in one small shuffle.

So the full report costs ONE pass over the data and one shuffle whose volume
is ~(distinct keys × batches), not rows.  Only the ``line``/``msg`` families
have high cardinality (exact dedup is inherently a shuffle); they are skipped
unless requested.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KIND_TOTAL = "total"
KIND_LEVEL = "level"
KIND_TREND = "trend"
KIND_ERROR = "error"
KIND_MSG = "msg"
KIND_MSG_HASH = "msg#"
KIND_LINE = "line"


def _count_keys(col: pa.ChunkedArray, drop_null: bool) -> tuple[list, list]:
    """(keys, counts) of a string column, vectorized via pa group_by."""
    t = pa.table({"k": col})
    if drop_null:
        t = t.filter(pc.is_valid(t["k"]))
    if t.num_rows == 0:
        return [], []
    g = t.group_by("k").aggregate([([], "count_all")])
    return g["k"].to_pylist(), g["count_all"].to_pylist()


def _hash_keys(keys: list) -> list[str]:
    """64-bit stable hashes (hex) of distinct keys.  The unique-message
    family only feeds a COUNT (A6) unless --show-unique: shipping every
    distinct message string through the partials merge moved ~70 B/key where
    16 B/key suffices, and at bench scale the msg family IS the partial
    volume.  Collision odds at 1M keys are ~3e-8 — and the distinct count is
    the only consumer."""
    import numpy as np
    import pandas as pd

    arr = np.array(["\0" if k is None else k for k in keys], dtype=object)
    return [format(h, "016x") for h in pd.util.hash_array(arr)]


class PartialCounts:
    """Per-batch partial aggregation; emits (kind, key, n) rows."""

    def __init__(
        self,
        want_trend: bool = False,
        want_stats: bool = False,
        want_lines: bool = False,
        extra_cols: list[str] | None = None,
        hash_msgs: bool = True,
    ):
        self.want_trend = want_trend
        self.want_stats = want_stats
        self.want_lines = want_lines
        self.extra_cols = extra_cols or []  # e.g. ["source", "severity"] → kind "col:source"
        self.hash_msgs = hash_msgs  # False when the real keys are needed (--show-unique)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds: list[str] = []
        keys: list = []
        ns: list[int] = []

        def emit(kind: str, k: list, n: list) -> None:
            kinds.extend([kind] * len(k))
            keys.extend(k)
            ns.extend(n)

        emit(KIND_TOTAL, [""], [batch.num_rows])
        if self.want_stats:
            k, n = _count_keys(batch["level"], drop_null=False)
            emit(KIND_LEVEL, k, n)
            k, n = _count_keys(batch["error_type"], drop_null=True)
            emit(KIND_ERROR, k, n)
            k, n = _count_keys(batch["message_key"], drop_null=False)
            if self.hash_msgs:
                emit(KIND_MSG_HASH, _hash_keys(k), n)
            else:
                emit(KIND_MSG, k, n)
        if self.want_trend:
            k, n = _count_keys(batch["ts_hour"], drop_null=True)
            emit(KIND_TREND, k, n)
        if self.want_lines:
            k, n = _count_keys(batch["line"], drop_null=False)
            emit(KIND_LINE, k, n)
        for col in self.extra_cols:
            k, n = _count_keys(batch[col], drop_null=False)
            emit(f"col:{col}", k, n)

        return pa.table(
            {
                "kind": pa.array(kinds, type=pa.string()),
                "key": pa.array(keys, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )


def merge_partials(partials_ds, keys: list[str], n_col: str,
                   compact_every: int = 64) -> pa.Table:
    """Final merge of partial-count batches, streamed to the driver.

    Replaces a Ray ``groupby().aggregate()`` for SMALL result cardinalities:
    partial batches (already collapsed per batch upstream) are folded with
    pyarrow ``group_by`` (C kernels) as they stream in, re-compacting every
    ``compact_every`` tables so driver memory stays ~O(distinct keys).  Ray's
    all-to-all Aggregate op has a multi-second fixed cost that dwarfs these
    tiny merges; the reference's own model is partial-per-chunk + final merge
    (src/analyzer.rs:510-549).  For billion-key cardinalities, use a Ray
    ``groupby`` instead.
    """
    n_cols = [n_col] if isinstance(n_col, str) else list(n_col)
    pending: list[pa.Table] = []

    def compact(tables: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tables)
        g = t.group_by(keys).aggregate([(c, "sum") for c in n_cols])
        return g.rename_columns(keys + n_cols)

    for batch in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows:
            pending.append(batch.select(keys + n_cols))
        if len(pending) >= compact_every:
            pending = [compact(pending)]
    if not pending:
        schema = pa.schema([(k, pa.string()) for k in keys] + [(c, pa.int64()) for c in n_cols])
        return schema.empty_table()
    return compact(pending)


def report_counts(ds, want_trend=False, want_stats=False, want_lines=False,
                  extra_cols=None, hash_msgs=True, as_table=False):
    """Final (kind, key, n) totals (small; driver-merged).  ``as_table``
    returns the Arrow table so callers can split out high-cardinality
    families before any pandas conversion."""
    partials = ds.map_batches(
        PartialCounts(
            want_trend=want_trend,
            want_stats=want_stats,
            want_lines=want_lines,
            extra_cols=extra_cols,
            hash_msgs=hash_msgs,
        ),
        batch_format="pyarrow",
    )
    out = merge_partials(partials, ["kind", "key"], "n")
    return out if as_table else out.to_pandas()


def counts_by(ds, keys, name: str = "n"):
    """Generic pre-aggregated groupby-count: partial per batch (pyarrow
    group_by, in C), final merge streamed to the driver.  Returns pandas."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [name])

    p = ds.map_batches(partial, batch_format="pyarrow")
    return merge_partials(p, keys, name).to_pandas()


def top_k(counts_df, key_col: str, n_col: str, k: int):
    """Deterministic top-K: count desc, key asc (the reference's tie order is
    hashmap iteration — nondeterministic; we define it, SURVEY.md §2.6 K1)."""
    import pandas as pd

    if not isinstance(counts_df, pd.DataFrame):
        counts_df = counts_df.to_pandas()
    return counts_df.sort_values([n_col, key_col], ascending=[False, True]).head(k)
