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
KIND_MSG_SKETCH = "msg~"  # degraded family: key = base64 HLL registers, n = 0
KIND_LINE = "line"
KIND_LINE_ORDER = "line@"  # n = MIN global row order of the line (first-seen);
                           # merged with min, not sum

# Distinct msg# keys the driver fold will hold exactly before auto-degrading
# to a HyperLogLog sketch (VERDICT r01 #4: with mostly-unique messages the
# partial volume approaches 16 B x rows; the guard bounds driver memory at
# ~limit x 16 B and the count becomes approximate past it).
MSG_GUARD_LIMIT = int(__import__("os").environ.get("TJ_MSG_GUARD_LIMIT", 5_000_000))

# Distinct keys any OTHER driver fold (word counts, doc frequency, distinct
# pairs, per-key session rows) holds exactly before auto-degrading to its
# sketch / distributed path (VERDICT r02 #2: on web text these families are
# billions of keys — URLs, typos, numbers — and an unguarded fold is a
# driver OOM).
FOLD_GUARD_LIMIT = int(__import__("os").environ.get("TJ_FOLD_GUARD_LIMIT", 5_000_000))


def _hex_to_u64(keys: list[str]):
    """Vectorized parse of 16-hex-char msg# keys to uint64 (big-endian)."""
    import numpy as np

    if not keys:
        return np.zeros(0, dtype=np.uint64)
    return np.frombuffer(bytes.fromhex("".join(keys)), dtype=">u8").astype(np.uint64)


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
        order_from: str | None = None,
    ):
        self.want_trend = want_trend
        self.want_stats = want_stats
        self.want_lines = want_lines
        self.extra_cols = extra_cols or []  # e.g. ["source", "severity"] → kind "col:source"
        self.hash_msgs = hash_msgs  # False when the real keys are needed (--show-unique)
        # column whose trailing digits define global row order (first-seen
        # matched-line display, e.g. "doc_id" of the sequences table);
        # emits KIND_LINE_ORDER min-rows alongside the line counts
        self.order_from = order_from

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
            if self.order_from and self.order_from in batch.column_names:
                order = pc.struct_field(
                    pc.extract_regex(batch[self.order_from], r"(?P<d>\d+)$"), "d"
                ).cast(pa.int64())
                t = pa.table({"k": batch["line"], "o": order})
                t = t.filter(pc.is_valid(t["o"]))
                if t.num_rows:
                    g = t.group_by("k").aggregate([("o", "min")])
                    emit(KIND_LINE_ORDER, g["k"].to_pylist(), g["o_min"].to_pylist())
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


def _remerge_min_kinds(raw: pa.Table, summed: pa.Table, keys: list[str],
                       n_col: str) -> pa.Table:
    """Kinds whose n is an ORDER statistic (KIND_LINE_ORDER) merge with min,
    not sum — re-derive those rows from the raw concat when present."""
    is_min_raw = pc.equal(raw["kind"], KIND_LINE_ORDER)
    if not pc.any(is_min_raw).as_py():
        return summed
    mins = raw.filter(is_min_raw).group_by(keys).aggregate([(n_col, "min")])
    mins = mins.rename_columns(keys + [n_col])
    rest = summed.filter(pc.invert(pc.equal(summed["kind"], KIND_LINE_ORDER)))
    return pa.concat_tables([rest.select(keys + [n_col]), mins.select(keys + [n_col])])


def merge_partials(partials_ds, keys: list[str], n_col: str,
                   compact_every: int = 64,
                   guard: tuple[str, int] | None = None) -> pa.Table:
    """Final merge of partial-count batches, streamed to the driver.

    Replaces a Ray ``groupby().aggregate()`` for SMALL result cardinalities:
    partial batches (already collapsed per batch upstream) are folded with
    pyarrow ``group_by`` (C kernels) as they stream in, re-compacting every
    ``compact_every`` tables so driver memory stays ~O(distinct keys).  Ray's
    all-to-all Aggregate op has a multi-second fixed cost that dwarfs these
    tiny merges; the reference's own model is partial-per-chunk + final merge
    (src/analyzer.rs:510-549).

    ``guard``: optional ``(kind_value, limit)`` cardinality guard (requires
    ``keys == ["kind", "key"]`` and 16-hex-digit hashed keys, the msg#
    family).  When the folded table holds more than ``limit`` distinct keys
    of that kind, the fold AUTO-DEGRADES: existing and subsequent keys of the
    kind are absorbed into a mergeable HyperLogLog and dropped from the exact
    fold, and the returned table carries one ``msg~`` row whose key is the
    base64 register array (persistable in wave sidecars; estimate/merge via
    ``_merge_counts``).  Driver memory is then bounded by ~limit x 16 B
    regardless of input cardinality.
    """
    n_cols = [n_col] if isinstance(n_col, str) else list(n_col)
    pending: list[pa.Table] = []
    guard_kind, guard_limit = guard if guard else (None, 0)
    hll = None  # set on degrade

    def absorb(t: pa.Table) -> pa.Table:
        """Move guard-kind rows of t into the HLL (degraded mode only)."""
        is_g = pc.equal(t["kind"], guard_kind)
        if not pc.any(is_g).as_py():
            return t
        hll.add_hashed(_hex_to_u64(t.filter(is_g)["key"].to_pylist()))
        return t.filter(pc.invert(is_g))

    def compact(tables: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tables)
        g = t.group_by(keys).aggregate([(c, "sum") for c in n_cols])
        g = g.rename_columns(keys + n_cols)
        if "kind" in keys and len(n_cols) == 1:
            g = _remerge_min_kinds(t, g, keys, n_cols[0])
        if guard_kind is not None and hll is None:
            n_g = pc.sum(pc.cast(pc.equal(g["kind"], guard_kind), "int64")).as_py() or 0
            if n_g > guard_limit:
                _degrade()
                g = absorb(g)
        return g

    def _degrade():
        nonlocal hll
        from timberjack_ray.functions.sketch import HyperLogLog

        hll = HyperLogLog(p=14)

    for batch in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows:
            batch = batch.select(keys + n_cols)
            if hll is not None:
                batch = absorb(batch)
            if batch.num_rows:
                pending.append(batch)
        if len(pending) >= compact_every:
            pending = [compact(pending)]
    if not pending and hll is None:
        schema = pa.schema([(k, pa.string()) for k in keys] + [(c, pa.int64()) for c in n_cols])
        return schema.empty_table()
    out = compact(pending) if pending else pa.table(
        {"kind": pa.array([], pa.string()), "key": pa.array([], pa.string()),
         **{c: pa.array([], pa.int64()) for c in n_cols}})
    if hll is not None:
        import base64

        sentinel = pa.table({
            "kind": pa.array([KIND_MSG_SKETCH], pa.string()),
            "key": pa.array([base64.b64encode(hll.registers.tobytes()).decode()], pa.string()),
            **{c: pa.array([0], pa.int64()) for c in n_cols},
        })
        out = pa.concat_tables([out.select(keys + n_cols), sentinel])
    return out


class GuardedCounts:
    """Result of ``merge_counts_guarded``: exact (key, n) table under the
    guard, Count-Min sketch + candidate keys past it.

    ``mode`` is "exact" or "cms"; ``top_k(k)`` works in both modes (exact
    counts, or CMS estimates over the candidate set — any key whose true
    count beats the k-th by > ~2N/width is guaranteed among some batch's
    top candidates, Cormode & Muthukrishnan 2005); ``to_pandas()`` returns
    the full exact table or the estimated candidate table."""

    def __init__(self, key_col: str, n_col: str):
        self.key_col, self.n_col = key_col, n_col
        self.mode = "exact"
        self.table: pa.Table | None = None
        self.cms = None
        self.candidates: set = set()

    def _estimates(self):
        import pandas as pd

        from timberjack_ray.functions.sketch import _hash_strings

        cand = sorted(self.candidates)
        est = self.cms.query_hashed(_hash_strings(cand))
        return pd.DataFrame({self.key_col: cand, self.n_col: est})

    def to_pandas(self):
        if self.mode == "exact":
            df = self.table.to_pandas()
        else:
            df = self._estimates()
        df.attrs["mode"] = self.mode
        return df

    def top_k(self, k: int):
        df = self.to_pandas()
        out = df.sort_values([self.n_col, self.key_col],
                             ascending=[False, True]).head(k) \
            .reset_index(drop=True)
        out.attrs["mode"] = self.mode
        return out


def merge_counts_guarded(partials_ds, key_col: str, n_col: str,
                         limit: int | None = None,
                         candidates_per_batch: int = 256,
                         max_candidates: int = 8192,
                         depth: int = 4, width: int = 1 << 16,
                         compact_every: int = 64) -> GuardedCounts:
    """Driver fold of (key, n) partial-count batches with a CARDINALITY
    GUARD: exact pyarrow group_by compaction while distinct keys stay under
    ``limit`` (default FOLD_GUARD_LIMIT); past it the fold AUTO-DEGRADES to
    a mergeable Count-Min sketch plus a bounded candidate set (each batch's
    top ``candidates_per_batch`` keys; re-pruned to ``max_candidates/2``
    by estimate when full).  Driver memory is then bounded by
    ~limit × key-size + depth × width × 8 B regardless of input
    cardinality — the msg#-guard pattern (VERDICT r02 #2) for the open
    count families (words, n-grams, doc frequency)."""
    import numpy as np

    if limit is None:
        limit = FOLD_GUARD_LIMIT
    out = GuardedCounts(key_col, n_col)
    pending: list[pa.Table] = []

    def compact(tables: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tables)
        g = t.group_by(key_col).aggregate([(n_col, "sum")])
        return g.rename_columns([key_col, n_col])

    def absorb(t: pa.Table) -> None:
        from timberjack_ray.functions.sketch import _hash_strings

        keys = t[key_col].to_pylist()
        ns = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out.cms.add_hashed(_hash_strings(keys), ns)
        if len(keys) > candidates_per_batch:
            top = np.argpartition(-ns, candidates_per_batch - 1)[:candidates_per_batch]
            out.candidates.update(keys[i] for i in top)
        else:
            out.candidates.update(keys)
        if len(out.candidates) > max_candidates:
            pruned = out._estimates().sort_values(
                [n_col, key_col], ascending=[False, True]) \
                .head(max_candidates // 2)
            out.candidates = set(pruned[key_col])

    def degrade(folded: pa.Table) -> None:
        from timberjack_ray.functions.sketch import CountMinSketch

        out.mode = "cms"
        out.cms = CountMinSketch(depth=depth, width=width)
        absorb(folded)

    for b in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        b = b.select([key_col, n_col])
        if out.mode == "cms":
            absorb(b)
            continue
        pending.append(b)
        if len(pending) >= compact_every:
            folded = compact(pending)
            pending = [folded]
            if folded.num_rows > limit:
                degrade(folded)
                pending = []
    if out.mode == "exact":
        if pending:
            folded = compact(pending)
            if folded.num_rows > limit:
                degrade(folded)
            else:
                out.table = folded
        else:
            out.table = pa.schema(
                [(key_col, pa.string()), (n_col, pa.int64())]).empty_table()
    return out


def report_counts(ds, want_trend=False, want_stats=False, want_lines=False,
                  extra_cols=None, hash_msgs=True, as_table=False,
                  order_from=None):
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
            order_from=order_from,
        ),
        batch_format="pyarrow",
    )
    guard = (KIND_MSG_HASH, MSG_GUARD_LIMIT) if (want_stats and hash_msgs) else None
    out = merge_partials(partials, ["kind", "key"], "n", guard=guard)
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


def grouped_aggregate_ds(ds, keys: list[str],
                         aggs: list[tuple[str, str, str]],
                         n_buckets: int = 256):
    """Distributed grouped aggregate via a BUCKET exchange — the scale
    replacement for ``ds.groupby(keys).aggregate(...)`` (round 5): hash
    the key tuple to ``n_buckets`` buckets, co-locate each bucket with
    one small-key groupby, and run pyarrow's C ``group_by`` inside the
    bucket.  Complete per-key results (a key's rows all share a bucket);
    measured 49.6 s → 1.6 s vs the sort-based ray groupby on a
    12M-distinct-key dedup (ray pays a full-width key sort, this path a
    256-value one).

    ``aggs``: (src_col, op, out_name) with op ∈ {sum, min, max, count,
    count_all} (count_all ignores src_col and counts rows).  Returns a
    Dataset with columns keys + out_names (unsorted).
    """
    import numpy as np
    import pandas as pd

    out_names = [a[2] for a in aggs]

    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer (inline: aggregates must not import
        corpus) — full-width avalanche, so strided key domains
        (multiples of 2^k) spread over all buckets instead of aliasing
        into bucket 0 under a multiply-only hash."""
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def add_kb(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for k in keys:
            col = t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray) \
                else t[k]
            # branch on the ARROW type, not the numpy dtype: an int64
            # column WITH nulls converts to float64 and would otherwise
            # hash differently than the same values in null-free batches,
            # splitting one key across buckets
            if pa.types.is_integer(col.type):
                vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                hk = _mix64(vals)
                if col.null_count:
                    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
                    hk = np.where(nulls,
                                  np.uint64(0xD6E8FEB86659FD93), hk)
            else:
                raw = col.to_numpy(zero_copy_only=False)
                try:
                    hk = pd.util.hash_array(raw).astype(np.uint64)
                except TypeError:  # pragma: no cover - exotic dtypes
                    hk = pd.util.hash_array(
                        raw.astype(object)).astype(np.uint64)
            h = h * np.uint64(1000003) + hk
        return t.append_column(
            "__kb", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        # empty groups flow through the SAME aggregate call: arrow's
        # group_by on a 0-row table emits the exact promoted output
        # schema (e.g. int32 sum -> int64), so empty blocks can never
        # carry a schema the non-empty blocks don't
        t = t.drop_columns(["__kb"])
        g = t.group_by(keys).aggregate(
            [(([], "count_all") if op == "count_all" else (c, op))
             for c, op, _ in aggs])
        return g.rename_columns(keys + out_names)

    return ds.map_batches(add_kb, batch_format="pyarrow") \
        .groupby("__kb").map_groups(per_bucket, batch_format="pyarrow")


def merge_partials_or_ds(partials_ds, keys: list[str], n_cols: list[str],
                         driver_limit: int | None = None,
                         ops: list[str] | None = None):
    """GUARDED variant of ``merge_partials`` for result cardinalities that
    are usually small but not bounded by construction (rollup combos,
    per-group stats): stream-fold on the driver while the folded table
    stays under ``driver_limit`` distinct keys; past it, bail to a Ray
    multi-key ``groupby().aggregate(Sum)`` and return that DATASET for the
    caller to stream/write (the VERDICT r02 auto-degrade pattern — driver
    memory stays bounded at any key cardinality, at the cost of one wasted
    partial pass bounded by driver_limit rows).

    ``ops``: per-column combine, parallel to ``n_cols`` — "sum" (default),
    "min" or "max"; all are commutative monoids so the driver fold and
    the distributed degrade agree exactly.

    Returns ``(pa.Table, "driver")`` or ``(Dataset, "distributed")``.
    """
    if driver_limit is None:
        driver_limit = FOLD_GUARD_LIMIT
    n_cols = list(n_cols)
    ops = list(ops) if ops is not None else ["sum"] * len(n_cols)
    assert len(ops) == len(n_cols) and set(ops) <= {"sum", "min", "max"}

    def distributed():
        return grouped_aggregate_ds(
            partials_ds,
            keys,
            [(c, op, c) for c, op in zip(n_cols, ops)],
        ), "distributed"

    pending: list[pa.Table] = []

    def compact(tables: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tables)
        g = t.group_by(keys).aggregate(
            [(c, op) for c, op in zip(n_cols, ops)])
        return g.rename_columns(keys + n_cols)

    for b in partials_ds.iter_batches(batch_size=None,
                                      batch_format="pyarrow"):
        if not b.num_rows:
            continue
        pending.append(b.select(keys + n_cols))
        if len(pending) >= 64:
            pending = [compact(pending)]
            if pending[0].num_rows > driver_limit:
                return distributed()
    if not pending:
        return pa.table({c: [] for c in keys + n_cols}), "driver"
    folded = compact(pending)
    if folded.num_rows > driver_limit:
        return distributed()
    return folded, "driver"


def distinct_values_guarded(ds, key: str, driver_limit: int | None = None):
    """Distinct values of one column via the GUARDED fold: per-batch
    (key, n) count partials → ``merge_partials_or_ds``.  Returns the same
    ``(pa.Table | Dataset, mode)`` contract — the shared partial for set
    ops (union / intersect / distinct) that must not pay the Ray
    all-to-all at small cardinalities nor OOM the driver at large ones."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(key).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    return merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key], ["n"], driver_limit=driver_limit)
