"""Generic relational building blocks the reference lacks but a standalone
engine needs: broadcast hash join, partial top-K, grouped distinct counts.

The reference has no joins (SURVEY.md §2.4) — its closest operation is the
per-row key lookup (src/parser/json.rs:8-15).  These follow the same
Ray-Data-first rules as the analyze pipeline:

* small build sides are broadcast (``ray.put`` once, pyarrow C hash join
  inside ``map_batches``) — never a shuffle;
* top-K keeps K rows per batch, merges K×batches rows driver-side — never a
  full distributed sort;
* grouped distinct counts pre-collapse (group, key) pairs per batch so the
  merge handles distinct pairs, not rows.  For billion-key cardinality swap
  the driver merge for ``ds.groupby`` (documented scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from timberjack_ray.aggregates import merge_partials

_JOIN_CACHE: dict[str, pa.Table] = {}


def _fetch_table(ref) -> pa.Table:
    import ray

    if isinstance(ref, pa.Table):
        return ref
    key = ref.hex()
    if key not in _JOIN_CACHE:
        _JOIN_CACHE[key] = ray.get(ref)
    return _JOIN_CACHE[key]


def broadcast_join(ds, right: pa.Table, keys, right_keys=None, join_type: str = "inner"):
    """Map-side hash join against a broadcast right table.

    ``right`` is shipped to the object store once; every task fetches it once
    per worker (module cache) and joins each batch with pyarrow's C hash
    join.  Correct tool whenever the right side fits in worker memory —
    at 100 TB that covers dimension/lookup tables; for two large sides,
    hash-partition both on the key (groupby/map_groups) instead.
    """
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = right_keys or keys
    right_keys = [right_keys] if isinstance(right_keys, str) else list(right_keys)
    ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        r = _fetch_table(ref)
        return batch.join(r, keys=keys, right_keys=right_keys, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


def sorted_topk(ds, sort_keys, k: int, descending=True) -> pd.DataFrame:
    """Global top-K without a distributed sort: each batch keeps its own top
    K (Arrow C sort over the batch), the driver merges ≤ K×num_batches rows."""
    sort_keys = [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
    desc = [descending] * len(sort_keys) if isinstance(descending, bool) else list(descending)
    order = [(c, "descending" if d else "ascending") for c, d in zip(sort_keys, desc)]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch.sort_by(order)
        return batch.sort_by(order).slice(0, k)

    tops = ds.map_batches(partial, batch_format="pyarrow")
    frames = [b for b in tops.iter_batches(batch_size=None, batch_format="pyarrow")
              if b.num_rows]
    if not frames:
        return pd.DataFrame()
    merged = pa.concat_tables(frames).sort_by(order).slice(0, k)
    return merged.to_pandas()


class AsofJoiner:
    """map_batches stage: per-row 'latest right row with ts ≤ left ts'
    within the same ``by`` key — the classic as-of join, which Ray Data has
    no operator for (SURVEY custom-op case (b): broadcast state + searchsorted).

    The right side is broadcast once and indexed per worker in ``__init__``:
    {by_key → (sorted ts int64[], right row index[])}.  Each batch dict-encodes
    its ``by`` column and runs ONE vectorized ``np.searchsorted`` per distinct
    key present — no per-row Python.
    """

    def __init__(self, right_ref, on: str, by: str, value_cols: list[str],
                 suffix: str = "_r"):
        right = _fetch_table(right_ref) if not isinstance(right_ref, pa.Table) else right_ref
        self.on = on
        self.by = by
        self.value_cols = value_cols
        self.suffix = suffix
        df = right.select([by, on] + value_cols).to_pandas()
        # normalize the ordering column to int64 ns so left and right agree
        # regardless of source timestamp unit (us-parquet vs ns-pandas)
        df["__ts"] = df[on].to_numpy().astype("datetime64[ns]").astype("int64") \
            if np.issubdtype(df[on].to_numpy().dtype, np.datetime64) \
            else df[on].to_numpy().astype("int64")
        df = df.sort_values([by, "__ts"], kind="stable").reset_index(drop=True)
        self.index: dict = {}
        for key, sub in df.groupby(by, sort=False):
            self.index[key] = (sub["__ts"].to_numpy(), sub.index.to_numpy())
        self.right_values = {c: df[c].to_numpy() for c in value_cols}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts_np = np.asarray(batch[self.on].combine_chunks()
                           if isinstance(batch[self.on], pa.ChunkedArray)
                           else batch[self.on])
        ts = (ts_np.astype("datetime64[ns]")
              if np.issubdtype(ts_np.dtype, np.datetime64) else ts_np).astype("int64")
        by_col = batch[self.by]
        enc = (by_col.combine_chunks() if isinstance(by_col, pa.ChunkedArray)
               else by_col).dictionary_encode()
        keys = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        match = np.full(n, -1, dtype=np.int64)
        for ki, key in enumerate(keys):
            ent = self.index.get(key)
            if ent is None:
                continue
            rts, rrows = ent
            sel = np.flatnonzero(idx == ki)
            pos = np.searchsorted(rts, ts[sel], side="right") - 1
            ok = pos >= 0
            match[sel[ok]] = rrows[pos[ok]]
        got = match >= 0
        out = batch
        for c in self.value_cols:
            vals = np.where(got, self.right_values[c][np.maximum(match, 0)], None)
            out = out.append_column(f"{c}{self.suffix}", pa.array(vals.tolist()))
        return out.append_column("__matched", pa.array(got))


def asof_join(ds, right: pa.Table, on: str, by: str, value_cols: list[str],
              suffix: str = "_r", inner: bool = True):
    """Broadcast as-of join (backward: latest right ts ≤ left ts per key).

    Right side must fit in worker memory (broadcast); for two large sides,
    hash-partition both by ``by`` and run this joiner per partition
    (groupby/map_groups) — documented scale path.
    """
    import ray

    ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        joiner_key = (ref.hex(), on, by, tuple(value_cols), suffix)
        j = _ASOF_CACHE.get(joiner_key)
        if j is None:
            j = AsofJoiner(ref, on, by, value_cols, suffix)
            _ASOF_CACHE[joiner_key] = j
        out = j(batch)
        if inner:
            out = out.filter(out["__matched"])
        return out.drop_columns(["__matched"])

    return ds.map_batches(join_batch, batch_format="pyarrow")


_ASOF_CACHE: dict = {}


def distinct_count_by(ds, group_col: str, distinct_col: str, name: str = "n_distinct") -> pd.DataFrame:
    """Exact COUNT(DISTINCT distinct_col) GROUP BY group_col.

    Two-level: per-batch dedup of (group, key) pairs (Arrow group_by), then
    a driver merge of distinct pairs, then a count per group.  Merge volume
    is the number of distinct pairs, not rows.
    """
    def pairs(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, distinct_col]).group_by(
            [group_col, distinct_col]).aggregate([([], "count_all")])
        t = g.rename_columns([group_col, distinct_col, "n"])
        return t.set_column(2, "n", pa.array([1] * t.num_rows, pa.int64()))

    p = ds.map_batches(pairs, batch_format="pyarrow")
    distinct_pairs = merge_partials(p, [group_col, distinct_col], "n")
    out = distinct_pairs.group_by(group_col).aggregate([([], "count_all")])
    return out.rename_columns([group_col, name]).to_pandas()
