"""Rule-based data validation — the ingest gate of a training pipeline.

``validate`` evaluates named per-batch violation predicates in ONE
streaming pass and merges (rule, n_checked, n_violations) counters —
rows never leave the workers, driver memory is O(#rules).  Reference
counterpart: none (the reference trusts its inputs); this is the
standard contract-check stage large pipelines put in front of every
ingest.

Small reference sets (an FK dimension's keys) ride the rule closure /
actor state, the broadcast-lookup pattern of ``stages/enrich.py``; for a
dimension too large to broadcast, express the FK check as the bucketed
LEFT OUTER anti join instead (``functions/relational.bucket_hash_join``,
as ``custs_without_orders`` does) — same answer, one exchange.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def validate(ds, rules: dict[str, Callable[[pa.Table], pa.Array]]
             ) -> pd.DataFrame:
    """(rule, n_checked, n_violations) per named rule.

    Each rule maps a batch to a boolean mask where True = VIOLATION;
    nulls in the mask count as violations (an uncheckable row fails the
    contract).  All rules run in the same pass over each batch.
    """
    from timberjack_ray.aggregates import merge_partials

    names = sorted(rules)

    def partial(t: pa.Table) -> pa.Table:
        checked, viol = [], []
        for name in names:
            m = rules[name](t)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            arr = m.to_numpy(zero_copy_only=False)
            nulls = pd.isna(arr)
            checked.append(len(arr))
            viol.append(int(nulls.sum()) + int(arr[~nulls].sum()))
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "n_checked": pa.array(checked, pa.int64()),
            "n_violations": pa.array(viol, pa.int64()),
        })

    p = ds.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["rule"], ["n_checked", "n_violations"]) \
        .to_pandas()
    return out.sort_values("rule").reset_index(drop=True)


def profile_numeric(ds, cols: list[str]) -> pd.DataFrame:
    """Dataset profile for numeric columns: (column, n, n_null, min_v,
    max_v) in one streaming pass.  Each batch contributes ONE row per
    column (count/null-count/min/max partials, values widened to
    float64), so the driver fold is #batches × #cols rows — profile
    volume, independent of data volume.  min/max merge by min-of-mins /
    max-of-maxes (pandas groupby on the tiny partial table)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        name, n, nn, mn, mx = [], [], [], [], []
        for c in cols:
            arr = t[c]
            name.append(c)
            n.append(len(arr))
            nn.append(arr.null_count)
            if len(arr) - arr.null_count:
                mm = pc.min_max(arr)
                mn.append(float(mm["min"].as_py()))
                mx.append(float(mm["max"].as_py()))
            else:
                mn.append(None)
                mx.append(None)
        return pa.table({"column": pa.array(name, pa.string()),
                         "n": pa.array(n, pa.int64()),
                         "n_null": pa.array(nn, pa.int64()),
                         "min_v": pa.array(mn, pa.float64()),
                         "max_v": pa.array(mx, pa.float64())})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby("column", as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max"))
    return out.sort_values("column").reset_index(drop=True)


def fk_orphan_count(child_ds, child_key: str, parent_ds, parent_key: str,
                    n_buckets: int = 64,
                    parent_broadcast_limit: int = 2_000_000) -> tuple[int, int]:
    """Exact referential-integrity count for one FK relation: returns
    ``(n_child, n_orphans)`` where n_orphans = child ROWS whose non-null
    key has no parent row (SQL ``LEFT JOIN ... WHERE parent IS NULL AND
    child_key IS NOT NULL`` — null FKs mean "no reference" and are never
    violations, matching SQL comparison semantics).

    Scale shape: the child side collapses per batch to (key, n) partials
    (volume <= child rows, usually far less), the parent side to distinct
    keys; ONE co-partitioning exchange via
    ``bucket_hash_join(join_type='left anti')`` leaves exactly the orphan
    key groups, whose n-sums stream back as scalars.  Neither side is
    ever folded on the driver past the broadcast guard, so the audit
    holds at any dimension size — the "too big to broadcast" FK path this
    module's docstring promises.

    Cost-based plan (the auto_join pattern): the parent's distinct keys
    fold first under ``parent_broadcast_limit`` — when they fit, the
    audit is ONE zero-exchange streaming probe over the child against a
    broadcast sorted key array; only a dimension too large to broadcast
    pays the anti-join exchange."""
    import ray

    from timberjack_ray.aggregates import merge_partials_or_ds
    import pyarrow.compute as pc

    from timberjack_ray.functions.relational import bucket_hash_join

    SENTINEL = np.iinfo(np.int64).min  # reserved: never a real parent key

    def child_partial(t: pa.Table) -> pa.Table:
        k = t[child_key]
        total = pa.table({
            "ck": pa.array([SENTINEL], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64()),
            "is_total": pa.array([True])})
        k = k.filter(pc.is_valid(k)) if k.null_count else k
        g = pa.table({"ck": pc.cast(k, pa.int64())}) \
            .group_by(["ck"]).aggregate([([], "count_all")])
        g = g.rename_columns(["ck", "n"]) \
            .append_column("is_total",
                           pa.array(np.zeros(g.num_rows, dtype=bool)))
        return pa.concat_tables([g, total])

    def parent_partial(t: pa.Table) -> pa.Table:
        k = t[parent_key]
        k = k.filter(pc.is_valid(k)) if k.null_count else k
        g = pa.table({"pk": pc.cast(k, pa.int64())}) \
            .group_by(["pk"]).aggregate([])
        return g

    parentp_probe = parent_ds.map_batches(parent_partial,
                                          batch_format="pyarrow")
    pk_tbl, pk_mode = merge_partials_or_ds(
        parentp_probe.map_batches(
            lambda t: t.append_column("one", pa.array(
                np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow"),
        ["pk"], ["one"], parent_broadcast_limit)
    if pk_mode == "driver":
        keys = np.sort(pk_tbl["pk"].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
        ref = ray.put(keys)

        def probe(t: pa.Table) -> pa.Table:
            from timberjack_ray.functions.util import fetch_broadcast

            kp = fetch_broadcast(ref)
            k = t[child_key]
            n_rows = t.num_rows
            if k.null_count:
                k = k.filter(pc.is_valid(k))
            v = pc.cast(k, pa.int64()).to_numpy(zero_copy_only=False)
            if len(kp):
                i = np.searchsorted(kp, v)
                hit = (i < len(kp)) & (kp[np.minimum(i, len(kp) - 1)] == v)
                orph = int((~hit).sum())
            else:
                orph = len(v)
            return pa.table({"n_child": pa.array([n_rows], pa.int64()),
                             "n_orphans": pa.array([orph], pa.int64())})

        n_child = 0
        n_orphans = 0
        for b in child_ds.map_batches(probe, batch_format="pyarrow")                 .iter_batches(batch_size=None, batch_format="pyarrow"):
            if b.num_rows:
                n_child += int(b["n_child"].to_numpy().sum())
                n_orphans += int(b["n_orphans"].to_numpy().sum())
        return n_child, n_orphans

    childp = child_ds.map_batches(child_partial, batch_format="pyarrow")
    # the sentinel total rows never match a parent key (INT64_MIN is
    # reserved), so they survive the anti join and carry n_child
    parentp = parent_ds.map_batches(parent_partial, batch_format="pyarrow")
    anti = bucket_hash_join(childp, parentp, "ck", "pk",
                            left_cols=["n", "is_total"], right_cols=[],
                            n_buckets=n_buckets, join_type="left anti")
    n_child = 0
    n_orphans = 0
    for b in anti.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        tot = b["is_total"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        n_child += int(n[tot].sum())
        n_orphans += int(n[~tot].sum())
    return n_child, n_orphans


def parent_keys_under(parent_ds, parent_key: str,
                      limit: int = 2_000_000):
    """Distinct parent keys as a SORTED int64 array when they fit
    ``limit``, else None (caller falls back to ``fk_orphan_count``'s
    anti-join exchange).  The fold is guarded exactly like every other
    driver fold in this engine."""
    import pyarrow.compute as pc

    from timberjack_ray.aggregates import merge_partials_or_ds

    def partial(t: pa.Table) -> pa.Table:
        k = t[parent_key]
        k = k.filter(pc.is_valid(k)) if k.null_count else k
        g = pa.table({"pk": pc.cast(k, pa.int64())}) \
            .group_by(["pk"]).aggregate([])
        return g.append_column("one", pa.array(
            np.ones(g.num_rows, dtype=np.int64)))

    tbl, mode = merge_partials_or_ds(
        parent_ds.map_batches(partial, batch_format="pyarrow"),
        ["pk"], ["one"], limit)
    if mode != "driver":
        return None
    return np.sort(tbl["pk"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))


def fk_orphan_probe_multi(child_ds, checks: list[tuple[str, object]]
                          ) -> list[tuple[int, int]]:
    """ONE streaming pass over a fact table probing SEVERAL broadcast
    dimension key sets at once: ``checks`` is [(child_key_col,
    ray.ObjectRef-or-ndarray of sorted parent keys), ...]; returns the
    aligned [(n_child, n_orphans), ...].  The 100-TB audit shape — the
    fact table (the expensive scan) is read exactly once however many
    FKs it carries, and only 2×len(checks) counters leave each task."""
    import pyarrow.compute as pc

    cols = [c for c, _ in checks]

    def probe(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import fetch_broadcast

        out = {}
        for j, (col, ref) in enumerate(checks):
            kp = fetch_broadcast(ref) if not isinstance(ref, np.ndarray) \
                else ref
            k = t[col]
            if k.null_count:
                k = k.filter(pc.is_valid(k))
            v = pc.cast(k, pa.int64()).to_numpy(zero_copy_only=False)
            if len(kp):
                i = np.searchsorted(kp, v)
                hit = (i < len(kp)) & (kp[np.minimum(i, len(kp) - 1)] == v)
                orph = int((~hit).sum())
            else:
                orph = len(v)
            out[f"n_child_{j}"] = pa.array([t.num_rows], pa.int64())
            out[f"n_orphans_{j}"] = pa.array([orph], pa.int64())
        return pa.table(out)

    sums = [[0, 0] for _ in checks]
    for b in child_ds.map_batches(probe, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        for j in range(len(checks)):
            sums[j][0] += int(b[f"n_child_{j}"].to_numpy().sum())
            sums[j][1] += int(b[f"n_orphans_{j}"].to_numpy().sum())
    return [tuple(s) for s in sums]
