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
