"""Regression tests for the ADVICE r4 findings (all fixed in round 5):

1. absent_followup_census composite-key int64 overflow now raises (the
   guard anchored_prepost_sums already had).
2. share_within_group enforces its documented v * 10^6 < 2^63
   precondition at runtime instead of wrapping silently.
3. pivot_counts emits an all-zero row for a row_col value whose every
   occurrence carries an out-of-list category (matching the SQL
   oracle's unfiltered GROUP BY).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_absent_followup_overflow_guard_raises(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sessions import absent_followup_census

    # 600 distinct b-keys x a ~2^53 us span in ONE bucket makes
    # len(bkeys) * off >= 2^62 — the composite encoding would wrap
    n_keys = 600
    far = np.int64(2**53)  # ~year 2255, inside pyarrow strftime range
    ts = np.r_[np.zeros(1, np.int64), np.full(n_keys, far)]
    t = pa.table({
        "uid": pa.array(np.r_[np.int64(0), np.arange(1, n_keys + 1)]),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "et": pa.array(["a"] + ["b"] * n_keys),
    })
    with pytest.raises(Exception) as ei:
        absent_followup_census(rd.from_arrow(t), "uid", "ts", "et",
                               a_type="a", b_type="b",
                               window_us=3_600_000_000, n_buckets=1)
    assert "composite overflow" in str(ei.value)


def test_absent_followup_still_correct_small(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sessions import absent_followup_census

    t = pa.table({
        "uid": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": pa.array(np.array([0, 30, 0, 0], "int64") * 1_000_000,
                       pa.timestamp("us")),
        "et": pa.array(["a", "b", "a", "a"]),
    })
    out = absent_followup_census(rd.from_arrow(t), "uid", "ts", "et",
                                 a_type="a", b_type="b",
                                 window_us=60_000_000, n_buckets=4)
    # uid 1 followed up within 60 s; uids 2 and 3 abandoned
    assert out["n_anchors"].sum() == 3 and out["n_abandoned"].sum() == 2


def test_share_within_group_overflow_raises(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import share_within_group

    df = pd.DataFrame({"p": ["x", "x"], "s": ["a", "b"],
                       "v": [2**63 // 1_000_000, 5]})
    with pytest.raises(ValueError, match="overflow"):
        share_within_group(rd.from_pandas(df), "p", "s", "v")


def test_pivot_counts_keeps_all_zero_row(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import pivot_counts

    df = pd.DataFrame({
        "row": ["d1", "d1", "d2", "d2", "d3"],
        "cat": ["a", "b", "a", "zz", "zz"],  # d3 has ONLY out-of-list cats
    })
    got = pivot_counts(rd.from_pandas(df).repartition(3), "row", "cat",
                       categories=["a", "b"])
    assert got["row"].tolist() == ["d1", "d2", "d3"]
    d3 = got[got["row"] == "d3"].iloc[0]
    assert d3["n_a"] == 0 and d3["n_b"] == 0
    assert got.set_index("row").loc["d1", ["n_a", "n_b"]].tolist() == [1, 1]
