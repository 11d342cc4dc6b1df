"""Round-3 regression tests for the ADVICE r02 findings: microsecond-exact
session gaps, single-space gram tokenization, bucket_hash_join key naming /
null handling, simhash degenerate-bucket cap, and the SQL ROUND tie rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timberjack_ray.functions.dedup import (_simhash_pairs_segmented,
                                            gram_hashes_batch)
from timberjack_ray.functions.util import scale_to_int, scale_to_int_np


def test_sessionize_fractional_gap_is_us_exact(ray_session):
    """A gap of 3600.5s must START a new session (epoch-diff > 3600) even
    though whole-second truncation would see exactly 3600."""
    import ray.data as rd

    from timberjack_ray.functions.sessions import session_stats

    base = pd.Timestamp("2024-01-01 00:00:00.200000")
    ts = pd.Series([
        base,
        base + pd.Timedelta(microseconds=3_600_500_000),   # +3600.5s → split
        base + pd.Timedelta(microseconds=3_600_500_000 + 3_599_999_999),  # no split
    ]).astype("datetime64[us]")
    df = pd.DataFrame({"u": [1, 1, 1], "ts": ts})
    out = session_stats(rd.from_pandas(df), "u", "ts", gap_s=3600)
    assert dict(zip(out["u"], out["n_sessions"])) == {1: 2}


def test_sessionize_exact_boundary_gap_does_not_split(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sessions import session_stats

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts = pd.Series([base, base + pd.Timedelta(seconds=3600)]).astype("datetime64[us]")
    df = pd.DataFrame({"u": [7, 7], "ts": ts})
    out = session_stats(rd.from_pandas(df), "u", "ts", gap_s=3600)
    assert dict(zip(out["u"], out["n_sessions"])) == {7: 1}


def test_gram_hashes_single_space_split():
    """'a  b c' under string_split(' ') has an empty middle word — its grams
    must differ from 'a b c'; runs-of-whitespace splitting collapsed them."""
    h1, o1 = gram_hashes_batch(["a  b c"], k=2)
    h2, o2 = gram_hashes_batch(["a b c"], k=2)
    assert set(h1.tolist()) != set(h2.tolist())
    # identical word sequences still collide (equivalence classes intact)
    h3, _ = gram_hashes_batch(["a  b c"], k=2)
    assert h1.tolist() == h3.tolist()
    # doc with <= k words (after single-space split) falls back to one
    # whole-text gram
    h4, o4 = gram_hashes_batch(["x y"], k=3)
    assert len(h4) == 1 and np.diff(o4).tolist() == [1]


def test_bucket_hash_join_null_key_raises(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    left = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "a": [1, 2]})
    right = pd.DataFrame({"k2": [1], "b": [3]})
    ds = bucket_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          "k", "k2", left_cols=["a"], right_cols=["b"])
    with pytest.raises(Exception) as ei:
        ds.to_pandas()
    assert "null join keys" in str(ei.value)


def test_bucket_hash_join_rejects_key_payload_collision(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    df = pd.DataFrame({"k": [1], "x": [2]})
    with pytest.raises(ValueError):
        bucket_hash_join(rd.from_pandas(df), rd.from_pandas(df), "k", "k",
                         left_cols=["x"], right_cols=["k"])


def test_simhash_segmented_cap_bounds_degenerate_bucket():
    """One giant (band, key) bucket (e.g. all-empty docs at simhash 0) must
    be capped: pairs come only from the first max_bucket rows (doc_id asc)."""
    n = 500
    t = pa.table({
        "band": pa.array(np.zeros(n, np.int32)),
        "key": pa.array(np.zeros(n, np.int64)),
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "simhash": pa.array(np.zeros(n, np.int64)),
    })
    out = _simhash_pairs_segmented(t, max_ham=3, max_bucket=10)
    # 10-row cap → C(10,2)=45 pairs, and every id involved is < 10
    assert out.num_rows == 45
    assert max(out["a"].to_pylist() + out["b"].to_pylist()) == 9


def test_scale_to_int_matches_sql_round_tie_rule():
    # SQL ROUND(2.5) = 3 (half away from zero); numpy round gives 2
    col = pa.array([2.5, 3.5, 0.0, 1.23])
    assert scale_to_int(col, 1).to_pylist() == [3, 4, 0, 1]
    assert scale_to_int_np(np.array([2.5, 3.5]), 1).tolist() == [3, 4]
    # cent scaling on representative price-like values agrees with DuckDB
    # ROUND(x*100) (same double arithmetic both sides; 10.005*100 lands at
    # 1000.5000000000001 → 1001 in BOTH engines)
    vals = np.array([123.45, 0.01, 999.99, 10.005])
    assert scale_to_int_np(vals, 100).tolist() == [12345, 1, 99999, 1001]
