"""Kernel-level properties for the round-4 late additions — Ray-free
(pure numpy/pyarrow), complementing the DuckDB gate in
tests/test_entry_queries.py which covers the end-to-end results."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from __ray_entry__ import _CMS_A, _CMS_B, _dbl_midranks


def naive_dbl_midranks(y):
    """2 × average rank (1-based), brute force."""
    y = list(y)
    out = []
    for v in y:
        less = sum(1 for x in y if x < v)
        eq = sum(1 for x in y if x == v)
        # midrank = less + (eq + 1) / 2  →  doubled = 2·less + eq + 1
        out.append(2 * less + eq + 1)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_dbl_midranks_matches_naive(vals):
    got = _dbl_midranks(np.array(vals, dtype=np.int64)).tolist()
    assert got == naive_dbl_midranks(vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200),
       st.integers(1, 4))
def test_ams_state_is_linear_in_batch_splits(hashes, n_splits):
    """Adding the same multiset in any batch partition yields the same
    AMS state — the property that makes per-batch partials fold exactly."""
    from timberjack_ray.functions.sketch import AMSF2

    h = np.array(hashes, dtype=np.uint64)
    whole = AMSF2()
    whole.add_hashed(h)
    parts = AMSF2()
    for chunk in np.array_split(h, n_splits):
        parts.add_hashed(chunk)
    assert (whole.state == parts.state).all()


def test_cms_checked_constants_never_undercount():
    """With the literal multiply-shift rows the query layer pins, every
    estimate is ≥ the true count (CMS one-sided error)."""
    from timberjack_ray.functions.corpus import horner_hash_strings
    from timberjack_ray.functions.sketch import CountMinSketch

    rng = np.random.RandomState(7)
    words = [f"w{int(i)}" for i in rng.zipf(1.5, 5000) % 800]
    arr = pa.array(words, pa.string())
    cms = CountMinSketch(4, 8192)
    cms.a = np.array(_CMS_A, np.uint64)
    cms.b = np.array(_CMS_B, np.uint64)
    h = horner_hash_strings(arr)
    cms.add_hashed(h)
    uniq, true = np.unique(np.array(words, dtype=object),
                           return_counts=True)
    est = cms.query_hashed(horner_hash_strings(
        pa.array(uniq.tolist(), pa.string())))
    assert (est >= true).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**64 - 1))
def test_hll_rank_equals_bit_length_form(h):
    """The add_hashed binary clz loop equals 65 − bit_length((h<<p)|2^(p-1))
    — the identity the SQL oracle relies on (p = 14)."""
    from timberjack_ray.functions.sketch import HyperLogLog

    p = 14
    hll = HyperLogLog(p)
    hll.add_hashed(np.array([h], dtype=np.uint64))
    idx = h >> (64 - p)
    rest = ((h << p) | (1 << (p - 1))) & (2**64 - 1)
    assert hll.registers[idx] == 65 - rest.bit_length()


def brute_pairs_by_day(spans, bucket_us):
    """O(n²) reference for concurrent_span_pairs: pair charged to day of
    later start under (s, key, sid) order."""
    from collections import Counter
    days = Counter()
    for i, (ki, si, a1, e1) in enumerate(spans):
        for j, (kj, sj, a2, e2) in enumerate(spans):
            if (a1, ki, si) < (a2, kj, sj) and e1 >= a2:
                days[a2 // bucket_us] += 1
    return dict(days)


def test_concurrent_span_pairs_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import concurrent_span_pairs

    B = 1000  # small bucket to force cross-bucket spans
    rng = np.random.RandomState(7)
    rows = []
    # events per (user): a few bursts; gaps > gap_s split sessions
    for u in range(12):
        t = int(rng.randint(0, 3 * B))
        for _ in range(rng.randint(2, 6)):
            n = rng.randint(1, 5)
            for _ in range(n):
                rows.append({"user_id": u, "ts": t})
                t += int(rng.randint(0, 40))  # within-session
            t += 200 + int(rng.randint(0, 3 * B))  # gap > gap_s => new session
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(4)
    # integer ts columns compare RAW values against gap_s (sessionize's
    # non-datetime branch): threshold 50 splits exactly at the bursts
    out = concurrent_span_pairs(ds, "user_id", "ts", gap_s=50, bucket_us=B)
    gap_us = 50
    spans = []
    for u, g in df.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy())
        new = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            seg = ts[sid == s]
            spans.append((u, int(s), int(seg.min()), int(seg.max())))
    ref = brute_pairs_by_day(spans, B)
    got = dict(zip(out["day"], out["n_pairs"]))
    assert got == {k: v for k, v in ref.items() if v > 0}


def test_knn_join_q8_guard_and_ties(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from timberjack_ray.functions.similarity import knn_join_q8

    # duplicate vectors: tie-break must pick ascending neighbor ids
    vecs = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": [10, 11, 12, 13], "embedding": vecs}))
    out = knn_join_q8(ds, k=2)
    r10 = out[out["vec_id"] == 10]
    assert r10["neighbor_id"].tolist() == [11, 12]   # score ties, id asc
    assert (out[out["vec_id"] == 13]["neighbor_id"] == [10, 11]).all()
    assert not (out["neighbor_id"] == out["vec_id"]).any()

    with pytest.raises(ValueError, match="max_rows"):
        knn_join_q8(ds, k=1, max_rows=2)


def test_rolling_zscore_breach_matches_pandas_reference(ray_session):
    """rolling_zscore_breach_counts: the bucketed segmented-cumsum kernel
    agrees with a per-key Python loop applying the integer rule
    (W*x - S)^2 > k^2*(W*Q - S^2) over full windows only, spikes planted."""
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.window import rolling_zscore_breach_counts

    rng = np.random.default_rng(5)
    n, W, K = 1500, 7, 2
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "ts": pd.to_datetime(rng.integers(0, 10**9, n) * 1000, unit="us"),
        "event_id": np.arange(n),
        "value": np.round(rng.uniform(0, 500, n), 2),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    df.loc[rng.choice(n, 30, replace=False), "value"] = 7000.0

    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    d2 = df.assign(c=cents).sort_values(["user_id", "ts", "event_id"])
    out = {et: [0, 0] for et in ["a", "b", "c"]}
    for _, g in d2.groupby("user_id"):
        c = g["c"].to_numpy()
        ets = g["event_type"].to_numpy()
        for i in range(W - 1, len(c)):
            w = c[i + 1 - W:i + 1]
            S, Q, x = int(w.sum()), int(sum(int(v) ** 2 for v in w)), int(c[i])
            out[ets[i]][0] += 1
            if (W * x - S) ** 2 > K * K * (W * Q - S * S):
                out[ets[i]][1] += 1
    ref = pd.DataFrame(
        [(k, v[0], v[1]) for k, v in sorted(out.items()) if v[0] > 0],
        columns=["event_type", "n_eval", "n_breach"]) \
        .astype({"n_eval": "int64", "n_breach": "int64"})

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    got = rolling_zscore_breach_counts(
        ds, "user_id", "ts", "event_id", "value", "event_type",
        window=W, k_sigma=K, n_buckets=8).reset_index(drop=True)
    assert got.equals(ref), (got, ref)


def test_rrf_fusion_matches_bruteforce_with_ties(ray_session):
    """rrf_fusion_topk: histogram-derived RANK() ranks + integer fused
    score agree with a brute force on tie-heavy random scores; the
    hist_limit guard raises past the domain bound."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from timberjack_ray.functions.text import rrf_fusion_topk

    rng = np.random.default_rng(23)
    n, scale, krrf = 400, 10**12, 60
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "s1": rng.integers(0, 12, n),      # heavy ties
        "s2": rng.integers(0, 300, n),
    })

    def rank_desc(col):
        v = df[col].to_numpy()
        return np.array([1 + int((v > x).sum()) for x in v], dtype=np.int64)

    r1, r2 = rank_desc("s1"), rank_desc("s2")
    rrf = scale // (krrf + r1) + scale // (krrf + r2)
    ref = pd.DataFrame({"doc_id": df["doc_id"], "rank_s1": r1,
                        "rank_s2": r2, "rrf": rrf}) \
        .sort_values(["rrf", "doc_id"], ascending=[False, True]) \
        .head(15).reset_index(drop=True).astype("int64")

    ds = rd.from_pandas(df).repartition(4)
    got = rrf_fusion_topk(ds, "doc_id", ["s1", "s2"], k=15)
    assert got.equals(ref), (got, ref)

    with pytest.raises(ValueError, match="hist_limit"):
        rrf_fusion_topk(ds, "doc_id", ["s1", "s2"], k=5, hist_limit=3)


def test_grouped_moment_stats_limb_exactness(ray_session):
    """grouped_moment_stats: limb-recombined Σc³/Σc⁴ equal a Python-int
    brute force, including NEGATIVE values (odd moments go negative and
    the base-1e18 split must keep lo >= 0) and s4 past int64."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from timberjack_ray.functions.relational import grouped_moment_stats

    rng = np.random.default_rng(29)
    n = 5000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], n),
        # values in dollars, negatives included; |cents| <= 1e5 bound
        "v": np.round(rng.uniform(-999, 999, n), 2),
    })
    got = grouped_moment_stats(
        rd.from_pandas(df).repartition(4), "g", "v", scale=100)

    E = 10**18
    for gname, sub in df.groupby("g"):
        c = [int(np.floor(x * 100 + 0.5)) for x in sub["v"]]
        s3 = sum(x**3 for x in c)
        s4 = sum(x**4 for x in c)
        row = got[got["g"] == gname].iloc[0]
        assert int(row.n) == len(c)
        assert int(row.s1) == sum(c)
        assert int(row.s2) == sum(x * x for x in c)
        assert (int(row.s3_hi), int(row.s3_lo)) == divmod(s3, E)
        assert (int(row.s4_hi), int(row.s4_lo)) == divmod(s4, E)
        assert 0 <= int(row.s3_lo) < E and 0 <= int(row.s4_lo) < E

    # magnitude contract enforced, not silently wrapped (the ValueError
    # surfaces wrapped in RayTaskError from the map task)
    big = pd.DataFrame({"g": ["a"], "v": [2000.0]})
    with pytest.raises(Exception, match="max_abs_scaled"):
        grouped_moment_stats(rd.from_pandas(big), "g", "v", scale=100)
