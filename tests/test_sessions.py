"""Sessionization and exact-quantile operators vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest

from timberjack_ray.functions.sessions import exact_quantiles, sessionize, session_stats

rng = np.random.default_rng(21)
N = 6000
DF = pd.DataFrame({
    "u": rng.choice([f"u{i}" for i in range(40)], N),
    "ts": rng.integers(0, 500_000, N),
    "val": (rng.random(N) * 100).round(2),
})


def expected_sessions(df, gap):
    out = {}
    for u, sub in df.groupby("u"):
        ts = np.sort(sub["ts"].to_numpy())
        out[u] = 1 + int((np.diff(ts) > gap).sum())
    return out


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(DF).repartition(6)


def test_session_stats(ds):
    out = session_stats(ds, "u", "ts", gap_s=10_000)
    got = dict(zip(out["u"], out["n_sessions"]))
    assert got == expected_sessions(DF, 10_000)


def test_sessionize_ids_are_per_key_monotone(ds):
    out = sessionize(ds, "u", "ts", gap_s=10_000).to_pandas()
    assert len(out) == N
    for u, sub in out.groupby("u"):
        sub = sub.sort_values("ts", kind="stable")
        assert (np.diff(sub["session_id"].to_numpy()) >= 0).all()
        gaps = np.diff(sub["ts"].to_numpy())
        bumps = np.diff(sub["session_id"].to_numpy())
        assert ((gaps > 10_000) == (bumps == 1)).all()


def test_exact_quantiles_match_numpy(ds):
    out = exact_quantiles(ds, "val", [0.25, 0.5, 0.9], scale=100)
    scaled = np.sort(np.round(DF["val"].to_numpy() * 100).astype("int64"))
    for q, v in zip(out["q"], out["value_scaled"]):
        rank = max(int(np.ceil(q * N)), 1)
        assert v == scaled[rank - 1]


def test_event_time_windower_watermark_semantics():
    import numpy as np

    from timberjack_ray.functions.window import EventTimeWindower

    M = 1_000_000
    # width 10s, lateness 5s.  Arrival order (event-time in s):
    #   3, 7        -> window 0 open
    #   21          -> watermark 16 >= 10: window 0 FINAL {2}, window 20 open
    #   8           -> window 0 finalized -> DROPPED
    #   19          -> window 10: 16 < 20 -> accepted (within lateness)
    #   25          -> window 20
    w = EventTimeWindower(width_s=10, lateness_s=5)
    w.feed(np.array([3, 7, 21], dtype=np.int64) * M)
    w.feed(np.array([8, 19, 25], dtype=np.int64) * M)
    out = w.result()
    got = {int(r["window_start"].timestamp()): r["n"]
           for _, r in out.iterrows()}
    assert got == {0: 2, 10: 1, 20: 2}
    assert w.late_dropped == 1


def test_event_time_windower_chunk_invariant():
    import numpy as np

    from timberjack_ray.functions.window import EventTimeWindower

    rng = np.random.RandomState(7)
    base = np.sort(rng.randint(0, 3_000, size=500)).astype(np.int64)
    jitter = rng.randint(-40, 40, size=500)
    arrival = base[np.argsort(base + jitter, kind="stable")] * 1_000_000

    def run(chunk):
        w = EventTimeWindower(width_s=60, lateness_s=30)
        for i in range(0, len(arrival), chunk):
            w.feed(arrival[i : i + chunk])
        return w.result(), w.late_dropped

    r1, d1 = run(7)
    r2, d2 = run(500)
    assert d1 == d2
    assert r1.equals(r2)


def test_transition_counts_matches_pandas(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import transition_counts

    rng = np.random.RandomState(4)
    n = 300
    t = pa.table({
        "u": pa.array(rng.randint(0, 12, n).astype(np.int64)),
        "ts": pa.array(rng.randint(0, 40, n).astype(np.int64)),  # many ties
        "ty": pa.array([f"e{x}" for x in rng.randint(0, 4, n)]),
        "id": pa.array(range(n), pa.int64()),
    })
    out = transition_counts(rd.from_arrow(t).repartition(5), "u", "ts",
                            "ty", "id", n_buckets=8)
    df = t.to_pandas().sort_values(["u", "ts", "id"])
    df["nxt"] = df.groupby("u")["ty"].shift(-1)
    exp = df.dropna(subset=["nxt"]).groupby(["ty", "nxt"]).size() \
        .reset_index(name="n").sort_values(["ty", "nxt"]) \
        .reset_index(drop=True)
    assert out["cur_type"].tolist() == exp["ty"].tolist()
    assert out["next_type"].tolist() == exp["nxt"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_retention_cohorts_basic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import retention_cohorts

    W = 7 * 86_400 * 1_000_000
    rows = [
        # u1 signs up in week 0, active weeks 0,1,2
        (1, 0, "signup"), (1, int(0.5 * W), "click"),
        (1, int(1.2 * W), "view"), (1, int(2.1 * W), "view"),
        # u2 signs up week 0, active week 0 only (pre-signup event ignored
        # only if before cohort week — same week counts)
        (2, int(0.1 * W), "signup"), (2, int(0.2 * W), "click"),
        # u3 signs up week 1, active weeks 1 and 3
        (3, int(1.1 * W), "signup"), (3, int(3.4 * W), "purchase"),
        # u4 never signs up: excluded entirely
        (4, int(0.3 * W), "click"),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "ty": pa.array([r[2] for r in rows]),
    })
    out = retention_cohorts(rd.from_arrow(t).repartition(3), "u", "ts", "ty")
    got = {(r["cohort_week"], r["k"]): r["n_users"]
           for r in out.to_dict("records")}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1, (1, 2): 1}


def test_debounce_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import debounce

    # user 1/type A: t=0 keep, t=500 drop, t=1101 keep (gap from t=500
    # is 601 > 600); user 1/type B independent stream: t=10 keep;
    # user 2/type A: t=20 keep.  Microsecond edge: gap EXACTLY 600s drops.
    base = np.datetime64("2025-01-01T00:00:00", "us")
    rows = [
        (1, 1, "A", 0), (2, 1, "A", 500), (3, 1, "A", 1101),
        (4, 1, "B", 10), (5, 2, "A", 20),
        (6, 2, "B", 0), (7, 2, "B", 600),          # exactly 600s → drop
        (8, 2, "B", 1200_000_001 // 1000000 + 600),  # 600.000001s later? no:
    ]
    ids = [r[0] for r in rows]
    ts = [base + np.timedelta64(int(r[3] * 1_000_000), "us") for r in rows]
    # overwrite row 8: 600s + 1us after row 7 → keep
    ts[7] = ts[6] + np.timedelta64(600_000_001, "us")
    t = pa.table({
        "event_id": ids,
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = debounce(rd.from_arrow(t), "user_id", "event_type", "ts",
                   "event_id", 600).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 4, 5, 6, 8]


def test_first_event_per_key_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import first_event_per_key

    base = np.datetime64("2025-01-01T00:00:00", "us")
    # user 1: tie on ts → event_id breaks it (id 3 < id 7)
    t = pa.table({
        "event_id": [7, 3, 9, 2],
        "user_id": [1, 1, 1, 2],
        "event_type": ["b", "a", "c", "z"],
        "ts": pa.array([base, base, base + np.timedelta64(5, "s"),
                        base], pa.timestamp("us")),
    })
    out = first_event_per_key(rd.from_arrow(t), "user_id", "ts",
                              "event_id").to_pandas()
    got = dict(zip(out["user_id"], out["event_type"]))
    assert got == {1: "a", 2: "z"}


def test_grouped_cumsum_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import grouped_cumsum

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(np.array([10, 5, 5, 3, 1], dtype="datetime64[s]")),
        "id": pa.array([4, 2, 1, 9, 8], pa.int64()),
        "v": pa.array([1.5, 2.25, 0.25, 10.0, 5.0]),
    })
    out = grouped_cumsum(rd.from_arrow(t), "u", "ts", "id", "v") \
        .to_pandas().set_index("id")["cum_scaled"].to_dict()
    # user 1 order by (ts, id): id1(25) -> id2(+225=250) -> id4(+150=400)
    # user 2: id8(500) -> id9(+1000=1500)
    assert out == {1: 25, 2: 250, 4: 400, 8: 500, 9: 1500}


def test_max_concurrent_planted(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.window import max_concurrent

    # intervals (sec): [0,10), [5,8), [7,20), and [3599, 7201) crossing
    # windows; plus a tie at t=7 where an end applies before a start
    starts = np.array([0, 5, 7, 3599, 5], dtype="datetime64[s]")
    durs = [10.0, 3.0, 13.0, 3602.0, 2.0]  # last: [5,7) ends AT 7
    ds = rd.from_arrow(pa.table({"ts": starts, "value": durs}))
    out = max_concurrent(ds, "ts", "value", width_s=3600, dur_scale=1.0)
    got = dict(zip(out["window_start"], out["max_concurrent"]))
    # window 0: run peaks at 4 ([0,10)+[5,8)+[5,7)+[7,20) with the t=7
    # end applying before the start would give 3+1=4? hand-walk:
    # t=0 +1 ->1; t=5 +2 ->3; t=7 -1([5,7)) ->2, +1([7,20)) ->3;
    # t=8 -1 ->2; t=10 -1 ->1; t=20 -1 ->0; t=3599 +1 ->1  => max 3
    # window 7200: carry 1, point -1@7201 -> 0
    assert got == {0: 3, 7200: 0}


def test_grouped_decayed_sum_matches_sequential_reference(ray_session):
    import pyarrow as pa
    """Vectorized shifted-add kernel vs a per-key sequential reference on
    random data with ts ties (id tie-break) and short/long segments."""
    import ray.data as rd

    from timberjack_ray.functions.sessions import grouped_decayed_sum

    rng = np.random.RandomState(23)
    n, w = 400, 16
    k = rng.randint(0, 12, n).astype(np.int64)
    ts = rng.randint(0, 40, n).astype(np.int64)  # many ties
    ids = np.arange(n, dtype=np.int64)
    vals = (rng.randint(0, 10_000, n) / 100.0)
    t = pa.table({"u": pa.array(k), "ts": pa.array(ts),
                  "id": pa.array(ids), "v": pa.array(vals)})
    got = grouped_decayed_sum(rd.from_arrow(t).repartition(4),
                              "u", "ts", "id", "v", window=w, n_buckets=8) \
        .to_pandas().sort_values("id").reset_index(drop=True)

    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    want = np.zeros(n, dtype=np.int64)
    df = pd.DataFrame({"u": k, "ts": ts, "id": ids, "c": cents}) \
        .sort_values(["u", "ts", "id"]).reset_index(drop=True)
    for _, sub in df.groupby("u"):
        c = sub["c"].to_numpy()
        for i in range(len(c)):
            acc = 0
            for j in range(min(w, i + 1)):
                acc += int(c[i - j]) << (w - 1 - j)
            want[sub["id"].iloc[i]] = acc
    assert got["decayed"].to_numpy().tolist() == want[got["id"]].tolist()


def test_exact_quantile_bisect_wide_range_matches_reference(ray_session):
    """Multi-pass narrowing on a HUGE sparse domain (the case the
    histogram fold can't serve): exact type-1 quantiles incl. negatives,
    verified against a sorted-array reference."""
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import exact_quantile_bisect

    rng = np.random.RandomState(31)
    # mixture: dense cluster + far outliers spanning ~2^40
    v = np.concatenate([
        rng.randint(-500, 500, 3000),
        rng.randint(-2**40, 2**40, 50),
    ]).astype(np.float64) / 100.0  # scale_to_int(·,100) recovers the ints
    t = pa.table({"value": pa.array(v)})
    qs = [0.01, 0.25, 0.5, 0.9, 0.999]
    out = exact_quantile_bisect(rd.from_arrow(t).repartition(5),
                                "value", qs, scale=100)
    cents = np.sort(np.floor(v * 100 + 0.5).astype(np.int64))
    for q, got in zip(out["q"], out["value_scaled"]):
        rank = max(1, int(np.ceil(q * len(cents))))
        assert got == cents[rank - 1], (q, got, cents[rank - 1])


def test_exact_quantile_bisect_full_int64_domain(ray_session):
    """Pivots above 2^53 — float linspace loses integer resolution there
    and could stall the bracket (ADVICE r3); integer pivot arithmetic
    must stay exact over the whole int64 domain, from shared passes."""
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import exact_quantile_bisect

    rng = np.random.RandomState(7)
    v = np.concatenate([
        rng.randint(2**60, 2**62, 2000),          # > 2^53 cluster
        rng.randint(-2**62, -2**60, 2000),
        rng.randint(-1000, 1000, 1000),
    ]).astype(np.int64)
    t = pa.table({"value": pa.array(v)})
    qs = [0.05, 0.5, 0.95]
    out = exact_quantile_bisect(rd.from_arrow(t).repartition(4),
                                "value", qs, scale=1, max_passes=16)
    ref = np.sort(v)
    for q, got in zip(out["q"], out["value_scaled"]):
        rank = max(1, int(np.ceil(q * len(ref))))
        assert got == ref[rank - 1], (q, got, ref[rank - 1])


def test_longest_streak_histogram_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import longest_streak_histogram

    DAY = 86_400_000_000
    rows = []
    # key 1: days 0,1,2 then 5,6 -> longest 3
    for d in [0, 1, 2, 5, 6]:
        rows.append((1, d * DAY + 123))
    # key 2: duplicate events on day 4; days 4,5 -> longest 2
    for d in [4, 4, 4, 5]:
        rows.append((2, d * DAY + 999))
    # key 3: isolated days 10, 20 -> longest 1
    for d in [10, 20]:
        rows.append((3, d * DAY))
    # key 4: one long run 0..7 -> longest 8
    for d in range(8):
        rows.append((4, d * DAY + 5))
    df = pd.DataFrame(rows, columns=["k", "t"])
    out = longest_streak_histogram(
        rd.from_pandas(df.sample(frac=1, random_state=3)).repartition(5),
        "k", "t", n_buckets=4)
    got = dict(zip(out["streak_days"], out["n_keys"]))
    assert got == {3: 1, 2: 1, 1: 1, 8: 1}


def test_interval_union_per_key_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import interval_union_per_key

    rows = [
        # key 1: [0,10) + [5,12) merge -> 12; [20,25) separate -> 5 => 17
        (1, 0, 10), (1, 5, 12), (1, 20, 25),
        # key 2: nested [0,100) contains [10,20) => 100
        (2, 0, 100), (2, 10, 20),
        # key 3: touching [0,5) [5,9) -> NOT overlapping (s > pme false at
        # s == pme? s=5 > pme=5 is False -> same island) => 9
        (3, 0, 5), (3, 5, 9),
        # key 4: duplicates
        (4, 3, 7), (4, 3, 7),
    ]
    df = pd.DataFrame(rows, columns=["k", "s", "e"])
    out = interval_union_per_key(
        rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(4),
        "k", "s", "e", n_buckets=3).to_pandas()
    got = dict(zip(out["k"], out["covered_us"]))
    assert got == {1: 17, 2: 100, 3: 9, 4: 4}


def test_interval_union_random_vs_reference(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import interval_union_per_key

    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "s": rng.integers(0, 10_000, n).astype("int64"),
    })
    df["e"] = df["s"] + rng.integers(1, 500, n)
    out = interval_union_per_key(
        rd.from_pandas(df).repartition(6), "k", "s", "e",
        n_buckets=8).to_pandas()
    got = dict(zip(out["k"], out["covered_us"]))
    for k, g in df.groupby("k"):
        iv = sorted(zip(g.s, g.e))
        tot, cs, ce = 0, None, None
        for s, e in iv:
            if cs is None:
                cs, ce = s, e
            elif s > ce:
                tot += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        tot += ce - cs
        assert got[k] == tot, k


def test_funnel_window_constraint_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import funnel_counts

    H = 3_600_000_000
    rows = [
        # user 1: view@0, click@0.5h, purchase@1h after click -> all in
        (1, 0, "view"), (1, H // 2, "click"), (1, H // 2 + H, "purchase"),
        # user 2: click 2h after view -> window kills step 2
        (2, 0, "view"), (2, 2 * H, "click"), (2, 3 * H, "purchase"),
        # user 3: exact boundary click at t1 + 1h (inclusive) -> qualifies
        (3, 0, "view"), (3, H, "click"),
    ]
    df = pd.DataFrame(rows, columns=["u", "t", "ty"])
    df["t"] = pd.to_datetime(df["t"], unit="us")
    out = funnel_counts(rd.from_pandas(df).repartition(3), "u", "t", "ty",
                        ["view", "click", "purchase"], window_s=3600)
    assert out["n_users"].tolist() == [3, 2, 1]
    # unwindowed: user 2's late click/purchase count again
    out2 = funnel_counts(rd.from_pandas(df).repartition(3), "u", "t", "ty",
                         ["view", "click", "purchase"])
    assert out2["n_users"].tolist() == [3, 3, 2]


def test_survival_histogram_censoring_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import survival_day_histogram

    DAY = 86_400_000_000
    rows = [
        # user 1: signup day 0, purchase day 3 -> event at day 3
        (1, 0, "signup"), (1, 3 * DAY, "purchase"),
        # user 2: signup day 1, never purchases -> censored at t_max
        (2, 1 * DAY, "signup"), (2, 2 * DAY, "view"),
        # user 3: purchase BEFORE signup doesn't count; censored
        (3, 5 * DAY, "purchase"), (3, 6 * DAY, "signup"),
        # user 4: no signup -> excluded entirely
        (4, 0, "purchase"),
        # corpus max: day 10 (user 2 censored at 9 days, user 3 at 4)
        (1, 10 * DAY, "view"),
    ]
    df = pd.DataFrame(rows, columns=["u", "t", "ty"])
    out = survival_day_histogram(
        rd.from_pandas(df.sample(frac=1, random_state=2)).repartition(3),
        "u", "t", "ty", "signup", "purchase", n_buckets=2)
    got = {int(r.day): (int(r.n_event), int(r.n_censored))
           for r in out.itertuples()}
    assert got == {3: (1, 0), 9: (0, 1), 4: (0, 1)}


def test_session_path_topk_matches_pandas_reference(ray_session):
    """session_path_topk: bucketed vectorized paths match a per-key
    Python reference applying the same gap rule and (ts, id) order,
    including exact-gap boundaries and duplicate timestamps."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import session_path_topk

    rng = np.random.default_rng(17)
    n, gap_s = 1200, 60
    df = pd.DataFrame({
        "user_id": rng.integers(0, 10, n),
        # coarse sparse grid -> real gaps, exact-gap ties, dup stamps
        "ts": pd.to_datetime(
            rng.integers(0, 3000, n) * gap_s * 1_000_000, unit="us"),
        "event_id": rng.permutation(n),
        "event_type": rng.choice(["v", "c", "p"], n),
    })

    ref_counts: dict = {}
    for _, g in df.sort_values(["user_id", "ts", "event_id"]) \
            .groupby("user_id"):
        tvals = g["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        ets = g["event_type"].to_numpy()
        cur = [ets[0]]
        for i in range(1, len(g)):
            if tvals[i] - tvals[i - 1] > gap_s * 1_000_000:
                p = ">".join(cur)
                ref_counts[p] = ref_counts.get(p, 0) + 1
                cur = []
            cur.append(ets[i])
        p = ">".join(cur)
        ref_counts[p] = ref_counts.get(p, 0) + 1
    ref = pd.DataFrame(sorted(ref_counts.items(),
                              key=lambda kv: (-kv[1], kv[0]))[:15],
                       columns=["path", "n"]).astype({"n": "int64"})

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(4)
    got = session_path_topk(ds, "user_id", "ts", "event_id", "event_type",
                            gap_s=gap_s, k=15, n_buckets=8) \
        .reset_index(drop=True)
    assert got.equals(ref), (got, ref)
    # forced distributed degrade agrees
    got2 = session_path_topk(ds, "user_id", "ts", "event_id", "event_type",
                             gap_s=gap_s, k=15, n_buckets=8,
                             path_driver_limit=0).reset_index(drop=True)
    assert got2.equals(ref), (got2, ref)


def test_session_window_overlap_matches_bruteforce(ray_session):
    """session_window_overlap_counts: the two-searchsorted disjoint-
    interval count agrees with an all-pairs brute force (closed-interval
    intersection), including right keys with no sessions and windows
    spanning several sessions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import \
        session_window_overlap_counts

    rng = np.random.default_rng(31)
    n, gap_s = 800, 60
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 8, n),
        "ts": pd.to_datetime(np.sort(rng.integers(0, 4000, n))
                             * 1_000_000, unit="us"),
    })
    nr = 120
    right = pd.DataFrame({
        "user_id": rng.integers(0, 12, nr),  # some keys have no sessions
        "ts": pd.to_datetime(rng.integers(0, 4000, nr) * 1_000_000,
                             unit="us"),
        "grp": rng.choice(["x", "y", "z"], nr),
    })
    W = 150 * 1_000_000  # 150 s window >> 60 s gap: spans sessions

    # brute force: build sessions per user, then all-pairs closed overlap
    spans = []
    for uid, g in ev.sort_values(["user_id", "ts"]).groupby("user_id"):
        tv = g["ts"].astype("int64").to_numpy() // 1000
        start = tv[0]
        prev = tv[0]
        for x in tv[1:]:
            if x - prev > gap_s * 1_000_000:
                spans.append((uid, start, prev))
                start = x
            prev = x
        spans.append((uid, start, prev))
    agg = {}
    for _, r in right.iterrows():
        a = int(r["ts"].value) // 1000
        b = a + W
        cnt = sum(1 for (u, s, e) in spans
                  if u == r["user_id"] and s <= b and a <= e)
        row = agg.setdefault(r["grp"], [0, 0, 0])
        row[0] += cnt
        row[1] += 1 if cnt > 0 else 0
        row[2] += 1
    ref = pd.DataFrame(
        [(k, *v) for k, v in sorted(agg.items())],
        columns=["grp", "n_pairs", "n_hit", "n_right"]).astype(
            {"n_pairs": "int64", "n_hit": "int64", "n_right": "int64"})

    got = session_window_overlap_counts(
        rd.from_pandas(ev).repartition(4), "user_id", "ts", gap_s,
        rd.from_pandas(right).repartition(3), "user_id", "ts", W, "grp",
        n_buckets=8).reset_index(drop=True)
    assert got.equals(ref), (got, ref)


def test_anchored_prepost_sums_matches_bruteforce(ray_session):
    """Band-aggregate join vs an all-pairs reference: strict exclusion
    of ts == anchor ts, inclusive [t-W] / [t+W] edges, anchors whose key
    has no events, exact-boundary events planted."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import anchored_prepost_sums

    rng = np.random.default_rng(23)
    n = 900
    ev = pd.DataFrame({
        "k": rng.integers(0, 10, n).astype(np.int64),
        "t": rng.integers(0, 5000, n).astype(np.int64),
        "v": rng.integers(-50, 200, n).astype(np.int64),
    })
    W = 250
    na = 150
    an = pd.DataFrame({
        "k": rng.integers(0, 14, na).astype(np.int64),  # some keyless
        "t": rng.integers(0, 5000, na).astype(np.int64),
        "g": rng.choice(["a", "b", "c"], na),
    })
    # plant exact-boundary and same-instant events around anchor 0
    k0, t0 = int(an.loc[0, "k"]), int(an.loc[0, "t"])
    ev = pd.concat([ev, pd.DataFrame({
        "k": [k0] * 3, "t": [t0 - W, t0, t0 + W],
        "v": [1000, 7777, 2000]})], ignore_index=True)

    agg = {}
    for _, r in an.iterrows():
        sub = ev[ev["k"] == r["k"]]
        pre = int(sub[(sub["t"] >= r["t"] - W) & (sub["t"] < r["t"])]["v"].sum())
        post = int(sub[(sub["t"] > r["t"]) & (sub["t"] <= r["t"] + W)]["v"].sum())
        row = agg.setdefault(r["g"], [0, 0, 0])
        row[0] += 1
        row[1] += pre
        row[2] += post
    ref = pd.DataFrame([(g, *v) for g, v in sorted(agg.items())],
                       columns=["g", "n_anchors", "pre", "post"]) \
        .astype({"n_anchors": "int64", "pre": "int64", "post": "int64"})

    got = anchored_prepost_sums(
        rd.from_pandas(ev).repartition(5), "k", "t", "v",
        rd.from_pandas(an).repartition(3), "k", "t", "g", W,
        n_buckets=8).reset_index(drop=True)
    assert got.equals(ref), (got, ref)


def test_ushape_attribution_matches_bruteforce(ray_session):
    """40/20/40 credit vs a per-user python reference: n=1/2/3/many
    journeys, ts ties broken by id, keys without conversions ignored,
    credit per converting key sums to exactly 10000."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import ushape_attribution

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "t": rng.integers(0, 300, n).astype(np.int64),  # many ts ties
        "i": np.arange(n, dtype=np.int64),
        "y": rng.choice(["view", "click", "cart", "purchase"], n,
                        p=[0.5, 0.25, 0.15, 0.1]),
    })

    agg: dict = {}
    total_check = 0
    for _, sub in df.groupby("k"):
        p = sub[sub["y"] == "purchase"]
        if p.empty:
            continue
        pt = int(p["t"].min())
        tt = sub[sub["t"] < pt].sort_values(["t", "i"])
        m = len(tt)
        if m == 0:
            continue
        credits = []
        if m == 1:
            credits = [10000]
        elif m == 2:
            credits = [5000, 5000]
        else:
            share = 2000 // (m - 2)
            credits = [4000] + [share] * (m - 2) + \
                [4000 + 2000 - (m - 2) * share]
        total_check += sum(credits)
        assert sum(credits) == 10000
        for yy, c in zip(tt["y"], credits):
            row = agg.setdefault(yy, [0, 0])
            row[0] += 1
            row[1] += c
    ref = pd.DataFrame([(y, *v) for y, v in sorted(agg.items())],
                       columns=["y", "n_touches", "credit_bp"]) \
        .astype({"n_touches": "int64", "credit_bp": "int64"})

    got = ushape_attribution(rd.from_pandas(df).repartition(5),
                             "k", "t", "i", "y", "purchase",
                             n_buckets=8).reset_index(drop=True)
    assert got.equals(ref), (got, ref)
    assert int(got["credit_bp"].sum()) == total_check


def test_sax_motif_census_matches_bruteforce(ray_session):
    """SAX census vs a per-key python reference: type-1 quartile
    breakpoints, partial tail frames dropped, words never span keys,
    partitioning invariance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import sax_motif_census

    rng = np.random.default_rng(17)
    n = 1200
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n).astype(np.int64),
        "t": rng.integers(0, 800, n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
        "v": rng.integers(-30, 120, n).astype(np.int64),
    })
    F, W = 3, 2

    # reference
    fsums, per_key = [], {}
    for kk, sub in df.sort_values(["k", "t", "i"]).groupby("k"):
        v = sub["v"].to_numpy()
        m = len(v) // F
        fs = [int(v[j * F:(j + 1) * F].sum()) for j in range(m)]
        per_key[kk] = fs
        fsums.extend(fs)
    fsums_sorted = sorted(fsums)
    nn = len(fsums_sorted)
    import math
    bps = [fsums_sorted[max(0, math.ceil(q * nn) - 1)]
           for q in (0.25, 0.5, 0.75)]  # type-1 / quantile_disc

    def sym(x):
        for j, b in enumerate(bps):
            if x <= b:
                return "abcd"[j]
        return "d"

    from collections import Counter
    cnt = Counter()
    for fs in per_key.values():
        ss = [sym(x) for x in fs]
        for j in range(len(ss) - W + 1):
            cnt["".join(ss[j:j + W])] += 1
    ref = pd.DataFrame(sorted(cnt.items()), columns=["motif", "n"]) \
        .astype({"n": "int64"})

    for parts in (1, 6):
        got = sax_motif_census(rd.from_pandas(df).repartition(parts),
                               "k", "t", "i", "v", frame=F, word=W,
                               n_buckets=8)
        assert got.equals(ref), (parts, got, ref)


def test_decay_attribution_matches_bruteforce(ray_session):
    """Integer half-life credit vs a per-user python reference: halving
    per elapsed half-life, 62-shift clamp, non-converting keys excluded,
    exact boundary age = k * halflife."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import decay_attribution

    rng = np.random.default_rng(29)
    n = 700
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n).astype(np.int64),
        "t": rng.integers(0, 1000, n).astype(np.int64),
        "y": rng.choice(["view", "click", "purchase"], n,
                        p=[0.6, 0.3, 0.1]),
    })
    HL, BASE = 100, 1_000_000

    agg: dict = {}
    for _, sub in df.groupby("k"):
        p = sub[sub["y"] == "purchase"]
        if p.empty:
            continue
        pt = int(p["t"].min())
        for _, r in sub[sub["t"] < pt].iterrows():
            age = pt - int(r["t"])
            c = BASE >> min(age // HL, 62)
            row = agg.setdefault(r["y"], [0, 0])
            row[0] += 1
            row[1] += c
    ref = pd.DataFrame([(y, *v) for y, v in sorted(agg.items())],
                       columns=["y", "n_touches", "credit"]) \
        .astype({"n_touches": "int64", "credit": "int64"})

    got = decay_attribution(rd.from_pandas(df).repartition(4),
                            "k", "t", "y", "purchase", HL,
                            base=BASE, n_buckets=8) \
        .reset_index(drop=True)
    assert got.equals(ref), (got, ref)


def test_absent_followup_census_matches_bruteforce(ray_session):
    """Negation window vs all-pairs reference: strict (t, t+W] bounds
    (a click exactly AT the view instant does not rescue it; exactly at
    t+W does), keys with no clicks at all, anchors with no key match."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.functions.sessions import absent_followup_census

    rng = np.random.default_rng(37)
    n = 800
    base_us = 1_600_000_000_000_000
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime(base_us + rng.integers(0, 5000, n)
                             * 1_000_000, unit="us"),
        "y": rng.choice(["view", "click", "other"], n, p=[0.4, 0.3, 0.3]),
    })
    # planted: view with click exactly at t (no rescue) and at t+W (rescue)
    W = 250 * 1_000_000
    t0 = base_us + 10_000 * 1_000_000
    df = pd.concat([df, pd.DataFrame({
        "k": [99, 99, 98, 98],
        "ts": pd.to_datetime([t0, t0, t0, t0 + W], unit="us"),
        "y": ["view", "click", "view", "click"]})], ignore_index=True)

    views = df[df["y"] == "view"]
    clicks = df[df["y"] == "click"]
    agg: dict = {}
    for _, r in views.iterrows():
        t = int(r["ts"].value) // 1000
        cs = clicks[clicks["k"] == r["k"]]
        ct = cs["ts"].astype("int64").to_numpy() // 1000
        rescued = ((ct > t) & (ct <= t + W)).any()
        g = r["ts"].strftime("%m")
        row = agg.setdefault(g, [0, 0])
        row[0] += 1
        row[1] += 0 if rescued else 1
    ref = pd.DataFrame([(g, *v) for g, v in sorted(agg.items())],
                       columns=["grp", "n_anchors", "n_abandoned"]) \
        .astype({"n_anchors": "int64", "n_abandoned": "int64"})

    got = absent_followup_census(
        rd.from_pandas(df).repartition(5), "k", "ts", "y",
        "view", "click", W, n_buckets=8).reset_index(drop=True)
    assert got.equals(ref), (got, ref)
