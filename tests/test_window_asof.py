"""Windowed aggregates (tumbling/sliding) and the as-of join, verified
against pandas ground truth on the same data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timberjack_ray.functions.relational import asof_join
from timberjack_ray.functions.window import sliding_counts, tumbling_counts

rng = np.random.default_rng(11)
N = 8000
TS0 = 1_700_000_000
EVENTS = pd.DataFrame({
    "ts": TS0 + rng.integers(0, 86_400, N),
    "key": rng.choice(["a", "b", "c"], N),
})


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(EVENTS).repartition(6)


def test_tumbling_counts(events_ds):
    out = tumbling_counts(events_ds, "ts", width_s=3600)
    expect = EVENTS.assign(ws=(EVENTS.ts // 3600) * 3600).groupby("ws").size()
    got = dict(zip(out["window_start"], out["n"]))
    assert got == expect.to_dict()


def test_tumbling_by_key(events_ds):
    out = tumbling_counts(events_ds, "ts", width_s=7200, by="key")
    expect = EVENTS.assign(ws=(EVENTS.ts // 7200) * 7200).groupby(["ws", "key"]).size()
    got = {(w, k): n for w, k, n in zip(out["window_start"], out["key"], out["n"])}
    assert got == expect.to_dict()


def test_sliding_counts_match_bruteforce(events_ds):
    width, slide = 3600, 900
    out = sliding_counts(events_ds, "ts", width_s=width, slide_s=slide)
    # brute force: for each candidate window, count rows in [ws, ws+width)
    got = dict(zip(out["window_start"], out["n"]))
    ts = EVENTS.ts.to_numpy()
    for ws, n in list(got.items())[:200]:
        assert n == int(((ts >= ws) & (ts < ws + width)).sum())
    # every row appears in exactly width/slide windows
    assert sum(got.values()) == N * (width // slide)


def test_asof_join_matches_pandas(ray_session):
    import ray.data as rd

    left = pd.DataFrame({
        "ts": np.sort(rng.integers(0, 10_000, 500)),
        "u": rng.choice(["x", "y", "z"], 500),
        "lid": np.arange(500),
    })
    right_df = pd.DataFrame({
        "ts": np.sort(rng.integers(0, 10_000, 80)),
        "u": rng.choice(["x", "y", "z"], 80),
        "val": np.arange(80) * 10,
    })
    out = asof_join(
        rd.from_pandas(left).repartition(4),
        pa.Table.from_pandas(right_df, preserve_index=False),
        on="ts", by="u", value_cols=["val"], inner=False,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    expect = pd.merge_asof(
        left.sort_values("ts", kind="stable"), right_df.sort_values("ts", kind="stable"),
        on="ts", by="u", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert out["val_r"].fillna(-1).astype("int64").tolist() == \
        expect["val"].fillna(-1).astype("int64").tolist()


def test_asof_join_inner_drops_unmatched(ray_session):
    import ray.data as rd

    left = pd.DataFrame({"ts": [5, 1], "u": ["x", "x"], "lid": [0, 1]})
    right = pa.table({"u": ["x"], "ts": [3], "val": [42]})
    out = asof_join(rd.from_pandas(left), right, on="ts", by="u",
                    value_cols=["val"]).to_pandas()
    assert out["lid"].tolist() == [0]  # ts=1 has no right row ≤ it
    assert out["val_r"].tolist() == [42]


def test_asof_join_bucketed_vs_merge_asof(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import asof_join_bucketed

    rng = np.random.default_rng(5)
    nl, nr = 3000, 2000
    left = pd.DataFrame({
        "k": rng.integers(0, 400, nl),          # some keys miss the right side
        "t": rng.integers(0, 10_000, nl).astype("int64"),
        "tag": rng.choice(list("xyz"), nl),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 300, nr),
        "rt": rng.integers(0, 10_000, nr).astype("int64"),
    })
    # force exact-tie rows: backward as-of must INCLUDE right_on == left_on
    left.loc[0, ["k", "t"]] = [7, 5000]
    right.loc[0, ["rk", "rt"]] = [7, 5000]

    out = asof_join_bucketed(
        rd.from_pandas(left).repartition(6), rd.from_pandas(right).repartition(5),
        "k", "t", "rk", "rt", ["tag"], n_buckets=16,
    ).to_pandas().sort_values(["k", "t", "tag"]).reset_index(drop=True)

    m = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("rt", kind="stable"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction="backward", allow_exact_matches=True,
    ).dropna(subset=["rt"])
    exp = pd.DataFrame({"k": m["k"], "t": m["t"], "tag": m["tag"],
                        "rt_matched": m["rt"].astype("int64")}) \
        .sort_values(["k", "t", "tag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "t", "tag", "rt_matched"]], exp, check_dtype=False)


def test_asof_join_bucketed_null_key_raises(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import asof_join_bucketed

    left = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                         "t": [1, 2], "tag": ["a", "b"]})
    right = pd.DataFrame({"rk": [1], "rt": [0]})
    with pytest.raises(Exception, match="null"):
        asof_join_bucketed(rd.from_pandas(left), rd.from_pandas(right),
                           "k", "t", "rk", "rt", ["tag"]).to_pandas()


def test_range_window_sum_vs_pandas(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import range_window_sum_per_key_ds

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),
        # coarse grid => many duplicate timestamps per key (RANGE peers)
        "t": rng.integers(0, 500, n).astype("int64") * 10,
        "id": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 100, n).astype("int64"),
    })
    w = 100
    out = range_window_sum_per_key_ds(
        rd.from_pandas(df).repartition(7), "k", "t", "id", "v",
        width_us=w, scale=1, n_buckets=8,
    ).to_pandas().sort_values("id").reset_index(drop=True)

    # RANGE frame: ALL rows of the key with t in [t_i - w, t_i] -- equal-t
    # peers after the current row included
    exp = []
    for _, r in df.iterrows():
        g = df[df.k == r.k]
        exp.append(g.v[(g.t >= r.t - w) & (g.t <= r.t)].sum())
    expect = df.assign(win_sum=np.array(exp, dtype="int64")) \
        .sort_values("id").reset_index(drop=True)
    assert out["win_sum"].tolist() == expect["win_sum"].tolist()


def test_asof_join_bucketed_forward(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import asof_join_bucketed

    rng = np.random.default_rng(13)
    nl, nr = 2500, 1500
    left = pd.DataFrame({
        "k": rng.integers(0, 300, nl),
        "t": rng.integers(0, 10_000, nl).astype("int64"),
        "tag": rng.choice(list("pq"), nl),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 250, nr),
        "rt": rng.integers(0, 10_000, nr).astype("int64"),
    })
    left.loc[0, ["k", "t"]] = [3, 4000]   # exact tie must match (inclusive)
    right.loc[0, ["rk", "rt"]] = [3, 4000]

    out = asof_join_bucketed(
        rd.from_pandas(left).repartition(5), rd.from_pandas(right).repartition(4),
        "k", "t", "rk", "rt", ["tag"], n_buckets=16, direction="forward",
    ).to_pandas().sort_values(["k", "t", "tag"]).reset_index(drop=True)

    m = pd.merge_asof(
        left.sort_values("t", kind="stable"), right.sort_values("rt", kind="stable"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction="forward", allow_exact_matches=True,
    ).dropna(subset=["rt"])
    exp = pd.DataFrame({"k": m["k"], "t": m["t"], "tag": m["tag"],
                        "rt_matched": m["rt"].astype("int64")}) \
        .sort_values(["k", "t", "tag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "t", "tag", "rt_matched"]], exp, check_dtype=False)


def test_range_join_bucketed_vs_pandas(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import range_join_bucketed

    rng = np.random.default_rng(21)
    nl, nr = 1200, 900
    left = pd.DataFrame({
        "k": rng.integers(0, 120, nl),
        "t": rng.integers(0, 5_000, nl).astype("int64"),
        "id": np.arange(nl, dtype="int64"),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 100, nr),
        "rt": rng.integers(0, 5_000, nr).astype("int64"),
        "rid": np.arange(10_000, 10_000 + nr, dtype="int64"),
    })
    lo, hi = -200, 100   # asymmetric band incl. forward reach
    out = range_join_bucketed(
        rd.from_pandas(left).repartition(5), rd.from_pandas(right).repartition(4),
        "k", "t", "id", "rk", "rt", "rid", lo_us=lo, hi_us=hi, n_buckets=16,
    ).to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)

    m = left.merge(right, left_on="k", right_on="rk")
    m = m[(m.rt >= m.t + lo) & (m.rt <= m.t + hi)]
    exp = m[["id", "rid"]].rename(columns={"id": "a_id", "rid": "b_id"}) \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
