"""VERDICT r02 #2: the four formerly-unbounded driver folds must
auto-degrade past a cardinality limit (msg#-guard pattern) — CMS top-K for
word counts / doc frequency, HLL-per-group for grouped distincts, and the
distributed groupby plan for per-key session counts — with bounded driver
state and sketch-tolerance answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _word_docs(n_docs=4000, planted="common"):
    # each doc: one planted frequent word + 3 unique words → vocabulary
    # ~3·n_docs + 1, planted count = n_docs
    texts = [f"{planted} u{i}a u{i}b u{i}c" for i in range(n_docs)]
    return pa.table({"doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                     "text": pa.array(texts)})


def test_word_topk_degrades_to_cms(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import word_topk

    ds = rd.from_arrow(_word_docs(4000)).repartition(8)
    out = word_topk(ds, k=5, limit=1_000)
    assert out.attrs["mode"] == "cms"            # the switch fired
    assert out.iloc[0]["word"] == "common"       # heavy hitter survives
    # CMS never under-counts; over-count bounded by ~2N/width (tiny here)
    assert 4000 <= out.iloc[0]["n"] <= 4400


def test_word_topk_exact_below_limit(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import word_topk

    ds = rd.from_arrow(_word_docs(500)).repartition(4)
    out = word_topk(ds, k=3, limit=1_000_000)
    assert out.attrs["mode"] == "exact"
    assert out.iloc[0]["word"] == "common" and out.iloc[0]["n"] == 500


def test_doc_frequency_degrades_to_cms(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import doc_frequency

    ds = rd.from_arrow(_word_docs(4000)).repartition(8)
    out = doc_frequency(ds, limit=1_000)
    assert out.attrs["mode"] == "cms"
    # candidate set is bounded, and the frequent word is in it with a
    # never-under-counting estimate
    assert len(out) <= 8192
    got = dict(zip(out["word"], out["df"]))
    assert 4000 <= got["common"] <= 4400


def test_doc_frequency_exact_below_limit(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import doc_frequency

    ds = rd.from_arrow(_word_docs(300)).repartition(4)
    out = doc_frequency(ds, limit=1_000_000)
    assert out.attrs["mode"] == "exact"
    got = dict(zip(out["word"], out["df"]))
    assert got["common"] == 300 and got["u7a"] == 1


def test_distinct_count_by_degrades_to_hll(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import distinct_count_by

    n = 20_000
    t = pa.table({
        "g": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
        "v": pa.array([f"v{i}" for i in range(n)]),  # all distinct
    })
    out = distinct_count_by(rd.from_arrow(t).repartition(8), "g", "v",
                            limit=2_000)
    assert out.attrs["mode"] == "hll"
    got = dict(zip(out["g"], out["n_distinct"]))
    for g in ("a", "b"):
        assert abs(got[g] - n // 2) / (n // 2) < 0.05  # HLL p=14 tolerance


def test_distinct_count_by_exact_below_limit(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"g": rng.choice(["x", "y"], 2000),
                       "v": rng.randint(0, 50, 2000).astype(str)})
    from timberjack_ray.functions.relational import distinct_count_by

    out = distinct_count_by(rd.from_pandas(df).repartition(4), "g", "v",
                            limit=1_000_000)
    assert out.attrs["mode"] == "exact"
    exp = df.groupby("g")["v"].nunique()
    got = dict(zip(out["g"], out["n_distinct"]))
    assert got == exp.to_dict()


def test_grouped_topk_streaming_tail_returns_dataset(ray_session):
    """Above driver_limit the k × #groups result must come back as a
    Dataset (VERDICT r02 #4), with exactly the same rows as the driver
    fold would produce."""
    import ray.data as rd
    from ray.data import Dataset

    from timberjack_ray.functions.relational import grouped_topk

    rng = np.random.RandomState(5)
    n = 5000
    df = pd.DataFrame({"g": rng.randint(0, 400, n),
                       "v": rng.randint(0, 10_000, n),
                       "id": np.arange(n, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8)

    small = grouped_topk(ds, "g", "v", 2, tie_col="id", driver_limit=2_000_000)
    assert isinstance(small, pd.DataFrame)

    big = grouped_topk(ds, "g", "v", 2, tie_col="id", driver_limit=10)
    assert isinstance(big, Dataset)              # the switch fired
    got = big.to_pandas().sort_values(["g", "v", "id"],
                                      ascending=[True, False, True]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "v", "id"]].astype("int64"),
                                  small[["g", "v", "id"]].astype("int64"))


def test_session_stats_bails_to_distributed_dataset(ray_session):
    import ray.data as rd
    from ray.data import Dataset

    from timberjack_ray.functions.sessions import session_stats

    n_users, per = 500, 3
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    rows = {
        "u": np.repeat(np.arange(n_users, dtype=np.int64), per),
        # events 2h apart → every event its own session (gap 3600s)
        "ts": pd.to_datetime(
            np.tile(np.arange(per) * 7_200_000_000, n_users)
            + np.repeat(np.arange(n_users, dtype=np.int64), per) + base,
            unit="us").astype("datetime64[us]"),
    }
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(8)

    exact = session_stats(ds, "u", "ts", gap_s=3600)
    assert exact.attrs["mode"] == "driver"
    assert set(exact["n_sessions"]) == {per}

    guarded = session_stats(ds, "u", "ts", gap_s=3600, driver_limit=50)
    assert isinstance(guarded, Dataset)          # the switch fired
    got = guarded.to_pandas().sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"u": "int64", "n_sessions": "int64"}),
        exact.rename(columns={})[["u", "n_sessions"]]
        .astype({"u": "int64", "n_sessions": "int64"}))


def test_rollup_sums_degrades_to_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.relational import rollup_sums

    n = 2000
    t = pa.table({"k": pa.array([f"k{i}" for i in range(n)]),
                  "v": pa.array([1.0] * n)})
    ds = rd.from_arrow(t).repartition(4)
    small = rollup_sums(ds, ["k"], "v", scale=100, driver_limit=100)
    assert not hasattr(small, "attrs")  # Dataset, not pandas
    dist = small.to_pandas()
    exact = rollup_sums(rd.from_arrow(t).repartition(4), ["k"], "v",
                        scale=100)
    assert exact.attrs["mode"] == "driver"
    m = dist.sort_values("k").reset_index(drop=True) \
        .merge(exact, on="k", suffixes=("_d", "_e"))
    assert len(m) == n + 1  # every key level + the ALL row, both paths
    assert (m["sum_v_scaled_d"] == m["sum_v_scaled_e"]).all()
    assert (m["n_d"] == m["n_e"]).all()


def test_comoment_sums_degrades_to_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.relational import grouped_comoment_sums

    n = 1500
    t = pa.table({"g": pa.array([f"g{i}" for i in range(n)]),
                  "x": pa.array([float(i % 7) for i in range(n)]),
                  "y": pa.array([float(i % 11) for i in range(n)])})
    ds = rd.from_arrow(t).repartition(4)
    out = grouped_comoment_sums(ds, "g", "x", "y", driver_limit=50)
    assert not hasattr(out, "attrs")  # degraded: Dataset
    dist = out.to_pandas().sort_values("g").reset_index(drop=True)
    exact = grouped_comoment_sums(rd.from_arrow(t).repartition(4),
                                  "g", "x", "y")
    assert exact.attrs["mode"] == "driver"
    assert dist[["sum_x", "sum_y", "sum_xy", "n"]].astype("int64") \
        .equals(exact[["sum_x", "sum_y", "sum_xy", "n"]].astype("int64"))


def test_windower_drain_keeps_state_bounded():
    import numpy as np

    from timberjack_ray.functions.window import EventTimeWindower

    w = EventTimeWindower(width_s=10, lateness_s=5)
    drained: dict = {}
    # in-order stream over 200 windows; drain after each chunk
    ts = np.arange(2000, dtype=np.int64) * 1_000_000
    for i in range(0, len(ts), 100):
        w.feed(ts[i : i + 100])
        for k, v in w.drain_finalized().items():
            drained[k] = drained.get(k, 0) + v
        assert len(w._open) + len(w._final) <= 3  # lateness horizon only
    final = w.result()
    total = sum(drained.values()) + int(final["n"].sum())
    assert total == 2000 and w.late_dropped == 0


def test_session_type_pairs_hot_key_bounded(ray_session):
    """One user owning 50k events (5-type alphabet) must cost one
    vectorized bucket pass — pair expansion is alphabet-bounded, not
    event-count-bounded."""
    import time

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sessions import session_type_pairs

    n = 50_000
    base = np.datetime64("2025-01-01T00:00:00", "us")
    ts = base + np.arange(n) * np.timedelta64(1, "s")  # all one session
    types = np.array(["a", "b", "c", "d", "e"], dtype=object)[
        np.arange(n) % 5]
    t = pa.table({"user_id": np.zeros(n, np.int64),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(types)})
    t0 = time.time()
    out = session_type_pairs(rd.from_arrow(t), "user_id", "ts",
                             "event_type", 3600)
    took = time.time() - t0
    # one session with 5 types → C(5,2)=10 pairs, each counted once
    assert len(out) == 10 and (out["n"] == 1).all()
    assert took < 60, f"hot-key pair expansion too slow: {took:.1f}s"


def test_inverted_index_hot_word_capped(ray_session):
    """A word in EVERY doc lands in one bucket; postings stay capped."""
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.corpus import inverted_index

    n = 20_000
    docs = [f"common unique{i}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n)), "text": docs}))
    out = inverted_index(ds, cap_postings=4).to_pandas()
    row = out[out["word"] == "common"].iloc[0]
    assert row["df"] == n
    assert row["postings"] == "0,1,2,3"  # capped, sorted


def test_top_key_per_window_degrades_distributed(ray_session):
    """Force the fold past max_rows: the distributed grouped_topk path must
    produce exactly the driver path's answer."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.window import top_key_per_window

    rng = np.random.RandomState(5)
    n = 4000
    ts = np.array(rng.randint(0, 4 * 3600, size=n), dtype="datetime64[s]")
    keys = [f"k{rng.randint(0, 50)}" for _ in range(n)]
    ds = rd.from_arrow(pa.table({"ts": ts, "key": keys}))
    want = top_key_per_window(ds, "ts", "key", 3600, k=2)  # driver path
    got = top_key_per_window(ds, "ts", "key", 3600, k=2, max_rows=10)
    assert want[["window_start", "key", "n", "rank"]].values.tolist() == \
        got[["window_start", "key", "n", "rank"]].values.tolist()


SF = "/root/testdata/sf0.001"


def test_copurchase_top20_distributed_degrade(ray_session, monkeypatch):
    """ADVICE r3: the degrade branch must resolve top-20 distributedly
    (per-batch top-k), not concat the whole edge Dataset on the driver —
    and must equal the driver-mode answer exactly."""
    import timberjack_ray.aggregates as agg

    import __ray_entry__ as e

    want = e.q_copurchase_top20(SF)
    monkeypatch.setattr(agg, "FOLD_GUARD_LIMIT", 10)  # force degrade
    got = e.q_copurchase_top20(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_ab_experiment_report_distributed_degrade(ray_session, monkeypatch):
    import timberjack_ray.aggregates as agg

    import __ray_entry__ as e

    want = e.q_ab_experiment_report(SF)
    monkeypatch.setattr(agg, "FOLD_GUARD_LIMIT", 10)
    got = e.q_ab_experiment_report(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_copurchase_lift_distributed_degrade(ray_session, monkeypatch):
    """The lift variant's degrade branch computes lift per edge block
    against the broadcast part-frequency map — must equal driver mode."""
    import timberjack_ray.aggregates as agg

    import __ray_entry__ as e

    want = e.q_copurchase_lift_top20(SF)
    assert len(want) and (want["lift_ppm"] > 0).all()
    monkeypatch.setattr(agg, "FOLD_GUARD_LIMIT", 10)  # force degrade
    got = e.q_copurchase_lift_top20(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
