"""HyperLogLog sketch: accuracy, merge semantics, Ray integration."""

import numpy as np
import pandas as pd
import pytest

from timberjack_ray.functions.sketch import (
    HyperLogLog,
    approx_distinct,
    approx_distinct_by,
)


def test_hll_accuracy():
    for n in (50, 5_000, 200_000):
        h = HyperLogLog(14)
        h.add_hashed(pd.util.hash_array(np.arange(n).astype(object)))
        assert abs(h.estimate() - n) / n < 0.03


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_strings([f"x{i}" for i in range(3000)])
    b.add_strings([f"x{i}" for i in range(1500, 4500)])  # overlap 1500
    u = HyperLogLog(12)
    u.add_strings([f"x{i}" for i in range(4500)])
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)  # max-merge is exact on registers
    assert abs(a.estimate() - 4500) / 4500 < 0.05


def test_approx_distinct_ray(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 7000, 40_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    exact = len(np.unique(vals))
    est = approx_distinct(ds, "v")
    assert abs(est - exact) / exact < 0.03


def test_approx_distinct_by_ray(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 30_000),
        "v": rng.integers(0, 2000, 30_000),
    })
    ds = rd.from_pandas(df).repartition(6)
    out = approx_distinct_by(ds, "g", "v", p=12)
    exact = df.groupby("g")["v"].nunique()
    for g, est in zip(out["g"], out["approx_distinct"]):
        assert abs(est - exact[g]) / exact[g] < 0.06


def test_cms_never_undercounts_and_bounds_error():
    from timberjack_ray.functions.sketch import CountMinSketch, _hash_strings

    rng = np.random.RandomState(9)
    # zipf-ish skew: value i appears ~ 1/i
    vals = [f"v{i}" for i in range(1, 400) for _ in range(max(1, 4000 // i))]
    rng.shuffle(vals)
    cms = CountMinSketch(depth=4, width=4096)
    cms.add_hashed(_hash_strings(vals))
    truth = pd.Series(vals).value_counts()
    keys = truth.index.tolist()
    est = cms.query_hashed(_hash_strings(keys))
    true_n = truth.to_numpy()
    assert (est >= true_n).all()                       # CMS only over-counts
    assert (est - true_n).max() <= 2 * len(vals) / 4096 * 4  # loose eps bound


def test_heavy_hitters_recovers_skewed_topk(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sketch import heavy_hitters

    rng = np.random.RandomState(17)
    vals = [f"hot{i}" for i in range(5) for _ in range(3000 - 400 * i)] + \
           [f"cold{i}" for i in range(5000) for _ in (0, 1)]  # long tail ×2
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"word": pd.Series(vals, dtype=object)})).repartition(8)
    out = heavy_hitters(ds, "word", k=5)
    assert out["word"].tolist() == [f"hot{i}" for i in range(5)]
    truth = pd.Series(vals).value_counts()
    for w, e in zip(out["word"], out["est_n"]):
        assert e >= truth[w]
        assert e - truth[w] <= 2 * len(vals) / 8192 * 4


def test_hdr_quantiles_relative_error(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sketch import hdr_quantiles

    rng = np.random.RandomState(4)
    vals = rng.lognormal(mean=5, sigma=2, size=20_000)
    df = pd.DataFrame({"v": vals})
    out = hdr_quantiles(rd.from_pandas(df).repartition(6), "v",
                        [0.5, 0.9, 0.99], scale=100, sig=3)
    scaled = np.round(vals * 100).astype(np.int64)
    for _, r in out.iterrows():
        exact = np.quantile(scaled, r["q"], method="inverted_cdf")
        rel = abs(r["value_scaled"] - exact) / max(exact, 1)
        assert rel <= 1e-2, (r["q"], r["value_scaled"], exact, rel)  # sig=3 ⇒ ≤1%


def test_hdr_quantiles_deterministic_and_empty(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sketch import hdr_quantiles

    df = pd.DataFrame({"v": np.arange(1000, dtype=np.float64)})
    a = hdr_quantiles(rd.from_pandas(df).repartition(3), "v", [0.5], sig=3)
    b = hdr_quantiles(rd.from_pandas(df).repartition(7), "v", [0.5], sig=3)
    assert a["value_scaled"].tolist() == b["value_scaled"].tolist()


def test_approx_set_overlap_tolerance(ray_session):
    """HLL inclusion–exclusion overlap vs exact sets: union/side cards
    within ~2% at p=14, intersection within 10% when the overlap is a
    substantial fraction of the union."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sketch import approx_set_overlap

    rng = np.random.RandomState(13)
    a = np.unique(rng.randint(0, 10**9, 30000))
    b = np.concatenate([a[: len(a) // 2],
                        np.unique(rng.randint(10**9, 2 * 10**9, 15000))])
    ds_a = rd.from_arrow(pa.table({"k": a})).repartition(4)
    ds_b = rd.from_arrow(pa.table({"k": b})).repartition(3)
    got = approx_set_overlap(ds_a, ds_b, "k", "k").iloc[0]
    exact_u = len(np.union1d(a, b))
    exact_i = len(np.intersect1d(a, b))
    assert abs(got.card_a - len(a)) / len(a) < 0.02
    assert abs(got.card_b - len(b)) / len(b) < 0.02
    assert abs(got.card_union - exact_u) / exact_u < 0.02
    assert abs(got.card_intersect - exact_i) / exact_i < 0.10
