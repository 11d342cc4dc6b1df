"""Round-3 validation/profiling operators over planted dirty data."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def test_validate_counts_planted_violations(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.validate import validate

    t = pa.table({
        "v": pa.array([1.0, -2.0, 50.0, None, 7.0], pa.float64()),
        "k": pa.array([1, 2, 3, 99, 99], pa.int64()),
    })
    ok_keys = pa.array([1, 2, 3], pa.int64())
    out = validate(rd.from_arrow(t).repartition(3), {
        # null v is an uncheckable row → violation by contract
        "v_nonneg": lambda b: pc.less(b["v"], 0.0),
        "k_known": lambda b: pc.invert(pc.is_in(b["k"], value_set=ok_keys)),
    })
    got = {r["rule"]: (r["n_checked"], r["n_violations"])
           for _, r in out.iterrows()}
    assert got == {"v_nonneg": (5, 2), "k_known": (5, 2)}


def test_grouped_centroid_sums_matches_numpy(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import grouped_centroid_sums

    rng = np.random.RandomState(11)
    m = rng.randn(200, 8).astype(np.float32)
    labels = rng.randint(0, 4, 200)
    t = pa.table({"label": pa.array(labels.astype("int64")),
                  "embedding": pa.array(list(m))})
    out = grouped_centroid_sums(rd.from_arrow(t).repartition(5),
                                "label", "embedding", scale=1e6)
    want = np.floor(m.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for lab in range(4):
        sums = want[labels == lab].sum(axis=0)
        sub = out[out["label"] == lab].sort_values("dim")
        assert (sub["sum_scaled"].to_numpy() == sums).all()
        assert (sub["n"] == (labels == lab).sum()).all()
        assert list(sub["dim"]) == list(range(1, 9))


def test_profile_numeric_nulls_and_merge(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.validate import profile_numeric

    t = pa.table({
        "a": pa.array([5, None, -3, 12, None], pa.int64()),
        "b": pa.array([0.5, 0.25, 9.75, -1.5, 2.0], pa.float64()),
    })
    out = profile_numeric(rd.from_arrow(t).repartition(4), ["a", "b"])
    rows = {r["column"]: r for _, r in out.iterrows()}
    assert rows["a"]["n"] == 5 and rows["a"]["n_null"] == 2
    assert rows["a"]["min_v"] == -3.0 and rows["a"]["max_v"] == 12.0
    assert rows["b"]["n_null"] == 0
    assert rows["b"]["min_v"] == -1.5 and rows["b"]["max_v"] == 9.75


def test_fk_orphan_count_both_plans(ray_session):
    """fk_orphan_count: broadcast probe and anti-join exchange agree on a
    planted-orphan table, including null child keys (never violations)
    and duplicated parent keys (must not double-count)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.validate import fk_orphan_count

    child = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 99, 100, None, 1], pa.int64())})) \
        .repartition(3)
    parent = rd.from_arrow(pa.table({
        "p": pa.array([1, 2, 3, 3, 4], pa.int64())})).repartition(2)
    # orphans: 99, 100 (the None is not a violation) -> 2 of 8 rows
    for limit in (2_000_000, 0):
        got = fk_orphan_count(child, "k", parent, "p", n_buckets=4,
                              parent_broadcast_limit=limit)
        assert got == (8, 2), (limit, got)


def test_fk_orphan_count_empty_parent(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.validate import fk_orphan_count

    child = rd.from_arrow(pa.table({"k": pa.array([5, 6], pa.int64())}))
    parent = rd.from_arrow(pa.table({"p": pa.array([], pa.int64())}))
    assert fk_orphan_count(child, "k", parent, "p",
                           parent_broadcast_limit=2_000_000) == (2, 2)


def test_fk_orphan_probe_multi_one_scan_two_fks(ray_session):
    """fk_orphan_probe_multi: one pass over a two-FK fact table probes
    both dimensions; counts match per-relation fk_orphan_count."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from timberjack_ray.functions.validate import (fk_orphan_count,
                                                   fk_orphan_probe_multi)

    child = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 9, None, 1], pa.int64()),
        "b": pa.array([10, 20, 77, 10, 20, None], pa.int64())})) \
        .repartition(3)
    pa_keys = np.array([1, 2, 3], dtype=np.int64)
    pb_keys = np.array([10, 20], dtype=np.int64)
    res = fk_orphan_probe_multi(
        child, [("a", ray.put(pa_keys)), ("b", ray.put(pb_keys))])
    # a-orphans: 9 (None skipped) -> 1; b-orphans: 77 -> 1
    assert res == [(6, 1), (6, 1)], res
    pda = rd.from_arrow(pa.table({"p": pa.array([1, 2, 3], pa.int64())}))
    assert fk_orphan_count(child, "a", pda, "p") == res[0]
