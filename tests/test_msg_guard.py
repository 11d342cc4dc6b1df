"""Cardinality auto-guard for the distinct-message family (VERDICT r01 #4):
past MSG_GUARD_LIMIT distinct msg# keys the driver fold degrades to a
mergeable HyperLogLog, bounding driver memory; the report records the path.
"""
import pyarrow as pa

from timberjack_ray import aggregates as agg
from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.pipelines.analyze import _merge_counts
from timberjack_ray.report import assemble_report


def _doc_table(n, prefix="msg"):
    return pa.table({
        "level": pa.array(["INFO"] * n, pa.string()),
        "error_type": pa.array([None] * n, pa.string()),
        "message_key": pa.array([f"{prefix}-{i}" for i in range(n)], pa.string()),
    })


def test_msg_guard_degrades_to_hll(ray_session, monkeypatch):
    import ray.data as rd

    monkeypatch.setattr(agg, "MSG_GUARD_LIMIT", 1_000)
    n = 20_000
    ds = rd.from_arrow(_doc_table(n)).repartition(16)
    tbl = agg.report_counts(ds, want_stats=True, as_table=True)
    kinds = set(tbl["kind"].to_pylist())
    assert agg.KIND_MSG_SKETCH in kinds          # the switch fired
    assert agg.KIND_MSG_HASH not in kinds        # exact keys were evicted
    # exact fold stayed bounded: no high-cardinality family remains
    assert tbl.num_rows < 100

    counts, unique, approx = _merge_counts([tbl], AnalyzeConfig(stats=True))
    assert approx is True
    assert abs(unique - n) / n < 0.05            # within HLL tolerance at p=14

    rep = assemble_report(counts, AnalyzeConfig(stats=True),
                          unique_count=unique, unique_approx=approx)
    assert rep["stats"]["unique_messages_approx"] is True
    assert rep["stats"]["unique_messages_count"] == unique


def test_msg_guard_not_triggered_below_limit(ray_session, monkeypatch):
    import ray.data as rd

    monkeypatch.setattr(agg, "MSG_GUARD_LIMIT", 1_000_000)
    n = 5_000
    ds = rd.from_arrow(_doc_table(n)).repartition(4)
    tbl = agg.report_counts(ds, want_stats=True, as_table=True)
    kinds = set(tbl["kind"].to_pylist())
    assert agg.KIND_MSG_SKETCH not in kinds
    counts, unique, approx = _merge_counts([tbl], AnalyzeConfig(stats=True))
    assert approx is False and unique == n       # exact path, exact count


def test_degraded_frame_absorbs_exact_frames(ray_session, monkeypatch):
    """A degraded wave's sketch merged with a non-degraded wave's exact msg#
    keys estimates the UNION (same pd.util.hash_array space)."""
    import ray.data as rd

    monkeypatch.setattr(agg, "MSG_GUARD_LIMIT", 500)
    # wave 1: 10k distinct (degrades); wave 2: 10k distinct, 5k overlapping
    t1 = agg.report_counts(rd.from_arrow(_doc_table(10_000, "a")).repartition(8),
                           want_stats=True, as_table=True)
    monkeypatch.setattr(agg, "MSG_GUARD_LIMIT", 1_000_000)
    half_overlap = pa.table({
        "level": pa.array(["INFO"] * 10_000, pa.string()),
        "error_type": pa.array([None] * 10_000, pa.string()),
        "message_key": pa.array(
            [f"a-{i}" for i in range(5_000)] + [f"b-{i}" for i in range(5_000)],
            pa.string()),
    })
    t2 = agg.report_counts(rd.from_arrow(half_overlap).repartition(4),
                           want_stats=True, as_table=True)
    assert agg.KIND_MSG_SKETCH in set(t1["kind"].to_pylist())
    assert agg.KIND_MSG_HASH in set(t2["kind"].to_pylist())
    counts, unique, approx = _merge_counts([t1, t2], AnalyzeConfig(stats=True))
    assert approx is True
    assert abs(unique - 15_000) / 15_000 < 0.05  # union, not sum
