"""Router / lineage / resume invariants (north_rule):
per-sink aggregate-count equality, routed-row token equality,
resume-from-checkpoint without reprocessing completed partitions."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from timberjack_ray import AnalyzeConfig, oracle
from timberjack_ray.data import synth
from timberjack_ray.pipelines.analyze import analyze_parquet
from timberjack_ray.stages.route import AssignPartition, build_salt_map, completed_pids

N = 8000
SEQ = "/tmp/tj_test_seq"
OUT = "/tmp/tj_test_routed"


@pytest.fixture(scope="module")
def seq_paths(ray_session):
    shutil.rmtree(SEQ, ignore_errors=True)
    synth.generate_sequences(N, SEQ, json_frac=0.0, rows_per_file=1000)
    return sorted(glob.glob(SEQ + "/part-*.parquet"))


@pytest.fixture(scope="module")
def routed(seq_paths):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = AnalyzeConfig(trend=True, stats=True)
    out = analyze_parquet(
        seq_paths, cfg, out_dir=OUT, lookup=synth.source_lookup_dict(), num_partitions=12
    )
    return out


@pytest.fixture(scope="module")
def oracle_result():
    return oracle.analyze_lines(
        [synth.line_for(i) for i in range(N)], fmt="generic",
        collect_trends=True, collect_stats=True,
    )


def test_per_sink_counts_match_levels(routed, oracle_result):
    per_level = routed.route_metrics.groupby("level")["rows"].sum().to_dict()
    assert per_level == oracle_result.levels_count
    got = {d["level"]: d["count"] for d in routed.report["stats"]["log_levels"]}
    assert got == oracle_result.levels_count


def test_lineage_records_complete(routed):
    pids = completed_pids(OUT)
    assert pids == set(routed.route_metrics["pid"].unique())
    for pid in pids:
        with open(os.path.join(OUT, "_lineage", f"{pid:05d}.json")) as f:
            lin = json.load(f)
        assert lin["pid"] == pid
        assert lin["rows"] == sum(v["rows"] for v in lin["per_level"].values())
        for lv, meta in lin["per_level"].items():
            from timberjack_ray.stages.route import _sanitize

            path = os.path.join(OUT, f"level={_sanitize(lv)}", f"part-{pid:05d}.parquet")
            t = pq.read_table(path)
            assert t.num_rows == meta["rows"]
            assert int(pc.sum(pc.list_flatten(t["tokens"])).as_py() or 0) == meta["token_sum"]


def test_routed_rows_token_equality(routed):
    """Per-row invariant vs the reference input: routed rows carry the exact
    original token arrays (BASELINE.json input_hint)."""
    f = sorted(glob.glob(OUT + "/level=ERROR/part-*.parquet"))[0]
    t = pq.read_table(f)
    for row in t.slice(0, 200).to_pylist():
        i = int(row["doc_id"].split("-")[1])
        assert row["tokens"] == synth.make_batch(i, i + 1)["tokens"][0].as_py()
        assert row["level"] == "ERROR"


def test_total_routed_rows(routed, oracle_result):
    assert routed.route_metrics["rows"].sum() == oracle_result.count
    assert routed.report["total_count"] == oracle_result.count


def test_resume_skips_completed(seq_paths, routed, oracle_result):
    all_pids = completed_pids(OUT)
    victims = sorted(all_pids)[:3]
    for pid in victims:
        os.remove(os.path.join(OUT, "_lineage", f"{pid:05d}.json"))
        for f in glob.glob(OUT + f"/level=*/part-{pid:05d}.parquet"):
            os.remove(f)
    cfg = AnalyzeConfig(trend=True, stats=True)
    out2 = analyze_parquet(
        seq_paths, cfg, out_dir=OUT, lookup=synth.source_lookup_dict(), num_partitions=12
    )
    assert out2.skipped_partitions == len(all_pids) - 3
    assert set(out2.route_metrics["pid"].unique()) == set(victims)
    # aggregates over the re-completed output are identical
    assert out2.report["total_count"] == oracle_result.count
    assert {d["level"]: d["count"] for d in out2.report["stats"]["log_levels"]} == oracle_result.levels_count
    assert completed_pids(OUT) == all_pids


def test_salted_partitioning_spreads_hot_source(ray_session):
    t = synth.sequences_table(4000)
    shares = {"app-0": 0.3, "app-1": 0.04}
    salt_map = build_salt_map(shares, num_partitions=16, hot_threshold=0.05)
    assert salt_map["app-0"] >= 2 and "app-1" not in salt_map
    stage = AssignPartition(16, salt_map)
    out = stage(t)
    hot = out.filter(pc.equal(out["source"], "app-0"))
    hot_pids = set(hot["__pid"].to_pylist())
    assert len(hot_pids) >= salt_map["app-0"] // 2  # spread over several partitions
    cold = out.filter(pc.equal(out["source"], "app-3"))
    assert len(set(cold["__pid"].to_pylist())) == 1  # cold sources stay co-located
    # deterministic across calls (stable hashes, no per-process salt)
    out2 = AssignPartition(16, salt_map)(t)
    assert out["__pid"].to_pylist() == out2["__pid"].to_pylist()
