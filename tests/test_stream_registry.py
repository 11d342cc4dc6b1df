"""S2 streaming path (stream.analyze_stream vs the line-at-a-time oracle)
and the §2.10 user-extension parser registry."""

import pyarrow as pa
import pytest

from timberjack_ray import AnalyzeConfig, kernels, oracle
from timberjack_ray.registry import ParserRegistry, default_registry
from timberjack_ray.stream import analyze_stream

LINES = [oracle_line for oracle_line in (
    [f"2025-03-01 0{h}:00:00 [ERROR] NullPointerException at step {i}"
     for h in range(4) for i in range(3)]
    + [f"2025-03-01 05:00:00 [INFO] all good {i}" for i in range(5)]
    + ["ERROR: colon-form failure", "plain line no level", ""]
)]


def test_stream_matches_oracle():
    o = oracle.analyze_lines([ln for ln in LINES], fmt="generic",
                             collect_trends=True, collect_stats=True)
    rep = analyze_stream(iter(LINES), AnalyzeConfig(trend=True, stats=True),
                         chunk_rows=7)
    assert rep["total_count"] == o.count
    assert {d["timestamp"]: d["count"] for d in rep["time_trends"]} == o.time_trends
    assert {d["level"]: d["count"] for d in rep["stats"]["log_levels"]} == o.levels_count
    assert rep["stats"]["unique_messages_count"] == len(o.unique_messages)
    assert rep["deduplicated"] is True
    # matched-lines sample is a set (stdin quirk, src/main.rs:258-261)
    lines_in_sample = [d["line"] for d in rep["matched_lines"]]
    assert len(lines_in_sample) == len(set(lines_in_sample))


def test_stream_filters():
    rep = analyze_stream(iter(LINES), AnalyzeConfig(level="ERROR"), chunk_rows=5)
    o = oracle.analyze_lines(LINES, fmt="generic", level="ERROR")
    assert rep["total_count"] == o.count


def test_registry_detection_order():
    reg = ParserRegistry()
    assert reg.detect(['{"timestamp": "t", "level": "info"}'] * 5) == "json"
    assert reg.detect(["plain text"] * 5) == "generic"
    assert reg.names() == ["json", "generic"]


class KvParser:
    """Custom format: 'ts=<ts> level=<LVL> msg'."""

    name = "kv"

    def can_parse(self, sample_lines):
        return all("level=" in s for s in sample_lines if s)

    def parse_batch(self, table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lv = pc.struct_field(
            pc.extract_regex(table["line"], r"level=(?P<lv>[A-Z]+)"), "lv")
        ts = pc.struct_field(
            pc.extract_regex(table["line"], r"ts=(?P<ts>\S+)"), "ts")
        return table.append_column("level", lv).append_column("ts", ts)


def test_custom_parser_in_stream():
    default_registry().register(KvParser())
    try:
        kv_lines = [f"ts=2025-03-01T0{i % 3}:00 level=WARN something" for i in range(10)]
        assert default_registry().detect(kv_lines) == "kv"
        rep = analyze_stream(iter(kv_lines), AnalyzeConfig(fmt="kv", stats=True, trend=True))
        assert rep["total_count"] == 10
        assert {d["level"]: d["count"] for d in rep["stats"]["log_levels"]} == {"WARN": 10}
        assert {d["timestamp"] for d in rep["time_trends"]} == {
            "2025-03-01T00", "2025-03-01T01", "2025-03-01T02"}
    finally:
        default_registry()._parsers.remove(
            next(p for p in default_registry()._parsers if p.name == "kv"))


def test_custom_parser_distributed(ray_session):
    """A registered parser rides into map_batches workers via cloudpickle.
    Defined inline: classes from a test module pickle by reference, which
    workers can't import — real user parsers live in importable modules."""
    import ray.data as rd

    from timberjack_ray.pipelines.analyze import analyze_dataset

    class LocalKvParser:
        name = "kv"

        def can_parse(self, sample_lines):
            return all("level=" in s for s in sample_lines if s)

        def parse_batch(self, table):
            import pyarrow.compute as pc

            lv = pc.struct_field(
                pc.extract_regex(table["line"], r"level=(?P<lv>[A-Z]+)"), "lv")
            ts = pc.struct_field(
                pc.extract_regex(table["line"], r"ts=(?P<ts>\S+)"), "ts")
            return table.append_column("level", lv).append_column("ts", ts)

    LocalKvParser.__module__ = "__main__"  # force cloudpickle by-value
    LocalKvParser.__qualname__ = "LocalKvParser"
    default_registry().register(LocalKvParser())
    try:
        rows = [{"line": f"ts=2025-03-01T00:00 level=ERROR boom {i}"} for i in range(50)]
        ds = rd.from_items(rows)
        out = analyze_dataset(ds, AnalyzeConfig(fmt="kv", stats=True))
        assert out.report["total_count"] == 50
        levels = {d["level"]: d["count"] for d in out.report["stats"]["log_levels"]}
        assert levels == {"ERROR": 50}
    finally:
        default_registry()._parsers.remove(
            next(p for p in default_registry()._parsers if p.name == "kv"))
