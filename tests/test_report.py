"""Report shape + text rendering parity (formatter.rs golden substrings)."""

import fixtures
from timberjack_ray import AnalyzeConfig, oracle, render_text
from timberjack_ray.report import assemble_report
import pandas as pd


def counts_from_oracle(o: oracle.OracleResult) -> pd.DataFrame:
    rows = [("total", "", o.count)]
    rows += [("line", k, v) for k, v in o.line_counts.items()]
    rows += [("level", k, v) for k, v in o.levels_count.items()]
    rows += [("trend", k, v) for k, v in o.time_trends.items()]
    rows += [("error", k, v) for k, v in o.error_types.items()]
    rows += [("msg", k, 1) for k in o.unique_messages]
    return pd.DataFrame(rows, columns=["kind", "key", "n"])


def test_text_output_golden_substrings():
    lines = fixtures.CLI_BASIC + fixtures.TREND_LINES
    o = oracle.analyze_lines(lines, fmt="generic", collect_trends=True, collect_stats=True)
    cfg = AnalyzeConfig(trend=True, stats=True)
    text = render_text(assemble_report(counts_from_oracle(o), cfg))
    assert "Felled: 5 logs" in text
    assert "Time trends:" in text
    assert "2025-03-21 14" in text and "2025-03-21 15" in text
    assert "Stats summary:" in text
    assert "Log levels:" in text
    assert "Top error types:" in text
    assert "Unique messages:" in text
    assert "Timber finished chopping the log!" in text
    # dedup display: repeated line shows [xN]
    assert "[x2]" in text  # NullPointerException line appears twice


def test_chop_text():
    o = oracle.analyze_lines(fixtures.CLI_BASIC, fmt="generic", pattern="ERROR")
    text = render_text(assemble_report(counts_from_oracle(o), AnalyzeConfig(pattern="ERROR")))
    assert "NullPointerException" in text
    assert "Felled: 1 logs" in text
    assert "Some warning" not in text


def test_json_report_shape():
    o = oracle.analyze_lines(fixtures.CLI_BASIC, fmt="generic", collect_stats=True)
    rep = assemble_report(counts_from_oracle(o), AnalyzeConfig(stats=True, show_unique=True))
    assert set(rep) == {"matched_lines", "total_count", "time_trends", "stats", "deduplicated"}
    assert rep["deduplicated"] is True
    st = rep["stats"]
    assert set(st) == {"log_levels", "error_types", "unique_messages_count",
                       "repetition_ratio", "unique_messages"}
    for i, et in enumerate(st["error_types"]):
        assert et["rank"] == i + 1


def test_repetition_ratio_zero_when_empty():
    o = oracle.analyze_lines([], fmt="generic", collect_stats=True)
    rep = assemble_report(counts_from_oracle(o), AnalyzeConfig(stats=True))
    assert rep["stats"]["repetition_ratio"] == 0.0
    assert rep["total_count"] == 0


def test_top_errors_limit():
    lines = [
        f"2025-03-21 14:00:0{i % 10},000 [ERROR] Fake{chr(65 + i)}Exception here"
        for i in range(8)
    ]
    o = oracle.analyze_lines(lines, fmt="generic", collect_stats=True)
    rep = assemble_report(counts_from_oracle(o), AnalyzeConfig(stats=True, top_errors=3))
    assert len(rep["stats"]["error_types"]) == 3
    rep_big = assemble_report(counts_from_oracle(o), AnalyzeConfig(stats=True, top_errors=1_000_000))
    assert len(rep_big["stats"]["error_types"]) == 8
