"""Pipeline ⇄ oracle conformance — the distributed Ray pipeline must produce
the oracle's exact aggregates for every filter combination ported from the
reference CLI test suite (SURVEY.md §5)."""

import pyarrow as pa
import pytest

import fixtures
from timberjack_ray import AnalyzeConfig, analyze_dataset, oracle, vocab
from timberjack_ray.data import synth


def make_ds(lines):
    import ray.data as rd

    toks = vocab.encode_batch(lines)
    t = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:010d}" for i in range(len(lines))]),
            "tokens": toks,
            "n_tok": pa.array(toks.value_lengths(), type=pa.int32()),
            "source": pa.array([f"app-{i % 3}" for i in range(len(lines))]),
        }
    )
    return rd.from_arrow(t)


def assert_match(out, o: oracle.OracleResult, cfg: AnalyzeConfig):
    assert out.report["total_count"] == o.count
    lc = {d["line"]: d["count"] for d in out.report["matched_lines"]}
    assert lc == o.line_counts
    if cfg.trend:
        got = {d["timestamp"]: d["count"] for d in (out.report["time_trends"] or [])}
        assert got == o.time_trends
    if cfg.stats:
        st = out.report["stats"]
        assert {d["level"]: d["count"] for d in st["log_levels"]} == o.levels_count
        exp_err = dict(sorted(o.error_types.items(), key=lambda kv: (-kv[1], kv[0]))[: cfg.top_errors])
        assert {d["error_type"]: d["count"] for d in st["error_types"]} == exp_err
        assert st["unique_messages_count"] == len(o.unique_messages)
        assert st["repetition_ratio"] == pytest.approx(oracle.repetition_ratio(o))
        if cfg.show_unique:
            assert st["unique_messages"] == sorted(o.unique_messages)


CASES = [
    # (lines, fmt, cfg kwargs, oracle kwargs)
    (fixtures.CLI_BASIC, "generic", dict(pattern="ERROR"), dict(pattern="ERROR")),
    (fixtures.CLI_BASIC, "generic", dict(level="WARN"), dict(level="WARN")),
    (fixtures.CLI_BASIC, "generic", dict(stats=True), dict(collect_stats=True)),
    (fixtures.TREND_LINES, "generic", dict(trend=True), dict(collect_trends=True)),
    (fixtures.CLI_BASIC, "generic", dict(pattern="ERROR", level="ERROR", trend=True, stats=True),
     dict(pattern="ERROR", level="ERROR", collect_trends=True, collect_stats=True)),
    (fixtures.MALFORMED, "generic", dict(), dict()),
    (fixtures.NON_ASCII, "generic", dict(stats=True, show_unique=True), dict(collect_stats=True)),
    (fixtures.COMPLEX_REGEX_LINES, "generic",
     dict(pattern=r"(?i)^.*\[(?:ERROR|WARN)\].*(?:Exception|timeout).*$"),
     dict(pattern=r"(?i)^.*\[(?:ERROR|WARN)\].*(?:Exception|timeout).*$")),
    (fixtures.COMPLEX_REGEX_LINES, "generic", dict(pattern=r"ID:\s+\w+-\d+-\w+"),
     dict(pattern=r"ID:\s+\w+-\d+-\w+")),
    (fixtures.MIXED_FORMATS, "generic", dict(level="ERROR"), dict(level="ERROR")),
    (fixtures.MIXED_FORMATS, "generic", dict(stats=True), dict(collect_stats=True)),
    (fixtures.MULTI_MATCH, "generic", dict(pattern="Error"), dict(pattern="Error")),
    (fixtures.LONG_LINE, "generic", dict(stats=True), dict(collect_stats=True)),
    (fixtures.JSON_LINES, "json", dict(stats=True, trend=True),
     dict(collect_stats=True, collect_trends=True)),
    (fixtures.JSON_LINES, "json", dict(level="ERROR"), dict(level="ERROR")),
    (fixtures.JSON_LINES, "json", dict(fields=["service=api"]),
     dict(field_filters={"service": "api"})),
    (fixtures.JSON_LINES, "json", dict(fields=["service=api", "user_id=12345"]),
     dict(field_filters={"service": "api", "user_id": "12345"})),
    (fixtures.JSON_LINES, "json", dict(fields=["user.role=admin"]),
     dict(field_filters={"user.role": "admin"})),
    (fixtures.JSON_LINES, "json", dict(fields=["error.type=NullPointerException"], stats=True),
     dict(field_filters={"error.type": "NullPointerException"}, collect_stats=True)),
]


@pytest.mark.parametrize("lines,fmt,cfg_kwargs,o_kwargs", CASES)
def test_fixture_conformance(ray_session, lines, fmt, cfg_kwargs, o_kwargs):
    cfg = AnalyzeConfig(fmt=fmt, **cfg_kwargs)
    out = analyze_dataset(make_ds(lines), cfg)
    o = oracle.analyze_lines(lines, fmt=fmt, **o_kwargs)
    assert_match(out, o, cfg)


def test_auto_detection_json(ray_session):
    cfg = AnalyzeConfig(fmt="auto", stats=True)
    out = analyze_dataset(make_ds(fixtures.JSON_LINES), cfg)
    assert out.fmt == "json"


def test_auto_detection_mixed_is_generic(ray_session):
    cfg = AnalyzeConfig(fmt="auto")
    out = analyze_dataset(make_ds(fixtures.MIXED_FORMATS), cfg)
    assert out.fmt == "generic"


def test_unsupported_format_raises(ray_session):
    # reference panics at get_parser().expect() for apache/syslog (main.rs:134-136)
    with pytest.raises(ValueError):
        analyze_dataset(make_ds(fixtures.CLI_BASIC), AnalyzeConfig(fmt="apache"))


@pytest.mark.parametrize("json_frac", [0.0, 0.3, 1.0])
@pytest.mark.parametrize(
    "cfg_kwargs,o_kwargs",
    [
        (dict(trend=True, stats=True), dict(collect_trends=True, collect_stats=True)),
        (dict(pattern="timeout", stats=True), dict(pattern="timeout", collect_stats=True)),
        (dict(level="ERROR", trend=True), dict(level="ERROR", collect_trends=True)),
        (dict(fields=["service=api"]), dict(field_filters={"service": "api"})),
    ],
)
def test_synth_conformance(ray_session, json_frac, cfg_kwargs, o_kwargs):
    n = 3000
    lines = [synth.line_for(i, json_frac) for i in range(n)]
    import ray.data as rd

    ds = rd.from_arrow(synth.sequences_table(n, json_frac)).repartition(5)
    fmt = oracle.kernels.detect_format(lines[:10])
    cfg = AnalyzeConfig(fmt="auto", **cfg_kwargs)
    out = analyze_dataset(ds, cfg)
    assert out.fmt == fmt
    o = oracle.analyze_lines(lines, fmt=fmt, **o_kwargs)
    assert_match(out, o, cfg)


@pytest.mark.parametrize(
    "cfg_kwargs,o_kwargs",
    [
        (dict(trend=True, stats=True), dict(collect_trends=True, collect_stats=True)),
        (dict(pattern="timeout", stats=True), dict(pattern="timeout", collect_stats=True)),
        (dict(level="ERROR", trend=True), dict(level="ERROR", collect_trends=True)),
        (dict(fields=["service=api"]), dict(field_filters={"service": "api"})),
    ],
)
def test_mixed_batch_json_split_conformance(ray_session, cfg_kwargs, o_kwargs):
    """fmt=json FORCED over a 50/50 generic/JSON stream pins the round-3
    mixed-batch split (columnar on the {-slice, vectorized non-dict
    semantics on the rest) against the per-line oracle."""
    n = 3000
    lines = [synth.line_for(i, 0.5) for i in range(n)]
    import ray.data as rd

    ds = rd.from_arrow(synth.sequences_table(n, 0.5)).repartition(5)
    cfg = AnalyzeConfig(fmt="json", **cfg_kwargs)
    out = analyze_dataset(ds, cfg)
    o = oracle.analyze_lines(lines, fmt="json", **o_kwargs)
    assert_match(out, o, cfg)


def test_count_mode_matches_oracle(ray_session):
    lines = [synth.line_for(i) for i in range(2000)]
    ds = make_ds(lines)
    for kwargs in [dict(), dict(pattern="ERROR"), dict(level="ERROR"),
                   dict(pattern="timeout", level="WARN")]:
        out = analyze_dataset(ds, AnalyzeConfig(count=True, **kwargs))
        assert out.report["total_count"] == oracle.count_only(lines, **kwargs)


def test_count_ignores_parser_and_fields(ray_session):
    # --count quirk (src/main.rs:306-313): JSON parsed levels unavailable
    out = analyze_dataset(make_ds(fixtures.JSON_LINES), AnalyzeConfig(count=True, level="ERROR"))
    assert out.report["total_count"] == 0


def test_empty_dataset(ray_session):
    out = analyze_dataset(make_ds([""]), AnalyzeConfig(stats=True, trend=True))
    assert out.report["total_count"] == 0
    assert out.report["stats"]["repetition_ratio"] == 0.0
