"""Raw-text log ingestion over the reference's checked-in fixture corpus
(/root/reference/tests/test_logs — read in place, skipped when absent, the
same guard the reference's own sample_logs_tests.rs:7-12 applies).

Covers SURVEY §2.1 S1 text parity: ray.data.read_text → ParseStage over
.log/.json files must reproduce the single-process oracle, including the
known ERROR spike in hour 2025-03-21 04 of lrg/app_errors-0.log
(tests/sample_logs_tests.rs:72-93).
"""
import os

import pytest

from timberjack_ray import oracle
from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.pipelines.analyze import analyze_text, sample_text_lines

FIXTURES = "/root/reference/tests/test_logs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixture corpus not present"
)


def _lines(path):
    with open(path, encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f]


def _trend_dict(report):
    return {t["timestamp"]: t["count"] for t in (report["time_trends"] or [])}


def _level_dict(report):
    return {l["level"]: l["count"] for l in report["stats"]["log_levels"]}


def test_sample_log_stats_matches_oracle(ray_session):
    path = os.path.join(FIXTURES, "sample.log")
    res = analyze_text(path, AnalyzeConfig(stats=True, trend=True, collect_lines=False))
    assert res.fmt == "generic"
    o = oracle.analyze_lines(_lines(path), fmt="generic",
                             collect_trends=True, collect_stats=True)
    assert res.report["total_count"] == o.count
    assert _level_dict(res.report) == o.levels_count
    assert _trend_dict(res.report) == o.time_trends
    assert res.report["stats"]["unique_messages_count"] == len(o.unique_messages)


def test_json_log_autodetect_and_levels(ray_session):
    path = os.path.join(FIXTURES, "json_log.json")
    res = analyze_text(path, AnalyzeConfig(stats=True, collect_lines=False))
    assert res.fmt == "json"
    o = oracle.analyze_lines(_lines(path), fmt="json", collect_stats=True)
    assert res.report["total_count"] == o.count
    assert _level_dict(res.report) == o.levels_count


def test_large_log_error_spike(ray_session):
    """The reference's spike assertion: --level ERROR --trend on
    lrg/app_errors-0.log peaks in hour 2025-03-21 04."""
    path = os.path.join(FIXTURES, "lrg", "app_errors-0.log")
    res = analyze_text(path, AnalyzeConfig(level="ERROR", trend=True, collect_lines=False))
    trends = _trend_dict(res.report)
    assert trends, "expected time trends"
    spike_hour = max(trends, key=lambda k: trends[k])
    assert spike_hour == "2025-03-21 04"
    o = oracle.analyze_lines(_lines(path), fmt="generic", level="ERROR",
                             collect_trends=True)
    assert res.report["total_count"] == o.count
    assert trends == o.time_trends


def test_medium_log_pattern_and_count(ray_session):
    path = os.path.join(FIXTURES, "med", "web_server-0.log")
    lines = _lines(path)
    # pattern filter parity
    res = analyze_text(path, AnalyzeConfig(pattern="GET", collect_lines=False))
    o = oracle.analyze_lines(lines, fmt="generic", pattern="GET")
    assert res.report["total_count"] == o.count
    # --count fast path parity (no parser, no fields — the reference quirk)
    res_c = analyze_text(path, AnalyzeConfig(count=True, pattern="GET"))
    assert res_c.report["total_count"] == oracle.count_only(lines, pattern="GET")


def test_text_glob_multi_file(ray_session):
    """A glob of all three sized fixtures sums to the per-file oracle totals."""
    paths = [os.path.join(FIXTURES, "sml", "app-0.log"),
             os.path.join(FIXTURES, "med", "web_server-0.log"),
             os.path.join(FIXTURES, "lrg", "app_errors-0.log")]
    res = analyze_text(paths, AnalyzeConfig(stats=True, collect_lines=False))
    expect = sum(oracle.analyze_lines(_lines(p), fmt="generic", collect_stats=True).count
                 for p in paths)
    assert res.report["total_count"] == expect


def test_text_routing_persists_lines(ray_session, tmp_path):
    """Routing a raw-text input: sinks must carry the line column (no token
    payload to re-derive it from) and resume must not reprocess."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(FIXTURES, "lrg", "app_errors-0.log")
    out = str(tmp_path / "routed")
    cfg = AnalyzeConfig(stats=True, trend=True, collect_lines=False)
    res = analyze_text(path, cfg, out_dir=out, num_partitions=8)
    files = glob.glob(os.path.join(out, "*=*", "*.parquet"))
    assert files
    cols = set(pq.ParquetFile(files[0]).schema_arrow.names)
    assert "line" in cols
    routed_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert routed_rows == res.report["total_count"]


def test_sample_text_lines_head():
    lines = sample_text_lines([os.path.join(FIXTURES, "sample.log")])
    assert 0 < len(lines) <= 10
    assert lines[0].startswith("2025-03-21")


def test_empty_text_file(ray_session, tmp_path):
    """error_tests.rs test_empty_file: empty input → 'Felled: 0 logs'."""
    p = tmp_path / "empty.log"
    p.write_text("")
    res = analyze_text(str(p), AnalyzeConfig())
    assert res.report["total_count"] == 0


def test_malformed_text_line(ray_session, tmp_path):
    """error_tests.rs test_malformed_log: an unstructured line still counts."""
    p = tmp_path / "odd.log"
    p.write_text("This is not a properly formatted log line\n")
    res = analyze_text(str(p), AnalyzeConfig(stats=True))
    assert res.report["total_count"] == 1
    assert {l["level"]: l["count"] for l in res.report["stats"]["log_levels"]} == {"": 1}


def test_nonexistent_file_cli():
    """error_tests.rs test_nonexistent_file: CLI path resolution fails loudly."""
    from timberjack_ray.cli import resolve_paths

    with pytest.raises(FileNotFoundError):
        resolve_paths("/no/such/file.log")


def test_encode_batch_arrow_matches_scalar_on_fixtures():
    import pyarrow as pa

    from timberjack_ray import vocab

    path = os.path.join(FIXTURES, "sample.log")
    lines = _lines(path)
    # fixture lines may contain words the vocab can't encode char-wise;
    # compare only on lines the scalar encoder accepts
    ok_lines = []
    for ln in lines:
        try:
            vocab.encode(ln)
            ok_lines.append(ln)
        except ValueError:
            pass
    assert ok_lines
    a = vocab.encode_batch_arrow(pa.array(ok_lines, pa.string()))
    b = vocab.encode_batch(ok_lines)
    assert a.to_pylist() == b.to_pylist()


def test_ingest_roundtrip_matches_text_analysis(ray_session, tmp_path):
    """ingest → sequences parquet → analyze_parquet must reproduce
    analyze_text over the same raw file (level counts + trend buckets)."""
    import glob

    from timberjack_ray.pipelines.analyze import analyze_parquet
    from timberjack_ray.pipelines.ingest import ingest_text

    path = os.path.join(FIXTURES, "sample.log")
    out_dir = str(tmp_path / "seq")
    stats = ingest_text([path], out_dir)
    assert stats["files"] == 1 and stats["rows"] > 0
    cfg = AnalyzeConfig(stats=True, trend=True, collect_lines=False)
    via_parquet = analyze_parquet(
        sorted(glob.glob(os.path.join(out_dir, "*.parquet"))), cfg).report
    via_text = analyze_text(path, cfg).report
    assert _level_dict(via_parquet) == _level_dict(via_text)
    assert _trend_dict(via_parquet) == _trend_dict(via_text)
    # idempotent resume: second run skips the finished file
    again = ingest_text([path], out_dir)
    assert again == {"files": 0, "skipped": 1, "rows": 0}


def test_ingest_multifile_corpus_matches_text_analysis(ray_session, tmp_path):
    """Whole fixture corpus (4 files) through ingest → analyze must equal
    analyze_text over the raw files — multi-file parallel ingest parity."""
    import glob

    from timberjack_ray.pipelines.analyze import analyze_parquet
    from timberjack_ray.pipelines.ingest import ingest_text

    paths = sorted(glob.glob(os.path.join(FIXTURES, "*/*.log"))) \
        + [os.path.join(FIXTURES, "sample.log")]
    out_dir = str(tmp_path / "seq")
    stats = ingest_text(paths, out_dir)
    assert stats["files"] == len(paths)
    cfg = AnalyzeConfig(stats=True, collect_lines=False)
    via_parquet = analyze_parquet(
        sorted(glob.glob(os.path.join(out_dir, "*.parquet"))), cfg).report
    via_text = analyze_text(paths, cfg).report
    assert _level_dict(via_parquet) == _level_dict(via_text)


def test_ingest_same_stem_different_dirs_no_overwrite(ray_session, tmp_path):
    """Two inputs with the SAME basename must produce distinct outputs and
    distinct doc_ids (review finding: stem-only naming silently lost one)."""
    from timberjack_ray.pipelines.ingest import ingest_text

    a = tmp_path / "a"; a.mkdir(); b = tmp_path / "b"; b.mkdir()
    (a / "app.log").write_text("ERROR one\nWARN two\n")
    (b / "app.log").write_text("INFO x\nINFO y\nINFO z\n")
    out_dir = str(tmp_path / "seq")
    stats = ingest_text([str(a / "app.log"), str(b / "app.log")], out_dir)
    assert stats == {"files": 2, "skipped": 0, "rows": 5}
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    assert len(files) == 2
    ids = []
    for f in files:
        ids.extend(pq.read_table(f)["doc_id"].to_pylist())
    assert len(ids) == len(set(ids)) == 5
    # resume skips both now
    again = ingest_text([str(a / "app.log"), str(b / "app.log")], out_dir)
    assert again == {"files": 0, "skipped": 2, "rows": 0}


def test_ingest_skips_unencodable_lines_keeps_raw_line_numbers(
        ray_session, tmp_path):
    from timberjack_ray.pipelines.ingest import ingest_text

    p = tmp_path / "mix.log"
    p.write_text("ERROR ok zero\nINFO bad ☃ snowman\nWARN ok two\n",
                 encoding="utf-8")
    out_dir = str(tmp_path / "seq")
    stats = ingest_text([str(p)], out_dir)
    assert stats["rows"] == 2  # the snowman line is dropped, like the
    import glob                # reference skips invalid UTF-8

    import pyarrow.parquet as pq

    t = pq.read_table(glob.glob(os.path.join(out_dir, "*.parquet"))[0])
    nums = [d.split(":")[-1] for d in t["doc_id"].to_pylist()]
    assert nums == ["00000000", "00000002"]  # raw-file line numbers kept


def test_analyze_corpus_with_empty_leading_file(ray_session, tmp_path):
    """An all-empty FIRST parquet (ingested empty log / empty routed shard)
    must not crash the format probe (review r03: StopIteration)."""
    import glob

    from timberjack_ray.pipelines.analyze import analyze_parquet
    from timberjack_ray.pipelines.ingest import ingest_text

    (tmp_path / "aa_empty.log").write_text("")
    (tmp_path / "zz_data.log").write_text("[ERROR] boom\n[INFO] fine\n")
    out_dir = str(tmp_path / "seq")
    stats = ingest_text([str(tmp_path / "aa_empty.log"),
                         str(tmp_path / "zz_data.log")], out_dir)
    assert stats["rows"] == 2
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    r = analyze_parquet(files, AnalyzeConfig(stats=True,
                                             collect_lines=False))
    assert _level_dict(r.report) == {"ERROR": 1, "INFO": 1}


def test_gzip_log_matches_plain(ray_session, tmp_path):
    """A .gz rotated log analyzes identically to its plain twin (stream
    decompression inside the read task; head-sample format probe also
    decompresses)."""
    import gzip
    import shutil

    src = os.path.join(FIXTURES, "sample.log")
    gz = str(tmp_path / "sample.log.gz")
    with open(src, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    plain = analyze_text(src, AnalyzeConfig(stats=True, collect_lines=False))
    zipped = analyze_text(gz, AnalyzeConfig(stats=True, collect_lines=False))
    assert zipped.fmt == plain.fmt == "generic"
    assert zipped.report["total_count"] == plain.report["total_count"]
    assert _level_dict(zipped.report) == _level_dict(plain.report)


def test_jsonl_roundtrip(ray_session, tmp_path):
    """documents → JSONL shards → read back: identical rows (the export/
    interchange surface for curated corpora)."""
    import pandas as pd
    import ray.data as rd

    from timberjack_ray.pipelines.ingest import export_jsonl, read_jsonl

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "source"])
    out = str(tmp_path / "jsonl")
    export_jsonl(ds, out)
    files = sorted(str(p) for p in (tmp_path / "jsonl").iterdir())
    assert files, "no shards written"
    back = read_jsonl(files).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    orig = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["doc_id", "text", "source"]],
                                  orig[["doc_id", "text", "source"]])
