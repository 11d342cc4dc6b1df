import pyarrow as pa
import pytest

from timberjack_ray import vocab
import fixtures


ALL_FIXTURES = (
    fixtures.CLI_BASIC
    + fixtures.MALFORMED
    + fixtures.NON_ASCII
    + fixtures.COMPLEX_REGEX_LINES
    + fixtures.MIXED_FORMATS
    + fixtures.MULTI_MATCH
    + fixtures.LONG_LINE
    + fixtures.JSON_LINES
)


def test_roundtrip_fixture_lines():
    for line in ALL_FIXTURES:
        assert vocab.decode(vocab.encode(line)) == line


def test_roundtrip_preserves_runs_of_spaces():
    for line in ["a  b", " lead", "trail ", "", "   "]:
        assert vocab.decode(vocab.encode(line)) == line


def test_vectorized_detokenize_matches_scalar():
    arr = vocab.encode_batch(ALL_FIXTURES)
    assert vocab.detokenize(arr).to_pylist() == ALL_FIXTURES


def test_detokenize_sliced_and_chunked():
    arr = vocab.encode_batch(ALL_FIXTURES)
    sl = arr.slice(2, 5)
    assert vocab.detokenize(sl).to_pylist() == ALL_FIXTURES[2:7]
    ch = pa.chunked_array([arr.slice(0, 3), arr.slice(3, 4)])
    assert vocab.detokenize(ch).to_pylist() == ALL_FIXTURES[:7]


def test_unknown_high_codepoint_raises():
    with pytest.raises(ValueError):
        vocab.encode("☃☃☃")


def test_synth_batches_roundtrip():
    from timberjack_ray.data import synth

    t = synth.make_batch(0, 500, json_frac=0.4)
    lines = vocab.detokenize(t["tokens"].combine_chunks() if isinstance(t["tokens"], pa.ChunkedArray) else t["tokens"])
    expected = [synth.line_for(i, 0.4) for i in range(500)]
    assert lines.to_pylist() == expected
    assert t["n_tok"].to_pylist() == [len(vocab.encode(l)) for l in expected]


def test_oov_tokens_silently_skipped():
    """Rows with out-of-vocab token ids decode to null and are dropped by
    the parse stage — the analog of the reference skipping invalid-UTF-8
    lines (src/analyzer.rs:299-304)."""
    import pyarrow as pa

    from timberjack_ray import AnalyzeConfig
    from timberjack_ray.stages.parse import CountStage, ParseStage

    good = vocab.encode("2025-03-01 10:00:00 [ERROR] boom")
    batch = pa.table({
        "tokens": pa.array([good, [1, 999_999], [-5], good], type=pa.list_(pa.int32())),
        "doc_id": ["a", "b", "c", "d"],
    })
    assert vocab.detokenize(batch["tokens"].combine_chunks()).null_count == 2
    out = ParseStage(cfg=AnalyzeConfig(stats=True), fmt="generic")(batch)
    assert out.num_rows == 2
    assert out["level"].to_pylist() == ["ERROR", "ERROR"]
    assert CountStage(None, None)(batch)["n"].to_pylist() == [2]
