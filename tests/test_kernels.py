"""Vectorized kernels must agree with the pure-Python (reference-faithful)
regex semantics on every fixture and synthetic line."""

import pyarrow as pa
import pytest

import fixtures
from timberjack_ray import kernels
from timberjack_ray.data import synth

ALL_LINES = (
    fixtures.CLI_BASIC
    + fixtures.MALFORMED
    + fixtures.NON_ASCII
    + fixtures.COMPLEX_REGEX_LINES
    + fixtures.MIXED_FORMATS
    + fixtures.MULTI_MATCH
    + fixtures.JSON_LINES
    + [synth.line_for(i, 0.3) for i in range(2000)]
)


@pytest.fixture(scope="module")
def arr():
    return pa.chunked_array([pa.array(ALL_LINES[:10]), pa.array(ALL_LINES[10:])])


def test_level_parity(arr):
    got = kernels.extract_level(arr).to_pylist()
    for i, line in enumerate(ALL_LINES):
        m = kernels.LEVEL_RE.search(line)
        exp = (m.group(1) or m.group(0)).upper() if m else ""
        assert got[i] == exp, line


def test_colon_level_keeps_colon(arr):
    got = kernels.extract_level(pa.array(["ERROR: Database connection failed"])).to_pylist()
    assert got == ["ERROR:"]  # quirk: never matches --level ERROR


def test_timestamp_parity(arr):
    got = kernels.extract_timestamp_raw(arr).to_pylist()
    for i, line in enumerate(ALL_LINES):
        m = kernels.TIMESTAMP_RE.search(line)
        assert got[i] == (m.group(1) if m else None), line


def test_error_type_parity(arr):
    got = kernels.extract_error_type(arr).to_pylist()
    for i, line in enumerate(ALL_LINES):
        m = kernels.ERROR_TYPE_RE.search(line)
        assert got[i] == (m.group(1) if m else None), line


def test_message_key_parity(arr):
    got = kernels.message_key(arr).to_pylist()
    for i, line in enumerate(ALL_LINES):
        parts = line.split("]")
        exp = parts[1].strip() if len(parts) >= 2 else line
        assert got[i] == exp, line


@pytest.mark.parametrize(
    "pattern",
    ["ERROR", "timeout", "Null.*Web", r"(?i)^.*\[(?:ERROR|WARN)\].*(?:Exception|timeout).*$",
     r"ID:\s+\w+-\d+-\w+", "Error"],
)
def test_pattern_mask_parity(arr, pattern):
    from timberjack_ray import oracle

    got = kernels.pattern_mask(arr, pattern).to_pylist()
    p = oracle.make_pattern(pattern)
    for i, line in enumerate(ALL_LINES):
        exp = (p in line) if isinstance(p, str) else (p.search(line) is not None)
        assert got[i] == exp, (pattern, line)


def test_is_complex_pattern():
    assert not kernels.is_complex_pattern("ERROR")
    assert not kernels.is_complex_pattern("Connection timeout")
    for p in ["a*", "a?", "[ab]", "(a)", "a|b", "a+", "a.b", "^a", "a$", "a\\b"]:
        assert kernels.is_complex_pattern(p), p


def test_hour_bucket():
    got = kernels.hour_bucket(pa.array(
        ["2025-03-21 14:00:00", "2025-03-21T14:03:00.123Z", "short", None]
    )).to_pylist()
    assert got == ["2025-03-21 14", "2025-03-21T14", "short", None]


def test_field_filter_args():
    # entries without '=' silently dropped (src/analyzer.rs:115-123)
    got = kernels.parse_field_filter_args(["a=1", "bogus", " k = v ", "x=y=z"])
    assert got == {"a": "1", "k": "v", "x": "y=z"}


def test_json_parse_basics():
    ts, lv, fields = kernels.parse_json_line(fixtures.JSON_LINES[0])
    assert ts == "2025-03-21T14:00:00.123Z"
    assert lv == "ERROR"
    assert fields["service"] == "api"
    assert fields["user_id"] == "12345"


def test_json_alias_keys():
    ts, lv, _ = kernels.parse_json_line(fixtures.JSON_LINES[2])
    assert ts == "2025-03-21T15:02:00.789Z"  # "time" alias
    assert lv == "ERROR"  # "severity" alias


def test_json_nested_flatten():
    _, _, fields = kernels.parse_json_line(
        '{"a":{"b":{"c":"x"}},"arr":[{"k":1},2],"n":null,"b":true,"f":12}'
    )
    assert fields["a.b.c"] == "x"
    assert fields["arr[0].k"] == "1"
    # scalar array items are DROPPED by the reference (extract_fields falls
    # through the `_ => {}` arm for non-container items, src/parser/json.rs:82-88)
    assert "arr[1]" not in fields
    assert fields["n"] == "null"
    assert fields["b"] == "true"  # serde bool Display is lowercase
    assert fields["f"] == "12"


def test_json_field_cap():
    obj = "{" + ",".join(f'"k{i:03d}": {i}' for i in range(150)) + "}"
    _, _, fields = kernels.parse_json_line(obj)
    assert len(fields) == 150  # leaves are always inserted; only recursion is capped
    nested = '{"outer": {' + ",".join(f'"k{i:03d}": {i}' for i in range(150)) + "}, " + \
        ",".join(f'"top{i:03d}": {i}' for i in range(120)) + "}"
    _, _, f2 = kernels.parse_json_line(nested)
    # sorted (BTreeMap) iteration: "outer" < "topNNN", so outer.* fills first
    assert "outer.k000" in f2


def test_json_malformed_falls_back():
    ts, lv, fields = kernels.parse_json_line("{not valid json at all")
    assert ts is None and lv is None and fields is None


def test_detect_format():
    assert kernels.detect_format(fixtures.JSON_LINES[:5]) == "json"
    assert kernels.detect_format(fixtures.CLI_BASIC) == "generic"
    # mixed head with <40% JSON in first 5 → generic
    assert kernels.detect_format(fixtures.MIXED_FORMATS) == "generic"
    assert kernels.detect_format([]) == "generic"
