"""Vectorized kernels must agree with the pure-Python (reference-faithful)
regex semantics on every fixture and synthetic line."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

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


# ---- round-4 Horner signature kernels vs naive references ----------------

def _naive_horner(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) % (1 << 64)
    return h


def _naive_winnow(text: str, ngram: int = 5) -> int:
    words = text.split(" ")
    if len(words) < ngram:
        return _naive_horner(text)
    whs = [_naive_horner(w) for w in words]
    best = None
    for i in range(len(whs) - ngram + 1):
        g = 0
        for wh in whs[i:i + ngram]:
            g = (g * 1000003 + wh) % (1 << 64)
        best = g if best is None else min(best, g)
    return best


def _naive_minhash(text: str, ngram: int = 3, n_perm: int = 8):
    words = text.split(" ")
    whs = [_naive_horner(w) for w in words]
    if len(words) >= ngram:
        grams = []
        for i in range(len(whs) - ngram + 1):
            g = 0
            for wh in whs[i:i + ngram]:
                g = (g * 1000003 + wh) % (1 << 64)
            grams.append(g)
    else:
        grams = [_naive_horner(text)]
    out = []
    a = 1
    for p in range(n_perm):
        a = (a * 1000003) % (1 << 64)
        b = p * 2654435761
        out.append(min((g * a + b) % (1 << 64) for g in grams))
    return out


def _naive_simhash16(text: str) -> int:
    whs = [_naive_horner(w) for w in text.split(" ")]
    sig = 0
    for b in range(16):
        ones = sum((h >> b) & 1 for h in whs)
        if 2 * ones > len(whs):
            sig |= 1 << b
    return sig


@given(st.lists(st.text(alphabet="abé 日x", min_size=0, max_size=30),
                min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_winnow_minhash_simhash_match_naive(texts):
    import pyarrow as pa

    from timberjack_ray.functions.dedup import (minhash_horner_signature,
                                                simhash16_horner)
    from timberjack_ray.functions.text import add_winnow_fp

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    fp = add_winnow_fp(t)["fp"].to_numpy(zero_copy_only=False)
    for i, txt in enumerate(texts):
        want = _naive_winnow(txt)
        got = int(fp[i]) % (1 << 64)
        assert got == want, (i, txt)

    mh = minhash_horner_signature(t).to_pandas()
    for i, txt in enumerate(texts):
        got = [int(v) % (1 << 64)
               for v in mh[mh["doc_id"] == i].sort_values("perm")["minhash"]]
        assert got == _naive_minhash(txt), (i, txt)

    sh = simhash16_horner(t).to_pandas().set_index("doc_id")["simhash"]
    for i, txt in enumerate(texts):
        assert int(sh[i]) == _naive_simhash16(txt), (i, txt)
