"""Vectorized parse/filter kernels — the semantic core of the engine.

Pure functions over Arrow arrays / Python scalars that reproduce the analysis
semantics of the reference (file:line citations into /root/reference):

* level extraction        — src/analyzer.rs:16-19, src/parser/generic.rs:5-13
* timestamp extraction    — src/analyzer.rs:21-23, src/parser/generic.rs:10-12
* error-type extraction   — src/analyzer.rs:25-28, :362-366
* message normalization   — src/analyzer.rs:348-355
* pattern matching tiers  — src/analyzer.rs:48-84, :194-208
* field filters           — src/analyzer.rs:115-163
* JSON line parsing       — src/parser/json.rs:8-15, :33-47, :50-90, :125-149
* format detection        — src/main.rs:52-89, src/parser/mod.rs:71-97,
                            src/parser/json.rs:98-123

Hot-path functions take ``pa.Array``/``pa.ChunkedArray`` of strings and use
``pyarrow.compute`` RE2 kernels (leftmost-first submatch semantics, same as
the Rust ``regex`` crate for these patterns — parity is asserted against the
pure-Python oracle in tests).  JSON parsing is per-row Python inside a batch
(like the reference, the JSON path is the slow path).
"""

from __future__ import annotations

import json
import re

try:
    # ~4× faster than stdlib json for small objects, and closer to
    # serde_json's semantics (rejects NaN/Infinity like src/parser/json.rs's
    # serde does; stdlib json would accept them)
    from orjson import loads as _json_loads
except ImportError:  # pragma: no cover
    _json_loads = json.loads

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Regex patterns (RE2 strings for pyarrow, re.Pattern for per-row paths)
# ---------------------------------------------------------------------------

_LEVEL_ALTS = "ERROR|WARN|INFO|DEBUG|TRACE|SEVERE|WARNING|FINE"

# group "b": bracketed form keeps the inner word; group "c": colon form keeps
# the trailing ':' (the reference's level value then never matches --level).
LEVEL_RE2 = rf"\[(?P<b>(?i:{_LEVEL_ALTS}))\]|(?P<c>(?i:{_LEVEL_ALTS}):)"
LEVEL_RE = re.compile(rf"\[((?i:{_LEVEL_ALTS}))\]|((?i:{_LEVEL_ALTS}):)")

TIMESTAMP_RE2 = r"(?P<t>\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2})"
TIMESTAMP_RE = re.compile(r"(\d{4}-\d{2}-\d{2}\s+\d{2}:\d{2}:\d{2})")

_ERROR_ALTS = (
    r"[A-Za-z]+Exception|[A-Za-z]+Error|[A-Za-z]+\s+timeout"
    r"|Connection timeout|500 Internal Server Error|401 Unauthorized|503 Service Unavailable"
)
ERROR_TYPE_RE2 = rf"(?P<e>{_ERROR_ALTS})"
ERROR_TYPE_RE = re.compile(rf"({_ERROR_ALTS})")

# JSON first-match key lists, src/parser/json.rs:8-15
TIMESTAMP_KEYS = ["timestamp", "time", "@timestamp", "date", "datetime"]
LEVEL_KEYS = ["level", "severity", "loglevel", "log_level", "@level"]
MESSAGE_KEYS = ["message", "msg", "text", "description", "content"]

JSON_FIELD_CAP = 100  # src/parser/json.rs:62-64


def _as_chunked(arr) -> pa.ChunkedArray:
    if isinstance(arr, pa.ChunkedArray):
        return arr
    return pa.chunked_array([arr])


# ---------------------------------------------------------------------------
# Extraction kernels (vectorized, RE2)
# ---------------------------------------------------------------------------

def extract_level(lines) -> pa.ChunkedArray:
    """Level of each raw line per LEVEL_REGEX; "" when absent.

    Bracket form → uppercased inner word ("ERROR"); colon form → uppercased
    match including the colon ("ERROR:"), per src/analyzer.rs:232-245.
    """
    st = pc.extract_regex(_as_chunked(lines), LEVEL_RE2)
    b = pc.struct_field(st, "b")
    c = pc.struct_field(st, "c")
    level = pc.if_else(pc.not_equal(b, ""), b, c)
    return pc.utf8_upper(pc.coalesce(level, ""))


def extract_timestamp_raw(lines) -> pa.ChunkedArray:
    """First TIMESTAMP_REGEX match (null when absent), untruncated."""
    st = pc.extract_regex(_as_chunked(lines), TIMESTAMP_RE2)
    return pc.struct_field(st, "t")


def extract_error_type(lines) -> pa.ChunkedArray:
    """First ERROR_TYPE_REGEX match on the raw line (null when absent)."""
    st = pc.extract_regex(_as_chunked(lines), ERROR_TYPE_RE2)
    return pc.struct_field(st, "e")


def hour_bucket(ts) -> pa.ChunkedArray:
    """13-char prefix of the timestamp string (src/analyzer.rs:326-336).

    Byte slicing in the reference; all timestamps are ASCII so codeunit
    slicing is equivalent.  Null in → null out (no trend contribution).
    """
    return pc.utf8_slice_codeunits(_as_chunked(ts), 0, 13)


def message_key(lines) -> pa.ChunkedArray:
    """``line.split(']').nth(1).trim()``, whole line if no second segment
    (src/analyzer.rs:348-355)."""
    arr = _as_chunked(lines)
    out_chunks = []
    for chunk in arr.chunks:
        parts = pc.split_pattern(chunk, "]")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        # list_slice(start=1, stop=2) yields [] for 1-element lists and
        # [second_segment] otherwise; flatten + scatter is branch-free.
        seconds = pc.list_slice(parts, 1, 2)
        flat = pc.utf8_trim_whitespace(seconds.flatten()).to_numpy(zero_copy_only=False)
        out = chunk.to_numpy(zero_copy_only=False).copy()
        has_second = lens >= 2
        out[has_second] = flat
        out_chunks.append(pa.array(out, type=pa.string()))
    return pa.chunked_array(out_chunks, type=pa.string())


# ---------------------------------------------------------------------------
# Pattern matching (chop)
# ---------------------------------------------------------------------------

_COMPLEX_CHARS = set("*?[(|+.^$\\")


def is_complex_pattern(pattern: str) -> bool:
    """src/analyzer.rs:195-208 — regex iff any metachar present."""
    return any(c in _COMPLEX_CHARS for c in pattern)


def pattern_mask(lines, pattern: str | None) -> pa.ChunkedArray | None:
    """Boolean mask of lines matching the chop pattern.

    Literal substring (Arrow SIMD kernel) when the pattern has no regex
    metacharacters, RE2 search otherwise — the same two tiers as
    src/analyzer.rs:48-84/:170-208 (the SIMD tier maps to Arrow's own
    vectorized kernel).
    """
    if pattern is None:
        return None
    arr = _as_chunked(lines)
    if is_complex_pattern(pattern):
        return pc.match_substring_regex(arr, pattern)
    return pc.match_substring(arr, pattern)


def level_mask(levels, level_filter: str | None) -> pa.ChunkedArray | None:
    """Case-insensitive exact match; empty level never matches
    (src/analyzer.rs:247-253)."""
    if level_filter is None:
        return None
    lv = _as_chunked(levels)
    return pc.and_(
        pc.not_equal(lv, ""),
        pc.equal(pc.utf8_upper(lv), level_filter.upper()),
    )


# ---------------------------------------------------------------------------
# Field filters
# ---------------------------------------------------------------------------

def parse_field_filter_args(args: list[str]) -> dict[str, str]:
    """``k=v`` args; entries without '=' silently dropped; k/v trimmed
    (src/analyzer.rs:115-123)."""
    out: dict[str, str] = {}
    for f in args:
        if "=" in f:
            k, _, v = f.partition("=")
            out[k.strip()] = v.strip()
    return out


def fallback_filter_mask(lines, filters: dict[str, str]) -> pa.ChunkedArray:
    """Substring fallback: line contains key AND value, case-insensitive,
    ANDed over filters (src/analyzer.rs:126-133).  Used when a row has no
    parsed field for the key (always, for non-JSON formats)."""
    low = pc.utf8_lower(_as_chunked(lines))
    mask = None
    for k, v in filters.items():
        m = pc.and_(
            pc.match_substring(low, k.lower()),
            pc.match_substring(low, v.lower()),
        )
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def field_filter_match(line: str, fields: dict[str, str] | None, filters: dict[str, str]) -> bool:
    """Scalar semantics (src/analyzer.rs:136-163): parsed-field equality
    (trimmed, case-insensitive) when the key exists, else substring fallback."""
    if not filters:
        return True
    line_lower = None
    for k, v in filters.items():
        k = k.strip()
        v = v.strip()
        fv = fields.get(k) if fields else None
        if fv is not None:
            if fv.strip().lower() != v.lower():
                return False
        else:
            if line_lower is None:
                line_lower = line.lower()
            if not (k.lower() in line_lower and v.lower() in line_lower):
                return False
    return True


# ---------------------------------------------------------------------------
# JSON line parsing (per-row Python inside a batch)
# ---------------------------------------------------------------------------

def json_value_to_string(v) -> str | None:
    """serde_json stringification of scalar values (src/parser/json.rs:36-41):
    strings as-is, numbers via Display, bools lowercase; null/containers → None."""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # Rust f64 Display ≈ shortest roundtrip; Python repr matches for
        # common values.  Integral floats differ ("1.0" vs Rust "1") — the
        # synthetic corpus avoids floats entirely.
        return repr(v)
    return None


def find_first_value(obj: dict, keys: list[str]) -> str | None:
    """First-match key lookup (src/parser/json.rs:33-47); scalar values only,
    containers/null skipped (continue to next key)."""
    for k in keys:
        if k in obj:
            s = json_value_to_string(obj[k])
            if s is not None:
                return s
    return None


def flatten_fields(value, prefix: str, result: dict[str, str]) -> None:
    """Dotted-key flatten with the 100-field cap (src/parser/json.rs:50-90).

    serde_json's default Map is a BTreeMap ⇒ keys iterate in SORTED order;
    the cap check happens before recursing into a container, leaves are always
    inserted (so the map can slightly exceed 100).
    """
    if isinstance(value, dict):
        for key in sorted(value.keys()):
            v = value[key]
            new_prefix = key if not prefix else f"{prefix}.{key}"
            if isinstance(v, (dict, list)):
                if len(result) < JSON_FIELD_CAP:
                    flatten_fields(v, new_prefix, result)
            elif v is None:
                result[new_prefix] = "null"
            else:
                result[new_prefix] = json_value_to_string(v)
    elif isinstance(value, list):
        for i, item in enumerate(value):
            flatten_fields(item, f"{prefix}[{i}]", result)


def parse_json_line(line: str, want_fields: bool = True):
    """→ (timestamp|None, level|None, fields|None).  Malformed JSON → all None
    (raw-line fallbacks apply downstream), mirroring src/parser/json.rs:125-149.
    """
    try:
        obj = _json_loads(line.strip())
    except (ValueError, UnicodeDecodeError):
        return None, None, None
    if not isinstance(obj, dict):
        # serde parses scalars as Value too; find_first_value then returns
        # None (not an object) and extract_fields inserts nothing.
        return None, None, {} if want_fields else None
    ts = find_first_value(obj, TIMESTAMP_KEYS)
    level = find_first_value(obj, LEVEL_KEYS)
    fields: dict[str, str] | None = None
    if want_fields:
        fields = {}
        flatten_fields(obj, "", fields)
    return ts, level, fields


# ---------------------------------------------------------------------------
# Format detection
# ---------------------------------------------------------------------------

def json_can_parse(sample_lines: list[str]) -> bool:
    """src/parser/json.rs:98-123 — ≥40 % of sample lines are JSON objects
    containing a timestamp-ish and a level-ish *substring*."""
    if not sample_lines:
        return False
    valid = 0
    for line in sample_lines:
        t = line.strip()
        if not (t.startswith("{") and t.endswith("}")):
            continue
        try:
            json.loads(t)
        except json.JSONDecodeError:
            continue
        if ("timestamp" in t or "time" in t or "@timestamp" in t) and (
            "level" in t or "severity" in t or "log_level" in t
        ):
            valid += 1
    return valid * 100 // len(sample_lines) >= 40


def detect_format(sample_lines: list[str]) -> str:
    """'json' or 'generic', from ≤10 sampled non-empty lines; only the first
    5 are consulted (src/parser/mod.rs:71-97)."""
    sample = [s.strip() for s in sample_lines if s.strip()][:10]
    sample = sample[:5] if len(sample) >= 5 else sample
    return "json" if json_can_parse(sample) else "generic"
