"""Single-process, line-at-a-time oracle mirroring the reference analyzer.

This is a deliberately *independent* implementation of the semantics in
/root/reference/src/analyzer.rs (``analyze_line`` :211-289,
``process_chunk_data`` :292-359) and src/parser/{generic,json}.rs, used as
ground truth by the conformance tests: the distributed Ray pipeline and this
oracle must produce identical aggregates on the same decoded lines.

Per-row Python, no Arrow, no Ray — do not use in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from timberjack_ray import kernels

MAX_UNIQUE_LINES = 10_000  # src/analyzer.rs:13


@dataclass
class OracleResult:
    """Mirror of AnalysisResult (src/analyzer.rs:30-40)."""

    matched_lines: list[str] = field(default_factory=list)
    line_counts: dict[str, int] = field(default_factory=dict)
    count: int = 0
    time_trends: dict[str, int] = field(default_factory=dict)
    levels_count: dict[str, int] = field(default_factory=dict)
    error_types: dict[str, int] = field(default_factory=dict)
    unique_messages: set[str] = field(default_factory=set)
    deduplicated: bool = True


def parse_line(line: str, fmt: str):
    """→ (timestamp|None, level|None, fields|None) per the format's parser."""
    if fmt == "json":
        return kernels.parse_json_line(line)
    # generic parser, src/parser/generic.rs:28-58
    level = None
    m = kernels.LEVEL_RE.search(line)
    if m:
        level = (m.group(1) or m.group(0)).upper()
    ts = None
    tm = kernels.TIMESTAMP_RE.search(line)
    if tm:
        t = tm.group(1)
        ts = t[:13] if len(t) >= 13 else t
    return ts, level, None


def analyze_line(
    line: str,
    fmt: str,
    pattern,  # compiled re.Pattern | (str literal) | None
    level_filter: str | None,
    field_filters: dict[str, str],
    collect_trends: bool,
):
    """src/analyzer.rs:211-289 → (line, level, timestamp|None) or None."""
    parsed_ts, parsed_level, fields = parse_line(line, fmt)

    if not kernels.field_filter_match(line, fields, field_filters):
        return None

    level = parsed_level
    if level is None:
        m = kernels.LEVEL_RE.search(line)
        level = (m.group(1) or m.group(0)).upper() if m else ""

    if level_filter is None:
        level_ok = True
    else:
        level_ok = level != "" and level.upper() == level_filter.upper()

    if pattern is None:
        pattern_ok = True
    elif isinstance(pattern, str):
        pattern_ok = pattern in line
    else:
        pattern_ok = pattern.search(line) is not None

    if not (level_ok and pattern_ok):
        return None

    ts = None
    if collect_trends:
        ts = parsed_ts
        if ts is None:
            tm = kernels.TIMESTAMP_RE.search(line)
            ts = tm.group(1) if tm else None
    return line, level, ts


def make_pattern(pattern: str | None):
    if pattern is None:
        return None
    if kernels.is_complex_pattern(pattern):
        import re

        return re.compile(pattern)
    return pattern  # literal contains


def analyze_lines(
    lines,
    fmt: str = "generic",
    pattern: str | None = None,
    level: str | None = None,
    field_filters: dict[str, str] | None = None,
    collect_trends: bool = False,
    collect_stats: bool = False,
) -> OracleResult:
    """src/analyzer.rs:292-359 over an iterable of decoded lines."""
    field_filters = field_filters or {}
    pat = make_pattern(pattern)
    result = OracleResult()

    for line in lines:
        if not line:
            continue
        hit = analyze_line(line, fmt, pat, level, field_filters, collect_trends)
        if hit is None:
            continue
        matched_line, lv, ts = hit
        result.count += 1
        result.line_counts[matched_line] = result.line_counts.get(matched_line, 0) + 1
        if len(result.matched_lines) < MAX_UNIQUE_LINES:
            result.matched_lines.append(matched_line)
        if collect_trends and ts is not None:
            hour = ts[:13] if len(ts) >= 13 else ts
            result.time_trends[hour] = result.time_trends.get(hour, 0) + 1
        if collect_stats:
            result.levels_count[lv] = result.levels_count.get(lv, 0) + 1
            em = kernels.ERROR_TYPE_RE.search(line)
            if em:
                et = em.group(1)
                result.error_types[et] = result.error_types.get(et, 0) + 1
            parts = matched_line.split("]")
            if len(parts) >= 2:
                result.unique_messages.add(parts[1].strip())
            else:
                result.unique_messages.add(matched_line)
    return result


def count_only(lines, pattern: str | None = None, level: str | None = None) -> int:
    """--count fast path (src/main.rs:299-366): fresh analyzer with pattern +
    level only — NO parser, NO field filters (quirk: JSON parsed levels are
    not available, so --level over JSON counts 0)."""
    return analyze_lines(
        lines, fmt="none", pattern=pattern, level=level,
        collect_trends=False, collect_stats=False,
    ).count


def repetition_ratio(result: OracleResult) -> float:
    """src/formatter.rs:106-110."""
    if result.count > 0:
        return (1.0 - len(result.unique_messages) / result.count) * 100.0
    return 0.0
