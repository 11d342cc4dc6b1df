"""User-extension surface: pluggable log parsers.

Mirror of the reference's ``LogParser`` trait + ``ParserRegistry``
(src/parser/mod.rs:5-15 — name/can_parse/parse_line — and the registry
try-in-order detection at :71-97, JSON registered before Generic at
:49-63).  Our parsers are VECTORIZED: ``parse_batch`` maps a pyarrow Table
with a ``line`` column to a Table with appended analysis columns, so a
registered parser slots straight into ``map_batches``.

Usage:

    from timberjack_ray.registry import LogParser, default_registry

    class MyParser:
        name = "myformat"
        def can_parse(self, sample_lines): ...
        def parse_batch(self, table): ...

    default_registry().register(MyParser())   # tried before the built-ins
    fmt = default_registry().detect(sample_lines)
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import pyarrow as pa

from timberjack_ray import kernels


@runtime_checkable
class LogParser(Protocol):
    name: str

    def can_parse(self, sample_lines: list[str]) -> bool:
        """True if this parser should handle a stream whose head looks like
        ``sample_lines`` (reference: can_parse, src/parser/mod.rs:8-11)."""
        ...

    def parse_batch(self, table: pa.Table) -> pa.Table:
        """Vectorized parse: input has a ``line`` string column; output must
        append ``level`` (string) and ``ts`` (string, nullable) columns."""
        ...


class GenericParser:
    """M1 — regex level + timestamp extraction (src/parser/generic.rs)."""

    name = "generic"

    def can_parse(self, sample_lines: list[str]) -> bool:
        return True  # always matches (src/parser/generic.rs:23-26)

    def parse_batch(self, table: pa.Table) -> pa.Table:
        lines = table["line"]
        level = kernels.extract_level(lines)
        ts = kernels.hour_bucket(kernels.extract_timestamp_raw(lines))
        return table.append_column("level", level).append_column("ts", ts)


class JsonParser:
    """M2 — serde-style JSON parse with key aliases (src/parser/json.rs)."""

    name = "json"

    def can_parse(self, sample_lines: list[str]) -> bool:
        return kernels.json_can_parse(sample_lines)

    def parse_batch(self, table: pa.Table) -> pa.Table:
        import numpy as np

        lines_py = table["line"].to_pylist()
        n = len(lines_py)
        ts = np.empty(n, dtype=object)
        level = np.empty(n, dtype=object)
        for i, line in enumerate(lines_py):
            t, lv, _ = kernels.parse_json_line(line, want_fields=False)
            ts[i] = t
            level[i] = lv
        lvl = pa.array(level, type=pa.string())
        import pyarrow.compute as pc

        fallback = kernels.extract_level(table["line"])
        lvl = pc.if_else(pc.is_valid(lvl), lvl, fallback)
        tsa = pa.array(ts, type=pa.string())
        tsa = pc.if_else(pc.is_valid(tsa), tsa, kernels.extract_timestamp_raw(table["line"]))
        return table.append_column("level", lvl).append_column("ts", tsa)


class ParserRegistry:
    """Parsers tried in registration order; user parsers go FIRST, then
    json, then generic (the always-matching fallback) — the reference's
    ordering (src/parser/mod.rs:79-90)."""

    def __init__(self):
        self._parsers: list[LogParser] = [JsonParser(), GenericParser()]

    def register(self, parser: LogParser) -> None:
        self._parsers.insert(0, parser)

    def get(self, name: str) -> LogParser:
        for p in self._parsers:
            if p.name == name:
                return p
        raise KeyError(f"no parser registered under {name!r}")

    def names(self) -> list[str]:
        return [p.name for p in self._parsers]

    def detect(self, sample_lines: list[str]) -> str:
        sample = [s.strip() for s in sample_lines if s.strip()][:10]
        for p in self._parsers:
            if p.can_parse(sample):
                return p.name
        return "generic"


_DEFAULT: ParserRegistry | None = None


def default_registry() -> ParserRegistry:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = ParserRegistry()
    return _DEFAULT
