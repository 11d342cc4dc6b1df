"""Analysis configuration — mirror of the reference CLI flags
(/root/reference/src/cli.rs:7-59)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class AnalyzeConfig:
    fmt: str = "auto"              # auto | generic | json  (--format)
    pattern: str | None = None     # --chop
    level: str | None = None       # --level
    fields: list[str] = field(default_factory=list)  # -f k=v (repeatable)
    trend: bool = False            # --trend
    stats: bool = False            # --stats
    top_errors: int = 5            # --top-errors
    show_unique: bool = False      # --show-unique
    count: bool = False            # --count (fast path: no parser, no field filters)
    collect_lines: bool = True     # matched-line sample (A2/K5); off for pure-aggregate runs
    first_seen: bool = False       # order matched lines by first global occurrence
                                   # (min row order per distinct line, SURVEY §2.6 A2 —
                                   # src/analyzer.rs:317-324's sequential display order;
                                   # needs an input column with a numeric row suffix,
                                   # e.g. the sequences table's doc_id)

    def field_filters(self) -> dict[str, str]:
        from timberjack_ray import kernels

        return kernels.parse_field_filter_args(self.fields)

    def resolve_format(self, sample_lines: list[str]) -> str:
        from timberjack_ray import kernels

        f = self.fmt.lower()
        if f == "auto":
            return kernels.detect_format(sample_lines)
        if f == "json":
            return "json"
        if f in ("apache", "syslog"):
            # The reference registers no parser for these and panics at
            # get_parser().expect() (src/main.rs:134-136); we surface a clear error.
            raise ValueError(f"format {f!r} has no registered parser")
        if f != "generic":
            # user-registered parser name (registry.ParserRegistry)
            from timberjack_ray.registry import default_registry

            default_registry().get(f)  # raises KeyError if unknown
            return f
        return "generic"
