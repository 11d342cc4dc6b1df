"""Bounded-streaming line analysis — the reference's stdin path
(src/main.rs:218-297) re-expressed over the same vectorized kernels.

Processes any iterable of text lines in fixed-size Arrow chunks with O(keys)
memory: each chunk runs through the SAME ParseStage used by the distributed
pipeline, partial counts fold into a running monoid (the reference's
inline counter updates), and the report is produced at end-of-stream —
"bounded streaming", exactly the reference's model (SURVEY.md §2.9: no
windows, no watermarks, string-keyed trend buckets regardless of arrival
order).

Reference stdin quirks preserved:
* always ``deduplicated: true`` (src/main.rs:233-235);
* the matched-lines sample is dedup-checked before insert (``contains`` at
  src/main.rs:258-261 — set semantics), unlike the mmap chunk path which
  pushes duplicates up to the cap;
* line cap 10 000 (src/main.rs:18).

No Ray session required — this is the single-process ingest tail of the
engine; for bulk history, write the lines to the sequences table and run
the distributed pipeline instead.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from timberjack_ray.aggregates import PartialCounts
from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.report import assemble_report
from timberjack_ray.stages.parse import ParseStage

MAX_LINES = 10_000  # src/main.rs:18


def _chunks(line_iter, size: int):
    buf: list[str] = []
    for line in line_iter:
        buf.append(line)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def analyze_stream(line_iter, cfg: AnalyzeConfig, fmt: str | None = None,
                   chunk_rows: int = 4096) -> dict:
    """→ report dict (formatter.rs JsonOutput shape), computed incrementally.

    ``fmt`` defaults to detection over the first chunk's head (the reference
    samples the first ≤10 lines, src/main.rs:52-89).
    """
    import pandas as pd

    if cfg.count:
        # --count fast path: pattern + level only, NO parser and NO field
        # filters (the reference quirk, src/main.rs:299-366)
        from timberjack_ray.stages.parse import CountStage

        cs = CountStage(cfg.pattern, cfg.level)
        total = 0
        for chunk in _chunks(line_iter, chunk_rows):
            total += cs(pa.table({"line": pa.array(chunk, type=pa.string())}))["n"][0].as_py()
        return {"matched_lines": [], "total_count": total, "time_trends": None,
                "stats": None, "deduplicated": True}

    counts: Counter = Counter()          # (kind, key) → n
    parser: ParseStage | None = None
    counter = PartialCounts(
        want_trend=cfg.trend, want_stats=cfg.stats,
        want_lines=cfg.collect_lines, hash_msgs=not cfg.show_unique,
    )
    total = 0
    for chunk in _chunks(line_iter, chunk_rows):
        if parser is None:
            resolved = fmt or cfg.resolve_format(chunk[:10])
            parser = ParseStage(cfg=cfg, fmt=resolved, keep_tokens=False)
        batch = parser(pa.table({"line": pa.array(chunk, type=pa.string())}))
        total += batch.num_rows
        partial = counter(batch)
        for kind, key, n in zip(partial["kind"].to_pylist(),
                                partial["key"].to_pylist(),
                                partial["n"].to_pylist()):
            counts[(kind, key)] += n

    df = pd.DataFrame(
        [(k, key, n) for (k, key), n in counts.items()],
        columns=["kind", "key", "n"],
    )
    report = assemble_report(df, cfg)
    # stdin-path semantics: sample is a SET of distinct matched lines
    # (src/main.rs:258-261) and the report is always flagged deduplicated
    report["deduplicated"] = True
    if cfg.collect_lines:
        report["matched_lines"] = report["matched_lines"][:MAX_LINES]
    return report
